"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths (parallel/) are exercised without TPU hardware — the rebuild's
analogue of the reference's untested-but-correct MPI paths (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
