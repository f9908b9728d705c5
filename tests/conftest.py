"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths (parallel/) are exercised without TPU hardware — the rebuild's
analogue of the reference's untested-but-correct MPI paths (SURVEY.md §4).

Note: the axon TPU plugin in this image force-appends itself to
jax_platforms, overriding the JAX_PLATFORMS env var — the config update
below (before any backend initialization) is what actually pins CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
