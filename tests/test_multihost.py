"""Two-process multi-host smoke test (SURVEY §2.3 / VERDICT r2 item 6).

The reference's MPI paths are 'correct by construction, never tested in
CI' (SURVEY §4); here the DCN analogue IS tested: two real OS processes,
each with two CPU devices, join through jax.distributed.initialize and
psum a global sharded array — the minimal proof that the multihost wiring
(coordinator handshake, cross-process device mesh, cross-process
collectives) works. TPU-pod runs use the same init_multihost() with
auto-detected arguments.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.getcwd())
    import jax
    jax.config.update("jax_platforms", "cpu")
    from proximalgalerkin_tpu.parallel.multihost import (
        init_multihost, is_coordinator)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    pid, n, devs = init_multihost()
    assert n == 2, n
    assert len(devs) == 4, devs                  # 2 hosts x 2 cpu devices
    mesh = Mesh(np.array(devs), ("dev",))
    sh = NamedSharding(mesh, P("dev"))

    def kern(x):
        return jax.lax.psum(jnp.sum(x), "dev") * jnp.ones_like(x)

    f = jax.jit(shard_map(kern, mesh=mesh, in_specs=P("dev"),
                          out_specs=P("dev")))
    # global vector [0, 1, 2, 3]: this process owns elements 2*pid, 2*pid+1
    locals_ = [jax.device_put(jnp.asarray([2.0 * pid + i]), d)
               for i, d in enumerate(jax.local_devices())]
    g = jax.make_array_from_single_device_arrays((4,), sh, locals_)
    out = f(g)
    total = float(np.asarray(out.addressable_shards[0].data)[0])
    assert abs(total - 6.0) < 1e-12, total       # 0+1+2+3
    if is_coordinator():
        print("MULTIHOST_OK", total)
""")


@pytest.mark.skipif(os.environ.get("PGTPU_SKIP_MULTIHOST") == "1",
                    reason="explicitly disabled")
def test_two_process_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = "2"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = []
    for pid in range(2):
        e = dict(env)
        e["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=e, cwd=os.getcwd(),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
        outs.append(out)
    assert all(pr.returncode == 0 for pr in procs), "\n---\n".join(outs)
    assert any("MULTIHOST_OK" in o for o in outs), "\n---\n".join(outs)
