"""Multi-host (DCN) path: two-process jax.distributed smoke test.

Exercises parallel.mesh.init_distributed — the multi-host entry the CLI
wires through --dcn-coordinator/--dcn-num-processes/--dcn-process-id
(bench/cli.py) — with two REAL processes on localhost over the CPU
backend: each process contributes 2 virtual devices, the ('data','model')
mesh spans all 4, and a pjit'd sharded reduction must see every process's
data (SURVEY.md §5.8 — the reference has no multi-device story at all).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); coord = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from whisper_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coord, 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()          # 2 per process
    assert len(jax.local_devices()) == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(4, model_parallel=2)                   # data=2, model=2
    # Each process materializes its LOCAL shard of a [4, 8] global array
    # whose row i equals i; the sharded sum must see all rows from both
    # processes (a cross-process psum over DCN-equivalent transport).
    sharding = NamedSharding(mesh, P("data", "model"))
    global_shape = (4, 8)
    arrs = []
    for d in jax.local_devices():
        # device d holds block (row_block, col_block) per the sharding
        idx_map = sharding.devices_indices_map(global_shape)
        rows, cols = idx_map[d]
        block = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)[rows, cols]
        arrs.append(jax.device_put(block, d))
    garr = jax.make_array_from_single_device_arrays(
        global_shape, sharding, arrs)

    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
    )(garr)
    want = float(np.arange(4 * 8).sum())
    got = float(np.asarray(jax.device_get(total)))
    assert got == want, (got, want)
    print(f"proc {{pid}} OK sum={{got}}", flush=True)
""").format(repo=REPO)


def test_two_process_dcn_mesh():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, str(pid), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
