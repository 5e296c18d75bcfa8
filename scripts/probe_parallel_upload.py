"""Probe whether concurrent H2D transfers through the axon tunnel scale.

The headline e2e is wire-bound (CLAUDE.md: 12-51 MB/s session-dependent).
All upload paths today serialize transfers (slab k+1 enqueued behind k).
If the tunnel multiplexes concurrent jnp.asarray calls over independent
streams, issuing slabs from multiple threads multiplies effective
bandwidth; if it is one TCP pipe, concurrency should be a wash.

Run on the real TPU: python scripts/probe_parallel_upload.py
Prints MB/s for 1, 2, 4, 8 concurrent equal-split transfers of the same
total payload (noise-like int16, incompressible), plus a same-thread
back-to-back enqueue variant (tests pipelining vs true concurrency).
"""

import concurrent.futures as cf
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TOTAL_MB = 16
REPEATS = 3


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def upload(arr):
    return jnp.asarray(arr)


def run_split(data, n_parts, pool):
    parts = np.array_split(data, n_parts)
    t0 = time.perf_counter()
    futs = [pool.submit(upload, p) for p in parts]
    devs = [f.result() for f in futs]
    for d in devs:
        _sync(d)
    return time.perf_counter() - t0


def run_serial_enqueue(data, n_parts):
    parts = np.array_split(data, n_parts)
    t0 = time.perf_counter()
    devs = [upload(p) for p in parts]
    for d in devs:
        _sync(d)
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    data = rng.integers(-32768, 32767, TOTAL_MB * 2**19,
                        dtype=np.int16)  # TOTAL_MB MB
    mb = data.nbytes / 2**20
    # warm the link + destination buffers
    _sync(upload(data[: 2**18]))

    out = {}
    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        for n in (1, 2, 4, 8):
            ts = [run_split(data, n, pool) for _ in range(REPEATS)]
            out[f"threads{n}"] = round(mb / min(ts), 1)
    for n in (2, 4):
        ts = [run_serial_enqueue(data, n) for _ in range(REPEATS)]
        out[f"enqueue{n}"] = round(mb / min(ts), 1)
    print(json.dumps({"total_mb": mb, "mbps": out}))


if __name__ == "__main__":
    main()
