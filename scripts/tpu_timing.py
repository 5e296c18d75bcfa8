"""Device-time measurement through the axon tunnel.

Single-call wall timing through the tunnel measures the ~30 ms fixed
round trip, not device time (CLAUDE.md).  `device_time` uses the
N-vs-n delta method: enqueue N calls back-to-back (dispatch is async and
overlaps device compute), sync once; per-call device time is
(t_N - t_n) / (N - n), with the fixed dispatch+sync cost cancelling.
"""

from __future__ import annotations

import time

import numpy as np


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def _chain(fn, args, n):
    out = None
    for _ in range(n):
        out = fn(*args)
    _sync(out)


def device_time(fn, args, n_hi: int = 110, n_lo: int = 10,
                reps: int = 3) -> float:
    """Median per-call device seconds of `fn(*args)` (jitted, async)."""
    _chain(fn, args, 2)  # compile + warm
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _chain(fn, args, n_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _chain(fn, args, n_hi)
        t_hi = time.perf_counter() - t0
        vals.append((t_hi - t_lo) / (n_hi - n_lo))
    vals.sort()
    return vals[len(vals) // 2]
