"""Shared helpers for the Pallas kernels.

One definition each for the tile-rounding helper and the tanh-GELU used
across the ops modules — the GELU constant is PARITY-SENSITIVE (the
fused encoder kernels' numerics are gated on transcript A/Bs;
docs/PARITY_MATRIX.md), so a tweak must hit every kernel at once, not
one copy of six.
"""

from __future__ import annotations

import jax.numpy as jnp

SQRT_2_OVER_PI = 0.7978845608028654


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x``."""
    return ((x + m - 1) // m) * m


def gelu_tanh(x):
    """tanh-approximation GELU — Mosaic on this stack has no erf lowering
    (CLAUDE.md), so every fused kernel uses this form."""
    return 0.5 * x * (
        1.0 + jnp.tanh(SQRT_2_OVER_PI * (x + 0.044715 * x * x * x))
    )
