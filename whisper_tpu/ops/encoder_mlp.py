"""Fused encoder-MLP Pallas kernel: LN -> FC1 -> GELU -> FC2 -> +residual.

The XLA encoder spends ~half its non-attention time in the MLP chain
(docs/DECODE_ROOFLINE.md round-2 addendum: fc2+residual output-fusions
run at ~26% MFU and each LayerNorm makes an fp32 round trip over the
[B,1500,d] activations).  This kernel keeps a row-block resident in VMEM
through the whole chain: one HBM read of x and one write of the output
per block, with both weight matrices held as VMEM-resident constant
operands (whisper-base: 2x 2 MB bf16, double-buffered — well inside the
16 MB budget).

Numerics: LN statistics in fp32; matmuls accumulate fp32 (Mosaic
requirement); GELU is the tanh approximation (no erf lowering on this
Mosaic stack — same tradeoff as ops/pallas_mel.py), so this kernel is an
x3+-family variant, not a parity rung.

STATUS: PROMOTED (round 3) — default on the x3..x6 ladder rungs.
Device-time A/B (delta method, bucket-16 whisper-base encoder): 21.1 ms
unfused -> 16.7 ms with this kernel.  Quality: tanh-GELU deviations are
bounded by the tie-flip gate (tests/test_parity_margins.py) and the
x5-vs-x4 chain pin (tests/test_fullscale_parity.py); the whole-block
fusion follow-up measured WORSE and stayed opt-in (ops/encoder_block.py
STATUS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512  # rows (B*T positions) per grid step

# Both dense weight matrices live in VMEM as constant operands and Mosaic
# double-buffers them, so the weights alone cost 2 * (2*d*f) * itemsize
# bytes of the ~16 MB budget (the activations tile adds ROWS*(d+f) fp32 on
# top).  whisper-base (d=512, f=2048, bf16) fits at ~8.4 MB; medium/large
# (d>=1024) do not — callers must check fits_vmem and fall back.
_VMEM_WEIGHT_BUDGET = 12 * 2**20


def fits_vmem(d: int, f: int, dtype) -> bool:
    """True when the fused kernel's VMEM-resident weights fit the budget
    (guard against a Mosaic compile-time failure at medium/large dims)."""
    itemsize = jnp.dtype(dtype).itemsize
    return 2 * (2 * d * f * itemsize) <= _VMEM_WEIGHT_BUDGET


from whisper_tpu.ops.common import gelu_tanh as _gelu_tanh


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref):
    x = x_ref[...]                                  # [R, d] bf16
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    r = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    r = (r * lns_ref[...].astype(jnp.float32)
         + lnb_ref[...].astype(jnp.float32)).astype(x.dtype)
    h = jax.lax.dot_general(
        r, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)            # [R, f] fp32
    h = _gelu_tanh(h).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)            # [R, d] fp32
    o_ref[...] = (x32 + y).astype(x.dtype)


from whisper_tpu.ops.common import round_up as _round_up


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_encoder_mlp(x: jax.Array, ln_s: jax.Array, ln_b: jax.Array,
                      w1: jax.Array, b1: jax.Array,
                      w2: jax.Array, b2: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """x [B, T, d] -> x + FC2(GELU_tanh(FC1(LN(x)))) with one HBM round
    trip for the activations.  Weights must be dense (dequantize QTensors
    before the call — once per layer, outside the row grid)."""
    b, t, d = x.shape
    f = w1.shape[1]
    n = b * t
    n_pad = _round_up(n, ROWS)
    xf = x.reshape(n, d)
    if n_pad != n:
        xf = jnp.pad(xf, ((0, n_pad - n), (0, 0)))

    grid = (n_pad // ROWS,)
    out = pl.pallas_call(
        _mlp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), x.dtype),
        interpret=interpret,
    )(xf, ln_s, ln_b, w1, b1, w2, b2)
    return out[:n].reshape(b, t, d)
