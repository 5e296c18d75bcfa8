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

Round 5: at d >= 1024 (whisper-medium and up) the whole matrices never
fit, so the promoted rung silently fell back to the unfused chain at
exactly the model sizes with the largest per-layer HBM intermediates.
The FFN-CHUNKED variant (chunk_plan + _mlp_kernel_chunked) fixes that:
grid (row_blocks, f_chunks) with f minor, weight SLICES streaming
through VMEM while the [R, d] activation tile and an fp32 accumulator
scratch stay resident — the [R, f] GELU intermediate still never
touches HBM.  Interpret-parity-tested at medium/large dims
(tests/test_encoder_mlp.py::TestChunkedKernel); device A/B queued
(scripts/bench_encoder_block.py at large-v3, tpu_round5_queue.sh 4c) —
treat the large-dims win as UNMEASURED until that runs.
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


ROWS_CHUNKED = 256   # smaller row tile: the chunked path also carries an
                     # fp32 [R, d] accumulator scratch at d>=1024
_F_CHUNK_BUDGET = 6 * 2**20  # double-buffered per-step weight bytes


def chunk_plan(d: int, f: int, dtype) -> int | None:
    """FFN-chunk size for dims where the whole-matrix kernel cannot fit
    (medium/large: d >= 1024 — the reason round 3's promoted fused-MLP
    rung silently fell back to the unfused chain at exactly the model
    sizes where the per-layer HBM intermediates are largest).

    Returns the largest F_BLK that (a) is a lane-aligned multiple of 128,
    (b) divides f exactly (no ragged chunk), and (c) keeps the
    double-buffered per-step weight slices (one [d, F_BLK] + one
    [F_BLK, d]) inside the chunk budget; None when no valid size exists.
    """
    itemsize = jnp.dtype(dtype).itemsize
    best = None
    blk = 128
    while blk <= f:
        if f % blk == 0 and 4 * d * blk * itemsize <= _F_CHUNK_BUDGET:
            best = blk
        blk += 128
    return best


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


def _mlp_kernel_chunked(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                        b2_ref, o_ref, acc_ref, *, n_chunks: int):
    """FFN-chunked variant: grid (row_blocks, f_chunks), f minor.  The
    [R, d] activation tile and the fp32 accumulator stay resident across
    the f sweep while the weight SLICES stream through VMEM — preserving
    the kernel's point (no [R, f] GELU intermediate ever touches HBM, LN
    fused) at dims whose whole weight matrices cannot fit.  LN is
    recomputed per chunk (VPU-cheap) instead of carried in scratch; the
    accumulator keeps fp32 like the unchunked kernel's single dot (the
    chunked sum only reassociates the fp32 adds)."""
    j = pl.program_id(1)
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
    ) + b1_ref[...].astype(jnp.float32)            # [R, F_BLK] fp32
    h = _gelu_tanh(h).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [R, d] fp32 partial

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = x32 + b2_ref[...].astype(jnp.float32) + y

    @pl.when(j > 0)
    def _accum():
        acc_ref[...] += y

    @pl.when(j == n_chunks - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(x.dtype)


from whisper_tpu.ops.common import round_up as _round_up


def _fused_mlp_chunked(xf, ln_s, ln_b, w1, b1, w2, b2, f_block, interpret):
    n_pad, d = xf.shape
    f = w1.shape[1]
    n_chunks = f // f_block
    grid = (n_pad // ROWS_CHUNKED, n_chunks)
    return pl.pallas_call(
        functools.partial(_mlp_kernel_chunked, n_chunks=n_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS_CHUNKED, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_block, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS_CHUNKED, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), xf.dtype),
        scratch_shapes=[pltpu.VMEM((ROWS_CHUNKED, d), jnp.float32)],
        interpret=interpret,
    )(xf, ln_s, ln_b, w1, b1, w2, b2)


@functools.partial(jax.jit, static_argnames=("interpret", "f_block"))
def fused_encoder_mlp(x: jax.Array, ln_s: jax.Array, ln_b: jax.Array,
                      w1: jax.Array, b1: jax.Array,
                      w2: jax.Array, b2: jax.Array,
                      interpret: bool = False,
                      f_block: int | None = None) -> jax.Array:
    """x [B, T, d] -> x + FC2(GELU_tanh(FC1(LN(x)))) with one HBM round
    trip for the activations.  Weights must be dense (dequantize QTensors
    before the call — once per layer, outside the row grid).

    f_block selects the FFN-chunked kernel (chunk_plan) for dims whose
    whole weight matrices exceed the VMEM budget (medium/large models);
    None = the original whole-matrix kernel."""
    b, t, d = x.shape
    f = w1.shape[1]
    # Vector operands go in as [1, n] 2D arrays: Mosaic rejects XLA's 1D
    # bf16 layout at larger sizes (bf16[5120] tiles T(1024)(128) in XLA vs
    # T(512)(128) in Mosaic — queue3 step 4c failure at large-v3); the 2D
    # form has one well-defined (sublane, lane) tiling at every size.
    ln_s, ln_b = ln_s.reshape(1, d), ln_b.reshape(1, d)
    b1, b2 = b1.reshape(1, f), b2.reshape(1, d)
    n = b * t
    rows = ROWS_CHUNKED if f_block else ROWS
    n_pad = _round_up(n, rows)
    xf = x.reshape(n, d)
    if n_pad != n:
        xf = jnp.pad(xf, ((0, n_pad - n), (0, 0)))

    if f_block:
        out = _fused_mlp_chunked(xf, ln_s, ln_b, w1, b1, w2, b2,
                                 f_block, interpret)
        return out[:n].reshape(b, t, d)

    grid = (n_pad // ROWS,)
    out = pl.pallas_call(
        _mlp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), x.dtype),
        interpret=interpret,
    )(xf, ln_s, ln_b, w1, b1, w2, b2)
    return out[:n].reshape(b, t, d)
