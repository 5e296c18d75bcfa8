"""Fused encoder-block Pallas kernels (round-3 perf lever).

The encoder forward is the biggest remaining device-time block: ~55 ms of
the 110 ms bucket-16 chunk program at ~25% MFU (docs/DECODE_ROOFLINE.md
addendum).  Measured causes: every LayerNorm makes an fp32 round trip over
the [B,1500,d] activations, and the QKV/O/FC matmuls lower as separate
kLoop fusions with an HBM round trip between each.  The reference runs its
whole encoder as one fused ORT graph (run_encoder, ref src/main.rs:698-707);
this is the TPU equivalent, built VMEM-first.

One encoder layer = three kernels, with only the attention boundary
touching HBM between them:

  1. ``fused_ln_qkv``  — LN1 -> Q/K/V projections as ONE [d, 3d] MXU dot
     (row-blocked over B*T; the packed weight keeps one dispatch where XLA
     ran three half-wide ones).
  2. ``ops.attention.fused_attention`` — existing whole-row VMEM attention.
  3. ``fused_out_mlp`` — O-proj + residual + LN2 + FC1 + GELU + FC2 +
     residual in one pass: the row block stays resident from the context
     read to the final residual write (supersedes ops/encoder_mlp.py's
     MLP-only kernel, which left O-proj + residual + LN to XLA).

Numerics: LN statistics and matmul accumulation in fp32 (Mosaic requires
32-bit accumulation); GELU is the tanh approximation (no erf lowering on
this Mosaic stack — same tradeoff as ops/pallas_mel.py and encoder_mlp.py),
so these kernels belong to the non-parity rungs of the ladder (x3+).
Quality bound: scripts/parity_matrix.py margin columns.

VMEM budget at whisper-base (d=512, f=2048, bf16, ROWS=512):
  ln_qkv:  W [512,1536] 1.5 MB x2 (double-buffered) + io blocks ~2.5 MB
  out_mlp: O+FC1+FC2 4.5 MB x2 + io ~3 MB + fp32 intermediates ~5 MB
Both inside the 16 MB budget; ``fits_vmem`` guards larger dims.  Round 5:
past the budget (d >= 1024) the fused_block path no longer silently
falls back — models/whisper.py composes the weight-streaming variant
instead: ``fused_ln_qkv(c_block=qkv_chunk_plan(...))`` (column-chunked
weight slices, no accumulator — QKV columns are independent) -> fused
attention -> XLA O-proj + residual (the O-fold measured WORSE at base
anyway) -> the FFN-chunked fused-MLP kernel (encoder_mlp.chunk_plan).
Device time at large dims is UNMEASURED until tpu_round5_queue step 4c
runs; interpret-mode parity in tests/test_encoder_block.py.

STATUS — MEASURED NEGATIVE RESULT (round 3, delta-method device time at
bucket-16 whisper-base; docs/DECODE_ROOFLINE.md round-3 addendum):
  unfused(+attn kernel) 21.1 ms | +fused_mlp 16.7 ms | +these kernels
  20.3 ms.  XLA's LN->matmul fusion plus the existing MLP-only kernel
  (ops/encoder_mlp.py, promoted to x3+ in the ladder) beats both the
  LN+QKV kernel (-4 ms worse) and folding O-proj into the MLP kernel
  (-1 ms worse): the extra pallas boundaries lose more overlap than the
  saved HBM round trips buy at d=512.  Kept opt-in (cfg.fused_encoder_
  block) with full parity tests as the documented experiment; revisit at
  d>=1024 if a weight-streaming (non-VMEM-resident) variant is built.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512  # rows (B*T positions) per grid step
_VMEM_WEIGHT_BUDGET = 12 * 2**20


from whisper_tpu.ops.common import gelu_tanh as _gelu_tanh


from whisper_tpu.ops.common import round_up as _round_up


def fits_vmem(d: int, f: int, dtype) -> bool:
    """True when the larger kernel's (out_mlp) VMEM-resident weights fit:
    O [d,d] + FC1 [d,f] + FC2 [f,d], double-buffered."""
    itemsize = jnp.dtype(dtype).itemsize
    return 2 * (d * d + 2 * d * f) * itemsize <= _VMEM_WEIGHT_BUDGET


ROWS_CHUNKED = 256
_QKV_CHUNK_BUDGET = 6 * 2**20


def qkv_chunk_plan(d: int, dtype) -> int | None:
    """Output-column chunk size for fused_ln_qkv at dims where the whole
    [d, 3d] weight cannot stay VMEM-resident (the round-5 weight-streaming
    variant the round-3 STATUS note asked for).  Unlike the MLP's FC2,
    QKV columns are independent — no accumulator needed; each (row, col)
    grid step writes its own output block.  Largest lane-aligned divisor
    of 3d inside the double-buffered chunk budget, or None."""
    itemsize = jnp.dtype(dtype).itemsize
    best = None
    blk = 128
    while blk <= 3 * d:
        if (3 * d) % blk == 0 and 4 * d * blk * itemsize <= _QKV_CHUNK_BUDGET:
            best = blk
        blk += 128
    return best


# ---------------------------------------------------------------------------
# Kernel 1: LN1 -> packed QKV projection
# ---------------------------------------------------------------------------

def _ln_qkv_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref, o_ref):
    x32 = x_ref[...].astype(jnp.float32)            # [R, d]
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    r = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    r = (r * lns_ref[...].astype(jnp.float32)
         + lnb_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    y = jax.lax.dot_general(
        r, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)              # [R, 3d]
    o_ref[...] = y.astype(x_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "c_block"))
def fused_ln_qkv(x: jax.Array, ln_s: jax.Array, ln_b: jax.Array,
                 w_qkv: jax.Array, b_qkv: jax.Array,
                 interpret: bool = False,
                 c_block: int | None = None) -> jax.Array:
    """x [B, T, d] -> LN(x) @ w_qkv + b_qkv as [B, T, 3d].

    ``w_qkv`` is the concatenation [q_w | k_w | v_w] along the output axis
    (K has no bias in Whisper — pass zeros in b_qkv's middle third).  The
    caller slices the thirds and splits heads.

    c_block (qkv_chunk_plan) streams [d, c_block] weight slices through
    VMEM for dims whose whole [d, 3d] weight cannot fit (d >= 1024): grid
    (row_blocks, col_chunks), LN recomputed per chunk (VPU-cheap), same
    kernel body — each grid step writes its own independent output
    columns."""
    b, t, d = x.shape
    d3 = w_qkv.shape[1]
    # [1, n] 2D vector operands — Mosaic rejects XLA's 1D bf16 layout at
    # larger sizes (see ops/encoder_mlp.py fused_encoder_mlp).
    ln_s, ln_b = ln_s.reshape(1, d), ln_b.reshape(1, d)
    b_qkv = b_qkv.reshape(1, d3)
    n = b * t
    rows = ROWS_CHUNKED if c_block else ROWS
    n_pad = _round_up(n, rows)
    xf = x.reshape(n, d)
    if n_pad != n:
        xf = jnp.pad(xf, ((0, n_pad - n), (0, 0)))

    if c_block:
        grid = (n_pad // rows, d3 // c_block)
        in_specs = [
            pl.BlockSpec((rows, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, c_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((rows, c_block), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
    else:
        grid = (n_pad // rows,)
        in_specs = [
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((rows, d3), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _ln_qkv_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d3), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * d3,
            bytes_accessed=(n_pad * (d + d3) + d * d3) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, ln_s, ln_b, w_qkv, b_qkv)
    return out[:n].reshape(b, t, d3)


# ---------------------------------------------------------------------------
# Kernel 2: O-proj + residual + LN2 + FC1 + GELU + FC2 + residual
# ---------------------------------------------------------------------------

def _out_mlp_kernel(x_ref, ctx_ref, ow_ref, ob_ref, lns_ref, lnb_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x32 = x_ref[...].astype(jnp.float32)            # [R, d] residual input
    o = jax.lax.dot_general(
        ctx_ref[...], ow_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ob_ref[...].astype(jnp.float32)
    y32 = x32 + o                                   # post-attention residual
    y = y32.astype(x_ref.dtype)

    mean = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
    r = (y32 - mean) * jax.lax.rsqrt(var + 1e-5)
    r = (r * lns_ref[...].astype(jnp.float32)
         + lnb_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    h = jax.lax.dot_general(
        r, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)             # [R, f] fp32
    h = _gelu_tanh(h).astype(x_ref.dtype)
    z = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)             # [R, d] fp32
    # Residual adds in the activation dtype (y, not y32): matches the
    # unfused path where the post-attention residual is already stored
    # bf16 before the MLP reads it.
    o_ref[...] = (y.astype(jnp.float32) + z).astype(x_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_out_mlp(x: jax.Array, ctx: jax.Array,
                  o_w: jax.Array, o_b: jax.Array,
                  ln_s: jax.Array, ln_b: jax.Array,
                  w1: jax.Array, b1: jax.Array,
                  w2: jax.Array, b2: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """y = x + ctx @ o_w + o_b;  return y + FC2(GELU_tanh(FC1(LN(y)))).

    x: pre-attention residual stream [B, T, d]; ctx: merged attention
    context [B, T, d].  One HBM read of (x, ctx), one write of the output,
    per row block."""
    b, t, d = x.shape
    f = w1.shape[1]
    # [1, n] 2D vector operands — see ops/encoder_mlp.py fused_encoder_mlp.
    o_b, ln_s, ln_b = o_b.reshape(1, d), ln_s.reshape(1, d), ln_b.reshape(1, d)
    b1, b2 = b1.reshape(1, f), b2.reshape(1, d)
    n = b * t
    n_pad = _round_up(n, ROWS)
    xf = x.reshape(n, d)
    cf = ctx.reshape(n, d)
    if n_pad != n:
        xf = jnp.pad(xf, ((0, n_pad - n), (0, 0)))
        cf = jnp.pad(cf, ((0, n_pad - n), (0, 0)))

    row_spec = pl.BlockSpec((ROWS, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_f = pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _out_mlp_kernel,
        grid=(n_pad // ROWS,),
        in_specs=[
            row_spec, row_spec,
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec_d, vec_d, vec_d,
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec_f,
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec_d,
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * (d * d + 2 * d * f),
            bytes_accessed=(3 * n_pad * d + d * d + 2 * d * f)
            * x.dtype.itemsize,
            transcendentals=n_pad * f,
        ),
        interpret=interpret,
    )(xf, cf, o_w, o_b, ln_s, ln_b, w1, b1, w2, b2)
    return out[:n].reshape(b, t, d)
