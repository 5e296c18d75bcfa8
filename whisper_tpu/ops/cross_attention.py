"""Head-packed Pallas cross-attention for the decode step (x4 path).

The decode loop's dominant cost is streaming the int8 cross-KV cache every
step (ref hot loop: src/main.rs:753-829; our profile: the QK and PV dots
are ~0.65 ms of a ~1.09 ms step at B=16, moving 147 MB at only ~27% of HBM
bandwidth). The root cause is layout: head_dim=64 fills half of a 128-lane
tile, and XLA lowers the dots as kLoop VPU fusions over `[B,H,1500,64]`.

This kernel restores full lanes by packing HEAD PAIRS onto the lane axis:

    K,V: [L, B, H, S, 64] int8  ->  [L, B, G=H/2, S_pad, 128] int8

and runs one grid program per batch row, statically unrolled over the head
pairs (few large programs beat many tiny ones: grid-step overhead at
(B,G)=64 programs measured comparable to the compute itself):

  - the LAYER is selected at runtime via scalar prefetch, so blocks are
    DMA'd straight out of the full [L,...] HBM cache — routing the cache
    through lax.scan xs materialized a 12 MB per-layer slice every step
    just to feed the custom call;
  - per-head scores WITHOUT lane-splitting reshapes (the round-1 failure
    mode, docs/DESIGN.md §4): one MXU dot against a q-selector matrix
    `qsel[d, j] = q[d] * (d//64 == j)` gives `scores[s, j]` for both heads;
  - masked softmax over the valid 1500 rows (pad rows get -inf);
  - PV without a transpose: probs are broadcast back onto lanes by head
    half via a second tiny selector dot, multiplied into V and
    sublane-reduced.

Numerics mirror models/whisper._attend_int8: fp32 scores, k_scale after
the dot, fp32 softmax, bf16 probs/V dot with fp32 accumulation, v_scale
after.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
PACK = 2  # heads per lane group (2 * head_dim 64 = 128 lanes)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_cross_kv(x8: jax.Array) -> jax.Array:
    """[L, B, H, S, 64] int8 -> [L, B, H//2, S_pad, 128] int8 (zero-pad S).

    One-time relayout after prefill; the step loop then streams full
    128-lane tiles instead of half-empty ones.
    """
    l, b, h, s, dh = x8.shape
    assert dh * PACK == LANES, (dh, LANES)
    assert h % PACK == 0, h
    s_pad = _round_up(s, 32)  # int8 sublane tile
    x8 = x8.reshape(l, b, h // PACK, PACK, s, dh)
    x8 = jnp.swapaxes(x8, 3, 4)  # [L, B, G, S, 2, 64]
    x8 = x8.reshape(l, b, h // PACK, s, LANES)
    if s_pad != s:
        x8 = jnp.pad(x8, ((0, 0), (0, 0), (0, 0), (0, s_pad - s), (0, 0)))
    return x8


def _kernel(layer_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref, *,
            s_valid: int, out_dtype):
    # Blocks (one batch row, all head pairs): q [1,G,128] f32,
    # k/v [1,1,G,S_pad,128] int8, ks/vs [1,1,G,2] f32, out [1,G,128].
    # The head-pair loop is a static Python unroll, so every ref access
    # uses constant indices (no dynamic sublane loads/stores, which Mosaic
    # rejects for small operands).
    del layer_ref  # consumed by the index maps only
    n_g = k_ref.shape[2]
    s_pad = k_ref.shape[3]

    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, PACK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (LANES, PACK), 1)
    sel = (lane // 64 == col).astype(jnp.float32)                # [128, 2]
    row = jax.lax.broadcasted_iota(jnp.int32, (s_pad, PACK), 0)
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    pv_dtype = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32

    outs = []
    for g in range(n_g):
        q = q_ref[0, g, :].astype(jnp.float32)                   # [128]
        qsel = q[:, None] * sel                                  # [128, 2]
        k = k_ref[0, 0, g].astype(jnp.float32)                   # [S_pad,128]
        scores = jnp.dot(k, qsel,
                         preferred_element_type=jnp.float32)     # [S_pad,2]
        scores = scores * ks_ref[0, 0, g][None, :]
        scores = jnp.where(row < s_valid, scores, neg)
        m = jnp.max(scores, axis=0, keepdims=True)               # [1, 2]
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=0, keepdims=True)                # [1, 2]
        probs = e / denom                                        # [S_pad, 2]

        # PV stays on the VPU: the A^T-B dot_general form measured ~20%
        # SLOWER end to end (Mosaic materializes a transpose); the
        # selector-dot broadcast + multiply + sublane-reduce wins.
        pm = jnp.dot(probs, sel.T,
                     preferred_element_type=jnp.float32)         # [S_pad,128]
        pm = pm.astype(pv_dtype)
        v = v_ref[0, 0, g].astype(pv_dtype)                      # [S_pad,128]
        ctx = jnp.sum((pm * v).astype(jnp.float32), axis=0)      # [128]

        vs = vs_ref[0, 0, g]                                     # [2]
        vsel = jnp.where(lane1 < 64, vs[0], vs[1])[0]            # [128]
        outs.append((ctx * vsel).astype(out_dtype))
    out_ref[0] = jnp.stack(outs, axis=0)                         # [G, 128]


def cross_attend_step_packed(
    q: jax.Array,        # [B, H, 64] — already scaled by head_dim^-0.5
    k8: jax.Array,       # [L, B, G, S_pad, 128] int8 (pack_cross_kv layout)
    v8: jax.Array,       # [L, B, G, S_pad, 128] int8
    k_scale: jax.Array,  # [L, B, H] fp32 per-head scales
    v_scale: jax.Array,  # [L, B, H] fp32
    layer: jax.Array,    # scalar int32: which layer's K/V to attend
    *,
    s_valid: int,
    interpret: bool = False,
) -> jax.Array:
    """Single-token cross-attention against the packed int8 cache of ONE
    layer, indexed at runtime via scalar prefetch (so the kernel streams
    blocks straight from the full HBM cache; no per-layer slice copy).

    Returns ctx [B, H, 64] in q.dtype.
    """
    b, h, dh = q.shape
    g = h // PACK
    l, s_pad = k8.shape[0], k8.shape[3]
    q_pk = q.astype(jnp.float32).reshape(b, g, LANES)  # exact reshape:
    # (h, d) -> (g, j*64+d) is contiguous for h = 2g + j.
    ks = k_scale.astype(jnp.float32).reshape(l, b, g, PACK)
    vs = v_scale.astype(jnp.float32).reshape(l, b, g, PACK)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    def _lidx(s):
        # The scalar-prefetch ref is (1,)-shaped on TPU but arrives as a
        # 0-d value in interpret mode.
        return s[0] if getattr(s, "shape", ()) else s

    kern = functools.partial(_kernel, s_valid=s_valid, out_dtype=q.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, g, LANES), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, s_pad, LANES),
                         lambda i, s: (_lidx(s), i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, s_pad, LANES),
                         lambda i, s: (_lidx(s), i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, PACK), lambda i, s: (_lidx(s), i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, PACK), lambda i, s: (_lidx(s), i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, LANES), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, LANES), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * s_valid * dh * 2,
            bytes_accessed=2 * b * g * s_pad * LANES + b * h * dh * 8,
            transcendentals=b * h * s_valid,
        ),
        interpret=interpret,
    )(layer_arr, q_pk, k8, v8, ks, vs)
    return out.reshape(b, h, dh)
