"""Head-packed Pallas self-attention for the decode step (x4 path).

Companion to ops/cross_attention.py: the decode step's self-attention on
the XLA path costs ~0.23 ms/step at whisper-base B=16, almost all of it
layout artifacts — per-layer dynamic-slice/update fusions over the
[L,B,H,S_max,64] cache, loop-carry copies, and half-lane (head_dim=64)
multiply-reduce dots. This kernel stores the self cache head-packed
([L, B, G=H/2, S_pad, 128]) and does the whole step in one pass per batch
row:

  - the new K/V row is merged into the cache block with a masked
    full-block write (Mosaic rejects dynamic-sublane stores) and the
    updated blocks are written back IN PLACE via input_output_aliases —
    no carry copies, no separate update op;
  - attention uses the same selector-dot construction as the cross
    kernel: MXU dot for per-head scores, masked softmax over rows
    [pad_count, pos], selector-dot broadcast + sublane-reduce for PV.

The layer is selected via scalar prefetch; per-row pad_counts (left-padded
conditioned prompts) ride the same scalar-prefetch block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
PACK = 2


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_self_cache(x: jax.Array) -> jax.Array:
    """[L, B, H, S_max, 64] -> [L, B, H//2, S_pad, 128] (zero-pad S)."""
    l, b, h, s, dh = x.shape
    assert dh * PACK == LANES and h % PACK == 0
    s_pad = _round_up(s, 16 if x.dtype == jnp.bfloat16 else 8)
    x = x.reshape(l, b, h // PACK, PACK, s, dh)
    x = jnp.swapaxes(x, 3, 4).reshape(l, b, h // PACK, s, LANES)
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, s_pad - s), (0, 0)))
    return x


def _kernel(scalars_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
            ctx_ref, ko_ref, vo_ref, *, out_dtype):
    # scalars: [2 + B] int32 = (layer, pos, pad_counts...). Blocks:
    # q/kn/vn [1,G,128], k/v [1,1,G,S_pad,128] (aliased to ko/vo),
    # ctx [1,G,128].
    i = pl.program_id(0)
    pos = scalars_ref[1]
    pad = scalars_ref[2 + i]
    n_g = k_ref.shape[2]
    s_pad = k_ref.shape[3]

    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, PACK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (LANES, PACK), 1)
    sel = (lane // 64 == col).astype(jnp.float32)                # [128, 2]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (s_pad, PACK), 0)
    rows_l = jax.lax.broadcasted_iota(jnp.int32, (s_pad, LANES), 0)
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    pv_dtype = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32

    outs = []
    for g in range(n_g):
        kb = k_ref[0, 0, g]                                      # [S_pad,128]
        vb = v_ref[0, 0, g]
        kb = jnp.where(rows_l == pos, kn_ref[0, g, :][None, :], kb)
        vb = jnp.where(rows_l == pos, vn_ref[0, g, :][None, :], vb)
        ko_ref[0, 0, g] = kb
        vo_ref[0, 0, g] = vb

        q = q_ref[0, g, :].astype(jnp.float32)                   # [128]
        qsel = q[:, None] * sel                                  # [128, 2]
        scores = jnp.dot(kb.astype(jnp.float32), qsel,
                         preferred_element_type=jnp.float32)     # [S_pad,2]
        valid = (rows2 <= pos) & (rows2 >= pad)
        scores = jnp.where(valid, scores, neg)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=0, keepdims=True)            # [S_pad,2]

        # PV on the VPU (the A^T-B dot_general form measured slower; see
        # cross_attention.py).
        pm = jnp.dot(probs, sel.T,
                     preferred_element_type=jnp.float32).astype(pv_dtype)
        ctx = jnp.sum((pm * vb.astype(pv_dtype)).astype(jnp.float32),
                      axis=0)                                    # [128]
        outs.append(ctx.astype(out_dtype))
    ctx_ref[0] = jnp.stack(outs, axis=0)                         # [G, 128]


def self_attend_step_packed_sharded(
    q, k_new, v_new, k_cache, v_cache, layer, pos, pad_count, *,
    mesh, interpret: bool = False,
):
    """Mesh-aware wrapper (see cross_attention.cross_attend_step_packed_
    sharded): batch over 'data', head groups over 'model'; the in-place
    cache update happens on each shard's local block."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape.get("model", 1)
    h_ax = "model" if tp > 1 else None
    b = q.shape[0]
    row = P("data", h_ax, None)
    kv = P(None, "data", h_ax, None, None)
    if pad_count is None:
        pad_count = jnp.zeros((b,), jnp.int32)

    def body(q, kn, vn, kc, vc, layer, pos, pad):
        return self_attend_step_packed(
            q, kn, vn, kc, vc, layer, pos, pad, interpret=interpret)

    return shard_map(
        body, mesh=mesh,
        in_specs=(row, row, row, kv, kv, P(), P(), P("data")),
        out_specs=(row, kv, kv), check_vma=False,
    )(q, k_new, v_new, k_cache, v_cache, layer, pos, pad_count)


def self_attend_step_packed(
    q: jax.Array,        # [B, H, 64] — already scaled by head_dim^-0.5
    k_new: jax.Array,    # [B, H, 64] this position's key
    v_new: jax.Array,    # [B, H, 64] this position's value
    k_cache: jax.Array,  # [L, B, G, S_pad, 128] (pack_self_cache layout)
    v_cache: jax.Array,  # [L, B, G, S_pad, 128]
    layer: jax.Array,    # scalar int32
    pos: jax.Array,      # scalar int32: cache slot of this token
    pad_count=None,      # [B] int32 left-pad slots (conditioned prompts)
    *,
    interpret: bool = False,
):
    """One self-attention decode step against (and into) the packed cache.

    Returns (ctx [B, H, 64], k_cache', v_cache') — the caches are updated
    IN PLACE (donated via input_output_aliases)."""
    b, h, dh = q.shape
    g = h // PACK
    s_pad = k_cache.shape[3]
    dt = k_cache.dtype

    q_pk = q.astype(jnp.float32).reshape(b, g, LANES)
    kn_pk = k_new.astype(dt).reshape(b, g, LANES)
    vn_pk = v_new.astype(dt).reshape(b, g, LANES)
    if pad_count is None:
        pad_count = jnp.zeros((b,), jnp.int32)
    scalars = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(pos, jnp.int32).reshape(1),
        jnp.broadcast_to(jnp.asarray(pad_count, jnp.int32), (b,)),
    ])

    def _l(s):
        return s[0] if getattr(s, "shape", ()) else s

    kern = functools.partial(_kernel, out_dtype=q.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, g, LANES), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, LANES), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, LANES), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, s_pad, LANES),
                         lambda i, s: (_l(s), i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, s_pad, LANES),
                         lambda i, s: (_l(s), i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, g, LANES), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, s_pad, LANES),
                         lambda i, s: (_l(s), i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, s_pad, LANES),
                         lambda i, s: (_l(s), i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    ctx, k_out, v_out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, g, LANES), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, dt),
            jax.ShapeDtypeStruct(v_cache.shape, dt),
        ),
        # args: scalars(0) q(1) kn(2) vn(3) k_cache(4) v_cache(5)
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(scalars, q_pk, kn_pk, vn_pk, k_cache, v_cache)
    return ctx.reshape(b, h, dh), k_out, v_out
