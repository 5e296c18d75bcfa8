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


from whisper_tpu.ops.common import round_up as _round_up


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


def pack_cross_kv_t(x8: jax.Array) -> jax.Array:
    """[L, B, H, S, 64] int8 -> TRANSPOSED [L, B, H//2, 128, S_pad] int8.

    The K layout for the int8-MXU kernel (x5): with the 1500-long sequence
    on LANES, scores come out [2, S] directly, so the softmax runs at full
    lane utilization (the [S, 2] orientation wastes 126/128 lanes on every
    VPU op — measured 2.2x slower kernel) and PV is a natural
    [2,S]x[S,128] MXU matmul.
    """
    return jnp.swapaxes(pack_cross_kv(x8), 3, 4)


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


def _kernel_int8_mxu(layer_ref, q_ref, qks_ref, vs_ref, kt_ref, v_ref,
                     out_ref, *, s_valid: int, out_dtype):
    """int8xint8 MXU variant (x5): both attention dots run on the MXU with
    int8 operands, so the 147 MB/step cross-KV stream never takes the
    per-element VPU dequantize that bounds the fp32-dequant kernel
    (docs/DECODE_ROOFLINE.md "VPU bound").

    Layout is the key (measured on v5e, 128 steps x 6 layers, B=16):
    K arrives TRANSPOSED [G, 128, S_pad] (pack_cross_kv_t) so that

    - QK is [2,128] x [128,S_pad] -> scoresT [2,S_pad]: the sequence lives
      on LANES, so the masked softmax runs at full lane utilization.  The
      [S_pad,2] orientation spent ~60% of the kernel in 2/128-lane VPU ops
      (0.359 ms/step); this form measures 0.161 ms/step — at the HBM floor.
    - q is pre-quantized per head outside; in-kernel it broadcasts onto
      [2,128] rows masked per head half (no transpose needed — q is a lane
      vector).
    - probs are quantized to int8 WITHOUT normalizing first: for e =
      exp(scores - max), max(e) = 1, so p8 = round(127*e) and the exact
      1/(127*denom) folds into the output scale (~7-bit probs; numerics
      validated vs the fp32 path in tests).
    - PV is the natural [2,S_pad] x [S_pad,128] int8 MXU matmul against the
      untransposed V block.
    - The merged all-pairs block-diagonal form ([G*S,2G] dots) measured
      1.5x SLOWER than per-pair — masked cross-pair MACs are not free.

    Scales arrive pre-combined per column (q_scale*k_scale and v_scale for
    the CURRENT layer, indexed outside the kernel — a [B,H] f32 slice, not
    the 12 MB/layer cache slice the scan-xs route would materialize).
    """
    del layer_ref
    n_g = kt_ref.shape[2]
    s_pad = kt_ref.shape[4]
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)[0]  # [128]
    colS = jax.lax.broadcasted_iota(jnp.int32, (PACK, s_pad), 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (PACK, LANES), 0)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (PACK, LANES), 1)
    rowmask = lanes2 // 64 == rows2      # row j selects head-half j's lanes

    low = lane1 < 64
    outs = []
    for g in range(n_g):
        q8 = q_ref[0, g, :].astype(jnp.int32)                    # [128]
        qT = jnp.where(rowmask, q8[None, :], 0).astype(jnp.int8)  # [2,128]
        scores = jax.lax.dot_general(
            qT, kt_ref[0, 0, g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)                                    # [2,S_pad]
        scores = scores * qks_ref[0, :, PACK * g:PACK * g + PACK].T
        scores = jnp.where(colS < s_valid, scores, neg)
        m = jnp.max(scores, axis=1, keepdims=True)               # [2, 1]
        e = jnp.exp(scores - m)                                  # max = 1.0
        denom = jnp.sum(e, axis=1, keepdims=True)                # [2, 1]
        p8 = jnp.round(e * 127.0).astype(jnp.int8)               # [2,S_pad]

        ctx = jax.lax.dot_general(
            p8, v_ref[0, 0, g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)                                    # [2, 128]

        s0 = vs_ref[0, 0, PACK * g] / (127.0 * denom[0, 0])
        s1 = vs_ref[0, 0, PACK * g + 1] / (127.0 * denom[1, 0])
        outs.append(jnp.where(low, ctx[0] * s0,
                              ctx[1] * s1).astype(out_dtype))
    out_ref[0] = jnp.stack(outs, axis=0)                         # [G, 128]


def _kernel_multi(layer_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref,
                  *, n_g: int, s_valid: int, out_dtype):
    """Multi-query generalization of _kernel for the speculative VERIFY
    pass: E = T*n_g packed query rows (t-major: e = t*n_g + g) attend the
    SAME per-layer KV block, which is streamed from HBM once per batch row
    instead of once per token — the whole point of verifying K+1 draft
    tokens in one pass (runtime/speculative.py).  Per-entry math is
    IDENTICAL to _kernel's (same fp32 accumulation order along S), so each
    token's context is bitwise what the single-query kernel would produce
    — pinned by tests/test_cross_attention.py."""
    del layer_ref
    e_total = q_ref.shape[1]
    s_pad = k_ref.shape[3]

    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, PACK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (LANES, PACK), 1)
    sel = (lane // 64 == col).astype(jnp.float32)                # [128, 2]
    row = jax.lax.broadcasted_iota(jnp.int32, (s_pad, PACK), 0)
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    pv_dtype = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32

    outs = []
    for e in range(e_total):
        g = e % n_g
        q = q_ref[0, e, :].astype(jnp.float32)                   # [128]
        qsel = q[:, None] * sel                                  # [128, 2]
        k = k_ref[0, 0, g].astype(jnp.float32)                   # [S_pad,128]
        scores = jnp.dot(k, qsel,
                         preferred_element_type=jnp.float32)     # [S_pad,2]
        scores = scores * ks_ref[0, 0, g][None, :]
        scores = jnp.where(row < s_valid, scores, neg)
        m = jnp.max(scores, axis=0, keepdims=True)
        eexp = jnp.exp(scores - m)
        denom = jnp.sum(eexp, axis=0, keepdims=True)
        probs = eexp / denom                                     # [S_pad, 2]

        pm = jnp.dot(probs, sel.T,
                     preferred_element_type=jnp.float32)         # [S_pad,128]
        pm = pm.astype(pv_dtype)
        v = v_ref[0, 0, g].astype(pv_dtype)                      # [S_pad,128]
        ctx = jnp.sum((pm * v).astype(jnp.float32), axis=0)      # [128]

        vs = vs_ref[0, 0, g]                                     # [2]
        vsel = jnp.where(lane1 < 64, vs[0], vs[1])[0]            # [128]
        outs.append((ctx * vsel).astype(out_dtype))
    out_ref[0] = jnp.stack(outs, axis=0)                         # [E, 128]


def _kernel_multi_int8_mxu(layer_ref, q_ref, qks_ref, vs_ref, kt_ref, v_ref,
                           out_ref, *, n_g: int, s_valid: int, out_dtype):
    """Multi-query generalization of _kernel_int8_mxu (x5) — per-entry
    math identical (per-query q quantized outside, 7-bit probs in-kernel),
    KV streamed once for all T queries."""
    del layer_ref
    e_total = q_ref.shape[1]
    s_pad = kt_ref.shape[4]
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)[0]  # [128]
    colS = jax.lax.broadcasted_iota(jnp.int32, (PACK, s_pad), 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (PACK, LANES), 0)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (PACK, LANES), 1)
    rowmask = lanes2 // 64 == rows2

    low = lane1 < 64
    outs = []
    for e in range(e_total):
        t, g = e // n_g, e % n_g
        q8 = q_ref[0, e, :].astype(jnp.int32)                    # [128]
        qT = jnp.where(rowmask, q8[None, :], 0).astype(jnp.int8)  # [2,128]
        scores = jax.lax.dot_general(
            qT, kt_ref[0, 0, g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)                                    # [2,S_pad]
        scores = scores * qks_ref[0, t:t + 1,
                                  PACK * g:PACK * g + PACK].T    # [2,1]
        scores = jnp.where(colS < s_valid, scores, neg)
        m = jnp.max(scores, axis=1, keepdims=True)
        eexp = jnp.exp(scores - m)                               # max = 1.0
        denom = jnp.sum(eexp, axis=1, keepdims=True)
        p8 = jnp.round(eexp * 127.0).astype(jnp.int8)            # [2,S_pad]

        ctx = jax.lax.dot_general(
            p8, v_ref[0, 0, g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)                                    # [2, 128]

        s0 = vs_ref[0, 0, PACK * g] / (127.0 * denom[0, 0])
        s1 = vs_ref[0, 0, PACK * g + 1] / (127.0 * denom[1, 0])
        outs.append(jnp.where(low, ctx[0] * s0,
                              ctx[1] * s1).astype(out_dtype))
    out_ref[0] = jnp.stack(outs, axis=0)                         # [E, 128]


def cross_attend_multi_packed_sharded(
    q, k8, v8, k_scale, v_scale, layer, *,
    s_valid: int, mesh, int8_mxu: bool = False, interpret: bool = False,
):
    """Mesh-aware multi-query wrapper (see cross_attend_step_packed_sharded
    for why: the custom call has no GSPMD rule).  q: [B, T, H, 64]."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape.get("model", 1)
    h_ax = "model" if tp > 1 else None
    qs = P("data", None, h_ax, None)
    kv = P(None, "data", h_ax, None, None)
    sc = P(None, "data", h_ax)

    def body(q, k8, v8, ks, vs, layer):
        return cross_attend_multi_packed(
            q, k8, v8, ks, vs, layer, s_valid=s_valid, int8_mxu=int8_mxu,
            interpret=interpret)

    return shard_map(
        body, mesh=mesh,
        in_specs=(qs, kv, kv, sc, sc, P()),
        out_specs=qs, check_vma=False,
    )(q, k8, v8, k_scale, v_scale, layer)


def cross_attend_multi_packed(
    q: jax.Array,        # [B, T, H, 64] — already scaled by head_dim^-0.5
    k8: jax.Array,       # as cross_attend_step_packed
    v8: jax.Array,
    k_scale: jax.Array,  # [L, B, H] fp32
    v_scale: jax.Array,
    layer: jax.Array,
    *,
    s_valid: int,
    int8_mxu: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """T-query cross-attention against the packed int8 cache of ONE layer
    (the speculative verify pass: T = draft_k + 1 tokens per round).

    Same numerics per query as cross_attend_step_packed — each query row is
    independent, so speculative decoding with a packed main cache stays
    token-identical to packed greedy (tests/test_speculative.py) — but the
    per-layer KV block is DMA'd from HBM once for all T queries instead of
    once per token.  Returns ctx [B, T, H, 64] in q.dtype.
    """
    b, t, h, dh = q.shape
    g = h // PACK
    e_total = t * g
    l, s_pad = k8.shape[0], v8.shape[3]
    if int8_mxu:
        assert k8.shape[3] == LANES and k8.shape[4] == s_pad, (
            "int8_mxu expects the pack_cross_kv_t K layout", k8.shape)
    ks = k_scale.astype(jnp.float32).reshape(l, b, g, PACK)
    vs = v_scale.astype(jnp.float32).reshape(l, b, g, PACK)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    if int8_mxu:
        q32 = q.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(q32), axis=-1, keepdims=True)  # [B,T,H,1]
        qscale = jnp.maximum(absmax, 1e-12) / 127.0
        q_pk = jnp.clip(jnp.round(q32 / qscale), -127, 127).astype(
            jnp.int8).reshape(b, e_total, LANES)  # t-major: e = t*G + g
        ks_l = jax.lax.dynamic_index_in_dim(
            k_scale.astype(jnp.float32), layer, 0, keepdims=False)  # [B, H]
        vs_l = jax.lax.dynamic_index_in_dim(
            v_scale.astype(jnp.float32), layer, 0, keepdims=False)
        qks = qscale[..., 0] * ks_l[:, None, :]                  # [B, T, H]
        vds = vs_l.reshape(b, 1, h)
    else:
        q_pk = q.astype(jnp.float32).reshape(b, e_total, LANES)

    def _lidx(s):
        return s[0] if getattr(s, "shape", ()) else s

    q_spec = pl.BlockSpec((1, e_total, LANES), lambda i, s: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, g, s_pad, LANES),
                           lambda i, s: (_lidx(s), i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, 1, g, PACK), lambda i, s: (_lidx(s), i, 0, 0),
                           memory_space=pltpu.VMEM)
    if int8_mxu:
        kern = functools.partial(_kernel_multi_int8_mxu, n_g=g,
                                 s_valid=s_valid, out_dtype=q.dtype)
        qks_spec = pl.BlockSpec((1, t, h), lambda i, s: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        vds_spec = pl.BlockSpec((1, 1, h), lambda i, s: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        kt_spec = pl.BlockSpec((1, 1, g, LANES, s_pad),
                               lambda i, s: (_lidx(s), i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        in_specs = [q_spec, qks_spec, vds_spec, kt_spec, kv_spec]
        operands = (layer_arr, q_pk, qks, vds, k8, v8)
    else:
        kern = functools.partial(_kernel_multi, n_g=g, s_valid=s_valid,
                                 out_dtype=q.dtype)
        in_specs = [q_spec, kv_spec, kv_spec, sc_spec, sc_spec]
        operands = (layer_arr, q_pk, k8, v8, ks, vs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, e_total, LANES), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, e_total, LANES), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * h * s_valid * dh * 2,
            bytes_accessed=2 * b * g * s_pad * LANES
            + b * t * h * dh * 8,
            transcendentals=b * t * h * s_valid,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, t, h, dh)


def cross_attend_step_packed_sharded(
    q, k8, v8, k_scale, v_scale, layer, *,
    s_valid: int, mesh, int8_mxu: bool = False, interpret: bool = False,
):
    """Mesh-aware wrapper: runs the packed kernel per shard via shard_map.

    The Pallas custom call has no GSPMD partitioning rule, so under a mesh
    XLA would otherwise gather the whole cache onto every chip (the round-2
    restriction that silently disabled x4/x5 on multi-chip,
    runtime/session.py).  Sharding is batch over 'data' and head GROUPS
    over 'model' (the TP column-parallel q/k/v projections already leave
    heads sharded that way, parallel/mesh._TP_RULES).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape.get("model", 1)
    h_ax = "model" if tp > 1 else None
    qs = P("data", h_ax, None)
    kv = P(None, "data", h_ax, None, None)
    sc = P(None, "data", h_ax)

    def body(q, k8, v8, ks, vs, layer):
        return cross_attend_step_packed(
            q, k8, v8, ks, vs, layer, s_valid=s_valid, int8_mxu=int8_mxu,
            interpret=interpret)

    return shard_map(
        body, mesh=mesh,
        in_specs=(qs, kv, kv, sc, sc, P()),
        out_specs=qs, check_vma=False,
    )(q, k8, v8, k_scale, v_scale, layer)


def cross_attend_step_packed(
    q: jax.Array,        # [B, H, 64] — already scaled by head_dim^-0.5
    k8: jax.Array,       # [L, B, G, S_pad, 128] int8 (pack_cross_kv), or
                         # TRANSPOSED [L, B, G, 128, S_pad] (pack_cross_kv_t)
                         # when int8_mxu is set
    v8: jax.Array,       # [L, B, G, S_pad, 128] int8
    k_scale: jax.Array,  # [L, B, H] fp32 per-head scales
    v_scale: jax.Array,  # [L, B, H] fp32
    layer: jax.Array,    # scalar int32: which layer's K/V to attend
    *,
    s_valid: int,
    int8_mxu: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Single-token cross-attention against the packed int8 cache of ONE
    layer, indexed at runtime via scalar prefetch (so the kernel streams
    blocks straight from the full HBM cache; no per-layer slice copy).

    With int8_mxu, q is quantized per head and BOTH dots run as int8xint8
    MXU matmuls (probs requantized to 7 bits in-kernel) — the decode step's
    dequantize leaves the VPU entirely (variant x5).  K must then be in the
    transposed pack_cross_kv_t layout (sequence on lanes).

    Returns ctx [B, H, 64] in q.dtype.
    """
    b, h, dh = q.shape
    g = h // PACK
    l, s_pad = k8.shape[0], v8.shape[3]
    if int8_mxu:
        assert k8.shape[3] == LANES and k8.shape[4] == s_pad, (
            "int8_mxu expects the pack_cross_kv_t K layout", k8.shape)
    ks = k_scale.astype(jnp.float32).reshape(l, b, g, PACK)
    vs = v_scale.astype(jnp.float32).reshape(l, b, g, PACK)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    if int8_mxu:
        q32 = q.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(q32), axis=-1, keepdims=True)   # [B, H, 1]
        qscale = jnp.maximum(absmax, 1e-12) / 127.0
        q_pk = jnp.clip(jnp.round(q32 / qscale), -127, 127).astype(
            jnp.int8).reshape(b, g, LANES)
        # Combined per-column scales for THIS layer, indexed outside the
        # kernel (a [B,H] f32 slice — tiny, unlike the KV cache itself).
        ks_l = jax.lax.dynamic_index_in_dim(
            k_scale.astype(jnp.float32), layer, 0, keepdims=False)  # [B, H]
        vs_l = jax.lax.dynamic_index_in_dim(
            v_scale.astype(jnp.float32), layer, 0, keepdims=False)
        qks = (qscale[..., 0] * ks_l).reshape(b, 1, h)
        vds = vs_l.reshape(b, 1, h)
    else:
        q_pk = q.astype(jnp.float32).reshape(b, g, LANES)  # exact reshape:
        # (h, d) -> (g, j*64+d) is contiguous for h = 2g + j.

    def _lidx(s):
        # The scalar-prefetch ref is (1,)-shaped on TPU but arrives as a
        # 0-d value in interpret mode.
        return s[0] if getattr(s, "shape", ()) else s

    q_spec = pl.BlockSpec((1, g, LANES), lambda i, s: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, g, s_pad, LANES),
                           lambda i, s: (_lidx(s), i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, 1, g, PACK), lambda i, s: (_lidx(s), i, 0, 0),
                           memory_space=pltpu.VMEM)
    if int8_mxu:
        kern = functools.partial(_kernel_int8_mxu, s_valid=s_valid,
                                 out_dtype=q.dtype)
        col_spec = pl.BlockSpec((1, 1, h), lambda i, s: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        kt_spec = pl.BlockSpec((1, 1, g, LANES, s_pad),
                               lambda i, s: (_lidx(s), i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        in_specs = [q_spec, col_spec, col_spec, kt_spec, kv_spec]
        operands = (layer_arr, q_pk, qks, vds, k8, v8)
    else:
        kern = functools.partial(_kernel, s_valid=s_valid, out_dtype=q.dtype)
        in_specs = [q_spec, kv_spec, kv_spec, sc_spec, sc_spec]
        operands = (layer_arr, q_pk, k8, v8, ks, vs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
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
    )(*operands)
    return out.reshape(b, h, dh)
