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


from whisper_tpu.ops.common import round_up as _round_up


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


def quantize_pack_self(k: jax.Array, v: jax.Array):
    """Quantize + pack the bf16 self cache for the int8-MXU step (x7).

    STATUS — OPT-IN, MEASURED SLOWER THAN x5: the v3 int8 step kernel
    below is 284.8 us vs the bf16 kernel's 244.1 us per layer call
    (scripts/bench_self_kernel.py; headline decode A/B +28%).  The self
    step is overhead-bound, not traffic-bound, so halving cache bytes
    cannot pay for the in-kernel per-row quantization at any model size
    (docs/DECODE_ROOFLINE.md round-3 addendum 2).  Token agreement with
    x5 is exact (2048/2048 on TPU); kept as the documented end-to-end
    int8-MXU attention variant.

    k, v: [L, B, H, S_max, 64] (prefill layout).  Returns
      k8, v8 [L, B, G, S_pad, 128] int8 — both UNTRANSPOSED, the same
                                        head-packed layout as the bf16
                                        pack_self_cache: the step's
                                        in-place insert is then a cheap
                                        masked ROW write (a transposed K,
                                        as in pack_cross_kv_t, makes the
                                        insert a per-group selector-dot
                                        COLUMN write — measured to cost
                                        more than the int8 traffic saves,
                                        scaling with L*G: +24% at base,
                                        +18% at medium)
      ks, vs [L, B, G, S_pad, 2] f32  — PER-ROW scales (each cached row is
                                        quantized independently at insert
                                        time; unlike the cross cache there
                                        is no whole-sequence absmax to
                                        share, since future rows are
                                        unknown when a row is written),
                                        row-major so the insert is a
                                        masked row write too

    Rows at/after the current position are rewritten by the step kernel
    before ever being attended, so their initial quantization only needs
    to be self-consistent, not meaningful.
    """
    l, b, h, s, dh = k.shape
    assert dh * PACK == LANES and h % PACK == 0
    s_pad = _round_up(s, 16)

    def pack8(x8):
        y = x8.reshape(l, b, h // PACK, PACK, s, dh)
        y = jnp.swapaxes(y, 3, 4).reshape(l, b, h // PACK, s, LANES)
        return jnp.pad(y, ((0, 0),) * 3 + ((0, s_pad - s), (0, 0)))

    def pack_scale(sc):
        y = jnp.swapaxes(sc.reshape(l, b, h // PACK, PACK, s), 3, 4)
        return jnp.pad(y, ((0, 0),) * 3 + ((0, s_pad - s), (0, 0)))

    k8, ks = _quant_rows(k)
    v8, vs = _quant_rows(v)
    return pack8(k8), pack8(v8), pack_scale(ks), pack_scale(vs)


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


def _kernel_int8(scalars_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
                 ks_ref, vs_ref,
                 ctx_ref, ko_ref, vo_ref, kso_ref, vso_ref, *, out_dtype):
    """int8xint8 MXU self-attention step with in-place int8 cache insert
    (x7).  Same block structure as the bf16 kernel above — K, V, and the
    per-row scale planes are all ROW-major ([S_pad, 128] / [S_pad, 2]),
    so every insert is a cheap masked full-block row write (a transposed
    K, as in the cross kernel, turns the insert into a per-group
    selector-dot column write that measured slower than the int8 traffic
    win).  q/k_new/v_new arrive UNQUANTIZED and are quantized per head
    IN-KERNEL (masked half-lane absmax): the host-side _quant_rows trio
    measured 224 us/step of pure XLA launch overhead at whisper-base —
    3.4x the whole bf16 kernel — while in here the rows are already
    VMEM-resident.  The int8 parts:

      - scores = (k8 . qsel8) on the MXU ([S_pad,128] x [128,2] int8 ->
        int32), dequantized by the per-row K scales and the two q scales;
      - masked softmax over SUBLANES (axis 0), like the bf16 kernel;
      - per-row V scales fold into the probs BEFORE requantization
        (p = e * vscale, one shared int8 scale per head column), so PV is
        a pure int8 A^T-B matmul ([S_pad,2]^T x [S_pad,128] -> [2,128])
        and the exact 1/(ps*denom) lands in the output scale.
    """
    i = pl.program_id(0)
    pos = scalars_ref[1]
    pad = scalars_ref[2 + i]
    n_g = k_ref.shape[2]
    s_pad = k_ref.shape[3]
    neg = jnp.float32(jnp.finfo(jnp.float32).min)

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)[0]   # [128]
    low = lane1 < 64
    laneQ = jax.lax.broadcasted_iota(jnp.int32, (LANES, PACK), 0)
    colQ = jax.lax.broadcasted_iota(jnp.int32, (LANES, PACK), 1)
    qmask = laneQ // 64 == colQ                               # [128, 2]
    rowsS2 = jax.lax.broadcasted_iota(jnp.int32, (s_pad, PACK), 0)
    colsS2 = jax.lax.broadcasted_iota(jnp.int32, (s_pad, PACK), 1)
    rowsV = jax.lax.broadcasted_iota(jnp.int32, (s_pad, LANES), 0)

    def quant_halves(row):
        """Per-head symmetric int8 quantization of one packed [128] row
        (lanes 0..63 = head 2g, 64..127 = head 2g+1), f32 in/out with
        integral values; mirrors _quant_rows' absmax/127 + 1e-12 floor."""
        a = jnp.abs(row)
        s0 = jnp.maximum(jnp.max(jnp.where(low, a, 0.0)), 1e-12) / 127.0
        s1 = jnp.maximum(jnp.max(jnp.where(low, 0.0, a)), 1e-12) / 127.0
        sc = jnp.where(low, s0, s1)
        q8 = jnp.clip(jnp.round(row / sc), -127, 127)
        return q8, s0, s1

    outs = []
    for g in range(n_g):
        # --- in-kernel quantization of the new rows ---
        kn8, kn_s0, kn_s1 = quant_halves(
            kn_ref[0, g, :].astype(jnp.float32))
        vn8, vn_s0, vn_s1 = quant_halves(
            vn_ref[0, g, :].astype(jnp.float32))
        q8v, q_s0, q_s1 = quant_halves(q_ref[0, g, :].astype(jnp.float32))

        # --- K/V row inserts (masked full-block writes) ---
        kb = jnp.where(rowsV == pos, kn8[None, :].astype(jnp.int8),
                       k_ref[0, 0, g])                        # [S_pad,128]
        ko_ref[0, 0, g] = kb
        vb = jnp.where(rowsV == pos, vn8[None, :].astype(jnp.int8),
                       v_ref[0, 0, g])
        vo_ref[0, 0, g] = vb

        # --- scale-plane row inserts ([S_pad, 2] blocks) ---
        fillk = jnp.where(colsS2 == 0, kn_s0, kn_s1)          # [S_pad, 2]
        ks = jnp.where(rowsS2 == pos, fillk, ks_ref[0, 0, g])
        kso_ref[0, 0, g] = ks
        fillv = jnp.where(colsS2 == 0, vn_s0, vn_s1)
        vs = jnp.where(rowsS2 == pos, fillv, vs_ref[0, 0, g])
        vso_ref[0, 0, g] = vs

        # --- scores on the MXU: [S_pad,128] x [128,2] int8 -> int32 ---
        qsel = jnp.where(qmask, q8v[:, None], 0.0).astype(jnp.int8)
        scores = jax.lax.dot_general(
            kb, qsel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)                                 # [S_pad, 2]
        qsf = jnp.where(colsS2 == 0, q_s0, q_s1)
        scores = scores * qsf * ks
        valid = (rowsS2 <= pos) & (rowsS2 >= pad)
        scores = jnp.where(valid, scores, neg)
        m = jnp.max(scores, axis=0, keepdims=True)            # [1, 2]
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=0, keepdims=True)             # [1, 2]

        # --- fold per-row V scales into probs, requantize, PV on MXU ---
        p = e * vs                                            # [S_pad, 2]
        pm = jnp.max(jnp.abs(p), axis=0, keepdims=True)
        ps = jnp.maximum(pm, 1e-30) / 127.0
        p8 = jnp.round(p / ps).astype(jnp.int8)
        ctx = jax.lax.dot_general(
            p8, vb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)                                 # [2, 128]
        s0 = ps[0, 0] / denom[0, 0]
        s1 = ps[0, 1] / denom[0, 1]
        outs.append(jnp.where(low, ctx[0] * s0,
                              ctx[1] * s1).astype(out_dtype))
    ctx_ref[0] = jnp.stack(outs, axis=0)                      # [G, 128]


def _quant_rows(x):
    """Per-(…, row) symmetric int8 quantization over the last axis."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    x8 = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return x8, scale[..., 0]


def self_attend_step_packed_int8(
    q: jax.Array,        # [B, H, 64] — already scaled by head_dim^-0.5
    k_new: jax.Array,    # [B, H, 64] this position's key (unquantized)
    v_new: jax.Array,    # [B, H, 64] this position's value
    k_cache: jax.Array,  # [L, B, G, S_pad, 128] int8 (quantize_pack_self)
    v_cache: jax.Array,  # [L, B, G, S_pad, 128] int8
    k_scale: jax.Array,  # [L, B, G, S_pad, 2] f32 per-row scales
    v_scale: jax.Array,  # [L, B, G, S_pad, 2] f32
    layer: jax.Array,    # scalar int32
    pos: jax.Array,      # scalar int32: cache slot of this token
    pad_count=None,      # [B] int32 left-pad slots
    *,
    interpret: bool = False,
):
    """One int8-MXU self-attention decode step against (and into) the
    quantized packed cache (variant x7).  The new K/V rows AND q are
    quantized per (batch, head) INSIDE the kernel (the host-side
    _quant_rows trio measured 224 us of pure launch overhead per step);
    caches AND scale planes are updated in place (input_output_aliases).

    Returns (ctx [B, H, 64], k_cache', v_cache', k_scale', v_scale')."""
    b, h, dh = q.shape
    g = h // PACK
    s_pad = v_cache.shape[3]
    assert k_cache.shape[3:] == (s_pad, LANES), (
        "int8 self step expects the row-major quantize_pack_self layout",
        k_cache.shape)

    q_pk = q.reshape(b, g, LANES)
    kn_pk = k_new.reshape(b, g, LANES)
    vn_pk = v_new.reshape(b, g, LANES)

    if pad_count is None:
        pad_count = jnp.zeros((b,), jnp.int32)
    scalars = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(pos, jnp.int32).reshape(1),
        jnp.broadcast_to(jnp.asarray(pad_count, jnp.int32), (b,)),
    ])

    def _l(s):
        return s[0] if getattr(s, "shape", ()) else s

    kern = functools.partial(_kernel_int8, out_dtype=q.dtype)
    row_spec = pl.BlockSpec((1, g, LANES), lambda i, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, g, s_pad, LANES),
                           lambda i, s: (_l(s), i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, 1, g, s_pad, PACK),
                           lambda i, s: (_l(s), i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[row_spec, row_spec, row_spec,
                  kv_spec, kv_spec, sc_spec, sc_spec],
        out_specs=(row_spec, kv_spec, kv_spec, sc_spec, sc_spec),
    )
    ctx, k_out, v_out, ks_out, vs_out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, g, LANES), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_cache.shape, jnp.int8),
            jax.ShapeDtypeStruct(k_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scale.shape, jnp.float32),
        ),
        # args: scalars(0) q(1) kn(2) vn(3)
        #       k_cache(4) v_cache(5) k_scale(6) v_scale(7)
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4},
        interpret=interpret,
    )(scalars, q_pk, kn_pk, vn_pk,
      k_cache, v_cache, k_scale, v_scale)
    return ctx.reshape(b, h, dh), k_out, v_out, ks_out, vs_out


def self_attend_step_packed_int8_sharded(
    q, k_new, v_new, k_cache, v_cache, k_scale, v_scale, layer, pos,
    pad_count, *, mesh, interpret: bool = False,
):
    """Mesh-aware wrapper for the int8 self step: batch over 'data', head
    groups over 'model'; quantization + in-place insert happen on each
    shard's local block."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape.get("model", 1)
    h_ax = "model" if tp > 1 else None
    b = q.shape[0]
    row = P("data", h_ax, None)
    kv = P(None, "data", h_ax, None, None)
    if pad_count is None:
        pad_count = jnp.zeros((b,), jnp.int32)

    def body(q, kn, vn, kc, vc, ks, vs, layer, pos, pad):
        return self_attend_step_packed_int8(
            q, kn, vn, kc, vc, ks, vs, layer, pos, pad,
            interpret=interpret)

    return shard_map(
        body, mesh=mesh,
        in_specs=(row, row, row, kv, kv, kv, kv, P(), P(), P("data")),
        out_specs=(row, kv, kv, kv, kv), check_vma=False,
    )(q, k_new, v_new, k_cache, v_cache, k_scale, v_scale,
      layer, pos, pad_count)


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
