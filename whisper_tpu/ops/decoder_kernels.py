"""Fused decoder-step kernels — the hot path of generation.

A single decoder step at whisper-base shapes ([B,512] activations) spends
more time on per-op sequencing than on math: the unfused step issues ~25
XLA ops per layer.  These kernels collapse each layer into three Pallas
calls, keeping every intermediate in VMEM:

- ``self_attn_block``: LN -> fused QKV matmul -> KV-cache update (in place
  via input/output aliasing) -> masked attention over the static cache ->
  output projection -> residual.
- ``cross_attn_block``: LN -> Q projection, then flash-style streaming over
  the [B,H,T_enc,Dh] encoder K/V in key blocks (grid-sequential online
  softmax in VMEM scratch — cross K/V is ~25 MB/layer at batch 16, far over
  VMEM, and streaming it is the decode loop's memory floor) -> output
  projection -> residual.
- ``mlp_block``: LN -> fc1 -> GELU -> fc2 -> residual.

``decoder_step_fused`` composes them over unrolled layers; it is numerically
equivalent to models.whisper.decoder_step (tested in interpret mode).

STATUS — ARCHIVED NEGATIVE RESULT, NOT ON ANY DEFAULT PATH: measured on a
real v5e at whisper-base/batch-16 the fused step is ~4x SLOWER than the
XLA step (5.0 vs 1.25 ms).  Root cause: Mosaic rejects the lane-splitting
reshapes a [B*H, ...] attention layout needs, so these kernels scalarize
the head dimension into per-head VPU loops where batch=16 occupies 16 of
128 lanes — ~12% vector utilization — while XLA's unfused attention already
runs near the cross-KV memory floor (~0.45 ms/step).  Its lessons seeded
the head-packed rewrite that DID win (ops/cross_attention.py,
ops/self_attention.py — the x4/x5 decode path); this module remains only
as the documented experiment behind the opt-in cfg.fused_decoder_step, and
its parity tests are gated behind `pytest -m slow`.

Weights arrive pre-fused per layer (QKV concatenated) via
:func:`build_step_weights`, computed once per session.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_tpu.models.registry import WhisperDims
from whisper_tpu.models.whisper import LN_EPS, _logits

NEG_INF = -1e30  # python float: jnp constants would be captured by kernels
# Encoder keys per grid step: K+V blocks are double-buffered in VMEM, so at
# batch 16 x 8 heads a 128-key block costs 4 x 2.1 MB — safely under the
# 16 MB VMEM budget together with the projection weights.
CROSS_BLOCK = 64


def _ln(x, s, b):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * s.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Self-attention block (cache update in place)
# ---------------------------------------------------------------------------

def _self_kernel(pos_ref, x_ref, ln_ref, qkvw_ref, qkvb_ref, ow_ref, ob_ref,
                 ck_in_ref, cv_in_ref,
                 out_ref, ck_ref, cv_ref, ctx_scr, *, heads: int):
    """Self-attention cache layout is TIME-MAJOR: [S, B, d] per layer.

    Mosaic cannot lower bf16 stores into the tiled interior of a 4D buffer
    ([B,H,pos,:]), but a 2D [B, d] store at a leading index (ck_ref[pos])
    is the standard supported case — and it writes all heads at once.
    """
    del ck_in_ref, cv_in_ref  # aliased with ck_ref / cv_ref
    b, d = x_ref.shape
    dh = d // heads
    pos = pos_ref[0, 0]

    x = x_ref[:]
    r = _ln(x, ln_ref[0], ln_ref[1])
    qkv = jnp.dot(r, qkvw_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + qkvb_ref[0].astype(jnp.float32)
    scale = jnp.asarray(dh, jnp.float32) ** -0.5

    ck_ref[pos] = qkv[:, d:2 * d].astype(x.dtype)         # all heads at once
    cv_ref[pos] = qkv[:, 2 * d:].astype(x.dtype)

    # Head dim as a static loop over lane-contiguous slices (Mosaic rejects
    # lane-splitting reshapes); everything fuses into this one kernel.
    s_rows = None
    for hd in range(heads):
        sl = slice(hd * dh, (hd + 1) * dh)
        q_h = qkv[:, sl] * scale                          # [B, Dh] fp32
        keys = ck_ref[:, :, sl].astype(jnp.float32)       # [S, B, Dh]
        scores = jnp.sum(q_h[None, :, :] * keys, axis=-1)  # [S, B]
        if s_rows is None:
            s_rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        scores = jnp.where(s_rows <= pos, scores, NEG_INF)
        m = jnp.max(scores, axis=0, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=0, keepdims=True)         # softmax over S
        vals = cv_ref[:, :, sl].astype(jnp.float32)       # [S, B, Dh]
        ctx_scr[:, sl] = jnp.sum(p[:, :, None] * vals, axis=0)

    ctx = ctx_scr[:].astype(x.dtype)
    out = jnp.dot(ctx, ow_ref[:], preferred_element_type=jnp.float32)
    out = out + ob_ref[0].astype(jnp.float32) + x.astype(jnp.float32)
    out_ref[:] = out.astype(x.dtype)


def self_attn_block(x, ln, qkv_w, qkv_b, o_w, o_b, cache_k, cache_v, pos,
                    heads: int, interpret: bool = False):
    """x [B,d]; cache_k/v TIME-MAJOR [S, B, d], updated in place at `pos`."""
    b, d = x.shape
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1, 1)
    out, ck, cv = pl.pallas_call(
        functools.partial(_self_kernel, heads=heads),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln [2,d]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_b [1,3d]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # o_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # o_b [1,d]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cache_k
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cache_v
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ),
        input_output_aliases={7: 1, 8: 2},  # cache buffers updated in place
        scratch_shapes=[pltpu.VMEM((b, d), jnp.float32)],
        interpret=interpret,
    )(pos_arr, x, ln, qkv_w, qkv_b, o_w, o_b, cache_k, cache_v)
    return out, ck, cv


# ---------------------------------------------------------------------------
# Cross-attention block (streamed over encoder keys)
# ---------------------------------------------------------------------------

def _cross_kernel(x_ref, ln_ref, qw_ref, qb_ref, ow_ref, ob_ref,
                  k_ref, v_ref, out_ref,
                  q_scr, m_scr, l_scr, acc_scr, *, heads: int, t_valid: int):
    b, d = x_ref.shape
    dh = d // heads
    j = pl.program_id(0)
    nblk = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        r = _ln(x_ref[:], ln_ref[0], ln_ref[1])
        q = jnp.dot(r, qw_ref[:], preferred_element_type=jnp.float32)
        q = q + qb_ref[0].astype(jnp.float32)
        scale = jnp.asarray(dh, jnp.float32) ** -0.5
        q_scr[:] = q * scale
        m_scr[:] = jnp.full_like(m_scr[:], NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    # Per-head online softmax (head dim as a static loop; see _self_kernel).
    bk = k_ref.shape[2]
    for hd in range(heads):
        sl = slice(hd * dh, (hd + 1) * dh)
        q_h = q_scr[:, sl]                               # [B, Dh] fp32
        keys = k_ref[:, hd].astype(jnp.float32)          # [B, BK, Dh]
        scores = jnp.sum(q_h[:, None, :] * keys, axis=-1)  # [B, BK]
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * bk
        scores = jnp.where(col < t_valid, scores, NEG_INF)

        m_prev = m_scr[:, hd]                            # [B]
        l_prev = l_scr[:, hd]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new[:, None])             # [B, BK]
        l_scr[:, hd] = l_prev * alpha + jnp.sum(p, axis=-1)
        vals = v_ref[:, hd].astype(jnp.float32)          # [B, BK, Dh]
        pv = jnp.sum(p[:, :, None] * vals, axis=1)       # [B, Dh]
        acc_scr[:, sl] = acc_scr[:, sl] * alpha[:, None] + pv
        m_scr[:, hd] = m_new

    @pl.when(j == nblk - 1)
    def _():
        # Normalization: expand each head's l across its Dh lanes.
        l_full = jnp.concatenate(
            [jnp.broadcast_to(l_scr[:, hd][:, None], (b, dh))
             for hd in range(heads)], axis=1,
        )
        ctx = (acc_scr[:] / l_full).astype(x_ref.dtype)
        out = jnp.dot(ctx, ow_ref[:], preferred_element_type=jnp.float32)
        out = out + ob_ref[0].astype(jnp.float32) + x_ref[:].astype(jnp.float32)
        out_ref[:] = out.astype(x_ref.dtype)


def cross_attn_block(x, ln, q_w, q_b, o_w, o_b, cross_k, cross_v,
                     heads: int, interpret: bool = False):
    """x [B,d]; cross_k/v [B,H,T,Dh] streamed in key blocks."""
    b, d = x.shape
    dh = d // heads
    t = cross_k.shape[2]
    bk = min(CROSS_BLOCK, t)
    t_pad = ((t + bk - 1) // bk) * bk
    if t_pad != t:
        pad = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
        cross_k = jnp.pad(cross_k, pad)
        cross_v = jnp.pad(cross_v, pad)
    nblk = t_pad // bk

    full = lambda: pl.BlockSpec(lambda j: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_cross_kernel, heads=heads, t_valid=t),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(x.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ln.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(q_w.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(q_b.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(o_w.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(o_b.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, heads, bk, dh), lambda j: (0, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, heads, bk, dh), lambda j: (0, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(x.shape, lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),      # q
            pltpu.VMEM((b, heads), jnp.float32),  # running max per head
            pltpu.VMEM((b, heads), jnp.float32),  # running sum per head
            pltpu.VMEM((b, d), jnp.float32),      # accumulator (head slices)
        ],
        interpret=interpret,
    )(x, ln, q_w, q_b, o_w, o_b, cross_k, cross_v)
    return out


# ---------------------------------------------------------------------------
# MLP block
# ---------------------------------------------------------------------------

def _mlp_kernel(x_ref, ln_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[:]
    r = _ln(x, ln_ref[0], ln_ref[1])
    h = jnp.dot(r, w1_ref[:], preferred_element_type=jnp.float32)
    # Mosaic has no erf/erfc lowering; tanh-GELU differs from exact GELU by
    # ~1e-3 relative — below bf16 resolution, and the fused path only runs
    # for bf16 variants (parity rungs use the unfused exact-GELU decoder).
    h = jax.nn.gelu(h + b1_ref[0].astype(jnp.float32), approximate=True)
    h = h.astype(x.dtype)
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (out + b2_ref[0].astype(jnp.float32)
                  + x.astype(jnp.float32)).astype(x.dtype)


def mlp_block(x, ln, w1, b1, w2, b2, interpret: bool = False):
    return pl.pallas_call(
        _mlp_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, ln, w1, b1, w2, b2)


# ---------------------------------------------------------------------------
# Fused step orchestration
# ---------------------------------------------------------------------------

def build_step_weights(params: Dict, dims: WhisperDims) -> Dict[str, Any]:
    """Pre-fuse decoder weights for the step kernels (QKV concat, biases as
    [1, n] rows, LN pairs stacked). Int8 QTensor weights are dequantized
    once here — the decode loop then streams bf16.  Computed once per
    session."""
    from whisper_tpu.variants.quant import QTensor, dequantize

    blocks = params["decoder"]["blocks"]

    def w(name):
        x = blocks[name]
        if isinstance(x, QTensor):
            return dequantize(x, params["decoder"]["tok_emb"].dtype)
        return x

    l = dims.decoder_layers
    d = dims.d_model
    zeros_kb = jnp.zeros((l, d), w("q_b").dtype)
    return {
        "qkv_w": jnp.concatenate([w("q_w"), w("k_w"), w("v_w")], axis=-1),
        "qkv_b": jnp.concatenate([blocks["q_b"], zeros_kb, blocks["v_b"]],
                                 axis=-1)[:, None, :],
        "o_w": w("o_w"), "o_b": blocks["o_b"][:, None, :],
        "ln1": jnp.stack([blocks["ln_s"], blocks["ln_b"]], axis=1),
        "xq_w": w("xq_w"), "xq_b": blocks["xq_b"][:, None, :],
        "xo_w": w("xo_w"), "xo_b": blocks["xo_b"][:, None, :],
        "ln2": jnp.stack([blocks["x_ln_s"], blocks["x_ln_b"]], axis=1),
        "fc1_w": w("fc1_w"), "fc1_b": blocks["fc1_b"][:, None, :],
        "fc2_w": w("fc2_w"), "fc2_b": blocks["fc2_b"][:, None, :],
        "ln3": jnp.stack([blocks["mlp_ln_s"], blocks["mlp_ln_b"]], axis=1),
    }


def decoder_step_hybrid(
    params: Dict,
    step_weights: Dict[str, Any],
    dims: WhisperDims,
    token: jax.Array,      # [B] int32
    pos: jax.Array,        # scalar
    cache,
    *,
    interpret: bool = False,
    precision=None,
):
    """Hybrid fused decoder step — THE production fast path for bf16 rungs.

    Measured 35% faster than the plain XLA step (0.81 vs 1.26 ms at
    whisper-base/batch 16): QKV collapse into one pre-fused matmul, the MLP
    runs as one Pallas kernel, and attention stays in XLA (which already
    runs near the cross-KV memory floor — see the module STATUS note on why
    fully-fused attention kernels lost). Signature matches
    models.whisper.decoder_step (KVCache in/out).
    """
    from whisper_tpu.models.whisper import (
        _attend,
        _attend_int8,
        _layer_norm,
        _merge_heads,
        _split_heads,
    )

    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    h = dims.decoder_heads
    d = dims.d_model
    sw = step_weights

    x = dec["tok_emb"][token][:, None, :] + jax.lax.dynamic_slice_in_dim(
        dec["pos_embed"], pos, 1, axis=0
    ).astype(dtype)
    max_len = cache.self_k.shape[3]
    mask = (jnp.arange(max_len) <= pos)[None, :]
    has_int8_kv = cache.cross_k_scale is not None

    # Layers iterate via lax.scan (NOT a python loop): per-layer python
    # slicing of the stacked cache + jnp.stack re-assembly generates ~75
    # copy/slice ops per step (measured in traces); scan keeps the cache
    # in-place like the plain decoder path.
    def layer(x, xs):
        (ln1, qkv_w, qkv_b, o_w, o_b, ln2, xq_w, xq_b, xo_w, xo_b,
         ln3, fc1_w, fc1_b, fc2_w, fc2_b, sk, sv, ck, cv, cks, cvs) = xs
        r = _layer_norm(x, ln1[0], ln1[1])
        qkv = jnp.dot(r, qkv_w, precision=precision,
                      preferred_element_type=dtype) + qkv_b[0]
        q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
        q, k, v = (_split_heads(t, h) for t in (q, k, v))
        sk = jax.lax.dynamic_update_slice(sk, k, (0, 0, pos, 0))
        sv = jax.lax.dynamic_update_slice(sv, v, (0, 0, pos, 0))
        o = _attend(q, sk, sv, mask, precision)
        x = x + jnp.dot(_merge_heads(o), o_w, precision=precision,
                        preferred_element_type=dtype) + o_b[0]

        r = _layer_norm(x, ln2[0], ln2[1])
        q = _split_heads(
            jnp.dot(r, xq_w, precision=precision,
                    preferred_element_type=dtype) + xq_b[0], h)
        if has_int8_kv:
            o = _attend_int8(q, ck, cv, cks, cvs, precision)
        else:
            o = _attend(q, ck, cv, None, precision)
        x = x + jnp.dot(_merge_heads(o), xo_w, precision=precision,
                        preferred_element_type=dtype) + xo_b[0]

        x = mlp_block(x[:, 0, :], ln3, fc1_w, fc1_b, fc2_w, fc2_b,
                      interpret=interpret)[:, None, :]
        return x, (sk, sv)

    xs = (sw["ln1"], sw["qkv_w"], sw["qkv_b"], sw["o_w"], sw["o_b"],
          sw["ln2"], sw["xq_w"], sw["xq_b"], sw["xo_w"], sw["xo_b"],
          sw["ln3"], sw["fc1_w"], sw["fc1_b"], sw["fc2_w"], sw["fc2_b"],
          cache.self_k, cache.self_v, cache.cross_k, cache.cross_v,
          cache.cross_k_scale, cache.cross_v_scale)
    x, (new_sk, new_sv) = jax.lax.scan(layer, x, xs)

    x = _layer_norm(x, dec["ln_f_s"], dec["ln_f_b"])
    logits = _logits(params, x, precision)[:, 0, :]
    return logits, cache._replace(self_k=new_sk, self_v=new_sv)


def cache_to_time_major(self_k: jax.Array) -> jax.Array:
    """[L, B, H, S, Dh] -> [L, S, B, H*Dh] (once per generate call)."""
    l, b, h, s, dh = self_k.shape
    return self_k.transpose(0, 3, 1, 2, 4).reshape(l, s, b, h * dh)


def cache_from_time_major(tm: jax.Array, heads: int) -> jax.Array:
    """[L, S, B, H*Dh] -> [L, B, H, S, Dh]."""
    l, s, b, d = tm.shape
    return tm.reshape(l, s, b, heads, d // heads).transpose(0, 2, 3, 1, 4)


def decoder_step_fused(
    params: Dict,
    step_weights: Dict[str, Any],
    dims: WhisperDims,
    token: jax.Array,      # [B] int32
    pos: jax.Array,        # scalar
    self_k_tm: jax.Array,  # [L, S, B, d] time-major self cache
    self_v_tm: jax.Array,
    cross_k: jax.Array,    # [L, B, H, T, Dh]
    cross_v: jax.Array,
    *,
    interpret: bool = False,
    precision=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused decoder step; returns (logits, self_k_tm, self_v_tm)."""
    from whisper_tpu.models.whisper import _layer_norm

    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    h = dims.decoder_heads
    x = dec["tok_emb"][token] + jax.lax.dynamic_slice_in_dim(
        dec["pos_embed"], pos, 1, axis=0
    ).astype(dtype)[0][None, :]

    sw = step_weights
    new_sk, new_sv = [], []
    for i in range(dims.decoder_layers):
        x, ck, cv = self_attn_block(
            x, sw["ln1"][i], sw["qkv_w"][i], sw["qkv_b"][i],
            sw["o_w"][i], sw["o_b"][i],
            self_k_tm[i], self_v_tm[i], pos, h, interpret=interpret,
        )
        new_sk.append(ck)
        new_sv.append(cv)
        x = cross_attn_block(
            x, sw["ln2"][i], sw["xq_w"][i], sw["xq_b"][i],
            sw["xo_w"][i], sw["xo_b"][i],
            cross_k[i], cross_v[i], h, interpret=interpret,
        )
        x = mlp_block(
            x, sw["ln3"][i], sw["fc1_w"][i], sw["fc1_b"][i],
            sw["fc2_w"][i], sw["fc2_b"][i], interpret=interpret,
        )

    x = _layer_norm(x, dec["ln_f_s"], dec["ln_f_b"])
    logits = _logits(params, x[:, None, :], precision)[:, 0, :]
    return logits, jnp.stack(new_sk), jnp.stack(new_sv)
