"""Pure-JAX Whisper encoder/decoder.

A TPU-first, functional re-implementation of the Whisper architecture whose
behavior the reference exercises through three exported ONNX graphs
(encoder_model.onnx / decoder_model.onnx / decoder_with_past_model.onnx, ref
scripts/export_onnx_whisper.py:10-30, src/main.rs:698-707, :753-829).  Here
the three graphs become three jittable functions over one param pytree:

- :func:`encoder_apply`   — log-mel [B, n_mels, 3000] -> states [B, 1500, d]
- :func:`decoder_prefill` — full-prompt pass; fills self-attn KV for the
  prompt and computes cross-attn KV once (the reference's first decoder call,
  src/main.rs:771-787)
- :func:`decoder_step`    — single-token pass against a **static-shape** KV
  cache updated with dynamic_update_slice (the reference's
  decoder_with_past + IoBinding loop, src/main.rs:789-827)

Design notes (TPU):
- Layer parameters are stacked along a leading ``L`` axis and iterated with
  ``lax.scan`` — O(1) compile time in depth, and stacked weights shard
  naturally for tensor parallelism ([L, d, 4d] sharded on the last axis).
- All shapes are static; masks (causal / step-position) select validity.
- LayerNorm and softmax accumulate in float32 regardless of activation dtype.
- Matmul precision is a parameter: ``HIGHEST`` for the fp32 parity variant,
  ``DEFAULT`` for bf16 throughput variants (see whisper_tpu.variants).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.models.registry import WhisperDims

Params = Dict[str, Any]
LN_EPS = 1e-5


class KVCache(NamedTuple):
    """Static-shape KV cache.

    self_k/self_v: [L, B, H, S_max, Dh] — decoder self-attention, updated
        every step at the current position (replaces the reference's
        present.* -> past_key_values.* renaming, src/main.rs:737-751).
    cross_k/cross_v: [L, B, H, T_enc, Dh] — computed once at prefill and
        reused (the reference reuses encoder K/V the same way).
    cross_k_scale/cross_v_scale: per-(layer, batch, head) fp32 scales when
        the cross cache is stored int8 (int8_cross_kv): streaming the cross
        KV is the decode loop's memory floor, and int8 halves it; the
        dequantize fuses into the attention dots (scale applied after).
    """

    self_k: jax.Array
    self_v: jax.Array
    cross_k: jax.Array
    cross_v: jax.Array
    cross_k_scale: Optional[jax.Array] = None
    cross_v_scale: Optional[jax.Array] = None
    # Per-ROW fp32 scales when the self cache is int8-quantized (x7,
    # ops/self_attention.quantize_pack_self): [L, B, G, S_pad, 2].  Each
    # cached row is quantized independently at insert time — future rows
    # are unknown when a row is written, so there is no shared absmax.
    self_k_scale: Optional[jax.Array] = None
    self_v_scale: Optional[jax.Array] = None


def sinusoid_position_embedding(length: int, channels: int) -> np.ndarray:
    """OpenAI Whisper sinusoidal embedding for the encoder (float32)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate(
        [np.sin(scaled_time), np.cos(scaled_time)], axis=1
    ).astype(np.float32)


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def _dequant(w, dtype):
    """QTensor -> dense weight in `dtype`; non-quantized weights pass
    through.  Duck-typed on the class NAME because importing
    variants.quant here would cycle (variants.__init__ -> ladder ->
    runtime.session -> this module); this is THE one dequant site —
    keep variants.quant.dequantize's math (q * s) in sync."""
    if type(w).__name__ == "QTensor":
        return w.q.astype(dtype) * w.s.astype(dtype)
    return w


def _dense(x, w, b, precision, int8_act: bool = False):
    if type(w).__name__ == "QTensor":  # int8 weight (variants.quant)
        if int8_act:
            # W8A8 (variant x6): dynamic per-row symmetric activation
            # quantization + int8xint8 MXU dot at 2x bf16 peak, int32
            # accumulation (the Mosaic/XLA requirement).  Output scale is
            # the product of the row scale and the per-output-channel
            # weight scale; bias adds in the activation dtype.
            xs = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            xs = jnp.maximum(xs.astype(jnp.float32) / 127.0, 1e-12)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, w.q,
                dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (acc.astype(jnp.float32) * xs
                 * w.s.astype(jnp.float32)).astype(x.dtype)
            return y if b is None else y + b
        w = _dequant(w, x.dtype)
    y = jnp.dot(x, w, precision=precision, preferred_element_type=x.dtype)
    return y if b is None else y + b


def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    """[..., S, d] -> [..., H, S, Dh]"""
    *lead, s, d = x.shape
    x = x.reshape(*lead, s, n_heads, d // n_heads)
    return jnp.moveaxis(x, -2, -3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """[..., H, S, Dh] -> [..., S, d]"""
    x = jnp.moveaxis(x, -3, -2)
    *lead, s, h, dh = x.shape
    return x.reshape(*lead, s, h * dh)


def _attend(q, k, v, mask, precision, fused: bool = False):
    """q [B,H,Sq,Dh], k/v [B,H,Sk,Dh], mask broadcastable to [B,H,Sq,Sk].

    q is pre-scaled by Dh^-0.5 before the matmul (HF order, which the
    reference's exported ONNX graphs inherit) so fp32 rounding matches.

    With fused=True (and no mask), the VMEM-resident Pallas attention
    kernel is used — scores never touch HBM (ops.attention).
    """
    dh = q.shape[-1]
    q = q * jnp.asarray(dh, q.dtype) ** -0.5
    if fused and mask is None:
        from whisper_tpu.ops.attention import fused_attention

        return fused_attention(q, k, v,
                               interpret=jax.default_backend() != "tpu")
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, precision=precision,
                      preferred_element_type=q.dtype)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _conv1d(x, w, b, stride, precision):
    """x [B, C_in, T], w [width, C_in, C_out] -> [B, C_out, T']"""
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NCH", "HIO", "NCH"),
        precision=precision,
    )
    return y + b[None, :, None]


def encoder_apply(
    params: Params,
    dims: WhisperDims,
    mel: jax.Array,
    *,
    precision=None,
    fused_attention: bool = False,
    int8_activations: bool = False,
    fused_mlp: bool = False,
    fused_block: bool = False,
) -> jax.Array:
    """Encoder forward: mel [B, n_mels, T] -> hidden states [B, T//2, d].

    conv1d(k=3,s=1)+GELU, conv1d(k=3,s=2)+GELU, +sinusoidal positions, then
    encoder_layers pre-LN transformer blocks and a final LayerNorm — the
    graph behind the reference's ``run_encoder`` (src/main.rs:698-707).

    int8_activations (variant x6, requires int8 weights): every block
    matmul runs as a full int8xint8 MXU dot with dynamic per-row
    activation scales — 2x the bf16 MXU peak.  The encoder is the
    compute-bound half of the pipeline (the decode loop is
    bandwidth-bound and keeps its own int8 paths, ops/cross_attention.py).
    """
    enc = params["encoder"]
    dtype = enc["conv1_w"].dtype
    x = mel.astype(dtype)

    x = jax.nn.gelu(_conv1d(x, enc["conv1_w"], enc["conv1_b"], 1, precision),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv2_w"], enc["conv2_b"], 2, precision),
                    approximate=False)
    x = jnp.swapaxes(x, 1, 2)  # [B, T', d]
    x = x + enc["pos_embed"][: x.shape[1]].astype(dtype)

    h = dims.encoder_heads

    i8 = int8_activations
    fb_mode = None          # "whole" | "chunked" when fused_block engages
    fb_qkv_c = None         # ln_qkv column chunk (chunked mode)
    fb_mlp_f = None         # fused-MLP FFN chunk (chunked mode; None =
                            # the whole-matrix MLP kernel fits)
    if fused_block:
        # Whole-layer fused path (ops/encoder_block.py): LN1+QKV kernel ->
        # fused attention -> O+residual+LN2+MLP+residual kernel.
        # Supersedes fused_mlp.  At dims past the VMEM budget (d >= 1024)
        # the round-5 weight-streaming composition engages instead:
        # column-chunked LN1+QKV kernel -> fused attention -> XLA O-proj +
        # residual (the O-fold measured WORSE at base anyway) -> the
        # FFN-chunked fused-MLP kernel.
        from whisper_tpu.ops import encoder_block as eb
        from whisper_tpu.ops import encoder_mlp as em

        if eb.fits_vmem(dims.d_model, dims.d_ffn, dtype):
            fb_mode = "whole"
        else:
            fb_qkv_c = eb.qkv_chunk_plan(dims.d_model, dtype)
            if not em.fits_vmem(dims.d_model, dims.d_ffn, dtype):
                fb_mlp_f = em.chunk_plan(dims.d_model, dims.d_ffn, dtype)
                mlp_ok = fb_mlp_f is not None
            else:
                mlp_ok = True
            fb_mode = "chunked" if (fb_qkv_c is not None and mlp_ok) else None
        fused_block = fb_mode is not None
        if fused_block:
            fused_mlp = False
    mlp_f_block = None
    if fused_mlp:
        # VMEM guard: the whole-matrix kernel holds both dense matrices as
        # double-buffered VMEM constants; past ~medium dims they blow the
        # 16 MB budget and Mosaic fails at compile time.  At those dims
        # switch to the FFN-chunked kernel (weight slices stream through
        # VMEM while the activation tile + fp32 accumulator stay resident
        # — round 5; previously this silently fell back to the unfused
        # chain at exactly the model sizes with the largest per-layer
        # HBM intermediates).
        from whisper_tpu.ops.encoder_mlp import chunk_plan, fits_vmem

        if not fits_vmem(dims.d_model, dims.d_ffn, dtype):
            mlp_f_block = chunk_plan(dims.d_model, dims.d_ffn, dtype)
            fused_mlp = mlp_f_block is not None

    def _dq(w):
        return _dequant(w, dtype)

    def block_fused(x, p):
        """One encoder layer via the ops/encoder_block.py kernel pair; the
        activations make exactly three HBM round trips per layer (qkv ->
        attention -> out) instead of ~10 separate op fusions.  In
        "chunked" mode (d >= 1024) the QKV kernel streams weight column
        slices, O-proj+residual runs in XLA, and the MLP half uses the
        FFN-chunked fused-MLP kernel."""
        from whisper_tpu.ops import encoder_block as eb

        interp = jax.default_backend() != "tpu"
        d = dims.d_model
        w_qkv = jnp.concatenate(
            [_dq(p["q_w"]), _dq(p["k_w"]), _dq(p["v_w"])], axis=1)
        b_qkv = jnp.concatenate(
            [p["q_b"], jnp.zeros_like(p["q_b"]), p["v_b"]])
        qkv = eb.fused_ln_qkv(x, p["attn_ln_s"], p["attn_ln_b"],
                              w_qkv, b_qkv, interpret=interp,
                              c_block=fb_qkv_c)
        q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
        o = _attend(_split_heads(q, h), _split_heads(k, h),
                    _split_heads(v, h), None, precision, fused=True)
        if fb_mode == "whole":
            x = eb.fused_out_mlp(
                x, _merge_heads(o), _dq(p["o_w"]), p["o_b"],
                p["mlp_ln_s"], p["mlp_ln_b"],
                _dq(p["fc1_w"]), p["fc1_b"], _dq(p["fc2_w"]), p["fc2_b"],
                interpret=interp)
        else:
            from whisper_tpu.ops.encoder_mlp import fused_encoder_mlp

            x = x + _dense(_merge_heads(o), p["o_w"], p["o_b"], precision)
            x = fused_encoder_mlp(
                x, p["mlp_ln_s"], p["mlp_ln_b"],
                _dequant(p["fc1_w"], x.dtype), p["fc1_b"],
                _dequant(p["fc2_w"], x.dtype), p["fc2_b"],
                interpret=interp, f_block=fb_mlp_f)
        return x, None

    def block(x, p):
        r = _layer_norm(x, p["attn_ln_s"], p["attn_ln_b"])
        q = _dense(r, p["q_w"], p["q_b"], precision, int8_act=i8)
        k = _dense(r, p["k_w"], None, precision, int8_act=i8)
        v = _dense(r, p["v_w"], p["v_b"], precision, int8_act=i8)
        o = _attend(_split_heads(q, h), _split_heads(k, h), _split_heads(v, h),
                    None, precision, fused=fused_attention)
        x = x + _dense(_merge_heads(o), p["o_w"], p["o_b"], precision,
                       int8_act=i8)

        if fused_mlp:
            # VMEM-resident LN+FC1+GELU+FC2+residual kernel (-17% on the
            # MLP chain at whisper-base, tanh GELU — ops/encoder_mlp.py).
            # Precedence: fused_mlp dequantizes FC1/FC2 and runs bf16 MXU
            # dots, overriding int8_activations for the MLP half (measured:
            # W8A8 gains nothing at base/medium dims, docs/DECODE_ROOFLINE
            # addendum; WhisperSession warns when both flags are set).
            from whisper_tpu.ops.encoder_mlp import fused_encoder_mlp

            x = fused_encoder_mlp(
                x, p["mlp_ln_s"], p["mlp_ln_b"],
                _dequant(p["fc1_w"], x.dtype), p["fc1_b"],
                _dequant(p["fc2_w"], x.dtype), p["fc2_b"],
                interpret=jax.default_backend() != "tpu",
                f_block=mlp_f_block,
            )
        else:
            r = _layer_norm(x, p["mlp_ln_s"], p["mlp_ln_b"])
            r = jax.nn.gelu(_dense(r, p["fc1_w"], p["fc1_b"], precision,
                                   int8_act=i8),
                            approximate=False)
            x = x + _dense(r, p["fc2_w"], p["fc2_b"], precision, int8_act=i8)
        return x, None

    x, _ = jax.lax.scan(block_fused if fused_block else block, x,
                        enc["blocks"])
    return _layer_norm(x, enc["ln_f_s"], enc["ln_f_b"])


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def init_cache(
    dims: WhisperDims, batch: int, max_len: int, t_enc: int, dtype
) -> KVCache:
    l, h, dh = dims.decoder_layers, dims.decoder_heads, dims.head_dim
    z = functools.partial(jnp.zeros, dtype=dtype)
    return KVCache(
        self_k=z((l, batch, h, max_len, dh)),
        self_v=z((l, batch, h, max_len, dh)),
        cross_k=z((l, batch, h, t_enc, dh)),
        cross_v=z((l, batch, h, t_enc, dh)),
    )


def _decoder_blocks(
    params: Params,
    dims: WhisperDims,
    x: jax.Array,            # [B, S, d]
    cache: KVCache,
    pos: jax.Array,          # int32: index of x[:, 0] in the sequence —
                             # scalar (all rows aligned) or [B] per-row
                             # (batched speculative decoding, where rows
                             # accept different draft lengths)
    self_mask,               # [S, S_max] (or [B, 1, S, S_max]) mask or None
    precision,
    cross_len: Optional[int] = None,  # true encoder length when the cross
                                      # cache is head-packed (see below)
    pad_count=None,                   # [B] left-pad slots (packed-self path)
    int8_mxu: bool = False,           # int8xint8 MXU attention dots (x5)
    mesh=None,                        # jax Mesh: run packed kernels per
                                      # shard via shard_map (multi-chip)
):
    """Run all decoder blocks via scan, updating the self-attn cache at
    positions [pos, pos+S) and attending per `self_mask`."""
    dec = params["decoder"]
    h = dims.decoder_heads
    s = x.shape[1]
    # Head-packed int8 cross cache (pack_cross_cache): keep the K/V arrays
    # OUT of the scan xs — the decode-step kernel indexes the layer itself
    # via scalar prefetch, so no per-layer slice is ever materialized.
    packed_cross = cache.cross_v.shape[-1] == 128 and cross_len is not None
    # Fully-packed decode step: the SELF cache is head-packed too
    # (pack_self_cache) and updated in place by its own kernel — no carry
    # copies, no dynamic-slice fusions (ops/self_attention.py).
    int8_self = cache.self_k_scale is not None  # x7: int8 self cache with
    packed_self = (packed_cross                 # per-row scale planes
                   and (cache.self_k.shape[-1] == 128 or int8_self)
                   and s == 1 and pos.ndim == 0)

    if packed_self:
        return _decoder_blocks_packed(
            params, dims, x, cache, pos, precision, cross_len, pad_count,
            int8_mxu=int8_mxu, mesh=mesh,
        )
    if int8_self or (packed_cross and cache.self_k.shape[-1] == 128):
        # A packed/int8 SELF cache that missed the packed fast path (s>1
        # or vector pos, e.g. a speculative verify pass) must not fall
        # into the generic block below: its dynamic_update_slice/_attend
        # assume the unpacked [B,H,S,Dh] bf16 layout and would silently
        # attend a head-packed (possibly int8) cache.
        raise ValueError(
            "packed/int8 self cache requires the single-token scalar-pos "
            "decode step (s==1, scalar pos); use an unpacked cache for "
            "multi-token or per-row-position passes")

    def block(x, layer):
        if packed_cross:
            li, p, sk, sv = layer
            ck = cv = cks = cvs = None
        else:
            p, sk, sv, ck, cv, cks, cvs = layer
        # --- causal self-attention against the static cache ---
        r = _layer_norm(x, p["ln_s"], p["ln_b"])
        q = _split_heads(_dense(r, p["q_w"], p["q_b"], precision), h)
        k = _split_heads(_dense(r, p["k_w"], None, precision), h)
        v = _split_heads(_dense(r, p["v_w"], p["v_b"], precision), h)
        if pos.ndim == 0:
            sk = jax.lax.dynamic_update_slice(sk, k, (0, 0, pos, 0))
            sv = jax.lax.dynamic_update_slice(sv, v, (0, 0, pos, 0))
        else:
            # Per-row write offsets (vmapped dynamic_update_slice lowers
            # to one scatter over the batch axis).
            row_dus = jax.vmap(
                lambda c, u, st: jax.lax.dynamic_update_slice(c, u, (0, st, 0))
            )
            sk = row_dus(sk, k, pos)
            sv = row_dus(sv, v, pos)
        o = _attend(q, sk, sv, self_mask, precision)
        x = x + _dense(_merge_heads(o), p["o_w"], p["o_b"], precision)

        # --- cross-attention (KV precomputed at prefill) ---
        r = _layer_norm(x, p["x_ln_s"], p["x_ln_b"])
        q = _split_heads(_dense(r, p["xq_w"], p["xq_b"], precision), h)
        if packed_cross:
            # Head-packed int8 cache (pack_cross_cache): the decode-step
            # Pallas kernel streams full 128-lane tiles — the XLA layout
            # at head_dim=64 only fills half a tile (docs/ROADMAP.md §1).
            # s > 1 (the speculative K+1-token verify pass) takes the
            # multi-query variant: same per-query numerics, one KV stream
            # for all tokens.
            from whisper_tpu.ops.cross_attention import (
                cross_attend_multi_packed,
                cross_attend_multi_packed_sharded,
                cross_attend_step_packed,
                cross_attend_step_packed_sharded,
            )

            dh = dims.head_dim
            interp = jax.default_backend() != "tpu"
            scale = jnp.asarray(dh, q.dtype) ** -0.5
            if s == 1:
                qs = q[:, :, 0, :] * scale
                if mesh is not None:
                    ctx = cross_attend_step_packed_sharded(
                        qs, cache.cross_k, cache.cross_v,
                        cache.cross_k_scale[:, :, :, 0, 0],
                        cache.cross_v_scale[:, :, :, 0, 0],
                        li, s_valid=cross_len, mesh=mesh,
                        int8_mxu=int8_mxu, interpret=interp,
                    )
                else:
                    ctx = cross_attend_step_packed(
                        qs, cache.cross_k, cache.cross_v,
                        cache.cross_k_scale[:, :, :, 0, 0],
                        cache.cross_v_scale[:, :, :, 0, 0],
                        li, s_valid=cross_len, int8_mxu=int8_mxu,
                        interpret=interp,
                    )
                o = ctx[:, :, None, :]
            else:
                qm = jnp.swapaxes(q, 1, 2) * scale     # [B, T, H, Dh]
                if mesh is not None:
                    ctx = cross_attend_multi_packed_sharded(
                        qm, cache.cross_k, cache.cross_v,
                        cache.cross_k_scale[:, :, :, 0, 0],
                        cache.cross_v_scale[:, :, :, 0, 0],
                        li, s_valid=cross_len, mesh=mesh,
                        int8_mxu=int8_mxu, interpret=interp,
                    )
                else:
                    ctx = cross_attend_multi_packed(
                        qm, cache.cross_k, cache.cross_v,
                        cache.cross_k_scale[:, :, :, 0, 0],
                        cache.cross_v_scale[:, :, :, 0, 0],
                        li, s_valid=cross_len, int8_mxu=int8_mxu,
                        interpret=interp,
                    )
                o = jnp.swapaxes(ctx, 1, 2)            # [B, H, T, Dh]
        elif cks is not None:
            o = _attend_int8(q, ck, cv, cks, cvs, precision)
        else:
            o = _attend(q, ck, cv, None, precision)
        x = x + _dense(_merge_heads(o), p["xo_w"], p["xo_b"], precision)

        # --- MLP ---
        r = _layer_norm(x, p["mlp_ln_s"], p["mlp_ln_b"])
        r = jax.nn.gelu(_dense(r, p["fc1_w"], p["fc1_b"], precision),
                        approximate=False)
        x = x + _dense(r, p["fc2_w"], p["fc2_b"], precision)
        return x, (sk, sv)

    if packed_cross:
        xs = (jnp.arange(dims.decoder_layers, dtype=jnp.int32),
              dec["blocks"], cache.self_k, cache.self_v)
    else:
        xs = (dec["blocks"], cache.self_k, cache.self_v, cache.cross_k,
              cache.cross_v, cache.cross_k_scale, cache.cross_v_scale)
    x, (new_sk, new_sv) = jax.lax.scan(block, x, xs)
    x = _layer_norm(x, dec["ln_f_s"], dec["ln_f_b"])
    return x, cache._replace(self_k=new_sk, self_v=new_sv)


def _decoder_blocks_packed(
    params: Params,
    dims: WhisperDims,
    x: jax.Array,            # [B, 1, d]
    cache: KVCache,
    pos: jax.Array,          # scalar int32
    precision,
    cross_len: int,
    pad_count,
    int8_mxu: bool = False,
    mesh=None,
):
    """Single-token decoder step with BOTH caches head-packed: self
    attention + in-place cache update in one Pallas kernel per layer, cross
    attention in another; the packed caches ride the scan carry and are
    donated through the kernels (input_output_aliases)."""
    import functools as _ft

    from whisper_tpu.ops import cross_attention as _ca, self_attention as _sa

    int8_self = cache.self_k_scale is not None  # x7: int8 self cache
    if mesh is not None:
        cross_attend = _ft.partial(_ca.cross_attend_step_packed_sharded,
                                   mesh=mesh)

        def self_attend(q, kn, vn, kc, vc, li, pos, pads, interpret):
            return _sa.self_attend_step_packed_sharded(
                q, kn, vn, kc, vc, li, pos, pads, mesh=mesh,
                interpret=interpret)

        def self_attend_i8(q, kn, vn, kc, vc, ks, vs, li, pos, pads,
                           interpret):
            return _sa.self_attend_step_packed_int8_sharded(
                q, kn, vn, kc, vc, ks, vs, li, pos, pads, mesh=mesh,
                interpret=interpret)
    else:
        cross_attend = _ca.cross_attend_step_packed

        def self_attend(q, kn, vn, kc, vc, li, pos, pads, interpret):
            return _sa.self_attend_step_packed(
                q, kn, vn, kc, vc, li, pos, pads, interpret=interpret)

        def self_attend_i8(q, kn, vn, kc, vc, ks, vs, li, pos, pads,
                           interpret):
            return _sa.self_attend_step_packed_int8(
                q, kn, vn, kc, vc, ks, vs, li, pos, pads,
                interpret=interpret)

    dec = params["decoder"]
    h = dims.decoder_heads
    dh = dims.head_dim
    interp = jax.default_backend() != "tpu"
    b = x.shape[0]
    pads = (jnp.zeros((b,), jnp.int32) if pad_count is None
            else jnp.broadcast_to(jnp.asarray(pad_count, jnp.int32), (b,)))
    scale = jnp.asarray(dh, x.dtype) ** -0.5

    def block(carry, layer):
        x, sk_full, sv_full, ks_full, vs_full = carry
        li, p = layer
        # --- self-attention (packed kernel: attend + in-place KV write) ---
        r = _layer_norm(x, p["ln_s"], p["ln_b"])
        q = _split_heads(_dense(r, p["q_w"], p["q_b"], precision), h)
        k = _split_heads(_dense(r, p["k_w"], None, precision), h)
        v = _split_heads(_dense(r, p["v_w"], p["v_b"], precision), h)
        if int8_self:
            ctx, sk_full, sv_full, ks_full, vs_full = self_attend_i8(
                q[:, :, 0, :] * scale, k[:, :, 0, :], v[:, :, 0, :],
                sk_full, sv_full, ks_full, vs_full, li, pos, pads, interp,
            )
        else:
            ctx, sk_full, sv_full = self_attend(
                q[:, :, 0, :] * scale, k[:, :, 0, :], v[:, :, 0, :],
                sk_full, sv_full, li, pos, pads, interp,
            )
        x = x + _dense(_merge_heads(ctx[:, :, None, :]), p["o_w"], p["o_b"],
                       precision)

        # --- cross-attention (packed kernel) ---
        r = _layer_norm(x, p["x_ln_s"], p["x_ln_b"])
        q = _split_heads(_dense(r, p["xq_w"], p["xq_b"], precision), h)
        ctx = cross_attend(
            q[:, :, 0, :] * scale.astype(q.dtype),
            cache.cross_k, cache.cross_v,
            cache.cross_k_scale[:, :, :, 0, 0],
            cache.cross_v_scale[:, :, :, 0, 0],
            li, s_valid=cross_len, int8_mxu=int8_mxu, interpret=interp,
        )
        x = x + _dense(_merge_heads(ctx[:, :, None, :]), p["xo_w"],
                       p["xo_b"], precision)

        # --- MLP ---
        r = _layer_norm(x, p["mlp_ln_s"], p["mlp_ln_b"])
        r = jax.nn.gelu(_dense(r, p["fc1_w"], p["fc1_b"], precision),
                        approximate=False)
        x = x + _dense(r, p["fc2_w"], p["fc2_b"], precision)
        return (x, sk_full, sv_full, ks_full, vs_full), None

    xs = (jnp.arange(dims.decoder_layers, dtype=jnp.int32), dec["blocks"])
    (x, new_sk, new_sv, new_ks, new_vs), _ = jax.lax.scan(
        block,
        (x, cache.self_k, cache.self_v, cache.self_k_scale,
         cache.self_v_scale),
        xs,
    )
    x = _layer_norm(x, dec["ln_f_s"], dec["ln_f_b"])
    return x, cache._replace(self_k=new_sk, self_v=new_sv,
                             self_k_scale=new_ks, self_v_scale=new_vs)


def _attend_int8(q, k8, v8, k_scale, v_scale, precision):
    """Cross attention against int8-stored K/V with per-head scales.

    The int8->bf16 convert fuses into the dot's operand read (halving the
    HBM traffic of the decode loop's dominant stream); the scale is applied
    AFTER the dot, so the math matches dequant-then-attend up to fp
    rounding.  k_scale/v_scale: [B, H, 1, 1] fp32.
    """
    dh = q.shape[-1]
    q = q * jnp.asarray(dh, q.dtype) ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k8.astype(q.dtype),
                        precision=precision,
                        preferred_element_type=jnp.float32)
    scores = scores * k_scale
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v8.astype(q.dtype),
                     precision=precision,
                     preferred_element_type=jnp.float32)
    return (ctx * v_scale).astype(q.dtype)


def pack_cross_cache(cache: KVCache, transpose_k: bool = False) -> KVCache:
    """Repack the int8 cross K/V to the head-packed [L,B,H/2,S_pad,128]
    layout consumed by the decode-step kernel (ops/cross_attention.py).
    One-time relayout after prefill; detected downstream by V's lane width.

    transpose_k stores K as [L,B,H/2,128,S_pad] (sequence on lanes) for the
    int8-MXU kernel (x5): scores come out [2,S] so the in-kernel softmax
    runs at full lane utilization."""
    from whisper_tpu.ops.cross_attention import pack_cross_kv, pack_cross_kv_t

    pk = pack_cross_kv_t if transpose_k else pack_cross_kv
    return cache._replace(
        cross_k=pk(cache.cross_k),
        cross_v=pack_cross_kv(cache.cross_v),
    )


def quantize_cross_kv(cache: KVCache) -> KVCache:
    """Quantize the cross K/V to symmetric int8 with per-(L,B,H) scales."""
    def quant(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(3, 4),
                         keepdims=True)
        scale = jnp.maximum(absmax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
        return q.astype(jnp.int8), scale
    k8, ks = quant(cache.cross_k)
    v8, vs = quant(cache.cross_v)
    return cache._replace(cross_k=k8, cross_v=v8,
                          cross_k_scale=ks, cross_v_scale=vs)


def _logits(params, x, precision):
    """Tied output projection: x [B, S, d] @ tok_emb.T — computed in fp32.

    With int8 weights (x4), `tok_emb_q` holds the projection matrix [d, V]
    quantized per vocab column (the exported ONNX decoder's logits MatMul,
    which the reference's quantize_dynamic covers); the dequantize fuses
    into the operand read, halving the dominant 53 MB/step weight stream.
    """
    emb_q = params["decoder"].get("tok_emb_q")
    if emb_q is not None:
        w = emb_q.q.astype(x.dtype) * emb_q.s.astype(x.dtype)   # [d, V]
        return jnp.dot(x, w, precision=precision,
                       preferred_element_type=jnp.float32)
    emb = params["decoder"]["tok_emb"]
    return jnp.dot(x, emb.T, precision=precision,
                   preferred_element_type=jnp.float32)


def decoder_prefill(
    params: Params,
    dims: WhisperDims,
    tokens: jax.Array,        # [B, P] int32
    enc_states: jax.Array,    # [B, T_enc, d]
    max_len: int,
    *,
    precision=None,
    int8_cross_kv: bool = False,
    prompt_mask: Optional[jax.Array] = None,  # [B, P] bool; False = left pad
) -> tuple[jax.Array, KVCache]:
    """Full-prompt decoder pass; returns logits [B, P, V] and a cache whose
    self-KV holds positions [0, P) and whose cross-KV is final.

    int8_cross_kv stores the cross K/V int8 with per-head scales (the
    prefill itself attends through the same int8 path so prefill and steps
    see identical cross values).

    prompt_mask supports LEFT-padded fixed-size prompts (previous-text
    conditioning with a static shape): padded slots get position id 0, are
    never attended, and real tokens take position ids counted over real
    slots only — numerically identical to an unpadded shorter prompt."""
    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    b, p = tokens.shape
    h = dims.decoder_heads

    # Cross-attention KV, computed once from encoder states (the reference
    # gets these as `present.*.encoder.*` of the first decoder call).
    def cross_kv(_, pblk):
        k = _split_heads(_dense(enc_states.astype(dtype), pblk["xk_w"], None,
                                precision), h)
        v = _split_heads(_dense(enc_states.astype(dtype), pblk["xv_w"],
                                pblk["xv_b"], precision), h)
        return None, (k, v)

    _, (ck, cv) = jax.lax.scan(cross_kv, None, dec["blocks"])

    cache = init_cache(dims, b, max_len, enc_states.shape[1], dtype)
    cache = cache._replace(cross_k=ck, cross_v=cv)
    if int8_cross_kv:
        cache = quantize_cross_kv(cache)

    if prompt_mask is None:
        x = dec["tok_emb"][tokens] + dec["pos_embed"][:p].astype(dtype)
        # Causal within the prompt; nothing beyond position P exists yet.
        q_idx = jnp.arange(p)[:, None]
        k_idx = jnp.arange(max_len)[None, :]
        mask = k_idx <= q_idx  # [P, S_max]
    else:
        # Left-padded prompt: real token i gets position id (#real slots
        # before it); pad slots are position 0 and never attended.
        pos_ids = jnp.maximum(
            jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) - 1, 0
        )  # [B, P]
        x = dec["tok_emb"][tokens] + dec["pos_embed"][pos_ids].astype(dtype)
        q_idx = jnp.arange(p)[None, :, None]
        k_idx = jnp.arange(max_len)[None, None, :]
        causal = k_idx <= q_idx                            # [1, P, S_max]
        valid_k = jnp.concatenate(
            [prompt_mask, jnp.ones((b, max_len - p), bool)], axis=1
        )  # [B, S_max]
        mask = (causal & valid_k[:, None, :])[:, None]     # [B, 1, P, S_max]

    x, cache = _decoder_blocks(
        params, dims, x, cache, jnp.int32(0), mask, precision
    )
    return _logits(params, x, precision), cache


def decoder_alignment_weights(
    params: Params,
    dims: WhisperDims,
    tokens: jax.Array,        # [B, P] int32 (prompt + generated, padded)
    enc_states: jax.Array,    # [B, T_enc, d]
    *,
    precision=None,
) -> jax.Array:
    """Teacher-forced pass returning cross-attention probabilities
    [L, B, H, P, T_enc] — the raw material for word-level timestamp
    alignment (openai-whisper's find_alignment attention hooks; a
    capability the comparison SUT faster-whisper exposes,
    ref benchmark_faster_whisper.py:113-122, and the Rust SUT lacks)."""
    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    b, p = tokens.shape
    h = dims.decoder_heads
    x = dec["tok_emb"][tokens] + dec["pos_embed"][:p].astype(dtype)
    causal = jnp.tril(jnp.ones((p, p), dtype=bool))[None, None]

    def block(x, pblk):
        r = _layer_norm(x, pblk["ln_s"], pblk["ln_b"])
        q = _split_heads(_dense(r, pblk["q_w"], pblk["q_b"], precision), h)
        k = _split_heads(_dense(r, pblk["k_w"], None, precision), h)
        v = _split_heads(_dense(r, pblk["v_w"], pblk["v_b"], precision), h)
        o = _attend(q, k, v, causal, precision)
        x = x + _dense(_merge_heads(o), pblk["o_w"], pblk["o_b"], precision)

        r = _layer_norm(x, pblk["x_ln_s"], pblk["x_ln_b"])
        q = _split_heads(_dense(r, pblk["xq_w"], pblk["xq_b"], precision), h)
        ck = _split_heads(
            _dense(enc_states.astype(dtype), pblk["xk_w"], None, precision), h
        )
        cv = _split_heads(
            _dense(enc_states.astype(dtype), pblk["xv_w"], pblk["xv_b"],
                   precision), h
        )
        dh = q.shape[-1]
        qs = q * jnp.asarray(dh, q.dtype) ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", qs, ck, precision=precision,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), cv,
                       precision=precision, preferred_element_type=q.dtype)
        x = x + _dense(_merge_heads(o), pblk["xo_w"], pblk["xo_b"], precision)

        r = _layer_norm(x, pblk["mlp_ln_s"], pblk["mlp_ln_b"])
        r = jax.nn.gelu(_dense(r, pblk["fc1_w"], pblk["fc1_b"], precision),
                        approximate=False)
        x = x + _dense(r, pblk["fc2_w"], pblk["fc2_b"], precision)
        return x, probs

    _, probs = jax.lax.scan(block, x, dec["blocks"])
    return probs


def decoder_step(
    params: Params,
    dims: WhisperDims,
    token: jax.Array,         # [B] int32
    pos: jax.Array,           # int32 position of this token: scalar or [B]
    cache: KVCache,
    *,
    precision=None,
    pad_count: Optional[jax.Array] = None,  # [B] left-pad slots in the cache
    cross_len: Optional[int] = None,        # encoder length (packed cross)
    int8_mxu: bool = False,                 # int8xint8 MXU attention (x5)
    mesh=None,                              # Mesh for sharded packed kernels
) -> tuple[jax.Array, KVCache]:
    """One-token decoder pass against the static cache; logits [B, V].

    The on-device replacement for the reference's per-token
    decoder_with_past IoBinding run (src/main.rs:793-827). A vector `pos`
    gives each row its own position (batched speculative decoding).

    With pad_count set (left-padded conditioned prompts), `pos` remains the
    CACHE SLOT index while the position embedding uses pos - pad_count (the
    real sequence position) and the first pad_count slots are never
    attended — matching an unpadded shorter sequence exactly.
    """
    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    max_len = cache.self_k.shape[3]
    if pad_count is not None:
        pos_ids = pos - pad_count                         # [B] real positions
        pos_emb = dec["pos_embed"][pos_ids].astype(dtype)[:, None, :]
        mask = (
            (jnp.arange(max_len)[None, :] <= jnp.broadcast_to(
                pos, pad_count.shape)[:, None])
            & (jnp.arange(max_len)[None, :] >= pad_count[:, None])
        )[:, None, None, :]                               # [B, 1, 1, S_max]
    elif pos.ndim == 0:
        pos_emb = jax.lax.dynamic_slice_in_dim(
            dec["pos_embed"], pos, 1, axis=0
        ).astype(dtype)                                   # [1, d]
        mask = (jnp.arange(max_len) <= pos)[None, :]      # [1, S_max]
    else:
        pos_emb = dec["pos_embed"][pos].astype(dtype)[:, None, :]  # [B, 1, d]
        mask = (
            jnp.arange(max_len)[None, :] <= pos[:, None]
        )[:, None, None, :]                               # [B, 1, 1, S_max]
    x = dec["tok_emb"][token][:, None, :] + pos_emb

    x, cache = _decoder_blocks(params, dims, x, cache, pos, mask, precision,
                               cross_len=cross_len, pad_count=pad_count,
                               int8_mxu=int8_mxu, mesh=mesh)
    return _logits(params, x, precision)[:, 0, :], cache
