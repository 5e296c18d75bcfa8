"""int8-MXU self-attention decode step (x7): parity in interpret mode.

The kernel (ops/self_attention.py self_attend_step_packed_int8) holds the
decoder self cache int8-quantized per row with the K block transposed
(sequence on lanes).  Checks here:

  * quantize_pack_self layout round-trips losslessly (int8 values + scales);
  * the in-place cache insert lands the quantized new row exactly at `pos`
    in both the transposed K block and the V block, plus both scale planes;
  * the attention output matches an exact jnp simulation of the kernel's
    scale algebra (per-row dequant scores -> masked softmax -> v-scale fold
    -> probs requant -> int8 PV) to fp tolerance;
  * it stays near the fp32 reference attention (quantization error bound);
  * left-padding masks rows [0, pad) exactly like the bf16 packed kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.ops.self_attention import (
    LANES,
    PACK,
    _quant_rows,
    quantize_pack_self,
    self_attend_step_packed_int8,
)

L, B, H, DH, S = 2, 3, 4, 64, 19  # S_pad -> 32
G = H // PACK
S_PAD = 32


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    k = jnp.asarray(rng.normal(0, 1, (L, B, H, S, DH)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (L, B, H, S, DH)).astype(np.float32))
    q = jnp.asarray(rng.normal(0, 1, (B, H, DH)).astype(np.float32))
    kn = jnp.asarray(rng.normal(0, 1, (B, H, DH)).astype(np.float32))
    vn = jnp.asarray(rng.normal(0, 1, (B, H, DH)).astype(np.float32))
    return k, v, q * DH**-0.5, kn, vn


def _unpack_kv(x8):
    """[L,B,G,S_pad,128] head-packed -> [L,B,H,S_pad,64]."""
    y = np.asarray(x8)
    l, b, g, sp, _ = y.shape
    y = y.reshape(l, b, g, sp, PACK, DH)
    return np.swapaxes(y, 3, 4).reshape(l, b, g * PACK, sp, DH)


_unpack_k = _unpack_v = _unpack_kv


def _unpack_scale(sc):
    y = np.swapaxes(np.asarray(sc), 3, 4)         # [L,B,G,2,S_pad]
    l, b, g, p, sp = y.shape
    return y.reshape(l, b, g * p, sp)             # head h = 2g + j


def test_quantize_pack_roundtrip():
    k, v, *_ = _setup()
    kt8, v8, ks, vs = quantize_pack_self(k, v)
    assert kt8.shape == (L, B, G, S_PAD, LANES) and kt8.dtype == jnp.int8
    assert v8.shape == (L, B, G, S_PAD, LANES) and v8.dtype == jnp.int8
    assert ks.shape == vs.shape == (L, B, G, S_PAD, PACK)

    k8_want, ks_want = _quant_rows(k)
    v8_want, vs_want = _quant_rows(v)
    np.testing.assert_array_equal(_unpack_k(kt8)[:, :, :, :S], np.asarray(k8_want))
    np.testing.assert_array_equal(_unpack_v(v8)[:, :, :, :S], np.asarray(v8_want))
    np.testing.assert_allclose(_unpack_scale(ks)[..., :S], np.asarray(ks_want))
    np.testing.assert_allclose(_unpack_scale(vs)[..., :S], np.asarray(vs_want))
    # Dequantized values within the symmetric-int8 error bound.
    deq = _unpack_k(kt8)[:, :, :, :S] * _unpack_scale(ks)[..., :S, None]
    np.testing.assert_allclose(deq, np.asarray(k), atol=np.abs(k).max() / 127)


def _run_step(pos, pad=None, seed=0, layer=1):
    k, v, q, kn, vn = _setup(seed)
    kt8, v8, ks, vs = quantize_pack_self(k, v)
    out = self_attend_step_packed_int8(
        q, kn, vn, kt8, v8, ks, vs,
        jnp.int32(layer), jnp.int32(pos),
        None if pad is None else jnp.asarray(pad, jnp.int32),
        interpret=True,
    )
    return (k, v, q, kn, vn), (kt8, v8, ks, vs), out


def test_cache_insert_exact():
    pos = 7
    (_, _, _, kn, vn), _, (ctx, ko, vo, kso, vso) = _run_step(pos)
    kn8, kns = _quant_rows(kn)
    vn8, vns = _quant_rows(vn)
    layer = 1
    ku = _unpack_k(ko)
    vu = _unpack_v(vo)
    ksu = _unpack_scale(kso)
    vsu = _unpack_scale(vso)
    np.testing.assert_array_equal(ku[layer, :, :, pos], np.asarray(kn8))
    np.testing.assert_array_equal(vu[layer, :, :, pos], np.asarray(vn8))
    # In-kernel quantization computes the absmax via a masked full-row
    # reduction — 1-ulp fp32 differences vs _quant_rows' axis reduction.
    np.testing.assert_allclose(ksu[layer, :, :, pos], np.asarray(kns),
                               rtol=1e-6)
    np.testing.assert_allclose(vsu[layer, :, :, pos], np.asarray(vns),
                               rtol=1e-6)
    # Other layers and other positions untouched.
    (k, v, *_), (kt8, v8, ks, vs), _ = _run_step(pos)
    for arr_out, arr_in in ((ko, kt8), (vo, v8), (kso, ks), (vso, vs)):
        a, b_ = np.asarray(arr_out), np.asarray(arr_in)
        mask = np.ones_like(a, bool)
        mask[layer, :, :, pos, :] = False  # all planes are row-major now
        np.testing.assert_array_equal(a[mask], b_[mask])


def _simulate(k, v, q, kn, vn, pos, pad, layer):
    """Exact mirror of the kernel's scale algebra in plain jnp fp32."""
    k8, ksc = _quant_rows(k)
    v8, vsc = _quant_rows(v)
    q8, qs = _quant_rows(q)
    kn8, kns = _quant_rows(kn)
    vn8, vns = _quant_rows(vn)
    k8 = k8[layer].at[:, :, pos].set(kn8)          # [B,H,S,64]
    v8 = v8[layer].at[:, :, pos].set(vn8)
    ksc = ksc[layer].at[:, :, pos].set(kns)        # [B,H,S]
    vsc = vsc[layer].at[:, :, pos].set(vns)
    scores = jnp.einsum("bhd,bhsd->bhs", q8.astype(jnp.float32),
                        k8.astype(jnp.float32))
    scores = scores * qs[..., None] * ksc
    s_idx = jnp.arange(k.shape[3])
    valid = (s_idx[None, :] <= pos) & (s_idx[None, :] >= pad[:, None])
    scores = jnp.where(valid[:, None, :], scores,
                       jnp.finfo(jnp.float32).min)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e * vsc                                     # fold per-row V scales
    ps = jnp.maximum(jnp.max(jnp.abs(p), -1, keepdims=True), 1e-30) / 127.0
    p8 = jnp.round(p / ps)
    ctx = jnp.einsum("bhs,bhsd->bhd", p8, v8.astype(jnp.float32))
    return ctx * ps / denom


def test_ctx_matches_exact_simulation():
    pos, layer = 9, 0
    pad = np.zeros((B,), np.int32)
    (k, v, q, kn, vn), _, (ctx, *_rest) = _run_step(pos, layer=layer)
    want = _simulate(k, v, q, kn, vn, pos, jnp.asarray(pad), layer)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_ctx_close_to_fp32_reference():
    """Against true fp32 attention: bounded by int8 quantization error."""
    pos, layer = S - 1, 1
    (k, v, q, kn, vn), _, (ctx, *_r) = _run_step(pos, layer=layer)
    kf = k[layer].at[:, :, pos].set(kn)
    vf = v[layer].at[:, :, pos].set(vn)
    scores = jnp.einsum("bhd,bhsd->bhs", q, kf)
    s_idx = jnp.arange(S)
    scores = jnp.where(s_idx[None, None, :] <= pos, scores,
                       jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    want = jnp.einsum("bhs,bhsd->bhd", probs, vf)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(want),
                               atol=0.04, rtol=0)


def test_left_pad_masks_history():
    """Rows [0, pad) must receive zero attention mass."""
    pos = 12
    pad = np.asarray([0, 4, 9], np.int32)
    (k, v, q, kn, vn), _, (ctx, *_r) = _run_step(pos, pad=pad, layer=0)
    want = _simulate(k, v, q, kn, vn, pos, jnp.asarray(pad), 0)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    # Poison the padded rows: output must not change.
    big_v = v.at[0, 1, :, :4].set(1e6).at[0, 2, :, :9].set(1e6)
    big_k = k.at[0, 1, :, :4].set(50.0).at[0, 2, :, :9].set(50.0)
    kt8, v8, ks, vs = quantize_pack_self(big_k, big_v)
    ctx2, *_ = self_attend_step_packed_int8(
        q, kn, vn, kt8, v8, ks, vs, jnp.int32(0), jnp.int32(pos),
        jnp.asarray(pad, jnp.int32), interpret=True,
    )
    # Rows with pad=0 are identical; padded rows see requantized-probs
    # noise only through their own (unpoisoned) valid rows.
    np.testing.assert_allclose(np.asarray(ctx2), np.asarray(ctx),
                               atol=0.08, rtol=0)


def test_sharded_wrapper_matches_single():
    from jax.sharding import Mesh

    from whisper_tpu.ops.self_attention import (
        self_attend_step_packed_int8_sharded,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    devs = np.array(jax.devices()[:2]).reshape(2, 1)
    mesh = Mesh(devs, ("data", "model"))
    pos = 5
    (k, v, q, kn, vn), (kt8, v8, ks, vs), want = _run_step(pos, layer=1)
    # B=3 doesn't divide 2 -> use batch 2 slices.
    sl = lambda x, ax: jnp.take(x, jnp.arange(2), axis=ax)
    got = self_attend_step_packed_int8_sharded(
        sl(q, 0), sl(kn, 0), sl(vn, 0), sl(kt8, 1), sl(v8, 1),
        sl(ks, 1), sl(vs, 1), jnp.int32(1), jnp.int32(pos), None,
        mesh=mesh, interpret=True,
    )
    for g, w, ax in zip(got, [x for x in want], [0, 1, 1, 1, 1]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(sl(w, ax)),
                                   atol=1e-6, rtol=1e-6)


# ---------------------------------------------------------------------------
# End-to-end x7 wiring
# ---------------------------------------------------------------------------

def test_x7_greedy_chain_matches_x5():
    """Greedy chains with the int8 self cache match the x5 packed path at
    toy scale (self-KV quantization noise far below argmax margins)."""
    from whisper_tpu.models import whisper
    from whisper_tpu.models.convert import init_params
    from whisper_tpu.models.registry import WhisperDims
    from whisper_tpu.runtime.generate import build_suppress_mask, greedy_generate

    dims = WhisperDims(
        n_mels=80, d_model=128, encoder_layers=2, encoder_heads=2,
        decoder_layers=2, decoder_heads=2, vocab_size=256,
        max_source_positions=96, max_target_positions=32,
    )
    params = init_params(dims, seed=3)
    rng = np.random.default_rng(1)
    mel = rng.normal(0, 1, (3, dims.n_mels, 2 * dims.max_source_positions))
    enc = whisper.encoder_apply(params, dims, jnp.asarray(mel, jnp.float32))
    mask = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
    prompt = jnp.asarray([3, 5], dtype=jnp.int32)
    common = dict(
        max_new_tokens=10, eot_id=2, int8_cross_kv=True, packed_cross=True,
        int8_mxu=True,
    )
    want = np.asarray(greedy_generate(
        params, dims, enc, prompt, mask, mask, **common))
    got = np.asarray(greedy_generate(
        params, dims, enc, prompt, mask, mask, int8_self=True, **common))
    np.testing.assert_array_equal(got, want)


def test_ladder_x7_spec():
    from whisper_tpu.runtime.session import RuntimeCfg
    from whisper_tpu.variants.ladder import apply_variant

    cfg, spec = apply_variant(RuntimeCfg(), "x7")
    assert spec.int8_self_kv and spec.int8_mxu_attn and spec.packed_cross_kv
    assert cfg.int8_self_kv and cfg.int8_mxu_attn
    # x5 must NOT enable it (the flag is the only delta).
    cfg5, spec5 = apply_variant(RuntimeCfg(), "x5")
    assert not spec5.int8_self_kv and not cfg5.int8_self_kv


def test_session_x7_matches_x5():
    """x7 session end-to-end vs the x5 session (head_dim=64 toy model)."""
    import dataclasses

    from whisper_tpu.models.convert import init_params
    from whisper_tpu.models.registry import WhisperDims
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.variants.ladder import apply_variant

    dims = WhisperDims(
        n_mels=80, d_model=128, encoder_layers=2, encoder_heads=2,
        decoder_layers=2, decoder_heads=2, vocab_size=256,
        max_source_positions=1500, max_target_positions=32,
    )
    params = init_params(dims, seed=5)
    rng = np.random.default_rng(2)
    mel = np.zeros((2, dims.n_mels, 3000), dtype=np.float32)
    mel[:, :, :192] = rng.normal(0, 1, (2, dims.n_mels, 192))

    def run(variant):
        cfg, _ = apply_variant(RuntimeCfg(max_batch=2), variant)
        cfg = dataclasses.replace(cfg, fused_frontend=False,
                                  fused_attention=False,
                                  fused_encoder_mlp=False)
        sess = WhisperSession(params, dims, cfg)
        if variant == "x7":
            assert sess._int8_self
        return sess.transcribe_chunks(mel, prompt=[3], max_new_tokens=6,
                                      eot_id=2)

    np.testing.assert_array_equal(run("x7"), run("x5"))
