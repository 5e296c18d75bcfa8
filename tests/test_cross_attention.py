"""Head-packed decode cross-attention kernel: parity vs the XLA int8 path.

The kernel (ops/cross_attention.py) must reproduce models/whisper's
_attend_int8 semantics exactly up to fp accumulation order; the pack/unpack
relayout must be lossless.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.models import whisper
from whisper_tpu.models.convert import init_params
from whisper_tpu.models.registry import WhisperDims
from whisper_tpu.ops.cross_attention import pack_cross_kv
from whisper_tpu.runtime.generate import build_suppress_mask, greedy_generate

DIMS = WhisperDims(
    n_mels=80, d_model=128, encoder_layers=2, encoder_heads=2,
    decoder_layers=2, decoder_heads=2, vocab_size=256,
    max_source_positions=96, max_target_positions=32,
)  # head_dim = 64 -> one packed head pair per layer


def test_pack_roundtrip_lossless():
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (2, 3, 4, 50, 64), dtype=np.int8)
    packed = np.asarray(pack_cross_kv(jnp.asarray(x)))
    l, b, g, s_pad, lanes = packed.shape
    assert (g, lanes) == (2, 128) and s_pad % 32 == 0
    unpacked = packed.reshape(l, b, g, s_pad, 2, 64)[:, :, :, :50]
    unpacked = np.swapaxes(unpacked, 3, 4).reshape(l, b, 4, 50, 64)
    np.testing.assert_array_equal(unpacked, x)
    # Padding rows are zero.
    assert not packed[:, :, :, 50:, :].any()


@pytest.fixture(scope="module")
def setup():
    params = init_params(DIMS, seed=3)
    rng = np.random.default_rng(1)
    mel = rng.normal(0, 1, (3, DIMS.n_mels, 2 * DIMS.max_source_positions))
    enc = whisper.encoder_apply(params, DIMS, jnp.asarray(mel, jnp.float32))
    return params, enc


def test_packed_step_logits_match_xla_int8(setup):
    """decoder_step over the packed cache (Pallas kernel, interpret on CPU)
    vs the unpacked _attend_int8 path — logits equal to fp tolerance."""
    params, enc = setup
    prompt = jnp.asarray([[3, 5], [7, 9], [2, 4]], dtype=jnp.int32)
    logits, cache = whisper.decoder_prefill(
        params, DIMS, prompt, enc, max_len=12, int8_cross_kv=True
    )
    packed = whisper.pack_cross_cache(cache)

    tok = jnp.asarray([10, 11, 12], dtype=jnp.int32)
    want, _ = whisper.decoder_step(params, DIMS, tok, jnp.int32(2), cache)
    got, _ = whisper.decoder_step(
        params, DIMS, tok, jnp.int32(2), packed,
        cross_len=DIMS.max_source_positions,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-3, rtol=0
    )


def test_packed_greedy_chain_matches_unpacked(setup):
    params, enc = setup
    mask = jnp.asarray(build_suppress_mask(DIMS.vocab_size, []))
    prompt = jnp.asarray([3, 5], dtype=jnp.int32)
    want = np.asarray(greedy_generate(
        params, DIMS, enc, prompt, mask, mask,
        max_new_tokens=10, eot_id=2, int8_cross_kv=True,
    ))
    got = np.asarray(greedy_generate(
        params, DIMS, enc, prompt, mask, mask,
        max_new_tokens=10, eot_id=2, int8_cross_kv=True, packed_cross=True,
    ))
    np.testing.assert_array_equal(got, want)


def test_packed_greedy_with_left_padded_prompt(setup):
    """Fully-packed step (self+cross kernels) under previous-text
    conditioning: a left-padded prompt with pad_count must decode exactly
    like the unpacked int8 path given the same padding."""
    params, enc = setup
    mask = jnp.asarray(build_suppress_mask(DIMS.vocab_size, []))
    prompt = jnp.asarray([0, 0, 0, 7, 11, 3, 5], dtype=jnp.int32)
    pads = jnp.asarray([3, 3, 3], dtype=jnp.int32)
    want = np.asarray(greedy_generate(
        params, DIMS, enc, prompt, mask, mask,
        max_new_tokens=8, eot_id=2, int8_cross_kv=True, pad_count=pads,
    ))
    got = np.asarray(greedy_generate(
        params, DIMS, enc, prompt, mask, mask,
        max_new_tokens=8, eot_id=2, int8_cross_kv=True, pad_count=pads,
        packed_cross=True,
    ))
    np.testing.assert_array_equal(got, want)


def test_beam_packed_matches_unpacked(setup):
    """Beam search over the packed cross cache (per-beam tiling + the
    self-only beam regather) must reproduce the unpacked int8 beams."""
    from whisper_tpu.runtime.beam import beam_generate

    params, enc = setup
    mask = jnp.asarray(build_suppress_mask(DIMS.vocab_size, []))
    prompt = jnp.asarray([3, 5], dtype=jnp.int32)
    want, ws = beam_generate(
        params, DIMS, enc, prompt, mask, mask,
        max_new_tokens=8, eot_id=2, num_beams=3, int8_cross_kv=True,
    )
    got, gs = beam_generate(
        params, DIMS, enc, prompt, mask, mask,
        max_new_tokens=8, eot_id=2, num_beams=3, int8_cross_kv=True,
        packed_cross=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), atol=1e-4)


def test_pack_transposed_roundtrip():
    from whisper_tpu.ops.cross_attention import pack_cross_kv_t

    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (2, 3, 4, 50, 64), dtype=np.int8)
    pt = np.asarray(pack_cross_kv_t(jnp.asarray(x)))
    assert pt.shape[3] == 128  # [L, B, G, 128, S_pad]
    np.testing.assert_array_equal(
        np.swapaxes(pt, 3, 4), np.asarray(pack_cross_kv(jnp.asarray(x)))
    )


def test_int8_mxu_step_close_to_fp32_dequant(setup):
    """x5 kernel (int8 MXU dots: quantized q + 7-bit probs) vs the
    fp32-dequant packed path: same argmax chain, logits close.  The probs
    quantization bounds the cross-attention output error at ~0.5/127 per
    softmax mass unit; downstream LayerNorms keep logits within ~5%."""
    params, enc = setup
    prompt = jnp.asarray([[3, 5], [7, 9], [2, 4]], dtype=jnp.int32)
    _, cache = whisper.decoder_prefill(
        params, DIMS, prompt, enc, max_len=12, int8_cross_kv=True
    )
    packed = whisper.pack_cross_cache(cache)
    packed_t = whisper.pack_cross_cache(cache, transpose_k=True)
    tok = jnp.asarray([10, 11, 12], dtype=jnp.int32)
    want, _ = whisper.decoder_step(
        params, DIMS, tok, jnp.int32(2), packed,
        cross_len=DIMS.max_source_positions,
    )
    got, _ = whisper.decoder_step(
        params, DIMS, tok, jnp.int32(2), packed_t,
        cross_len=DIMS.max_source_positions, int8_mxu=True,
    )
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    assert np.argmax(g, -1).tolist() == np.argmax(w, -1).tolist()
    np.testing.assert_allclose(g, w, atol=0.05 * np.abs(w).max(), rtol=0)


def test_int8_mxu_greedy_chain_matches(setup):
    """Greedy chains under the x5 kernel match the x4 packed path at toy
    scale (quantization noise far below the argmax margins here)."""
    params, enc = setup
    mask = jnp.asarray(build_suppress_mask(DIMS.vocab_size, []))
    prompt = jnp.asarray([3, 5], dtype=jnp.int32)
    want = np.asarray(greedy_generate(
        params, DIMS, enc, prompt, mask, mask,
        max_new_tokens=10, eot_id=2, int8_cross_kv=True, packed_cross=True,
    ))
    got = np.asarray(greedy_generate(
        params, DIMS, enc, prompt, mask, mask,
        max_new_tokens=10, eot_id=2, int8_cross_kv=True, packed_cross=True,
        int8_mxu=True,
    ))
    np.testing.assert_array_equal(got, want)


def test_ladder_x5_spec():
    from whisper_tpu.runtime.session import RuntimeCfg
    from whisper_tpu.variants.ladder import apply_variant

    cfg, spec = apply_variant(RuntimeCfg(), "x5")
    assert spec.int8_mxu_attn and spec.packed_cross_kv and spec.int8_kv_cache
    assert cfg.int8_mxu_attn and cfg.packed_cross_kv


def test_session_x4_with_packed_kernel():
    """The x4 session path end-to-end with the packed kernel enabled
    (head_dim=64 model) — runs and matches the unpacked session."""
    import dataclasses

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

    cfg4, _ = apply_variant(RuntimeCfg(max_batch=2), "x4")
    # fused_frontend/attention off: not the subject here, and interpret-mode
    # encoder attention at this size is slow on CPU.
    cfg4 = dataclasses.replace(cfg4, fused_frontend=False,
                               fused_attention=False)
    assert cfg4.packed_cross_kv
    sess = WhisperSession(params, dims, cfg4)
    assert sess._packed_cross
    toks = sess.transcribe_chunks(mel, prompt=[3], max_new_tokens=6, eot_id=2)

    cfg_plain = dataclasses.replace(cfg4, packed_cross_kv=False)
    sess2 = WhisperSession(params, dims, cfg_plain)
    assert not sess2._packed_cross
    want = sess2.transcribe_chunks(mel, prompt=[3], max_new_tokens=6,
                                   eot_id=2)
    np.testing.assert_array_equal(toks, want)


class TestMultiQueryKernel:
    """cross_attend_multi_packed (the speculative verify pass's kernel):
    each query row must reproduce the single-token kernel's output exactly
    — same per-query math, the KV block just streams once for all T
    queries (runtime/speculative.py)."""

    @pytest.fixture(scope="class")
    def packed_cache(self):
        params = init_params(DIMS, seed=3)
        rng = np.random.default_rng(1)
        mel = rng.normal(0, 1, (3, DIMS.n_mels, 2 * DIMS.max_source_positions))
        enc = whisper.encoder_apply(params, DIMS, jnp.asarray(mel, jnp.float32))
        prompt = jnp.asarray([[3, 5], [7, 9], [2, 4]], dtype=jnp.int32)
        _, cache = whisper.decoder_prefill(
            params, DIMS, prompt, enc, max_len=12, int8_cross_kv=True
        )
        return cache

    @pytest.mark.parametrize("mxu", [False, True])
    def test_per_query_matches_single_token_kernel(self, packed_cache, mxu):
        from whisper_tpu.ops.cross_attention import (
            cross_attend_multi_packed,
            cross_attend_step_packed,
        )

        packed = whisper.pack_cross_cache(packed_cache, transpose_k=mxu)
        ks = packed.cross_k_scale[:, :, :, 0, 0]
        vs = packed.cross_v_scale[:, :, :, 0, 0]
        rng = np.random.default_rng(7)
        b, t, h, dh = 3, 4, DIMS.decoder_heads, 64
        q = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
        s_valid = DIMS.max_source_positions

        for layer in range(DIMS.decoder_layers):
            li = jnp.int32(layer)
            multi = np.asarray(cross_attend_multi_packed(
                q, packed.cross_k, packed.cross_v, ks, vs, li,
                s_valid=s_valid, int8_mxu=mxu, interpret=True,
            ))  # [B, T, H, 64]
            for tt in range(t):
                single = np.asarray(cross_attend_step_packed(
                    q[:, tt], packed.cross_k, packed.cross_v, ks, vs, li,
                    s_valid=s_valid, int8_mxu=mxu, interpret=True,
                ))  # [B, H, 64]
                np.testing.assert_array_equal(multi[:, tt], single)

    @pytest.mark.parametrize("mxu", [False, True])
    def test_multi_query_matches_xla_int8(self, packed_cache, mxu):
        """And against the reference _attend_int8 math (fp tolerance: the
        mxu variant carries ~7-bit probs, like the single-token pin in
        test_int8_mxu_step_close_to_fp32_dequant)."""
        from whisper_tpu.ops.cross_attention import cross_attend_multi_packed

        cache = packed_cache
        packed = whisper.pack_cross_cache(cache, transpose_k=mxu)
        ks = packed.cross_k_scale[:, :, :, 0, 0]
        vs = packed.cross_v_scale[:, :, :, 0, 0]
        rng = np.random.default_rng(8)
        b, t, h, dh = 3, 5, DIMS.decoder_heads, 64
        q = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
        s_valid = DIMS.max_source_positions

        li = jnp.int32(1)
        got = np.asarray(cross_attend_multi_packed(
            q * dh ** -0.5, packed.cross_k, packed.cross_v, ks, vs, li,
            s_valid=s_valid, int8_mxu=mxu, interpret=True,
        ))  # [B, T, H, 64]
        # _attend_int8 wants q [B, H, T, Dh] (scales itself by dh^-0.5).
        want = np.asarray(whisper._attend_int8(
            jnp.swapaxes(q, 1, 2), cache.cross_k[1], cache.cross_v[1],
            cache.cross_k_scale[1], cache.cross_v_scale[1], None,
        ))  # [B, H, T, 64]
        atol = 2e-2 if mxu else 2e-3
        np.testing.assert_allclose(
            got, np.swapaxes(want, 1, 2), atol=atol, rtol=0
        )
