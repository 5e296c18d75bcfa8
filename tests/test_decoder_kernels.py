"""Fused decoder-step kernels vs the reference jnp decoder_step
(interpret mode on the CPU mesh; same kernels compile on TPU).

The kernels under test are the ARCHIVED time-major experiment
(ops/decoder_kernels.py status header) — parity coverage is kept but runs
only with `pytest -m slow`."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from whisper_tpu.models import whisper
from whisper_tpu.models.convert import init_params
from whisper_tpu.models.registry import get_dims
from whisper_tpu.ops.decoder_kernels import (
    build_step_weights,
    cache_to_time_major,
    decoder_step_fused,
)


def _fused(params, sw, dims, tok, pos, cache):
    """Adapter: KVCache -> time-major fused step -> logits + new tm caches."""
    tm_k = cache_to_time_major(cache.self_k)
    tm_v = cache_to_time_major(cache.self_v)
    logits, tm_k, tm_v = decoder_step_fused(
        params, sw, dims, tok, pos, tm_k, tm_v,
        cache.cross_k, cache.cross_v, interpret=True,
    )
    from whisper_tpu.ops.decoder_kernels import cache_from_time_major

    return logits, cache._replace(
        self_k=cache_from_time_major(tm_k, dims.decoder_heads),
        self_v=cache_from_time_major(tm_v, dims.decoder_heads),
    )


@pytest.fixture(scope="module")
def setup():
    dims = get_dims("test/whisper-nano")
    params = init_params(dims, seed=3)
    rng = np.random.default_rng(0)
    b = 4
    enc = jnp.asarray(rng.normal(0, 1, (b, 96, dims.d_model)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, dims.vocab_size, (b, 3)), dtype=jnp.int32)
    _, cache = whisper.decoder_prefill(params, dims, toks, enc, max_len=10)
    sw = build_step_weights(params, dims)
    return dims, params, sw, cache, b


def test_single_step_parity(setup):
    dims, params, sw, cache, b = setup
    tok = jnp.asarray([5, 9, 1, 30], dtype=jnp.int32)
    want_logits, want_cache = whisper.decoder_step(
        params, dims, tok, jnp.int32(3), cache
    )
    got_logits, got_cache = _fused(params, sw, dims, tok, jnp.int32(3), cache)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(want_logits), atol=2e-4, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(got_cache.self_k), np.asarray(want_cache.self_k),
        atol=2e-5, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(got_cache.self_v), np.asarray(want_cache.self_v),
        atol=2e-5, rtol=0,
    )


def test_multi_step_chain_parity(setup):
    """Three chained fused steps must track the jnp implementation —
    catches cache-aliasing bugs that a single step would hide."""
    dims, params, sw, cache, b = setup
    cache_a = cache
    cache_b = cache
    tok = jnp.asarray([2, 4, 6, 8], dtype=jnp.int32)
    for i in range(3):
        la, cache_a = whisper.decoder_step(
            params, dims, tok, jnp.int32(3 + i), cache_a
        )
        lb, cache_b = _fused(params, sw, dims, tok, jnp.int32(3 + i), cache_b)
        np.testing.assert_allclose(
            np.asarray(lb), np.asarray(la), atol=3e-4, rtol=0
        )
        tok = jnp.argmax(la, axis=-1).astype(jnp.int32)


def test_int8_weights_dequantized_once(setup):
    dims, params, _, cache, b = setup
    from whisper_tpu.variants.quant import quantize_params

    qparams = quantize_params(params)
    sw = build_step_weights(qparams, dims)
    assert sw["qkv_w"].dtype == params["decoder"]["tok_emb"].dtype
    tok = jnp.asarray([1, 2, 3, 4], dtype=jnp.int32)
    logits, _ = _fused(qparams, sw, dims, tok, jnp.int32(3), cache)
    want, _ = whisper.decoder_step(params, dims, tok, jnp.int32(3), cache)
    # int8 quantization error only
    assert np.abs(np.asarray(logits) - np.asarray(want)).max() < 0.5


class TestHybridStep:
    """Hybrid fused step (fused QKV + Pallas MLP + XLA attention) — the
    production fast path for bf16 rungs (x3/x4)."""

    def test_greedy_parity_hybrid_vs_plain(self, setup):
        import jax.numpy as jnp

        from whisper_tpu.runtime.generate import (
            build_suppress_mask,
            greedy_generate,
        )

        dims, params, sw, cache, b = setup
        rng = np.random.default_rng(7)
        enc = jnp.asarray(
            rng.normal(0, 1, (2, 96, dims.d_model)).astype(np.float32)
        )
        prompt = jnp.asarray([3, 5], dtype=jnp.int32)
        zero = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        plain = np.asarray(greedy_generate(
            params, dims, enc, prompt, zero, zero,
            max_new_tokens=6, eot_id=2,
        ))
        hybrid = np.asarray(greedy_generate(
            params, dims, enc, prompt, zero, zero,
            max_new_tokens=6, eot_id=2, step_weights=sw,
        ))
        np.testing.assert_array_equal(hybrid, plain)

    def test_session_opt_in_builds_step_weights(self):
        """fused_decoder_step is opt-in (off in the ladder — see DESIGN.md
        trace verdict); the session must build and use the pre-fused
        weights when enabled."""
        import dataclasses

        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
        from whisper_tpu.variants.ladder import apply_variant

        dims = get_dims("test/whisper-nano")
        cfg, _ = apply_variant(RuntimeCfg(max_batch=2), "x3")
        assert not cfg.fused_decoder_step  # off by default
        cfg = dataclasses.replace(cfg, fused_decoder_step=True)
        sess = WhisperSession(init_params(dims, seed=1), dims, cfg)
        assert sess._step_weights is not None
        rng = np.random.default_rng(0)
        mel = rng.normal(0, 1, (2, dims.n_mels, 3000)).astype(np.float32)
        toks = sess.transcribe_chunks(mel, prompt=[3], max_new_tokens=4,
                                      eot_id=2)
        assert toks.shape == (2, 4)
