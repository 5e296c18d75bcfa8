"""Int8 weight quantization tests (analog of quantize_onnx_int8.py scope:
matmul weights only, per-channel)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.models.convert import init_params, load_params, save_params
from whisper_tpu.models.registry import get_dims
from whisper_tpu.variants.quant import (
    QTensor,
    dequantize,
    is_quantized,
    quantize_params,
    quantize_tensor,
)


class TestQuantizeTensor:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = rng.normal(0, 0.05, (4, 64, 128)).astype(np.float32)
        qt = quantize_tensor(w)
        assert qt.q.dtype == jnp.int8
        assert qt.s.shape == (4, 1, 128)
        back = np.asarray(dequantize(qt, jnp.float32))
        # per-channel symmetric: error <= scale/2 per element
        scale = np.asarray(qt.s)
        assert np.all(np.abs(back - w) <= scale / 2 + 1e-9)

    def test_scale_uses_column_absmax(self):
        w = np.zeros((2, 3), dtype=np.float32)
        w[0, 1] = 1.27
        qt = quantize_tensor(w)
        assert abs(float(qt.s[0, 1]) - 0.01) < 1e-6
        assert int(qt.q[0, 1]) == 127


class TestQuantizeParams:
    def test_scope_matches_reference(self):
        dims = get_dims("test/whisper-nano")
        params = quantize_params(init_params(dims))
        assert is_quantized(params)
        enc = params["encoder"]
        # matmul weights quantized
        assert isinstance(enc["blocks"]["q_w"], QTensor)
        assert isinstance(enc["blocks"]["fc2_w"], QTensor)
        assert isinstance(params["decoder"]["blocks"]["xk_w"], QTensor)
        # conv / embedding lookup / norms / biases stay fp
        assert not isinstance(enc["conv1_w"], QTensor)
        assert not isinstance(enc["blocks"]["q_b"], QTensor)
        assert not isinstance(params["decoder"]["tok_emb"], QTensor)
        assert not isinstance(enc["blocks"]["attn_ln_s"], QTensor)
        # The tied-embedding OUTPUT projection is a MatMul in the exported
        # ONNX decoder, so the reference's quantize_dynamic covers it:
        # stored as a quantized [d, V] projection alongside the fp lookup.
        assert isinstance(params["decoder"]["tok_emb_q"], QTensor)
        assert params["decoder"]["tok_emb_q"].q.shape == (
            params["decoder"]["tok_emb"].shape[1],
            params["decoder"]["tok_emb"].shape[0],
        )

    def test_quantized_logits_projection_close(self):
        from whisper_tpu.models import whisper

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=4)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 1, (1, 3, dims.d_model)), jnp.float32)
        want = np.asarray(whisper._logits(params, x, None))
        got = np.asarray(whisper._logits(quantize_params(params), x, None))
        assert np.abs(got - want).max() < 0.05
        assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999

    def test_forward_close_to_fp32(self):
        from whisper_tpu.models import whisper

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=2)
        rng = np.random.default_rng(1)
        mel = rng.normal(0, 1, (1, dims.n_mels, 200)).astype(np.float32)
        want = np.asarray(whisper.encoder_apply(params, dims, jnp.asarray(mel)))
        got = np.asarray(
            whisper.encoder_apply(quantize_params(params), dims, jnp.asarray(mel))
        )
        # int8 weights: small relative error, same shape/scale of outputs
        assert np.abs(got - want).max() < 0.12
        assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999

    def test_save_load_roundtrip(self, tmp_path):
        dims = get_dims("test/whisper-nano")
        params = quantize_params(init_params(dims))
        save_params(params, dims, str(tmp_path / "m"))
        loaded, dims2 = load_params(str(tmp_path / "m"))
        assert dims2 == dims
        qt = loaded["encoder"]["blocks"]["q_w"]
        assert isinstance(qt, QTensor)
        np.testing.assert_array_equal(
            np.asarray(qt.q), np.asarray(params["encoder"]["blocks"]["q_w"].q)
        )

    def test_quantize_model_dir_tool(self, tmp_path):
        from whisper_tpu.variants.quantize_int8 import quantize_model_dir

        dims = get_dims("test/whisper-nano")
        src = tmp_path / "model"
        save_params(init_params(dims), dims, str(src),
                    extra_config={"model_id": "test/whisper-nano"})
        (src / "generation_config.json").write_text('{"suppress_tokens": [1]}')
        out = quantize_model_dir(str(src))
        assert out == str(src) + "-int8"
        loaded, _ = load_params(out)
        assert is_quantized(loaded)
        assert os.path.isfile(os.path.join(out, "generation_config.json"))
        meta = json.load(open(os.path.join(out, "optimization_metadata.json")))
        assert meta["int8_weights"] is True


class TestSessionInt8:
    def test_int8_session_generates(self):
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
        from whisper_tpu.variants.ladder import apply_variant

        dims = get_dims("test/whisper-nano")
        cfg, spec = apply_variant(RuntimeCfg(max_batch=2), "int8")
        assert cfg.int8_weights and spec.name == "x4"
        sess = WhisperSession(init_params(dims, seed=3), dims, cfg)
        rng = np.random.default_rng(0)
        mel = rng.normal(0, 1, (2, dims.n_mels, 3000)).astype(np.float32)
        toks = sess.transcribe_chunks(mel, prompt=[3, 4], max_new_tokens=4,
                                      eot_id=2)
        assert toks.shape == (2, 4)


class TestInt8CrossKV:
    def test_prefill_logits_close_and_step_runs(self):
        import jax.numpy as jnp

        from whisper_tpu.models import whisper
        from whisper_tpu.runtime.generate import build_suppress_mask, greedy_generate

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=5)
        rng = np.random.default_rng(2)
        mel = rng.normal(0, 1, (2, dims.n_mels, 200)).astype(np.float32)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        toks = jnp.asarray([[3, 7], [5, 9]], dtype=jnp.int32)

        lg_bf, cache_bf = whisper.decoder_prefill(params, dims, toks, enc, 12)
        lg_i8, cache_i8 = whisper.decoder_prefill(
            params, dims, toks, enc, 12, int8_cross_kv=True
        )
        assert cache_i8.cross_k.dtype == jnp.int8
        assert cache_i8.cross_k_scale is not None
        # int8 cross-KV error only (logits scale ~ O(1) on the nano model)
        assert np.abs(np.asarray(lg_i8) - np.asarray(lg_bf)).max() < 0.1

        zero = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        out = greedy_generate(
            params, dims, enc, jnp.asarray([3], dtype=jnp.int32),
            zero, zero, max_new_tokens=4, eot_id=2, int8_cross_kv=True,
        )
        assert out.shape == (2, 4)

    def test_x4_variant_enables_kv_cache_flag(self):
        from whisper_tpu.runtime.session import RuntimeCfg
        from whisper_tpu.variants.ladder import apply_variant

        cfg, spec = apply_variant(RuntimeCfg(), "x4")
        assert cfg.int8_kv_cache is True
        cfg2, _ = apply_variant(RuntimeCfg(), "x2")
        assert cfg2.int8_kv_cache is False

    def test_beam_with_int8_kv(self):
        import jax.numpy as jnp

        from whisper_tpu.models import whisper
        from whisper_tpu.runtime.beam import beam_generate
        from whisper_tpu.runtime.generate import build_suppress_mask

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=6)
        rng = np.random.default_rng(3)
        mel = rng.normal(0, 1, (1, dims.n_mels, 200)).astype(np.float32)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        zero = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        toks, scores = beam_generate(
            params, dims, enc, jnp.asarray([3], dtype=jnp.int32),
            zero, zero, max_new_tokens=4, eot_id=2, num_beams=2,
            int8_cross_kv=True,
        )
        assert toks.shape == (1, 4)


class TestW8A8Encoder:
    """x6: dynamic per-row activation int8 + int8xint8 MXU encoder matmuls
    (models/whisper.py _dense int8_act path)."""

    def test_dense_w8a8_matches_dequant_reference(self):
        """The int8 dot with row/column scales must track the
        dequantize-then-matmul path within the activation-quantization
        noise bound (absmax/127 per row -> ~1% relative on sums)."""
        import jax.numpy as jnp

        from whisper_tpu.models.whisper import _dense
        from whisper_tpu.variants.quant import quantize_tensor

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (4, 96, 128)).astype(np.float32))
        w = rng.normal(0, 0.05, (128, 256)).astype(np.float32)
        b = jnp.asarray(rng.normal(0, 0.1, 256).astype(np.float32))
        qw = quantize_tensor(w)

        ref = np.asarray(_dense(x, qw, b, None))
        got = np.asarray(_dense(x, qw, b, None, int8_act=True))
        denom = np.abs(ref).mean()
        assert np.abs(got - ref).mean() / denom < 0.02

    def test_encoder_x6_close_to_x4(self):
        """Full encoder under W8A8 vs weight-only int8 at nano dims."""
        import jax.numpy as jnp

        from whisper_tpu.models.whisper import encoder_apply
        from whisper_tpu.variants.quant import quantize_params

        dims = get_dims("test/whisper-nano")
        params = quantize_params(init_params(dims, seed=0))
        rng = np.random.default_rng(1)
        mel = jnp.asarray(rng.normal(0, 1, (2, dims.n_mels, 3000))
                          .astype(np.float32))
        ref = np.asarray(encoder_apply(params, dims, mel))
        got = np.asarray(encoder_apply(params, dims, mel,
                                       int8_activations=True))
        denom = np.abs(ref).mean()
        assert np.abs(got - ref).mean() / denom < 0.05

    def test_x6_session_generates(self):
        import dataclasses

        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
        from whisper_tpu.variants.ladder import apply_variant

        dims = get_dims("test/whisper-nano")
        cfg, spec = apply_variant(RuntimeCfg(max_batch=2), "x6")
        assert spec.int8_encoder_act and cfg.int8_encoder_act
        # interpret-mode Pallas front/attention is slow on CPU and not
        # under test here
        cfg = dataclasses.replace(cfg, fused_frontend=False,
                                  fused_attention=False)
        sess = WhisperSession(init_params(dims, seed=0), dims, cfg)
        assert sess._enc_i8
        rng = np.random.default_rng(2)
        mel = rng.normal(0, 1, (2, dims.n_mels, 3000)).astype(np.float32)
        toks = sess.transcribe_chunks(mel, prompt=[1, 2, 3],
                                      max_new_tokens=4, eot_id=5)
        assert toks.shape == (2, 4)
