"""Converter round-trip tests incl. asymmetric encoder/decoder depths
(large-v3-turbo / distil style) and the converter CLI."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from whisper_tpu.models import convert, whisper  # noqa: E402
from whisper_tpu.models.registry import dims_from_hf_config  # noqa: E402


@pytest.fixture(scope="module")
def turbo_like():
    """Asymmetric config: deep encoder, 2-layer decoder (distil-style)."""
    cfg = transformers.WhisperConfig(
        vocab_size=400, num_mel_bins=80, d_model=64,
        encoder_layers=4, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=100, max_target_positions=48,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3,
    )
    torch.manual_seed(5)
    model = transformers.WhisperForConditionalGeneration(cfg).eval()
    dims = dims_from_hf_config(cfg)
    params = convert.cast_params(
        convert.params_from_hf_state_dict(model.state_dict(), dims),
        jnp.float32,
    )
    return model, dims, params


class TestAsymmetricDepths:
    def test_logits_parity(self, turbo_like):
        model, dims, params = turbo_like
        assert dims.encoder_layers == 4 and dims.decoder_layers == 2
        rng = np.random.default_rng(0)
        mel = rng.normal(0, 1, (1, 80, 200)).astype(np.float32)
        toks = np.array([[3, 10, 20]], dtype=np.int32)
        with torch.no_grad():
            want = model(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.from_numpy(toks.astype(np.int64)),
            ).logits.numpy()
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        got, _ = whisper.decoder_prefill(
            params, dims, jnp.asarray(toks), enc, max_len=8
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=0)


class TestConverterCli:
    def test_hf_dir_to_model_dir(self, turbo_like, tmp_path):
        model, dims, _ = turbo_like
        hf_dir = tmp_path / "hf"
        model.save_pretrained(str(hf_dir), safe_serialization=True)
        (hf_dir / "tokenizer.json").write_text('{"model": {"vocab": {}}}')

        from whisper_tpu.models.convert_cli import main

        out = tmp_path / "model"
        rc = main(["--hf-dir", str(hf_dir), "--out-dir", str(out),
                   "--model-id", "test/turbo-like", "--int8"])
        assert rc == 0
        params, dims2 = convert.load_params(str(out))
        assert dims2 == dims
        # Value-exactness through the disk roundtrip, not just shapes:
        # numpy 2.x np.stack over transposed views yields non-contiguous
        # arrays and safetensors 0.8.0 silently permutes those on save —
        # save_params must make leaves contiguous.
        want = convert.params_from_hf_state_dict(model.state_dict(), dims)
        got_fc1 = np.asarray(params["encoder"]["blocks"]["fc1_w"])
        np.testing.assert_array_equal(got_fc1, np.asarray(want["encoder"]["blocks"]["fc1_w"]))
        got_q = np.asarray(params["decoder"]["blocks"]["q_w"])
        np.testing.assert_array_equal(got_q, np.asarray(want["decoder"]["blocks"]["q_w"]))
        assert os.path.isfile(out / "tokenizer.json")
        cfgj = json.load(open(out / "config.json"))
        assert cfgj["model_id"] == "test/turbo-like"
        # int8 copy exists and is quantized
        from whisper_tpu.variants.quant import is_quantized

        qparams, _ = convert.load_params(str(out) + "-int8")
        assert is_quantized(qparams)


class TestTurboConfigGeneration:
    def test_turbo_style_greedy_runs(self, turbo_like):
        """4-enc/2-dec asymmetric model through the full generate path."""
        import jax.numpy as jnp

        from whisper_tpu.runtime.generate import (
            build_suppress_mask,
            greedy_generate,
        )

        _, dims, params = turbo_like
        rng = np.random.default_rng(0)
        mel = rng.normal(0, 1, (2, dims.n_mels, 200)).astype(np.float32)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        zero = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        toks = greedy_generate(
            params, dims, enc, jnp.asarray([3], dtype=jnp.int32),
            zero, zero, max_new_tokens=5, eot_id=2,
        )
        assert toks.shape == (2, 5)


class TestOrbaxFormat:
    def test_orbax_save_load_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from whisper_tpu.models.convert import (
            init_params,
            load_params_orbax,
            save_params_orbax,
        )
        from whisper_tpu.models.registry import get_dims

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=7)
        save_params_orbax(params, dims, str(tmp_path / "m"))
        loaded, dims2 = load_params_orbax(str(tmp_path / "m"))
        assert dims2 == dims
        a = np.asarray(params["decoder"]["tok_emb"])
        b = np.asarray(loaded["decoder"]["tok_emb"])
        np.testing.assert_array_equal(a, b)

    def test_orbax_sharded_restore(self, tmp_path):
        """Pod-style loading (ROADMAP §11): each leaf restores DIRECTLY
        onto its mesh devices with the TP sharding rules — values equal
        the unsharded checkpoint, spec follows the rules."""
        pytest.importorskip("orbax.checkpoint")
        import jax
        from jax.sharding import PartitionSpec as P

        from whisper_tpu.models.convert import (
            init_params,
            load_params_orbax,
            save_params_orbax,
        )
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.parallel.mesh import make_mesh, param_shardings

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=8)
        save_params_orbax(params, dims, str(tmp_path / "m"))

        mesh = make_mesh(len(jax.devices()), model_parallel=2)
        sh = param_shardings(params, mesh)
        loaded, dims2 = load_params_orbax(str(tmp_path / "m"), shardings=sh)
        assert dims2 == dims
        w = loaded["decoder"]["blocks"]["fc1_w"]
        assert w.sharding.spec == P(None, None, "model")
        np.testing.assert_array_equal(
            np.asarray(w), np.asarray(params["decoder"]["blocks"]["fc1_w"])
        )
        assert loaded["decoder"]["tok_emb"].sharding.spec == P()
