"""Numerical parity of the JAX Whisper vs transformers' torch implementation.

The reference's correctness bar is matching the ONNX graphs exported from
transformers (SURVEY.md §7 "token parity vs ORT fp32"); onnxruntime is not
available in this environment, but the torch model the ONNX graphs are
exported from is — so fp32 parity against torch WhisperForConditionalGeneration
on random weights validates the same contract.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from whisper_tpu.models import convert, whisper  # noqa: E402
from whisper_tpu.models.registry import dims_from_hf_config  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.WhisperConfig(
        vocab_size=1000,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=150,  # 3 s context for fast tests
        max_target_positions=64,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(cfg).eval()
    dims = dims_from_hf_config(cfg)
    params = convert.cast_params(
        convert.params_from_hf_state_dict(model.state_dict(), dims), jnp.float32
    )
    return model, dims, params


def _mel(dims, n_frames, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, (2, dims.n_mels, n_frames)).astype(np.float32)


class TestEncoderParity:
    def test_encoder_hidden_states(self, tiny):
        model, dims, params = tiny
        mel = _mel(dims, 2 * dims.max_source_positions)
        with torch.no_grad():
            want = model.model.encoder(
                input_features=torch.from_numpy(mel)
            ).last_hidden_state.numpy()
        got = np.asarray(whisper.encoder_apply(params, dims, jnp.asarray(mel)))
        assert got.shape == want.shape == (2, dims.max_source_positions, dims.d_model)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


class TestDecoderParity:
    def test_prefill_logits(self, tiny):
        model, dims, params = tiny
        mel = _mel(dims, 2 * dims.max_source_positions)
        tokens = np.array([[5, 17, 256, 3], [900, 2, 44, 7]], dtype=np.int32)
        with torch.no_grad():
            want = model(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
            ).logits.numpy()

        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        logits, cache = whisper.decoder_prefill(
            params, dims, jnp.asarray(tokens), enc, max_len=16
        )
        got = np.asarray(logits)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=0)
        # Cross-KV cache covers the full encoder context.
        assert cache.cross_k.shape == (
            dims.decoder_layers, 2, dims.decoder_heads,
            dims.max_source_positions, dims.head_dim,
        )

    def test_step_matches_full_forward(self, tiny):
        """decoder_step at positions P..P+2 must equal a full torch forward
        over the growing sequence — the static-KV-cache equivalent of the
        reference's decoder_with_past loop (src/main.rs:793-827)."""
        model, dims, params = tiny
        mel = _mel(dims, 2 * dims.max_source_positions, seed=3)
        seq = np.array([[5, 17, 256, 3, 88, 421, 9]], dtype=np.int32)
        prompt, rest = seq[:, :4], seq[0, 4:]

        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel[:1]))
        logits, cache = whisper.decoder_prefill(
            params, dims, jnp.asarray(prompt), enc, max_len=16
        )

        for i, tok in enumerate(rest):
            pos = prompt.shape[1] + i
            with torch.no_grad():
                want = model(
                    input_features=torch.from_numpy(mel[:1]),
                    decoder_input_ids=torch.from_numpy(
                        seq[:, : pos + 1].astype(np.int64)
                    ),
                ).logits.numpy()[:, -1]
            step_logits, cache = whisper.decoder_step(
                params, dims, jnp.asarray([tok]), jnp.int32(pos), cache
            )
            np.testing.assert_allclose(
                np.asarray(step_logits), want, atol=3e-4, rtol=0
            )

    def test_left_padded_conditioned_prompt_equals_unpadded(self, tiny):
        """Previous-text conditioning uses LEFT-padded fixed-size prompts
        (prompt_mask in prefill + pad_count in steps) so one program serves
        every window. The padded run must be token-for-token identical to
        torch greedy over the UNPADDED prompt — proving the mask/position
        bookkeeping is exact (ref semantics: HF generate with
        condition_on_prev, benchmark_without_hf_pipeline.py:236-244)."""
        import jax

        from whisper_tpu.runtime.generate import build_suppress_mask, greedy_generate

        model, dims, params = tiny
        mel = _mel(dims, 2 * dims.max_source_positions, seed=21)
        # Unpadded conditioned prompt: [sot_prev(=7), prev..., sot(=1), 5]
        real_prompt = [7, 101, 202, 303, 1, 5]
        n_new = 6

        seq = np.asarray([real_prompt], dtype=np.int64)
        for _ in range(n_new):
            with torch.no_grad():
                lg = model(
                    input_features=torch.from_numpy(mel[:1]),
                    decoder_input_ids=torch.from_numpy(seq),
                ).logits.numpy()[0, -1]
            seq = np.concatenate([seq, [[int(lg.argmax())]]], axis=1)
        want = list(seq[0, len(real_prompt):])

        pad = 3
        padded_prompt = [0] * pad + real_prompt
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel[:1]))
        mask = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        got = np.asarray(greedy_generate(
            params, dims, enc,
            jnp.asarray(padded_prompt, dtype=jnp.int32),
            mask, mask, max_new_tokens=n_new, eot_id=2,
            pad_count=jnp.asarray([pad], dtype=jnp.int32),
        ))[0]
        assert list(got) == want

    def test_prefill_then_step_argmax_chain(self, tiny):
        """Greedy chain: argmax from our prefill+steps equals torch's."""
        model, dims, params = tiny
        mel = _mel(dims, 2 * dims.max_source_positions, seed=11)
        prompt = np.array([[1, 2]], dtype=np.int32)
        n_new = 8

        # torch greedy loop (manual, mirrors ORT semantics)
        seq = prompt.astype(np.int64)
        for _ in range(n_new):
            with torch.no_grad():
                lg = model(
                    input_features=torch.from_numpy(mel[:1]),
                    decoder_input_ids=torch.from_numpy(seq),
                ).logits.numpy()[0, -1]
            seq = np.concatenate([seq, [[int(lg.argmax())]]], axis=1)
        want = seq[0, 2:]

        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel[:1]))
        logits, cache = whisper.decoder_prefill(
            params, dims, jnp.asarray(prompt), enc,
            max_len=prompt.shape[1] + n_new,
        )
        got = []
        tok = int(np.asarray(logits)[0, -1].argmax())
        got.append(tok)
        for i in range(n_new - 1):
            pos = prompt.shape[1] + i
            step_logits, cache = whisper.decoder_step(
                params, dims, jnp.asarray([tok]), jnp.int32(pos), cache
            )
            tok = int(np.asarray(step_logits)[0].argmax())
            got.append(tok)
        assert got == list(want)
