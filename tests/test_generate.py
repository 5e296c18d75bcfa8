"""On-device greedy loop tests: token parity vs a manual torch greedy loop,
suppression semantics, EOT early-stop, and batching invariance.

Mirrors the reference semantics of greedy_decode_with_past
(ref src/main.rs:753-829): first token suppressed by base ∪ begin_suppress,
later tokens by base only, stop at EOT or max_new_tokens.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from whisper_tpu.models import convert, whisper  # noqa: E402
from whisper_tpu.models.registry import dims_from_hf_config  # noqa: E402
from whisper_tpu.runtime.generate import (  # noqa: E402
    build_suppress_mask,
    greedy_generate,
    strip_generated,
)
from whisper_tpu.runtime.session import WhisperSession, RuntimeCfg  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.WhisperConfig(
        vocab_size=500, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=150, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3,
    )
    torch.manual_seed(1)
    model = transformers.WhisperForConditionalGeneration(cfg).eval()
    dims = dims_from_hf_config(cfg)
    params = convert.cast_params(
        convert.params_from_hf_state_dict(model.state_dict(), dims), jnp.float32
    )
    return model, dims, params


def _mel(dims, seed=0, batch=1):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, (batch, dims.n_mels, 2 * dims.max_source_positions)).astype(
        np.float32
    )


def _torch_greedy(model, mel, prompt, max_new, suppress, begin_suppress, eot):
    """Manual torch greedy loop with ORT-reference suppression semantics."""
    seq = list(prompt)
    for i in range(max_new):
        with torch.no_grad():
            lg = model(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.tensor([seq], dtype=torch.long),
            ).logits.numpy()[0, -1].copy()
        banned = set(suppress) | (set(begin_suppress) if i == 0 else set())
        lg[list(banned)] = -np.inf
        nxt = int(lg.argmax())
        seq.append(nxt)
        if nxt == eot:
            break
    return seq[len(prompt):]


class TestGreedyGenerate:
    def test_token_parity_with_suppression(self, tiny):
        model, dims, params = tiny
        mel = _mel(dims, seed=5)
        prompt = [3, 7]
        max_new = 10
        suppress = [11, 12, 13]
        eot = 2  # random weights: EOT effectively never generated

        want = _torch_greedy(model, mel, prompt, max_new, suppress, [99], eot)

        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        got = greedy_generate(
            params, dims, enc, jnp.asarray(prompt, dtype=jnp.int32),
            jnp.asarray(build_suppress_mask(dims.vocab_size, suppress)),
            jnp.asarray(build_suppress_mask(dims.vocab_size, suppress + [99])),
            max_new_tokens=max_new, eot_id=eot,
        )
        got = strip_generated(np.asarray(got)[0], eot)
        assert got == want
        assert not (set(got) & {11, 12, 13})

    def test_eot_early_stop_pads_with_eot(self, tiny):
        model, dims, params = tiny
        mel = _mel(dims, seed=6)
        prompt = [3]
        # Find what torch generates unconstrained, then declare the 4th
        # generated token to be "EOT" and check we stop there.
        free = _torch_greedy(model, mel, prompt, 8, [], [], eot=-1)
        eot = free[3]
        want = free[: free.index(eot)]

        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        zero = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        out = np.asarray(
            greedy_generate(
                params, dims, enc, jnp.asarray(prompt, dtype=jnp.int32),
                zero, zero, max_new_tokens=8, eot_id=eot,
            )
        )[0]
        idx = list(out).index(eot)
        assert list(out[:idx]) == want
        assert np.all(out[idx:] == eot)  # padded with EOT after stop
        assert strip_generated(out, eot) == want

    def test_batched_rows_match_individual(self, tiny):
        model, dims, params = tiny
        prompt = [3, 4]
        max_new = 6
        mels = _mel(dims, seed=7, batch=3)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mels))
        zero = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        batched = np.asarray(
            greedy_generate(
                params, dims, enc, jnp.asarray(prompt, dtype=jnp.int32),
                zero, zero, max_new_tokens=max_new, eot_id=2,
            )
        )
        for i in range(3):
            want = _torch_greedy(model, mels[i : i + 1], prompt, max_new, [], [], 2)
            got = strip_generated(batched[i], 2)
            assert got == want


class TestWhisperSession:
    def test_session_bucketing_and_parity(self, tiny):
        model, dims, params = tiny
        sess = WhisperSession(
            params, dims,
            RuntimeCfg(dtype="float32", matmul_precision="highest", max_batch=4),
        )
        from whisper_tpu.frontend import golden

        # 3 chunks -> bucket of 4 with one zero-pad row.
        mels = _mel(dims, seed=9, batch=3)
        toks = sess.transcribe_chunks(
            mels, prompt=[3, 4], max_new_tokens=5, eot_id=2,
            suppress_ids=[10], begin_suppress_ids=[20],
        )
        assert toks.shape == (3, 5)
        for i in range(3):
            want = _torch_greedy(
                model, mels[i : i + 1], [3, 4], 5, [10], [20], 2
            )
            assert strip_generated(toks[i], 2) == want

    def test_session_multi_bucket_split(self, tiny):
        model, dims, params = tiny
        sess = WhisperSession(
            params, dims,
            RuntimeCfg(dtype="float32", matmul_precision="highest", max_batch=2),
        )
        mels = _mel(dims, seed=13, batch=5)  # 2+2+1 buckets
        toks = sess.transcribe_chunks(
            mels, prompt=[3], max_new_tokens=4, eot_id=2
        )
        assert toks.shape == (5, 4)
        for i in range(5):
            want = _torch_greedy(model, mels[i : i + 1], [3], 4, [], [], 2)
            assert strip_generated(toks[i], 2) == want
