"""Beam search tests: K=1 ≡ greedy, parity vs an independent NumPy/torch
reference beam with identical rules, suppression, and length penalty."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from whisper_tpu.models import convert, whisper  # noqa: E402
from whisper_tpu.models.registry import dims_from_hf_config  # noqa: E402
from whisper_tpu.runtime.beam import beam_generate  # noqa: E402
from whisper_tpu.runtime.generate import (  # noqa: E402
    build_suppress_mask,
    greedy_generate,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.WhisperConfig(
        vocab_size=300, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=150, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3,
    )
    torch.manual_seed(7)
    model = transformers.WhisperForConditionalGeneration(cfg).eval()
    dims = dims_from_hf_config(cfg)
    params = convert.cast_params(
        convert.params_from_hf_state_dict(model.state_dict(), dims), jnp.float32
    )
    return model, dims, params


def _mel(dims, seed=0, batch=1):
    rng = np.random.default_rng(seed)
    return rng.normal(
        0, 1, (batch, dims.n_mels, 2 * dims.max_source_positions)
    ).astype(np.float32)


def _torch_logits(model, mel, seq):
    with torch.no_grad():
        return (
            model(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.tensor([seq], dtype=torch.long),
            ).logits.numpy()[0, -1].astype(np.float64)
        )


def _np_log_softmax(x):
    x = x - x.max()
    return x - np.log(np.exp(x).sum())


def _ref_beam(model, mel, prompt, k, max_new, eot, suppress, length_penalty=1.0):
    """Independent reference beam with the same rules as runtime.beam."""
    smask = np.where(np.isin(np.arange(model.config.vocab_size), suppress),
                     -np.inf, 0.0)
    logp0 = _np_log_softmax(_torch_logits(model, mel, list(prompt)) + smask)
    order = np.argsort(-logp0, kind="stable")[:k]
    beams = [
        {"toks": [int(t)], "score": float(logp0[t]),
         "done": int(t) == eot, "len": 1}
        for t in order
    ]
    for _ in range(1, max_new):
        if all(b["done"] for b in beams):
            break
        cands = []
        for bi, beam in enumerate(beams):
            if beam["done"]:
                cands.append((beam["score"], bi, eot))
                continue
            lg = _torch_logits(model, mel, list(prompt) + beam["toks"])
            lp = _np_log_softmax(lg + smask)
            for t in range(len(lp)):
                cands.append((beam["score"] + lp[t], bi, t))
        cands.sort(key=lambda c: (-c[0], c[1] * len(smask) + c[2]))
        new_beams = []
        for score, bi, t in cands[:k]:
            src = beams[bi]
            if src["done"]:
                new_beams.append(dict(src))
            else:
                new_beams.append({
                    "toks": src["toks"] + [t], "score": float(score),
                    "done": t == eot, "len": src["len"] + 1,
                })
        beams = new_beams
    best = max(beams, key=lambda b: b["score"] / (b["len"] ** length_penalty))
    toks = best["toks"]
    if eot in toks:
        toks = toks[: toks.index(eot)]
    return toks


def _strip(row, eot):
    out = []
    for t in row.tolist():
        if t == eot:
            break
        out.append(int(t))
    return out


class TestBeam:
    def test_k1_equals_greedy(self, tiny):
        _, dims, params = tiny
        mel = _mel(dims, seed=1, batch=2)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        prompt = jnp.asarray([3, 5], dtype=jnp.int32)
        zero = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        want = np.asarray(greedy_generate(
            params, dims, enc, prompt, zero, zero,
            max_new_tokens=8, eot_id=2,
        ))
        got, _ = beam_generate(
            params, dims, enc, prompt, zero, zero,
            max_new_tokens=8, eot_id=2, num_beams=1,
        )
        np.testing.assert_array_equal(np.asarray(got), want)

    @pytest.mark.parametrize("k", [2, 3])
    def test_matches_reference_beam(self, tiny, k):
        model, dims, params = tiny
        mel = _mel(dims, seed=4)
        prompt = [3]
        suppress = [7, 8]
        want = _ref_beam(model, mel, prompt, k, 6, eot=2, suppress=suppress)

        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        mask = jnp.asarray(build_suppress_mask(dims.vocab_size, suppress))
        got, _ = beam_generate(
            params, dims, enc, jnp.asarray(prompt, dtype=jnp.int32),
            mask, mask, max_new_tokens=6, eot_id=2, num_beams=k,
        )
        assert _strip(np.asarray(got)[0], 2) == want

    def test_batch_rows_independent(self, tiny):
        model, dims, params = tiny
        mels = _mel(dims, seed=9, batch=3)
        prompt = [3]
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mels))
        zero = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        got, _ = beam_generate(
            params, dims, enc, jnp.asarray(prompt, dtype=jnp.int32),
            zero, zero, max_new_tokens=5, eot_id=2, num_beams=2,
        )
        for i in range(3):
            want = _ref_beam(model, mels[i : i + 1], prompt, 2, 5, eot=2,
                             suppress=[])
            assert _strip(np.asarray(got)[i], 2) == want

    def test_length_penalty_changes_selection(self, tiny):
        # Sanity: scores returned, and length_penalty is plumbed through.
        _, dims, params = tiny
        mel = _mel(dims, seed=12)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        zero = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        toks, scores = beam_generate(
            params, dims, enc, jnp.asarray([3], dtype=jnp.int32),
            zero, zero, max_new_tokens=4, eot_id=2, num_beams=2,
            length_penalty=0.5,
        )
        assert toks.shape == (1, 4)
        assert np.isfinite(np.asarray(scores)).all()
