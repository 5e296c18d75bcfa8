"""Temperature-fallback decoding tests (openai-whisper's robustness ladder,
absent from the reference)."""

import numpy as np
import pytest

from whisper_tpu.models.convert import init_params
from whisper_tpu.models.registry import get_dims
from whisper_tpu.pipeline.fallback import (
    compression_ratio,
    needs_fallback,
    transcribe_longform_fallback,
)
from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession


@pytest.fixture(scope="module")
def session():
    dims = get_dims("test/whisper-nano")
    return WhisperSession(
        init_params(dims, seed=0), dims,
        RuntimeCfg(dtype="float32", max_batch=4),
    )


class TestQualityGates:
    def test_compression_ratio_detects_repetition(self):
        assert compression_ratio("the the the the the the the the " * 20) > 2.4
        assert compression_ratio(
            "an ordinary varied sentence with many distinct words"
        ) < 2.4
        assert compression_ratio("") == 0.0

    def test_needs_fallback(self):
        assert needs_fallback("ok text", avg_logprob=-3.0)          # low conf
        assert needs_fallback("a a a a a a a a a a a a " * 30, -0.1)  # repeat
        assert not needs_fallback("fine output here", -0.2)


class TestScoredGenerate:
    def test_t0_with_scores_matches_plain(self, session):
        import jax

        from whisper_tpu.frontend import golden
        from whisper_tpu.pipeline.chunk import mel_frame_bucket

        rng = np.random.default_rng(0)
        audio = rng.normal(0, 0.1, 2 * 16000).astype(np.float32)
        padded = golden.reflect_pad(audio)
        tf = golden.num_frames(len(audio))
        mel = jax.block_until_ready(
            session.compute_mel(padded, tf, mel_frame_bucket(tf))
        )
        plain = session.transcribe_from_mel(
            mel, [0], prompt=[3], max_new_tokens=5, eot_id=2,
        )
        scored, lp, nt = session.transcribe_from_mel(
            mel, [0], prompt=[3], max_new_tokens=5, eot_id=2,
            with_scores=True,
        )
        np.testing.assert_array_equal(scored, plain)
        assert nt[0] >= 1
        assert lp[0] <= 0.0  # log-probabilities

    def test_sampling_deterministic_per_seed(self, session):
        import jax

        from whisper_tpu.frontend import golden
        from whisper_tpu.pipeline.chunk import mel_frame_bucket

        rng = np.random.default_rng(1)
        audio = rng.normal(0, 0.1, 16000).astype(np.float32)
        padded = golden.reflect_pad(audio)
        tf = golden.num_frames(len(audio))
        mel = jax.block_until_ready(
            session.compute_mel(padded, tf, mel_frame_bucket(tf))
        )
        a, _, _ = session.transcribe_from_mel(
            mel, [0], prompt=[3], max_new_tokens=6, eot_id=2,
            temperature=0.8, seed=7, with_scores=True,
        )
        b, _, _ = session.transcribe_from_mel(
            mel, [0], prompt=[3], max_new_tokens=6, eot_id=2,
            temperature=0.8, seed=7, with_scores=True,
        )
        c, _, _ = session.transcribe_from_mel(
            mel, [0], prompt=[3], max_new_tokens=6, eot_id=2,
            temperature=0.8, seed=8, with_scores=True,
        )
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c) or True  # different seed may differ


class TestFallbackLadder:
    def test_accepts_at_first_rung_when_quality_ok(self, session):
        rng = np.random.default_rng(2)
        audio = rng.normal(0, 0.1, 2 * 16000).astype(np.float32)
        text, timing, info = transcribe_longform_fallback(
            session, audio, "en", "transcribe", 5,
            logprob_threshold=-1e9, compression_ratio_threshold=1e9,
        )
        assert all(t == 0.0 for t in info["accepted_at"])

    @pytest.mark.slow
    def test_impossible_gates_walk_the_ladder(self, session):
        rng = np.random.default_rng(3)
        audio = rng.normal(0, 0.1, 2 * 16000).astype(np.float32)
        temps = (0.0, 0.5, 1.0)
        text, timing, info = transcribe_longform_fallback(
            session, audio, "en", "transcribe", 4,
            temperatures=temps,
            logprob_threshold=1.0,  # impossible: avg logprob is always <= 0
        )
        # Every chunk must end up accepted at the LAST rung.
        assert all(t == 1.0 for t in info["accepted_at"])
        assert isinstance(text, str)


def test_fallback_auto_language(session):
    """--language auto + --temperatures must not crash (first-window
    detection like the sibling long-form modes)."""
    from whisper_tpu.pipeline.fallback import transcribe_longform_fallback

    rng = np.random.default_rng(5)
    audio = rng.normal(0, 0.1, 2 * 16000).astype(np.float32)
    text, _, info = transcribe_longform_fallback(
        session, audio, "auto", "transcribe", max_new_tokens=4,
        temperatures=(0.0,),
    )
    assert isinstance(text, str)
