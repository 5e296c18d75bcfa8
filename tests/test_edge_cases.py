"""Edge-case robustness: degenerate audio lengths, silence, unicode text,
and tiny files through the full pipeline (the reference bails on empty
audio, src/main.rs:414-416; everything else must work)."""

import numpy as np
import pytest

from whisper_tpu.frontend import golden
from whisper_tpu.models.convert import init_params
from whisper_tpu.models.registry import get_dims
from whisper_tpu.pipeline.longform import transcribe_longform
from whisper_tpu.pipeline.stitch import stitch_texts, word_overlap
from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession


@pytest.fixture(scope="module")
def session():
    dims = get_dims("test/whisper-nano")
    return WhisperSession(
        init_params(dims, seed=0), dims,
        RuntimeCfg(dtype="float32", max_batch=2),
    )


class TestDegenerateAudio:
    def test_one_sample(self, session):
        text, timing = transcribe_longform(
            session, np.array([0.5], dtype=np.float32), "en", "transcribe", 2,
        )
        assert isinstance(text, str)

    def test_exactly_one_hop(self, session):
        audio = np.zeros(160, dtype=np.float32)
        assert golden.num_frames(160) == 1
        text, _ = transcribe_longform(session, audio, "en", "transcribe", 2)
        assert isinstance(text, str)

    def test_pure_silence_mel_is_finite(self):
        # All-zero audio -> power clamped at 1e-10 -> finite normalized mel.
        mel = golden.log_mel_golden(np.zeros(16000, dtype=np.float32))
        assert np.isfinite(mel).all()

    def test_clipping_audio(self, session):
        audio = np.ones(8000, dtype=np.float32)  # hard-clipped DC
        text, _ = transcribe_longform(session, audio, "en", "transcribe", 2)
        assert isinstance(text, str)

    def test_exact_chunk_boundary(self, session):
        # 30.000 s exactly: one chunk, no empty tail.
        audio = np.zeros(30 * 16000, dtype=np.float32)
        text, _ = transcribe_longform(session, audio, "en", "transcribe", 2)
        assert isinstance(text, str)


class TestStitchUnicode:
    def test_unicode_overlap(self):
        a = "こんにちは world Grüße"
        b = "world grüße merci"
        # case-insensitive overlap across unicode words
        assert word_overlap(a, b, 16) == 2
        assert stitch_texts([a, b]) == "こんにちは world Grüße merci"

    def test_whitespace_only_chunks(self):
        assert stitch_texts(["\n\t ", "a", "  "]) == "a"


class TestSuppressEdge:
    def test_all_vocab_suppressed_still_terminates(self, session):
        """Even a pathological generation_config cannot hang the loop."""
        from whisper_tpu.runtime.genconfig import GenerationCfg

        dims = session.dims
        gen_cfg = GenerationCfg(
            suppress_tokens=list(range(dims.vocab_size)),
            begin_suppress_tokens=[],
        )
        audio = np.zeros(16000, dtype=np.float32)
        text, _ = transcribe_longform(
            session, audio, "en", "transcribe", 3, gen_cfg=gen_cfg,
        )
        assert isinstance(text, str)
