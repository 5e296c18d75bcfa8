"""Chunker / stitcher / long-form driver tests (ref src/main.rs:659-696,
834-1008)."""

import numpy as np
import pytest

from whisper_tpu.pipeline.chunk import chunk_starts, mel_frame_bucket, slice_mel_chunks
from whisper_tpu.pipeline.stitch import stitch_texts, word_overlap


class TestChunkGeometry:
    def test_reference_301s_gives_12_chunks(self):
        # 301.574 s at 16 kHz, 30 s chunks, 5 s overlap -> starts every 25 s;
        # the chunk starting at 275 s reaches past EOF, so the loop stops.
        n = int(301.574 * 16000)
        starts = chunk_starts(n, 30 * 16000, 25 * 16000)
        assert len(starts) == 12
        assert starts[:3] == [0, 400000, 800000]
        assert starts[-1] == 11 * 25 * 16000

    def test_short_file_single_chunk(self):
        assert chunk_starts(16000, 30 * 16000, 25 * 16000) == [0]

    def test_exact_boundary_no_empty_tail(self):
        # File ends exactly at a chunk end -> loop breaks (end == len).
        n = 30 * 16000
        assert chunk_starts(n, 30 * 16000, 25 * 16000) == [0]

    def test_step_floor_of_one(self):
        # overlap >= chunk_len clamps step to 1 sample (ref: .max(1)).
        starts = chunk_starts(10, 4, 1)
        assert starts == list(range(0, 7))


class TestMelSlicing:
    def test_padding_and_content(self):
        mel = np.arange(80 * 4000, dtype=np.float32).reshape(80, 4000)
        chunks = slice_mel_chunks(mel, [0, 2500 * 160], 4000)
        assert chunks.shape == (2, 80, 3000)
        np.testing.assert_array_equal(chunks[0], mel[:, :3000])
        np.testing.assert_array_equal(chunks[1, :, :1500], mel[:, 2500:4000])
        assert np.all(chunks[1, :, 1500:] == 0)

    def test_start_beyond_frames_is_all_zero(self):
        mel = np.ones((80, 100), dtype=np.float32)
        chunks = slice_mel_chunks(mel, [200 * 160], 100)
        assert np.all(chunks == 0)

    def test_bucket_pow2(self):
        assert mel_frame_bucket(1) == 3000
        assert mel_frame_bucket(3000) == 3000
        assert mel_frame_bucket(3001) == 6000
        assert mel_frame_bucket(30158) == 48000  # 301.574 s file


class TestStitch:
    def test_overlap_dedupe(self):
        a = "the quick brown fox jumps"
        b = "fox jumps over the lazy dog"
        assert word_overlap(a, b, 16) == 2
        assert stitch_texts([a, b]) == "the quick brown fox jumps over the lazy dog"

    def test_case_insensitive_overlap(self):
        assert word_overlap("Hello World", "world again", 16) == 1

    def test_no_overlap_concat_with_space(self):
        assert stitch_texts(["abc", "def"]) == "abc def"

    def test_empty_chunks_skipped(self):
        assert stitch_texts(["", "  ", "abc", ""]) == "abc"

    def test_full_containment(self):
        # b entirely consumed by the overlap -> nothing appended.
        assert stitch_texts(["a b c", "b c"]) == "a b c"

    def test_longest_overlap_wins(self):
        # "a b a b" + "a b x": longest suffix/prefix match is 2.
        assert stitch_texts(["a b a b", "a b x"]) == "a b a b x"


class TestLongformSmoke:
    def test_longform_end_to_end_tiny(self):
        """Whole pipeline on a random nano model: audio -> mel -> batched
        encode+greedy -> [TOKENS:..] text -> stitched output + timing."""
        import jax.numpy as jnp

        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.pipeline.longform import transcribe_longform
        from whisper_tpu.runtime.session import WhisperSession, RuntimeCfg

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=0)
        sess = WhisperSession(
            params, dims, RuntimeCfg(dtype="float32", matmul_precision="default",
                                     max_batch=4),
        )
        rng = np.random.default_rng(0)
        audio = rng.normal(0, 0.1, 70 * 16000).astype(np.float32)  # 70 s -> 3 chunks
        text, timing = transcribe_longform(
            sess, audio, language="en", task="transcribe", max_new_tokens=6,
        )
        # Random weights + no tokenizer -> token-id placeholder text.
        assert "[TOKENS:" in text
        assert timing.end_to_end_s > 0
        assert timing.model_only_s > 0
        assert timing.preprocess_s > 0
