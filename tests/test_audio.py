"""Audio I/O and resampler tests (ref src/main.rs:207-316)."""

import numpy as np
import pytest

from whisper_tpu.audio.resample import resample_linear
from whisper_tpu.audio.wav import read_wav
from whisper_tpu.audio.io import load_audio_16k_mono


def _ref_resample(x, sr_in, sr_out):
    """Literal transcription of the reference's scalar loop (src/main.rs:207-226)."""
    if sr_in == sr_out:
        return np.asarray(x, dtype=np.float32).copy()
    ratio = sr_out / sr_in
    n_out = int(np.floor(len(x) * ratio + 0.5))
    y = np.empty(n_out, dtype=np.float32)
    for i in range(n_out):
        t = i / ratio
        i0 = int(np.floor(t))
        i1 = i0 + 1
        a = t - i0
        s0 = x[i0] if 0 <= i0 < len(x) else 0.0
        s1 = x[i1] if 0 <= i1 < len(x) else 0.0
        y[i] = np.float32(1.0 - a) * np.float32(s0) + np.float32(a) * np.float32(s1)
    return y


class TestResample:
    @pytest.mark.parametrize("sr_in,sr_out", [(44100, 16000), (8000, 16000), (48000, 16000)])
    def test_matches_reference_loop(self, sr_in, sr_out):
        rng = np.random.default_rng(7)
        x = rng.normal(0, 0.5, 2000).astype(np.float32)
        np.testing.assert_allclose(
            resample_linear(x, sr_in, sr_out), _ref_resample(x, sr_in, sr_out),
            atol=1e-7,
        )

    def test_same_rate_is_copy(self):
        x = np.ones(10, dtype=np.float32)
        y = resample_linear(x, 16000, 16000)
        np.testing.assert_array_equal(x, y)
        assert y is not x


def _write_wav_s16(path, data, sr, channels):
    """Minimal WAV writer for fixtures (s16 interleaved)."""
    import struct

    pcm = np.clip(data * 32768.0, -32768, 32767).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, channels, sr,
        sr * channels * 2, channels * 2, 16, b"data", len(pcm),
    )
    with open(path, "wb") as f:
        f.write(hdr + pcm)


class TestWavReader:
    def test_s16_stereo_downmix(self, tmp_path):
        sr = 22050
        t = np.arange(sr, dtype=np.float64) / sr
        left = 0.5 * np.sin(2 * np.pi * 440 * t)
        right = 0.25 * np.sin(2 * np.pi * 220 * t)
        inter = np.stack([left, right], axis=1).reshape(-1)
        p = tmp_path / "x.wav"
        _write_wav_s16(p, inter, sr, 2)

        mono, got_sr = read_wav(str(p))
        assert got_sr == sr
        # Same clip+truncate quantization as the fixture writer.
        want = np.clip(np.stack([left, right], 1) * 32768.0, -32768, 32767).astype(
            np.int16
        )
        want = (want.astype(np.float32) / 32768.0).mean(axis=1)
        np.testing.assert_allclose(mono, want, atol=1e-6)

    def test_float32_wav(self, tmp_path):
        import scipy.io.wavfile as sw

        sr = 16000
        x = np.linspace(-0.9, 0.9, sr).astype(np.float32)
        p = tmp_path / "f.wav"
        sw.write(str(p), sr, x)
        mono, got_sr = read_wav(str(p))
        assert got_sr == sr
        np.testing.assert_allclose(mono, x, atol=0)

    def test_u8_wav(self, tmp_path):
        import scipy.io.wavfile as sw

        sr = 8000
        x8 = (np.linspace(0, 255, 100)).astype(np.uint8)
        p = tmp_path / "u8.wav"
        sw.write(str(p), sr, x8)
        mono, _ = read_wav(str(p))
        np.testing.assert_allclose(
            mono, (x8.astype(np.float32) - 128.0) / 128.0, atol=1e-6
        )

    def test_load_audio_16k_mono_resamples(self, tmp_path):
        sr = 8000
        x = np.sin(np.linspace(0, 100, sr)).astype(np.float32) * 0.5
        p = tmp_path / "r.wav"
        _write_wav_s16(p, x, sr, 1)
        mono, got_sr, dur = load_audio_16k_mono(str(p))
        assert got_sr == 16000
        assert abs(dur - 1.0) < 0.01
        assert abs(len(mono) - 16000) <= 1

    def test_non_wav_extension_raises_without_native(self, tmp_path):
        from whisper_tpu.audio import io as aio

        if aio._get_native() is not None:
            pytest.skip("native decoder available")
        p = tmp_path / "x.mp3"
        p.write_bytes(b"\xff\xfb")
        with pytest.raises(RuntimeError):
            load_audio_16k_mono(str(p))


def test_wav_truncated_data_chunk_decodes(tmp_path):
    """A data-chunk size past EOF (streamed/cut files) must decode the
    whole samples present, not crash np.frombuffer on a ragged tail."""
    import struct

    from whisper_tpu.audio.wav import read_wav

    pcm = (np.sin(np.arange(1000) / 5.0) * 20000).astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm),
                      b"WAVE", b"fmt ", 16, 1, 1, 16000, 32000, 2, 16,
                      b"data", len(pcm) + 999)   # declared size past EOF
    p = tmp_path / "cut.wav"
    p.write_bytes(hdr + pcm + b"\x01")           # one ragged byte
    mono, sr = read_wav(str(p))
    assert sr == 16000 and len(mono) == 1000
