"""Native C++ audio decoder tests (builds the library on demand).

The native decoder (libavformat/libavcodec) must be sample-exact vs the
pure-Python WAV reader for PCM inputs (both mirror the reference's
normalization, src/main.rs:241-307).
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "whisper_tpu", "native",
)


@pytest.fixture(scope="module")
def native():
    from whisper_tpu.native import audio_native

    if not audio_native.available():
        if shutil.which("g++") is None:
            pytest.skip("no g++ toolchain")
        r = subprocess.run(
            ["make", "-C", NATIVE_DIR], capture_output=True, text=True
        )
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr[-400:]}")
        # reset the module's load cache
        audio_native._load_attempted = False
        audio_native._lib = None
    if not audio_native.available():
        pytest.skip("native library unavailable after build")
    return audio_native


def _write_wav(path, data, sr=16000, channels=1):
    pcm = np.clip(data * 32768.0, -32768, 32767).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, channels, sr,
        sr * channels * 2, channels * 2, 16, b"data", len(pcm),
    )
    with open(path, "wb") as f:
        f.write(hdr + pcm)


class TestNativeDecoder:
    def test_matches_python_wav_reader(self, native, tmp_path):
        from whisper_tpu.audio.wav import read_wav

        rng = np.random.default_rng(3)
        p = tmp_path / "m.wav"
        _write_wav(p, rng.normal(0, 0.3, 32000), sr=16000)
        mono_n, sr_n = native.decode_mono(str(p))
        mono_p, sr_p = read_wav(str(p))
        assert sr_n == sr_p == 16000
        np.testing.assert_array_equal(mono_n, mono_p)

    def test_stereo_downmix(self, native, tmp_path):
        from whisper_tpu.audio.wav import read_wav

        rng = np.random.default_rng(4)
        inter = rng.normal(0, 0.2, 2 * 8000)
        p = tmp_path / "s.wav"
        _write_wav(p, inter, sr=22050, channels=2)
        mono_n, sr = native.decode_mono(str(p))
        mono_p, _ = read_wav(str(p))
        assert sr == 22050
        np.testing.assert_allclose(mono_n, mono_p, atol=1e-7)

    def test_missing_file_error(self, native):
        with pytest.raises(RuntimeError):
            native.decode_mono("/does/not/exist.wav")

    def test_malformed_file_corpus(self, native, tmp_path):
        """Untrusted-input corpus: every malformed file must produce a clean
        RuntimeError, never a crash. Run under ASan/UBSan via
        `make -C whisper_tpu/native check` (SURVEY.md §5.2)."""
        rng = np.random.default_rng(5)
        good = np.clip(
            rng.normal(0, 0.3, 4000) * 32768.0, -32768, 32767
        ).astype("<i2").tobytes()
        good_hdr = struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(good), b"WAVE", b"fmt ", 16, 1, 1, 16000,
            32000, 2, 16, b"data", len(good),
        )
        corpus = {
            "empty.wav": b"",
            "just_magic.wav": b"RIFF",
            "truncated_header.wav": good_hdr[:20],
            "header_no_data.wav": good_hdr,
            "truncated_data.wav": good_hdr + good[:7],
            "garbage.wav": rng.bytes(4096),
            "riff_garbage.wav": b"RIFF" + rng.bytes(4096),
            "huge_declared_size.wav": struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF", 0xFFFFFFF0, b"WAVE", b"fmt ", 16, 1, 1, 16000,
                32000, 2, 16, b"data", 0xFFFFFF00,
            ) + good[:64],
            "zero_channels.wav": struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF", 36 + len(good), b"WAVE", b"fmt ", 16, 1, 0, 16000,
                0, 0, 16, b"data", len(good),
            ) + good,
            "zero_rate.wav": struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF", 36 + len(good), b"WAVE", b"fmt ", 16, 1, 1, 0,
                0, 2, 16, b"data", len(good),
            ) + good,
            "garbage.mp3": rng.bytes(2048),
            "garbage.flac": b"fLaC" + rng.bytes(2048),
        }
        for name, blob in corpus.items():
            p = tmp_path / name
            p.write_bytes(blob)
            try:
                mono, sr = native.decode_mono(str(p))
            except RuntimeError:
                continue  # clean rejection is the expected outcome
            # Some demuxers salvage partial/odd streams; that's fine as long
            # as the result is well-formed.
            assert sr >= 0 and mono.ndim == 1, name

    def test_io_facade_prefers_native(self, native, tmp_path):
        import whisper_tpu.audio.io as aio

        aio._native_checked = False
        aio._native = None
        p = tmp_path / "f.wav"
        _write_wav(p, np.zeros(16000), sr=16000)
        mono, sr, dur = aio.load_audio_16k_mono(str(p))
        assert aio._get_native() is not None
        assert sr == 16000 and abs(dur - 1.0) < 1e-3


class TestNativeResampler:
    def test_native_resample_bit_equals_numpy(self):
        """The C++ resampler (built with -ffp-contract=off) must be
        BIT-equal to the NumPy reference expression for every rate pair
        the reference exercises (ref src/main.rs:207-226)."""
        from whisper_tpu.native import audio_native

        if not audio_native.resample_available():
            pytest.skip("native lib not built")
        from whisper_tpu.audio.resample import _resample_linear_numpy

        rng = np.random.default_rng(0)
        for sr_in, sr_out in [(44100, 16000), (48000, 16000), (22050, 16000),
                              (8000, 16000), (16000, 8000), (11025, 16000)]:
            x = rng.normal(0, 0.3, 44100).astype(np.float32)
            got = audio_native.resample_linear(x, sr_in, sr_out)
            want = _resample_linear_numpy(x, sr_in, sr_out)
            assert got.shape == want.shape, (sr_in, sr_out)
            np.testing.assert_array_equal(got, want, err_msg=f"{sr_in}->{sr_out}")

    def test_resample_linear_routes_native(self):
        from whisper_tpu.native import audio_native

        if not audio_native.resample_available():
            pytest.skip("native lib not built")
        from whisper_tpu.audio import resample

        x = np.ones(1000, dtype=np.float32)
        # Route check: both paths agree and produce the documented length.
        out = resample.resample_linear(x, 44100, 16000)
        assert len(out) == int(np.floor(1000 * 16000 / 44100 + 0.5))
