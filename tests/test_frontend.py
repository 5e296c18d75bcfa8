"""Log-mel front-end contract tests.

Validates the golden NumPy implementation (the numerical contract of ref
src/main.rs:407-509) against transformers' WhisperFeatureExtractor as an
independent oracle, and the JAX/XLA implementation against the golden one.
"""

import numpy as np
import pytest

from whisper_tpu.frontend import golden
from whisper_tpu.frontend.mel import log_mel, log_mel_jax
from whisper_tpu.frontend.golden import reflect_pad, num_frames


def _speechy_audio(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic speech-like signal: a few chirps + noise floor."""
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64) / 16000.0
    x = (
        0.3 * np.sin(2 * np.pi * (200 + 40 * np.sin(2 * np.pi * 1.3 * t)) * t)
        + 0.2 * np.sin(2 * np.pi * 850 * t)
        + 0.05 * rng.standard_normal(n)
    )
    return (x * 0.5).astype(np.float32)


class TestGoldenVsHF:
    """transformers' WhisperFeatureExtractor computes the same Whisper
    log-mel spec (reflect pad, drop last frame, Slaney fb, log10/clamp/norm),
    so it is a fully independent oracle for our golden implementation."""

    @pytest.mark.parametrize("n_samples", [480_000, 160_000])
    def test_matches_feature_extractor(self, n_samples):
        transformers = pytest.importorskip("transformers")
        fe = transformers.WhisperFeatureExtractor(
            feature_size=80, sampling_rate=16000, hop_length=160,
            chunk_length=30, n_fft=400,
        )
        audio = _speechy_audio(n_samples)
        # HF pads/truncates to exactly 30 s; feed 30 s to compare 1:1.
        padded = np.zeros(480_000, dtype=np.float32)
        padded[: len(audio)] = audio
        ours = golden.log_mel_golden(padded)
        theirs = fe(
            padded, sampling_rate=16000, return_tensors="np", padding="do_not_pad"
        )["input_features"][0]
        assert ours.shape == theirs.shape == (80, 3000)
        np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=0)

    def test_mel_filterbank_matches_hf(self):
        pytest.importorskip("transformers")
        from transformers.audio_utils import mel_filter_bank

        fb_hf = mel_filter_bank(
            num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
            max_frequency=8000.0, sampling_rate=16000, norm="slaney",
            mel_scale="slaney",
        ).T  # HF returns [n_freq, n_mels]
        fb = golden.build_mel_filterbank(n_mels=80)
        np.testing.assert_allclose(fb, fb_hf, atol=1e-6)


class TestGoldenInternals:
    def test_reflect_pad_matches_numpy(self):
        x = np.arange(1000, dtype=np.float32)
        ours = reflect_pad(x)
        theirs = np.pad(x, 200, mode="reflect")
        np.testing.assert_array_equal(ours, theirs)

    def test_reflect_pad_short_signal(self):
        # Reference behavior for len < 2: trailing zeros only (src/main.rs:430-434).
        x = np.array([0.5], dtype=np.float32)
        out = reflect_pad(x)
        assert out.shape == (401,)
        assert out[0] == 0.5 and np.all(out[1:] == 0)

    @pytest.mark.parametrize(
        "n,expected",
        [(480_000, 3000), (160_000, 1000), (160, 1), (1, 1), (399, 2)],
    )
    def test_num_frames(self, n, expected):
        # padded = n + 400; frames = 1 + (padded-400)//160, then drop last.
        assert num_frames(n) == expected

    def test_30s_gives_3000_frames(self):
        audio = _speechy_audio(480_000)
        mel = golden.log_mel_golden(audio)
        assert mel.shape == (80, 3000)
        # Normalization range: after (x+4)/4 with clamp at max-8, values
        # lie within [max-2, max] in normalized units.
        assert mel.max() <= 2.0 and mel.min() >= mel.max() - 2.0


class TestJaxVsGolden:
    @pytest.mark.parametrize("n_samples", [480_000, 123_457, 16_000])
    def test_exact_length(self, n_samples):
        audio = _speechy_audio(n_samples, seed=n_samples % 97)
        want = golden.log_mel_golden(audio)
        got = np.asarray(log_mel(audio))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)

    def test_bucketed_padding_frames_are_zero_and_valid_match(self):
        audio = _speechy_audio(160_000)  # 1000 frames
        want = golden.log_mel_golden(audio)
        got = np.asarray(log_mel(audio, bucket=1500))
        assert got.shape == (80, 1500)
        np.testing.assert_allclose(got[:, :1000], want, atol=3e-5, rtol=0)
        assert np.all(got[:, 1000:] == 0.0)

    def test_n_mels_128(self):
        audio = _speechy_audio(48_000)
        want = golden.log_mel_golden(audio, n_mels=128)
        got = np.asarray(log_mel(audio, n_mels=128))
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


class TestTransferEncodings:
    def test_int16_path_close_to_fp32(self):
        audio = _speechy_audio(48_000)
        want = golden.log_mel_golden(audio)
        import jax.numpy as jnp

        # exact reflect pad in float then quantize, matching the session
        padded_f = reflect_pad(audio)
        padded = np.round(np.clip(padded_f, -1, 1) * 32767.0).astype(np.int16)
        got = np.asarray(log_mel_jax(
            jnp.asarray(padded), jnp.int32(num_frames(len(audio))),
            n_mels=80, n_frames=num_frames(len(audio)),
        ))
        assert np.abs(got - want).max() < 5e-3

    def test_ulaw8_path_close_to_fp32(self):
        from whisper_tpu.audio.resample import ulaw_encode
        import jax.numpy as jnp

        audio = _speechy_audio(48_000)
        want = golden.log_mel_golden(audio)
        padded = ulaw_encode(reflect_pad(audio))
        got = np.asarray(log_mel_jax(
            jnp.asarray(padded), jnp.int32(num_frames(len(audio))),
            n_mels=80, n_frames=num_frames(len(audio)),
        ))
        # mu-law's white quantization noise floor dominates QUIET mel bins
        # (log scale amplifies it): mean error stays small but the max is
        # large — which is exactly why ulaw8 is opt-in, not a ladder rung.
        assert np.abs(got - want).mean() < 0.02
        assert np.abs(got - want).max() < 1.0


class TestStreamedMel:
    """compute_mel_streamed must be BITWISE identical to the one-shot XLA
    path: frame f is a pure function of padded samples [160f, 160f+400),
    and the global max equals the max of per-slab masked maxes."""

    def _session(self, slab_frames):
        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=0)
        cfg = RuntimeCfg(streamed_mel=True, mel_slab_frames=slab_frames,
                         audio_transfer="int16")
        return WhisperSession(params, dims, cfg)

    @pytest.mark.parametrize("seconds,slab_frames", [
        (75.3, 3000),    # multi-slab with ragged tail
        (60.0, 3000),    # n_valid just past an exact slab multiple
        (29.9, 3000),    # single slab -> one-shot fallback
        (95.0, 1000),    # many small slabs
    ])
    def test_streamed_bitwise_equals_single_shot(self, seconds, slab_frames):
        from whisper_tpu.pipeline.chunk import mel_frame_bucket

        session = self._session(slab_frames)
        audio = _speechy_audio(int(seconds * 16000), seed=3)
        padded = reflect_pad(audio)
        nv = num_frames(len(audio))
        bucket = mel_frame_bucket(nv)
        got = np.asarray(session.compute_mel_streamed(padded, nv, bucket))
        want = np.asarray(session._compute_mel_single(padded, nv, bucket))
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)

    def test_compute_mel_routes_to_streamed(self, monkeypatch):
        session = self._session(3000)
        calls = {}
        orig = type(session).compute_mel_streamed

        def spy(self, *a, **k):
            calls["streamed"] = True
            return orig(self, *a, **k)

        monkeypatch.setattr(type(session), "compute_mel_streamed", spy)
        audio = _speechy_audio(int(61.0 * 16000))
        padded = reflect_pad(audio)
        nv = num_frames(len(audio))
        from whisper_tpu.pipeline.chunk import mel_frame_bucket

        session.compute_mel(padded, nv, mel_frame_bucket(nv))
        assert calls.get("streamed")

    def test_streamed_fp32_transfer_bitwise(self):
        """x0/x1 parity variants (audio_transfer=fp32) stream bitwise too."""
        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.pipeline.chunk import mel_frame_bucket
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        cfg = RuntimeCfg(streamed_mel=True, mel_slab_frames=2000,
                         audio_transfer="fp32")
        session = WhisperSession(init_params(dims, seed=0), dims, cfg)
        audio = _speechy_audio(int(70.0 * 16000), seed=5)
        padded = reflect_pad(audio)
        nv = num_frames(len(audio))
        bucket = mel_frame_bucket(nv)
        got = np.asarray(session.compute_mel_streamed(padded, nv, bucket))
        want = np.asarray(session._compute_mel_single(padded, nv, bucket))
        np.testing.assert_array_equal(got, want)


class TestDeltaTransfer:
    """dint16 wire encoding (round 3): delta-coded int16 shipped as uint16
    must decode BIT-EXACTLY to the int16 path's samples and mels."""

    def test_decode_reconstructs_int16_exactly(self):
        import jax.numpy as jnp

        from whisper_tpu.frontend.mel import decode_transfer

        rng = np.random.default_rng(0)
        pcm = rng.integers(-32768, 32768, 20011, dtype=np.int16)
        d = np.diff(pcm.astype(np.int32),
                    prepend=np.int32(0)).astype(np.uint16)
        got = np.asarray(decode_transfer(jnp.asarray(d)))
        want = np.asarray(decode_transfer(jnp.asarray(pcm)))
        np.testing.assert_array_equal(got, want)

    def test_session_mel_bitwise_vs_int16(self):
        import dataclasses

        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.pipeline.longform import compute_mel_full
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=0)
        rng = np.random.default_rng(3)
        audio = (0.4 * np.sin(np.arange(40 * 16000) / 20.0)
                 + 0.05 * rng.standard_normal(40 * 16000)).astype(np.float32)

        cfg16 = RuntimeCfg(dtype="float32", audio_transfer="int16")
        cfgd = dataclasses.replace(cfg16, audio_transfer="dint16")
        mel16, _ = compute_mel_full(WhisperSession(params, dims, cfg16),
                                    audio)
        meld, _ = compute_mel_full(WhisperSession(params, dims, cfgd),
                                   audio)
        np.testing.assert_array_equal(np.asarray(meld), np.asarray(mel16))

    def test_batched_rows_encode_independently(self):
        """Serving path: [B, L] audio delta-codes along the last axis, so
        each row decodes standalone."""
        import jax.numpy as jnp

        from whisper_tpu.frontend.mel import decode_transfer
        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        sess = WhisperSession(init_params(dims, seed=0), dims,
                              RuntimeCfg(dtype="float32",
                                         audio_transfer="dint16"))
        rng = np.random.default_rng(1)
        audio = rng.normal(0, 0.2, (3, 16000)).astype(np.float32)
        enc = sess._encode_transfer(audio)
        assert enc.dtype == np.uint16 and enc.shape == audio.shape
        dec = np.asarray(decode_transfer(jnp.asarray(enc)))
        pcm = np.round(np.clip(audio, -1, 1) * 32767.0).astype(np.int16)
        np.testing.assert_allclose(
            dec, pcm.astype(np.float32) / 32767.0, atol=1e-7)


class TestPlanarDeltaTransfer:
    """dint16p wire encoding: zig-zag deltas split into byte planes
    (int8, [..., hi | lo]) must decode BIT-EXACTLY to the int16 path,
    including worst-case deltas (full-range sign alternation)."""

    def test_decode_reconstructs_int16_exactly(self):
        import jax.numpy as jnp

        from whisper_tpu.frontend.mel import decode_transfer

        rng = np.random.default_rng(0)
        pcm = rng.integers(-32768, 32768, 20011, dtype=np.int16)
        pcm[:8] = [32767, -32768, 32767, -32768, 0, -1, 1, -32768]
        d = np.diff(pcm.astype(np.int32),
                    prepend=np.int32(0)).astype(np.int16)
        di = d.astype(np.int32)
        z = ((di << 1) ^ (di >> 15)) & 0xFFFF
        enc = np.concatenate([(z >> 8).astype(np.uint8),
                              (z & 0xFF).astype(np.uint8)]).view(np.int8)
        got = np.asarray(decode_transfer(jnp.asarray(enc)))
        want = np.asarray(decode_transfer(jnp.asarray(pcm)))
        np.testing.assert_array_equal(got, want)

    def test_session_mel_bitwise_vs_int16(self):
        import dataclasses

        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.pipeline.longform import compute_mel_full
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=0)
        rng = np.random.default_rng(3)
        audio = (0.4 * np.sin(np.arange(40 * 16000) / 20.0)
                 + 0.05 * rng.standard_normal(40 * 16000)).astype(np.float32)

        cfg16 = RuntimeCfg(dtype="float32", audio_transfer="int16")
        cfgp = dataclasses.replace(cfg16, audio_transfer="dint16p")
        mel16, _ = compute_mel_full(WhisperSession(params, dims, cfg16),
                                    audio)
        melp, _ = compute_mel_full(WhisperSession(params, dims, cfgp),
                                   audio)
        np.testing.assert_array_equal(np.asarray(melp), np.asarray(mel16))

    def test_batched_rows_encode_independently(self):
        import jax.numpy as jnp

        from whisper_tpu.frontend.mel import decode_transfer
        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        sess = WhisperSession(init_params(dims, seed=0), dims,
                              RuntimeCfg(dtype="float32",
                                         audio_transfer="dint16p"))
        rng = np.random.default_rng(1)
        audio = rng.normal(0, 0.2, (3, 16000)).astype(np.float32)
        enc = sess._encode_transfer(audio)
        assert enc.dtype == np.int8
        assert enc.shape == (3, 2 * 16000)
        dec = np.asarray(decode_transfer(jnp.asarray(enc)))
        pcm = np.round(np.clip(audio, -1, 1) * 32767.0).astype(np.int16)
        np.testing.assert_allclose(
            dec, pcm.astype(np.float32) / 32767.0, atol=1e-7)


class TestPackedPcmTransfer:
    """pcm12/pcm14 wire encodings (utils/pcmpack.py): bit-packed truncated
    PCM — 25% / 12.5% fewer wire bytes on EVERY link (unlike the delta
    encodings, which need the tunnel's compressor).  The packing must
    round-trip BIT-exactly to the quantized reference, and the mel error
    must stay at/below the log-mel clamp floor (quantization noise ~-77 /
    ~-89 dB power vs the clamp's -80 dB window)."""

    @pytest.mark.parametrize("mode", ["pcm12", "pcm14"])
    @pytest.mark.parametrize("shape", [(4096,), (3, 4096), (5, 1001)])
    def test_roundtrip_bit_exact(self, mode, shape):
        import jax.numpy as jnp

        from whisper_tpu.frontend.mel import decode_transfer
        from whisper_tpu.utils.pcmpack import pack_pcm, quantized_reference

        rng = np.random.default_rng(0)
        x = np.clip(rng.normal(0, 0.3, shape), -1, 1).astype(np.float32)
        x.flat[:6] = [-1.0, 1.0, 0.0, 1.0, -1.0, 0.5]   # extremes
        dec = np.asarray(decode_transfer(jnp.asarray(pack_pcm(x, mode)),
                                         mode))
        ref = quantized_reference(x, mode)
        n = x.shape[-1]
        assert dec.shape[-1] >= n                        # pad-group tail
        np.testing.assert_array_equal(dec[..., :n], ref[..., :n])

    @pytest.mark.parametrize("mode", ["pcm12", "pcm14"])
    def test_int16_input_roundtrip(self, mode):
        import jax.numpy as jnp

        from whisper_tpu.frontend.mel import decode_transfer
        from whisper_tpu.utils.pcmpack import pack_pcm, quantized_reference

        rng = np.random.default_rng(1)
        pcm = rng.integers(-32768, 32768, 2048, dtype=np.int16)
        dec = np.asarray(decode_transfer(jnp.asarray(pack_pcm(pcm, mode)),
                                         mode))
        np.testing.assert_array_equal(
            dec[:2048], quantized_reference(pcm, mode))

    def test_session_mel_error_bounds(self):
        """Normalized log-mel deviation vs the f32 upload on a speech-like
        signal (same signal family as the headline bench): the measured
        hierarchy int16 < pcm14 < pcm12 << ulaw8 with pcm12's MEAN error
        an order of magnitude under ulaw8's (measured: int16 4.2e-5,
        pcm14 1.7e-4, pcm12 6.7e-4, ulaw8 7.3e-3)."""
        import jax.numpy as jnp

        from whisper_tpu.frontend.golden import num_frames, reflect_pad
        from whisper_tpu.frontend.mel import log_mel_jax
        from whisper_tpu.utils.pcmpack import pack_pcm
        from whisper_tpu.utils.wireprobe import synth_speechlike

        x = synth_speechlike(10.0)
        padded = reflect_pad(x)
        nf = num_frames(len(x))

        def mel(enc, transfer="auto"):
            return np.asarray(log_mel_jax(
                jnp.asarray(enc), jnp.int32(nf), n_mels=80, n_frames=nf,
                transfer=transfer))

        m_f32 = mel(padded)
        d14 = np.abs(mel(pack_pcm(padded, "pcm14"), "pcm14") - m_f32)
        d12 = np.abs(mel(pack_pcm(padded, "pcm12"), "pcm12") - m_f32)
        assert d14.mean() < 5e-4 and d14.max() < 0.06, (d14.mean(), d14.max())
        assert d12.mean() < 2e-3 and d12.max() < 0.15, (d12.mean(), d12.max())

    def test_streamed_pcm12_bitwise_equals_single_shot(self):
        """Slab-wise pcm12 packing must equal the one-shot pcm12 upload
        bitwise: slab lengths are even so the 2-sample pack groups align
        with slab boundaries (same invariant as the int16 streamed path)."""
        from whisper_tpu.frontend.golden import num_frames, reflect_pad
        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.pipeline.chunk import mel_frame_bucket
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        session = WhisperSession(
            init_params(dims, seed=0), dims,
            RuntimeCfg(streamed_mel=True, mel_slab_frames=3000,
                       audio_transfer="pcm12"),
        )
        rng = np.random.default_rng(7)
        audio = (0.3 * np.sin(np.arange(int(75.3 * 16000)) / 15.0)
                 + 0.03 * rng.standard_normal(int(75.3 * 16000))
                 ).astype(np.float32)
        padded = reflect_pad(audio)
        nv = num_frames(len(audio))
        bucket = mel_frame_bucket(nv)
        got = np.asarray(session.compute_mel_streamed(padded, nv, bucket))
        want = np.asarray(session._compute_mel_single(padded, nv, bucket))
        np.testing.assert_array_equal(got, want)

    def test_nano_tokens_match_int16(self):
        """Greedy chains through a full random-weight session must agree
        between int16 and pcm12/pcm14 uploads (the token-level gate; the
        full-scale whisper-base version of this A/B is in
        tests/test_fullscale_parity.py::test_fullscale_pcm_transfer_chain)."""
        import dataclasses

        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=0)
        audio = (0.3 * np.sin(np.arange(2 * 16000) / 9.0)).astype(np.float32)

        def run(mode):
            cfg = RuntimeCfg(dtype="float32", max_batch=1,
                             audio_transfer=mode)
            sess = WhisperSession(params, dims, cfg)
            toks = sess.transcribe_short_batch(
                np.pad(audio, (0, 400))[None], np.array([200]),
                prompt=[0], max_new_tokens=4, eot_id=1)
            return np.asarray(toks).tolist()

        base = run("int16")
        assert run("pcm14") == base
        assert run("pcm12") == base
