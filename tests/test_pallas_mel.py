"""Fused Pallas log-mel kernel vs the golden NumPy contract (interpret mode
on the CPU test mesh; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.frontend import golden
from whisper_tpu.ops.pallas_mel import log_mel_pallas


def _audio(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * 300 * t) + 0.05 * rng.standard_normal(n)
    return x.astype(np.float32)


def _run(audio, n_mels=80, bucket=None):
    padded = golden.reflect_pad(audio)
    n_valid = golden.num_frames(len(audio))
    n_frames = bucket or n_valid
    return np.asarray(
        log_mel_pallas(
            jnp.asarray(padded), jnp.int32(n_valid),
            n_mels=n_mels, n_frames=n_frames, interpret=True,
        )
    )


@pytest.mark.parametrize("n_samples", [480_000, 160_000, 123_457])
def test_matches_golden(n_samples):
    audio = _audio(n_samples, seed=n_samples % 13)
    want = golden.log_mel_golden(audio)
    got = _run(audio)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_bucketed_invalid_frames_zero():
    audio = _audio(160_000)  # 1000 valid frames
    got = _run(audio, bucket=1500)
    want = golden.log_mel_golden(audio)
    np.testing.assert_allclose(got[:, :1000], want, atol=2e-4, rtol=0)
    assert np.all(got[:, 1000:] == 0)


def test_n_mels_128():
    audio = _audio(48_000)
    want = golden.log_mel_golden(audio, n_mels=128)
    got = _run(audio, n_mels=128)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)
