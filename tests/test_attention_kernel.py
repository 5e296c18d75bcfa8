"""Fused attention kernel vs the jnp reference path (interpret mode on CPU;
the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.ops.attention import fused_attention


def _qkv(b, h, t, dh, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: rng.normal(0, 1, (b, h, t, dh)).astype(np.float32)
    return jnp.asarray(mk()), jnp.asarray(mk()), jnp.asarray(mk())


def _reference(q, k, v):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@pytest.mark.parametrize("t", [1500, 256, 100, 300, 650])
def test_matches_reference(t):
    # 300 and 650: round_up(t,128) is NOT a multiple of the 256 q-block —
    # regression for the grid floor-division that dropped the trailing
    # partial block (rows past the last full block came back as garbage).
    q, k, v = _qkv(2, 3, t, 64, seed=t)
    want = np.asarray(_reference(q, k, v))
    got = np.asarray(fused_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_unpadded_tail_is_masked():
    # t=100 pads K to 128; padded keys must not receive attention mass.
    q, k, v = _qkv(1, 1, 100, 64, seed=3)
    big_v = v.at[:, :, :, :].set(1e6)  # if mask leaked, output explodes
    got = np.asarray(fused_attention(q, k, big_v, interpret=True))
    assert np.all(np.abs(got) <= 1e6 + 1)


def test_encoder_variant_parity():
    """x3 fused encoder output matches the plain jnp encoder (fp32)."""
    from whisper_tpu.models import whisper
    from whisper_tpu.models.convert import init_params
    from whisper_tpu.models.registry import get_dims

    dims = get_dims("test/whisper-nano")  # head_dim 32
    params = init_params(dims, seed=1)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(0, 1, (2, dims.n_mels, 200)).astype(np.float32))
    want = np.asarray(whisper.encoder_apply(params, dims, mel))
    got = np.asarray(
        whisper.encoder_apply(params, dims, mel, fused_attention=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)
