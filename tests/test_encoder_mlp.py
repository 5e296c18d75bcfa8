"""Fused encoder-MLP kernel (ops/encoder_mlp.py): LN+FC1+GELU+FC2+residual
in one VMEM-resident pass.  Interpret-mode parity vs the jnp tanh-GELU
reference here; the TPU win (-17% on the 6-layer MLP chain, 0.5% rel err
vs exact GELU) is recorded in docs/DECODE_ROOFLINE.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _params(d, f, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s, scale=0.05: jnp.asarray(
        rng.normal(0, scale, s).astype(np.float32)).astype(jnp.bfloat16)
    return dict(
        lns=mk(d, scale=0.1) + 1, lnb=mk(d, scale=0.1),
        w1=mk(d, f), b1=mk(f, scale=0.1),
        w2=mk(f, d), b2=mk(d, scale=0.1),
    )


def _ref(x, p):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    r = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)
         * p["lns"].astype(jnp.float32)
         + p["lnb"].astype(jnp.float32)).astype(x.dtype)
    h = (jnp.dot(r, p["w1"], preferred_element_type=jnp.float32)
         + p["b1"].astype(jnp.float32))
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    y = (jnp.dot(h, p["w2"], preferred_element_type=jnp.float32)
         + p["b2"].astype(jnp.float32))
    return (x32 + y).astype(x.dtype)


class TestKernel:
    @pytest.mark.parametrize("b,t,d,f", [(2, 300, 64, 256),
                                         (1, 777, 128, 512)])
    def test_interpret_matches_reference(self, b, t, d, f):
        from whisper_tpu.ops.encoder_mlp import fused_encoder_mlp

        p = _params(d, f)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (b, t, d)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        got = np.asarray(fused_encoder_mlp(
            x, p["lns"], p["lnb"], p["w1"], p["b1"], p["w2"], p["b2"],
            interpret=True), dtype=np.float32)
        want = np.asarray(_ref(x, p), dtype=np.float32)
        denom = max(float(np.abs(want).max()), 1e-6)
        assert float(np.abs(got - want).max()) / denom < 1e-2

    def test_session_flag_generates(self):
        import dataclasses

        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        cfg = RuntimeCfg(dtype="float32", max_batch=2,
                         fused_encoder_mlp=True)
        sess = WhisperSession(init_params(dims, seed=0), dims, cfg)
        rng = np.random.default_rng(2)
        mel = rng.normal(0, 1, (2, dims.n_mels, 3000)).astype(np.float32)
        toks = sess.transcribe_chunks(mel, prompt=[1, 2, 3],
                                      max_new_tokens=4, eot_id=5)
        assert toks.shape == (2, 4)

    def test_flag_with_int8_weights(self):
        """QTensor weights dequantize outside the kernel's row grid."""
        from whisper_tpu.models.convert import init_params
        from whisper_tpu.models.registry import get_dims
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        cfg = RuntimeCfg(dtype="float32", max_batch=2, int8_weights=True,
                         fused_encoder_mlp=True)
        sess = WhisperSession(init_params(dims, seed=0), dims, cfg)
        rng = np.random.default_rng(3)
        mel = rng.normal(0, 1, (1, dims.n_mels, 3000)).astype(np.float32)
        toks = sess.transcribe_chunks(mel, prompt=[1, 2, 3],
                                      max_new_tokens=3, eot_id=5)
        assert toks.shape == (1, 3)
