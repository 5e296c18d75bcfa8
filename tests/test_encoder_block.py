"""Fused encoder-block kernels (ops/encoder_block.py) vs jnp references —
interpret mode on the CPU mesh; the same kernels compile on TPU.

The kernels use tanh-GELU (no erf lowering on this Mosaic stack), so the
references here implement the SAME math (jax.nn.gelu approximate=True);
the erf-vs-tanh deviation is bounded separately in scripts/parity_matrix.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.models import whisper
from whisper_tpu.models.convert import init_params
from whisper_tpu.models.registry import get_dims
from whisper_tpu.ops.encoder_block import (
    fits_vmem,
    fused_ln_qkv,
    fused_out_mlp,
)


def _ln(x, s, b):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / np.sqrt(v + 1e-5) * s + b


class TestLnQkv:
    def test_matches_reference(self):
        rng = np.random.default_rng(0)
        b, t, d = 2, 96, 64
        x = rng.normal(0, 1, (b, t, d)).astype(np.float32)
        lns = rng.normal(1, 0.1, d).astype(np.float32)
        lnb = rng.normal(0, 0.1, d).astype(np.float32)
        w = rng.normal(0, 0.05, (d, 3 * d)).astype(np.float32)
        bias = rng.normal(0, 0.1, 3 * d).astype(np.float32)

        got = fused_ln_qkv(jnp.asarray(x), jnp.asarray(lns), jnp.asarray(lnb),
                           jnp.asarray(w), jnp.asarray(bias), interpret=True)
        want = _ln(x, lns, lnb) @ w + bias
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_row_padding_is_dropped(self):
        # b*t = 7 rows, far below the 512-row block: padding must not leak.
        rng = np.random.default_rng(1)
        b, t, d = 1, 7, 64
        x = rng.normal(0, 1, (b, t, d)).astype(np.float32)
        lns = np.ones(d, np.float32)
        lnb = np.zeros(d, np.float32)
        w = rng.normal(0, 0.1, (d, 3 * d)).astype(np.float32)
        bias = np.zeros(3 * d, np.float32)
        got = fused_ln_qkv(jnp.asarray(x), jnp.asarray(lns), jnp.asarray(lnb),
                           jnp.asarray(w), jnp.asarray(bias), interpret=True)
        assert got.shape == (b, t, 3 * d)
        want = _ln(x, lns, lnb) @ w
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestOutMlp:
    def test_matches_reference(self):
        rng = np.random.default_rng(2)
        b, t, d, f = 2, 80, 64, 256
        x = rng.normal(0, 1, (b, t, d)).astype(np.float32)
        ctx = rng.normal(0, 1, (b, t, d)).astype(np.float32)
        ow = rng.normal(0, 0.05, (d, d)).astype(np.float32)
        ob = rng.normal(0, 0.1, d).astype(np.float32)
        lns = rng.normal(1, 0.1, d).astype(np.float32)
        lnb = rng.normal(0, 0.1, d).astype(np.float32)
        w1 = rng.normal(0, 0.05, (d, f)).astype(np.float32)
        b1 = rng.normal(0, 0.1, f).astype(np.float32)
        w2 = rng.normal(0, 0.05, (f, d)).astype(np.float32)
        b2 = rng.normal(0, 0.1, d).astype(np.float32)

        got = fused_out_mlp(
            jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(ow),
            jnp.asarray(ob), jnp.asarray(lns), jnp.asarray(lnb),
            jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
            jnp.asarray(b2), interpret=True)

        y = x + ctx @ ow + ob
        h = np.asarray(jax.nn.gelu(jnp.asarray(_ln(y, lns, lnb) @ w1 + b1),
                                   approximate=True))
        want = y + h @ w2 + b2
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


class TestEncoderApplyFusedBlock:
    def test_matches_tanh_gelu_reference(self):
        """encoder_apply(fused_block=True) == a jnp replica of the same
        math (fused attention + tanh GELU) at nano dims, fp32."""
        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=5)
        rng = np.random.default_rng(3)
        mel = rng.normal(0, 1, (2, dims.n_mels, 200)).astype(np.float32)

        got = whisper.encoder_apply(params, dims, jnp.asarray(mel),
                                    fused_block=True)

        # Reference: the unfused path but with tanh GELU in the MLP.
        orig_gelu = jax.nn.gelu

        def tanh_gelu(x, approximate=False):
            return orig_gelu(x, approximate=True)

        try:
            jax.nn.gelu = tanh_gelu
            # conv-stem GELU also flips to tanh under the patch; apply the
            # same patch to both paths' stems by comparing against a
            # fused_block run... instead compare block math only: run the
            # unfused path under the patch.
            want = whisper.encoder_apply(params, dims, jnp.asarray(mel),
                                         fused_attention=True)
        finally:
            jax.nn.gelu = orig_gelu
        np.testing.assert_allclose(
            np.asarray(got, dtype=np.float32),
            np.asarray(want, dtype=np.float32), atol=2e-4, rtol=1e-3)

    def test_vmem_guard_falls_back(self):
        # medium dims: weights exceed the VMEM budget -> fits_vmem False
        assert fits_vmem(512, 2048, jnp.bfloat16)
        assert not fits_vmem(1024, 4096, jnp.bfloat16)
        # encoder_apply silently falls back (no Mosaic compile attempt):
        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=1)
        mel = np.zeros((1, dims.n_mels, 100), np.float32)
        out = whisper.encoder_apply(params, dims, jnp.asarray(mel),
                                    fused_block=True)
        assert out.shape == (1, 50, dims.d_model)

    def test_session_variant_flag(self):
        """A session with fused_encoder_block decodes end to end and agrees
        with the plain bf16 session's token chains at nano dims (same
        greedy argmax despite the tanh-GELU encoder)."""
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=7)
        rng = np.random.default_rng(11)
        mel = rng.normal(0, 0.5, (2, dims.n_mels, 3000)).astype(np.float32)

        cfg = RuntimeCfg(dtype="float32", matmul_precision="highest")
        import dataclasses
        cfg_f = dataclasses.replace(cfg, fused_encoder_block=True)
        a = WhisperSession(params, dims, cfg).transcribe_chunks(
            mel, [1, 4], 8, eot_id=2)
        b = WhisperSession(params, dims, cfg_f).transcribe_chunks(
            mel, [1, 4], 8, eot_id=2)
        # tanh-vs-erf GELU can flip near-tied argmaxes on random weights;
        # require the chains to agree up to the first divergence and the
        # shapes/dtypes to match exactly.
        assert a.shape == b.shape
        agree = int((a == b).all(axis=1).sum())
        assert agree >= 1, (a, b)


class TestChunkedQkv:
    """Round-5 weight-streaming variant (the STATUS note's 'revisit at
    d>=1024' item): column-chunked ln_qkv + XLA O-proj + FFN-chunked MLP
    compose the fused_block path at dims where the whole-matrix kernels
    cannot fit VMEM."""

    def test_qkv_chunk_plan(self):
        from whisper_tpu.ops.encoder_block import qkv_chunk_plan

        for d in (1024, 1280):
            blk = qkv_chunk_plan(d, jnp.bfloat16)
            assert blk is not None and blk % 128 == 0 and (3 * d) % blk == 0
            assert 4 * d * blk * 2 <= 6 * 2**20

    def test_chunked_matches_whole_kernel(self):
        rng = np.random.default_rng(4)
        b, t, d = 2, 300, 128
        x = rng.normal(0, 1, (b, t, d)).astype(np.float32)
        lns = rng.normal(1, 0.1, d).astype(np.float32)
        lnb = rng.normal(0, 0.1, d).astype(np.float32)
        w = rng.normal(0, 0.05, (d, 3 * d)).astype(np.float32)
        bias = rng.normal(0, 0.1, 3 * d).astype(np.float32)

        whole = fused_ln_qkv(
            jnp.asarray(x), jnp.asarray(lns), jnp.asarray(lnb),
            jnp.asarray(w), jnp.asarray(bias), interpret=True)
        chunked = fused_ln_qkv(
            jnp.asarray(x), jnp.asarray(lns), jnp.asarray(lnb),
            jnp.asarray(w), jnp.asarray(bias), interpret=True, c_block=128)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                                   atol=2e-5)

    def test_chunked_at_large_dims_matches_reference(self):
        from whisper_tpu.ops.encoder_block import qkv_chunk_plan

        rng = np.random.default_rng(5)
        b, t, d = 1, 260, 1280
        blk = qkv_chunk_plan(d, jnp.float32)
        assert blk is not None
        x = rng.normal(0, 1, (b, t, d)).astype(np.float32)
        lns = rng.normal(1, 0.1, d).astype(np.float32)
        lnb = rng.normal(0, 0.1, d).astype(np.float32)
        w = rng.normal(0, 0.02, (d, 3 * d)).astype(np.float32)
        bias = rng.normal(0, 0.1, 3 * d).astype(np.float32)
        got = fused_ln_qkv(
            jnp.asarray(x), jnp.asarray(lns), jnp.asarray(lnb),
            jnp.asarray(w), jnp.asarray(bias), interpret=True, c_block=blk)
        want = _ln(x, lns, lnb) @ w + bias
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4,
                                   rtol=1e-4)

    def test_encoder_engages_chunked_block_at_medium_dims(self):
        """encoder_apply(fused_block=True) at d=1024 now takes the chunked
        composition (not the silent fallback) and stays close to the
        unfused encoder (tanh-vs-exact GELU tolerance)."""
        from whisper_tpu.models.registry import WhisperDims

        dims = WhisperDims(
            n_mels=80, d_model=1024, encoder_layers=1, encoder_heads=16,
            decoder_layers=1, decoder_heads=16, vocab_size=64,
            max_source_positions=64, max_target_positions=16,
        )
        params = init_params(dims, seed=0)
        rng = np.random.default_rng(6)
        mel = jnp.asarray(
            rng.normal(0, 1, (1, dims.n_mels, 2 * dims.max_source_positions)
                       ).astype(np.float32))
        want = np.asarray(
            whisper.encoder_apply(params, dims, mel), dtype=np.float32)
        got = np.asarray(
            whisper.encoder_apply(params, dims, mel, fused_block=True),
            dtype=np.float32)
        denom = max(float(np.abs(want).max()), 1e-6)
        assert float(np.abs(got - want).max()) / denom < 2e-2
