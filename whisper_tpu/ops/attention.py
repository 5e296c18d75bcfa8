"""Fused multi-head attention Pallas kernel for the encoder.

XLA cannot fuse matmul -> softmax -> matmul on TPU, so the plain-jnp
encoder attention materializes fp32 scores [B, H, 1500, 1500] in HBM
(~1.5 GB at whisper-base batch 16) — measured as the dominant encoder cost.
This kernel keeps the whole score block in VMEM: per (batch*head, q-block)
grid step it loads K/V fully (1500x64 bf16 = 192 KB each — VMEM-resident,
no flash tiling needed at Whisper's fixed T=1500), computes scores + softmax
in fp32 on-chip, and writes only the [TQ, Dh] output. HBM traffic drops
from O(T^2) to O(T*Dh).

Used for encoder self-attention in the x3+ variants; the parity rungs keep
the jnp path (different accumulation order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 256


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_valid: int):
    q = q_ref[0]                      # [TQ, Dh]
    k = k_ref[0]                      # [T_pad, Dh]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # [TQ, T_pad] fp32, VMEM only
    t_pad = scores.shape[-1]
    if t_pad > t_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < t_valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    # Mosaic requires 32-bit matmul accumulation; cast down after.
    o_ref[0] = jnp.dot(
        probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


from whisper_tpu.ops.common import round_up as _round_up


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """Full (unmasked) attention: q,k,v [B, H, T, Dh] -> [B, H, T, Dh].

    q must already be scaled (the model pre-scales by Dh^-0.5, matching the
    HF operator order the reference's ONNX graphs inherit)."""
    b, h, t, dh = q.shape
    t_pad = _round_up(t, 128)
    tq = min(Q_BLOCK, t_pad)
    # The q-grid tiles t_pad in tq blocks; t_pad must divide evenly or the
    # trailing partial block's rows would never be written (latent for
    # Whisper's t=1500 -> 1536 = 6*256, but e.g. t=300 -> 384 would lose
    # rows 256..299).  Round up to the block size, not just 128.
    t_pad = _round_up(t_pad, tq)

    qf = q.reshape(b * h, t, dh)
    kf = k.reshape(b * h, t, dh)
    vf = v.reshape(b * h, t, dh)
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        qf, kf, vf = (jnp.pad(x, pad) for x in (qf, kf, vf))

    grid = (b * h, t_pad // tq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, t_valid=t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_pad * t_pad * dh,
            bytes_accessed=4 * b * h * t_pad * dh * q.dtype.itemsize,
            transcendentals=b * h * t_pad * t_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :t, :].reshape(b, h, t, dh)
