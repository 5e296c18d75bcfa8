"""Fused multi-head attention Pallas kernel for the encoder.

XLA cannot fuse matmul -> softmax -> matmul on TPU, so the plain-jnp
encoder attention materializes fp32 scores [B, H, 1500, 1500] in HBM
(~1.5 GB at whisper-base batch 16) — measured as the dominant encoder cost.
This kernel keeps the whole score block in VMEM: per (batch*head) grid step
it loads Q/K/V fully (1500x64 bf16 = 192 KB each — VMEM-resident, no flash
tiling needed at Whisper's fixed T=1500), computes scores + softmax in fp32
on-chip in static Q_CHUNK-row slabs, and writes only [T, Dh] back.  HBM
traffic drops from O(T^2) to O(T*Dh).

Layout notes (round-5 rework, same numerics bit-for-bit):
- No operand padding at all.  Whisper's T=1500 is not divisible by any
  Mosaic-legal tile (8-multiple), so a q-grid needs a 1500->1536 round-up —
  measured as three HBM pad copies + a slice-back that dominated the
  encoder's layout overhead at large-v3 (docs/DECODE_ROOFLINE.md round-5
  addendum 2).  Instead every block spans its exact array dims (always
  legal), and the q rows are covered by a STATIC in-kernel chunk loop whose
  ragged tail (rows 1280:1500) Mosaic masks for free.
- One program per (batch*head) instead of six: grid-step overhead is real
  on this stack (CLAUDE.md), and the chunk loop is a static unroll inside
  a single program.
- Q_CHUNK swept on-device (128/256/512/1024/1500, all bitwise-equal —
  softmax is row-wise, so slabbing cannot change results): 1024 and
  whole-row tie for fastest; 1024 keeps the fp32 score slab at 6.1 MB
  (vs 9 MB whole-row) for VMEM headroom.
- Measured (delta method, one process, 2026-08-19): 1.52 -> 1.22 ms/call at
  whisper-base dims (16,8,1500,64), 5.6 -> 3.52 ms/call at large-v3 dims
  (16,20,1500,64) vs the padded q-grid version; outputs bitwise equal.

Used for encoder self-attention in the x3+ variants; the parity rungs keep
the jnp path (different accumulation order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_CHUNK = 1024


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t: int):
    k = k_ref[0]                      # [T, Dh] — exact T, no pad columns
    v = v_ref[0]
    for i0 in range(0, t, Q_CHUNK):   # static unroll; tail slab is ragged
        i1 = min(i0 + Q_CHUNK, t)
        q = q_ref[0, i0:i1, :]        # [tq_i, Dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                              # [tq_i, T] fp32, VMEM only
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        # Mosaic requires 32-bit matmul accumulation; cast down after.
        o_ref[0, i0:i1, :] = jnp.dot(
            probs, v, preferred_element_type=jnp.float32
        ).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """Full (unmasked) attention: q,k,v [B, H, T, Dh] -> [B, H, T, Dh].

    q must already be scaled (the model pre-scales by Dh^-0.5, matching the
    HF operator order the reference's ONNX graphs inherit)."""
    b, h, t, dh = q.shape
    qf = q.reshape(b * h, t, dh)
    kf = k.reshape(b * h, t, dh)
    vf = v.reshape(b * h, t, dh)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, t=t),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, t, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * dh,
            bytes_accessed=4 * b * h * t * dh * q.dtype.itemsize,
            transcendentals=b * h * t * t,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, t, dh)
