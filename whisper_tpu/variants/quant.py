"""Int8 weight quantization — the TPU analog of the reference's dynamic
INT8 path (quantize_onnx_int8.py:28-45: ``quantize_dynamic(weight_type=
QInt8, op_types_to_quantize=["MatMul","Gemm"])``).

Scope matches the reference: ONLY matmul weights are quantized (attention
q/k/v/o, cross-attention, MLP fc1/fc2, and the tied-embedding OUTPUT
projection, which the exported ONNX decoder expresses as a MatMul and
quantize_dynamic therefore covers) — convolutions, the embedding LOOKUP
table and LayerNorms stay floating point.  Storage is per-output-channel
symmetric
int8 with a float32 scale; at use the dequantize multiplies fuse into the
matmul operand read, so the win is the halved HBM weight traffic that
dominates the memory-bound decode loop (the same reason the reference's
int8 rust SUT beats its fp32 one, BASELINE.md).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QTensor(NamedTuple):
    """Per-output-channel symmetric int8 weight: w ≈ q * s.

    q: int8, same shape as the original weight [..., in, out]
    s: float32 scale, shape [..., 1, out] (broadcasts over the in axis)
    """

    q: Any
    s: Any


# Names of stacked block weights eligible for quantization ([L, in, out]).
QUANTIZABLE = {
    "q_w", "k_w", "v_w", "o_w",
    "xq_w", "xk_w", "xv_w", "xo_w",
    "fc1_w", "fc2_w",
}


def quantize_tensor(w: np.ndarray | jax.Array) -> QTensor:
    """Symmetric per-output-channel (last axis) int8 quantization."""
    w = np.asarray(w, dtype=np.float32)
    absmax = np.max(np.abs(w), axis=-2, keepdims=True)  # [..., 1, out]
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return QTensor(q=jnp.asarray(q), s=jnp.asarray(scale.astype(np.float32)))


def dequantize(qt: QTensor, dtype) -> jax.Array:
    return qt.q.astype(dtype) * qt.s.astype(dtype)


def quantize_params(params: Dict) -> Dict:
    """Quantize all eligible block weights in a param pytree (encoder and
    decoder transformer matmuls), leaving everything else untouched.

    The decoder additionally gains `tok_emb_q` — the tied embedding
    quantized as the [d, V] logits-projection matrix (per-vocab-column
    scales). The bf16 `tok_emb` stays for the embedding lookup (its gather
    reads only B rows/step; the projection reads all 53 MB at whisper-base,
    which is what int8 halves)."""

    def walk(node, in_blocks=False):
        if isinstance(node, dict):
            return {
                k: (
                    quantize_tensor(v)
                    if in_blocks and k in QUANTIZABLE and not isinstance(v, QTensor)
                    else walk(v, in_blocks or k == "blocks")
                )
                for k, v in node.items()
            }
        return node

    out = walk(params)
    dec = out.get("decoder")
    if isinstance(dec, dict) and "tok_emb" in dec and "tok_emb_q" not in dec:
        emb = dec["tok_emb"]
        if not isinstance(emb, QTensor):
            dec["tok_emb_q"] = quantize_tensor(np.asarray(emb).T)
    return out


def is_quantized(params: Dict) -> bool:
    found = False

    def visit(node):
        nonlocal found
        if isinstance(node, QTensor):
            found = True
        elif isinstance(node, dict):
            for v in node.values():
                visit(v)

    visit(params)
    return found
