"""Optimization-variant ladder — the TPU analog of the reference's ONNX
O1–O4 / INT8 ladder (scripts/optimize_onnx_whisper.py:46-87,
quantize_onnx_int8.py:28-45).

Where the reference re-serializes graphs at increasing ORT optimization
levels plus a dynamic-INT8 copy, the TPU framework expresses the ladder as
compile/precision configurations over one weight set:

  x0   fp32, HIGHEST matmul precision — strict token-parity reference
  x1   fp32, HIGH precision           — fp32 storage, faster MXU passes
  x2   bf16                           — standard TPU serving precision
  x3   bf16 + fused Pallas kernels    — fused log-mel front end, fused
                                        encoder attention, and the fused
                                        encoder-MLP kernel (promoted r3)
  x4   x3 + int8 weights + int8 KV    — per-channel weight quantization
                                        (MatMul-only scope, matching
                                        quantize_onnx_int8.py:37-42) plus
                                        int8 cross-KV cache with the
                                        head-packed decode kernels
  x5   x4 + int8 MXU attention       — quantized q + 7-bit probs run both
                                        decode attention dots as int8xint8
                                        MXU matmuls (the dequantize leaves
                                        the VPU; docs/DECODE_ROOFLINE.md)
  x6   x5 + W8A8 encoder QKV/O       — dynamic per-row activation int8 MXU
                                        dots (measured: no gain at
                                        base/medium; MLP half stays on the
                                        faster fused bf16 kernel)
  x7   x5 + int8 SELF cache          — honest negative: exact token
                                        agreement with x5 but measured
                                        slower (overhead-bound step);
                                        kept opt-in

`int8` is accepted as an alias of x4 to mirror the reference's naming.
Each variant can be materialized as a model-dir with a metadata.json
sidecar, mirroring optimization_metadata.json (scripts/optimize_onnx_whisper.py:56-58).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, asdict
from typing import Dict

from whisper_tpu.runtime.session import RuntimeCfg


@dataclass(frozen=True)
class VariantSpec:
    name: str
    description: str
    dtype: str
    matmul_precision: str
    fused_frontend: bool = False
    fused_attention: bool = False
    int8_weights: bool = False
    int8_kv_cache: bool = False
    packed_cross_kv: bool = False
    int8_mxu_attn: bool = False
    int8_self_kv: bool = False
    int8_encoder_act: bool = False
    fused_encoder_mlp: bool = False
    fused_encoder_block: bool = False
    fused_decoder_step: bool = False
    audio_transfer: str = "int16"


LADDER: Dict[str, VariantSpec] = {
    "x0": VariantSpec("x0", "fp32 strict parity (HIGHEST precision)",
                      "float32", "highest", audio_transfer="float32"),
    "x1": VariantSpec("x1", "fp32 storage, HIGH matmul precision",
                      "float32", "high", audio_transfer="float32"),
    "x2": VariantSpec("x2", "bf16 serving precision", "bfloat16", "default"),
    # fused_encoder_mlp promoted round 3: -4.4 ms device time on the
    # bucket-16 encoder (21.1 -> 16.7 ms, scripts/bench_encoder_block.py
    # delta method); tanh-GELU numerics bounded by the tie-flip gate
    # (tests/test_parity_margins.py) and the x5-vs-x4 chain pin.
    "x3": VariantSpec("x3", "bf16 + fused Pallas log-mel + fused attention"
                      " + fused encoder MLP",
                      "bfloat16", "default", fused_frontend=True,
                      fused_attention=True, fused_encoder_mlp=True),
    "x4": VariantSpec("x4", "bf16 + fused kernels + int8 weights + int8 KV",
                      "bfloat16", "default", fused_frontend=True,
                      fused_attention=True, fused_encoder_mlp=True,
                      int8_weights=True,
                      int8_kv_cache=True, packed_cross_kv=True),
    "x5": VariantSpec("x5", "x4 + int8xint8 MXU attention (quantized "
                      "q/probs; dequantize off the VPU)",
                      "bfloat16", "default", fused_frontend=True,
                      fused_attention=True, fused_encoder_mlp=True,
                      int8_weights=True,
                      int8_kv_cache=True, packed_cross_kv=True,
                      int8_mxu_attn=True),
    "x6": VariantSpec("x6", "x5 + W8A8 encoder QKV/O (dynamic activation "
                      "int8 MXU dots; MLP half stays on the fused bf16 "
                      "kernel, which measured faster than W8A8)",
                      "bfloat16", "default", fused_frontend=True,
                      fused_attention=True, fused_encoder_mlp=True,
                      int8_weights=True,
                      int8_kv_cache=True, packed_cross_kv=True,
                      int8_mxu_attn=True, int8_encoder_act=True),
    "x7": VariantSpec("x7", "x5 + int8 SELF cache (per-row scales, "
                      "in-place quantized insert): attention int8 on the "
                      "MXU end to end. Exact token agreement with x5 but "
                      "MEASURED SLOWER (+17%/kernel call — the self step "
                      "is overhead-bound, not traffic-bound; "
                      "docs/DECODE_ROOFLINE.md addendum 2); kept opt-in",
                      "bfloat16", "default", fused_frontend=True,
                      fused_attention=True, fused_encoder_mlp=True,
                      int8_weights=True,
                      int8_kv_cache=True, packed_cross_kv=True,
                      int8_mxu_attn=True, int8_self_kv=True),
}
LADDER["int8"] = LADDER["x4"]


def apply_variant(cfg: RuntimeCfg, name: str) -> tuple[RuntimeCfg, VariantSpec]:
    """Return a copy of `cfg` with the variant's dtype/precision applied."""
    try:
        spec = LADDER[name]
    except KeyError:
        raise KeyError(f"Unknown variant {name!r}; known: {sorted(LADDER)}")
    import dataclasses

    return (
        dataclasses.replace(
            cfg,
            dtype=spec.dtype,
            matmul_precision=spec.matmul_precision,
            fused_frontend=spec.fused_frontend,
            fused_attention=spec.fused_attention,
            int8_weights=spec.int8_weights,
            int8_kv_cache=spec.int8_kv_cache,
            packed_cross_kv=spec.packed_cross_kv,
            int8_mxu_attn=spec.int8_mxu_attn,
            int8_self_kv=spec.int8_self_kv,
            int8_encoder_act=spec.int8_encoder_act,
            fused_encoder_mlp=spec.fused_encoder_mlp,
            fused_encoder_block=spec.fused_encoder_block,
            fused_decoder_step=spec.fused_decoder_step,
            audio_transfer=spec.audio_transfer,
        ),
        spec,
    )


def write_variant_metadata(model_dir: str, spec: VariantSpec,
                           base_model_id: str) -> None:
    """metadata.json sidecar mirroring the reference's
    optimization_metadata.json convention."""
    meta = {
        "variant": spec.name,
        "description": spec.description,
        **asdict(spec),
        "base_model_id": base_model_id,
        "framework": "whisper_tpu",
    }
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "optimization_metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
