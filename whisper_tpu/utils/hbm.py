"""HBM resident-footprint estimator — fail fast before a doomed compile.

A speculative-decoding config that cannot fit HBM costs ~10 min of remote
XLA compile before the RESOURCE_EXHAUSTED arrives (measured 2026-08-19:
whisper-large-v3 bf16 speculative at B=16 keeps TWO full bf16 cross-KV
caches of ~7.9 GB each and needs 17.52 GB of the chip's 15.75 GB).  The
reference has no counterpart (its ORT sessions size themselves lazily on
CPU, /root/reference/src/main.rs:523-560); on TPU the resident set is
fully determined by static shapes at trace time, so we can price it
exactly and warn BEFORE compilation.

Estimates cover the long-lived residents: parameters, KV caches (self +
cross, fp/int8), and encoder states.  XLA temps (attention score tiles,
fusion scratch) are excluded — they are per-program and small next to the
residents at decode shapes — so treat the numbers as a tight lower bound
and keep ~5-10% headroom.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from whisper_tpu.models.registry import WhisperDims


def param_count(dims: WhisperDims) -> int:
    """Exact parameter count of the pytree `models/convert.py:init_params`
    builds (and converted HF checkpoints mirror).  Pinned against the real
    tree in tests/test_hbm.py."""
    d, f = dims.d_model, dims.d_ffn
    le, ld = dims.encoder_layers, dims.decoder_layers

    attn = 4 * d * d + 3 * d                     # q/k/v/o weights, q/v/o bias
    mlp = d * f + f + f * d + d                  # fc1 + fc2
    ln = 2 * d                                   # scale + bias

    enc_layer = ln + attn + ln + mlp
    enc = (
        3 * dims.n_mels * d + d                  # conv1
        + 3 * d * d + d                          # conv2
        + dims.max_source_positions * d          # (sinusoidal, still stored)
        + le * enc_layer
        + ln                                     # ln_f
    )
    dec_layer = ln + attn + ln + attn + ln + mlp  # self + cross + mlp
    dec = (
        dims.vocab_size * d
        + dims.max_target_positions * d
        + ld * dec_layer
        + ln
    )
    return enc + dec


def param_bytes(dims: WhisperDims, bytes_per_el: int = 2) -> int:
    """Resident weight bytes (2 = bf16, 4 = fp32; int8 variants store the
    MatMul weights at 1 byte + fp32 scales, ~0.5x of bf16)."""
    return param_count(dims) * bytes_per_el


def kv_cache_bytes(
    dims: WhisperDims,
    batch: int,
    max_len: int,
    enc_len: Optional[int] = None,
    *,
    kv_bytes: int = 2,
    int8_cross: bool = False,
    int8_self: bool = False,
) -> int:
    """Bytes of one decoder KV cache as `models/whisper.py:decoder_prefill`
    allocates it: self_k/self_v [L,B,H,max_len,Dh] + cross_k/cross_v
    [L,B,H,enc_len,Dh] (+fp32 per-(L,B,H) scales when int8)."""
    enc_len = dims.max_source_positions if enc_len is None else enc_len
    l, h, dh = dims.decoder_layers, dims.decoder_heads, dims.head_dim
    self_el = l * batch * h * max_len * dh
    cross_el = l * batch * h * enc_len * dh
    total = 2 * self_el * (1 if int8_self else kv_bytes)
    total += 2 * cross_el * (1 if int8_cross else kv_bytes)
    scales = 2 * l * batch * h * 4                # fp32 [L,B,H,1,1] k+v
    if int8_cross:
        total += scales
    if int8_self:
        total += scales
    return total


def decode_footprint(
    dims: WhisperDims,
    batch: int,
    max_len: int,
    enc_len: Optional[int] = None,
    *,
    weight_bytes: int = 2,
    kv_bytes: int = 2,
    int8_cross: bool = False,
    int8_self: bool = False,
    draft_dims: Optional[WhisperDims] = None,
    shared_draft_params: bool = False,
    cache_copies: float = 1.0,
) -> Dict[str, int]:
    """Resident-set breakdown (bytes) for a greedy or speculative decode.

    draft_dims adds the drafter's weights (unless shared_draft_params —
    the A/B's 'self' arm passes the same buffers twice), cache, and
    encoder states.  Returns {'params', 'kv_cache', 'enc_states',
    'draft_*', 'total'}.

    cache_copies multiplies the KV-cache terms: inside a decode
    while_loop XLA holds roughly TWO copies of each loop-carried cache
    (ping-pong buffers — the measured 2026-08-19 OOM breakdown was
    'program 14.03G' vs a 7.9 GB single-copy cross-cache estimate), so
    speculative callers pass 2.0 to price the compiled program rather
    than the steady resident set.
    """
    enc_len = dims.max_source_positions if enc_len is None else enc_len
    out = {
        "params": param_bytes(dims, weight_bytes),
        "kv_cache": int(cache_copies * kv_cache_bytes(
            dims, batch, max_len, enc_len, kv_bytes=kv_bytes,
            int8_cross=int8_cross, int8_self=int8_self,
        )),
        "enc_states": batch * enc_len * dims.d_model * kv_bytes,
    }
    if draft_dims is not None:
        out["draft_params"] = (
            0 if shared_draft_params else param_bytes(draft_dims, weight_bytes)
        )
        out["draft_kv_cache"] = int(cache_copies * kv_cache_bytes(
            draft_dims, batch, max_len, enc_len, kv_bytes=kv_bytes,
            int8_cross=int8_cross, int8_self=int8_self,
        ))
        out["draft_enc_states"] = (
            batch * enc_len * draft_dims.d_model * kv_bytes
        )
    out["total"] = sum(out.values())
    return out


def device_hbm_budget() -> Optional[int]:
    """Best-effort HBM capacity in bytes: WHISPER_TPU_HBM_GB env override,
    else the default backend device's memory_stats. None when unknown
    (CPU backend, axon tunnel without stats)."""
    env = os.environ.get("WHISPER_TPU_HBM_GB")
    if env:
        try:
            return int(float(env) * (1 << 30))
        except ValueError:
            return None
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats()
        cap = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        return int(cap) if cap else None
    except Exception:  # noqa: BLE001 — stats are a nicety on every backend
        return None


def check_fit(
    footprint: Dict[str, int],
    budget: Optional[int] = None,
    *,
    label: str = "decode",
    headroom: float = 0.95,
) -> Optional[str]:
    """Return a warning string when footprint['total'] exceeds
    headroom*budget (None when it fits or the budget is unknown).
    Callers warn/raise as appropriate; estimates exclude XLA temps, so a
    returned warning means the compile is near-certain to OOM."""
    budget = device_hbm_budget() if budget is None else budget
    if not budget:
        return None
    total = footprint["total"]
    if total <= headroom * budget:
        return None
    gib = 1 << 30
    parts = ", ".join(
        f"{k}={v / gib:.2f}" for k, v in footprint.items() if k != "total"
    )
    return (
        f"{label}: resident HBM estimate {total / gib:.2f} GiB exceeds "
        f"{headroom:.0%} of the {budget / gib:.2f} GiB budget ({parts}); "
        f"reduce batch, shorten max_len, or enable int8 KV"
    )
