"""Variant-quality diagnosis: teacher-forced logit deltas + argmax margins.

The round-2 parity matrix stopped at "x3+ agree with x0 on 25-27/48 prefix
tokens" without distinguishing *tie-flips on near-tied logits* from *real
numeric drift* (VERDICT weak #1).  This module produces the evidence:

- ``teacher_forced_logits``: the fp32 logits a variant session assigns to
  every position of a given token sequence (its own mel + encoder +
  prefill path, its own quantized weights) — the variant's numeric field
  along a fixed trajectory.
- ``divergence_report``: compares a variant's field against x0's along
  x0's own greedy chains and, at each realized decode divergence, reports
    * the x0 argmax margin between x0's token and the variant's token,
    * the max |Δlogit| over the (non-suppressed) vocab at that step,
    * the chain-wide max |Δlogit|.

Tie-flip criterion: if the variant picked b where x0 picked a, then
  lg_v[b] >= lg_v[a]  =>  lg_0[a] - lg_0[b] <= 2 * max|Δlogit@step|.
A divergence is a *tie-flip* when that inequality holds with Δ at the
rounding scale of the variant's dtype path (bf16 ~ 0.4% relative, int8
weight quant ~ 0.4%/channel); it would be *drift* if max|Δlogit| itself
were large relative to the logit scale.  The reference's analog evidence
is int8-vs-fp32 transcript comparability (ref quantize_onnx_int8.py:28-45
scope; results.old transcript diffs).

Used by scripts/parity_matrix.py (TPU report) and
tests/test_parity_margins.py (CPU gate at real whisper-base dims).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

NEG = float("-inf")

# Decode-step kernels (packed int8 cross-attention, fused self-attention)
# accumulate in a different order than the prefill path used for
# teacher-forcing; a variant-field gap smaller than this can legitimately
# flip at decode time.  Scale: bf16 rounding on O(10) logits is ~0.04-0.1;
# observed step-vs-prefill deltas are below 0.15 (tests/test_parity_margins
# calibration run, 2026-08-17).
KERNEL_EPS = 0.25


def teacher_forced_logits(session, mel_chunk: np.ndarray,
                          tokens: Sequence[int]) -> np.ndarray:
    """fp32 logits [len(tokens), V] the session's variant assigns along
    `tokens` (prompt + generated), teacher-forced in ONE prefill pass.

    Runs the variant's own encoder configuration (fused kernels, int8
    weights/activations, int8 cross-KV) so the returned field carries the
    variant's full numeric path.  Position i's row predicts token i+1.
    """
    import jax.numpy as jnp

    from whisper_tpu.models import whisper

    cfg = session.cfg
    dims = session.dims
    enc = whisper.encoder_apply(
        session.params, dims, jnp.asarray(mel_chunk)[None],
        precision=cfg.precision,
        fused_attention=cfg.fused_attention,
        int8_activations=session._enc_i8,
        fused_mlp=cfg.fused_encoder_mlp,
        fused_block=cfg.fused_encoder_block,
    )
    toks = jnp.asarray(np.asarray(tokens, dtype=np.int32))[None]
    logits, _ = whisper.decoder_prefill(
        session.params, dims, toks, enc,
        max_len=len(tokens) + 1,
        precision=cfg.precision,
        int8_cross_kv=cfg.int8_kv_cache,
    )
    return np.asarray(logits[0], dtype=np.float32)


@dataclass
class StepDiag:
    round_idx: int
    step: int            # index into the round's generated chain
    x0_token: int
    var_token: int
    x0_margin: float     # lg0[x0_token] - lg0[var_token] (>= 0)
    var_margin: float    # lgv[x0_token] - lgv[var_token] (teacher-forced;
                         # <= 0 when the variant's own field already flips,
                         # small-positive when only its decode-step kernel
                         # numerics flip it)
    max_dlogit_step: float
    tie_flip: bool       # see KERNEL_EPS in divergence_report


@dataclass
class VariantDiag:
    name: str
    max_dlogit_chain: float   # over all steps/rounds, non-suppressed vocab
    p99_dlogit_chain: float
    median_x0_margin: float   # x0 top1-vs-top2 margin across all steps
    divergences: List[StepDiag]

    @property
    def all_tie_flips(self) -> bool:
        return all(d.tie_flip for d in self.divergences)


def _suppress(lg: np.ndarray, sup: set) -> np.ndarray:
    if not sup:
        return lg
    lg = lg.copy()
    lg[:, list(sup)] = NEG
    return lg


def divergence_report(
    name: str,
    sess_x0,
    sess_var,
    mel_x0: np.ndarray,
    mel_var: np.ndarray,
    prompt: Sequence[int],
    x0_rounds: List[List[int]],
    var_rounds: List[List[int]],
    eot_id: Optional[int] = None,
) -> VariantDiag:
    """Diagnose a variant's divergences from x0 along x0's greedy chains.

    mel_x0 / mel_var: each session's OWN [n_mels, 3000] chunk (the mel
    path is part of the variant's numerics).  x0_rounds / var_rounds: the
    actually-decoded chains per suppression round (scripts/parity_matrix.py
    semantics: round r suppresses all earlier rounds' tokens).
    """
    p = len(prompt)
    divs: List[StepDiag] = []
    d_max = 0.0
    d_all: List[float] = []
    margins: List[float] = []
    sup: set = set()
    for r, (c0, cv) in enumerate(zip(x0_rounds, var_rounds)):
        seq = list(prompt) + list(c0)
        lg0 = _suppress(teacher_forced_logits(sess_x0, mel_x0, seq), sup)
        lgv = _suppress(teacher_forced_logits(sess_var, mel_var, seq), sup)
        # positions p-1 .. p-1+len(c0)-1 predict chain tokens 0..len-1
        for i, tok0 in enumerate(c0):
            row0 = lg0[p - 1 + i]
            rowv = lgv[p - 1 + i]
            ok = np.isfinite(row0)
            d_step = float(np.max(np.abs(rowv[ok] - row0[ok])))
            d_all.append(d_step)
            d_max = max(d_max, d_step)
            srt = np.sort(row0[ok])
            margins.append(float(srt[-1] - srt[-2]))
            early_eot = i >= len(cv) and eot_id is not None
            if (i < len(cv) and cv[i] != tok0) or early_eot:
                tokv = int(eot_id) if early_eot else cv[i]
                margin = float(row0[tok0] - row0[tokv])
                vmargin = float(rowv[tok0] - rowv[tokv])
                # Tie-flip if (a) the variant's teacher-forced field itself
                # prefers tokv — then margin <= 2Δ holds by the triangle
                # inequality — or (b) the field still narrowly prefers tok0
                # (vmargin <= KERNEL_EPS) and the decode-STEP kernels
                # (packed int8 cross-attn vs the prefill path used for
                # teacher-forcing) tipped a near-tie with their different
                # accumulation order.  Anything past both bounds is drift.
                divs.append(StepDiag(
                    round_idx=r, step=i, x0_token=int(tok0),
                    var_token=int(tokv), x0_margin=margin,
                    var_margin=vmargin, max_dlogit_step=d_step,
                    tie_flip=(margin <= 2.0 * d_step + 1e-6
                              or vmargin <= KERNEL_EPS),
                ))
                break  # past the first divergence the trajectories differ
            if i >= len(cv):
                break
        else:
            # No divergence inside c0 — but a variant that keeps decoding
            # PAST x0's stop is drifting too: position p-1+len(c0) is
            # where x0 predicted EOT (the last teacher-forced row), and
            # the variant emitted cv[len(c0)] there instead.
            if (eot_id is not None and len(cv) > len(c0)
                    and (not divs or divs[-1].round_idx != r)):
                row0 = lg0[p - 1 + len(c0)]
                rowv = lgv[p - 1 + len(c0)]
                ok = np.isfinite(row0)
                d_step = float(np.max(np.abs(rowv[ok] - row0[ok])))
                tokv = int(cv[len(c0)])
                margin = float(row0[eot_id] - row0[tokv])
                vmargin = float(rowv[eot_id] - rowv[tokv])
                divs.append(StepDiag(
                    round_idx=r, step=len(c0), x0_token=int(eot_id),
                    var_token=tokv, x0_margin=margin,
                    var_margin=vmargin, max_dlogit_step=d_step,
                    tie_flip=(margin <= 2.0 * d_step + 1e-6
                              or vmargin <= KERNEL_EPS),
                ))
        sup.update(c0)
    return VariantDiag(
        name=name,
        max_dlogit_chain=d_max,
        p99_dlogit_chain=float(np.percentile(d_all, 99)) if d_all else 0.0,
        median_x0_margin=float(np.median(margins)) if margins else 0.0,
        divergences=divs,
    )
