"""Quality gate for the non-parity ladder rungs (VERDICT r2, missing #2).

At REAL whisper-base dimensions, the bf16/int8 variants must deviate from
the x0 fp32-parity rung only at *rounding scale*, and every realized greedy
divergence must be a *tie-flip* (the x0 margin between the two candidate
tokens lies within twice the step's max |Δlogit|) — not numeric drift.

Representative rungs: x2 (pure bf16 — the dtype family) and x4 (int8
weights + int8 cross-KV + fused kernels — the quantized family).  x3
shares x4's kernel set minus quantization; x5 is pinned token-for-token to
x4 by tests/test_fullscale_parity.py::test_fullscale_x5_matches_x4_chain;
x6 differs from x5 only inside the encoder matmuls, bounded here by the
same Δlogit measurement on x4's path.

Bounds were calibrated on this suite's CPU mesh and the TPU run of
scripts/parity_matrix.py (docs/PARITY_MATRIX.md): observed max|Δlogit| is
O(0.1) on an O(10) logit scale for bf16 (~0.4% relative — bf16 epsilon),
with ~3x headroom here.
"""

import numpy as np
import pytest

from whisper_tpu.models.convert import init_params
from whisper_tpu.models.registry import get_dims
from whisper_tpu.pipeline.longform import compute_mel_full
from whisper_tpu.runtime.generate import strip_generated
from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
from whisper_tpu.variants.diagnose import divergence_report
from whisper_tpu.variants.ladder import apply_variant

SOT, EN, TRANSCRIBE, NOTS, EOT = 50258, 50259, 50359, 50363, 50257
PROMPT = [SOT, EN, TRANSCRIBE, NOTS]

# max |Δlogit| vs x0 allowed along a teacher-forced chain (absolute, on a
# logit scale of O(10) at random whisper-base weights).
DLOGIT_BOUND = {"x2": 0.5, "x4": 1.0}
ROUNDS = 2
MAX_NEW = 8


@pytest.fixture(scope="module")
def base():
    dims = get_dims("openai/whisper-base")
    params = init_params(dims, seed=0)
    rng = np.random.default_rng(7)
    t = np.linspace(0.0, 30.0, 30 * 16000, endpoint=False)
    audio = (0.3 * np.sin(2 * np.pi * 220.0 * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 0.7 * t))
             + 0.05 * rng.normal(0.0, 1.0, t.shape)).astype(np.float32)
    return dims, params, audio


def _chains(sess, mel):
    rounds, sup = [], set()
    for _ in range(ROUNDS):
        toks = sess.transcribe_chunks(
            mel[None, :, :3000], prompt=PROMPT, max_new_tokens=MAX_NEW,
            eot_id=EOT, suppress_ids=sorted(sup))
        chain = strip_generated(np.asarray(toks)[0], EOT)
        rounds.append(chain)
        sup.update(chain)
    return rounds


@pytest.mark.parametrize("variant", ["x2", "x4"])
def test_divergences_are_tie_flips_at_base_dims(base, variant):
    dims, params, audio = base
    cfg0, _ = apply_variant(RuntimeCfg(max_batch=1), "x0")
    cfgv, _ = apply_variant(RuntimeCfg(max_batch=1), variant)
    s0 = WhisperSession(params, dims, cfg0)
    sv = WhisperSession(params, dims, cfgv)
    mel0, _ = compute_mel_full(s0, audio)
    melv, _ = compute_mel_full(sv, audio)

    r0 = _chains(s0, np.asarray(mel0))
    rv = _chains(sv, np.asarray(melv))

    diag = divergence_report(
        variant, s0, sv, np.asarray(mel0)[:, :3000],
        np.asarray(melv)[:, :3000], PROMPT, r0, rv, eot_id=EOT)

    # (1) the variant's numeric field stays at rounding scale vs x0
    assert diag.max_dlogit_chain <= DLOGIT_BOUND[variant], diag
    # (2) every realized greedy divergence is a tie-flip, not drift
    for d in diag.divergences:
        assert d.tie_flip, (
            f"{variant} divergence at r{d.round_idx} s{d.step} is NOT a "
            f"tie-flip: x0 margin {d.x0_margin:.4f} > "
            f"2*Δ {2 * d.max_dlogit_step:.4f}, var margin "
            f"{d.var_margin:.4f}")
        # and the x0 field itself was near-tied there — the OR branch of
        # the criterion must never excuse a large-margin flip
        assert d.x0_margin <= 0.5, d
    # (3) the trajectory really is degenerate/near-tied where it flips:
    # x0's median top1-top2 margin should dwarf nothing — just record it
    # is positive (sanity that margins are being computed).
    assert diag.median_x0_margin > 0.0


def test_late_stop_divergence_detected(monkeypatch):
    """A variant that keeps decoding PAST x0's EOT must register a
    divergence (review r3: the loop over c0 ended without checking the
    position where x0 predicted EOT)."""
    from whisper_tpu.variants import diagnose

    V, P = 8, 2
    EOT = 7

    def fake_logits(session, mel, seq):
        n = len(seq)
        lg = np.full((n, V), -5.0, dtype=np.float32)
        for i in range(n):
            lg[i, EOT if i >= P + 1 else 3] = 5.0
        if session != "x0":
            # Teacher-forced fields nearly identical (tiny Δlogit) while
            # the variant's DECODE kept going past EOT: genuine drift,
            # not a tie-flip (margin >> 2Δ and vmargin >> kernel eps).
            lg = lg + 0.01
        return lg

    monkeypatch.setattr(diagnose, "teacher_forced_logits", fake_logits)
    diag = diagnose.divergence_report(
        "xv", "x0", "var", None, None, prompt=[0, 1],
        x0_rounds=[[3, 3]],            # x0: two tokens then EOT
        var_rounds=[[3, 3, 4, 4]],     # variant keeps going
        eot_id=EOT,
    )
    assert len(diag.divergences) == 1
    d = diag.divergences[0]
    assert d.x0_token == EOT and d.var_token == 4 and d.step == 2
    assert not d.tie_flip          # 10.0 margin is genuine drift
