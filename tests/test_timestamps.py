"""Timestamp-grammar tests: rule-by-rule unit checks and an oracle
comparison against transformers' WhisperTimeStampLogitsProcessor."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.runtime.timestamps import (
    TimestampCfg,
    TimestampState,
    apply_rules,
    init_state,
    update_state,
    render_timestamp,
)

V = 120
EOT = 2
NO_TS = 90
TSB = 91  # <|0.00|>
CFG = TimestampCfg(timestamp_begin=TSB, eot_id=EOT, no_timestamps_id=NO_TS,
                   max_initial_timestamp_index=10)


def _state(last=EOT, penult=EOT, max_ts=0):
    return TimestampState(
        last=jnp.asarray([last], dtype=jnp.int32),
        penult=jnp.asarray([penult], dtype=jnp.int32),
        max_ts=jnp.asarray([max_ts], dtype=jnp.int32),
    )


def _rules(logits, state, step):
    return np.asarray(
        apply_rules(jnp.asarray(logits[None], dtype=jnp.float32), state,
                    jnp.int32(step), CFG)
    )[0]


class TestRules:
    def test_first_token_must_be_bounded_timestamp(self):
        logits = np.zeros(V, dtype=np.float32)
        logits[50] = 10.0  # strong text token
        out = _rules(logits, init_state(1, EOT), 0)
        assert np.isneginf(out[50])
        assert np.isfinite(out[TSB])           # <|0.00|> allowed
        assert np.isfinite(out[TSB + 10])      # cap inclusive
        assert np.isneginf(out[TSB + 11])      # beyond cap banned

    def test_notimestamps_always_banned(self):
        logits = np.zeros(V, dtype=np.float32)
        out = _rules(logits, _state(last=TSB + 1, penult=5, max_ts=TSB + 1), 3)
        assert np.isneginf(out[NO_TS])

    def test_pair_completion_bans_text(self):
        # last was timestamp, penultimate was text -> must close the pair.
        # With uniform logits the probability-mass rule ALSO fires (many
        # timestamp columns outweigh any single text token), banning EOT —
        # exactly what HF does (`scores[:, :timestamp_begin] = -inf`), so
        # EOT viability is asserted with a dominant EOT logit instead.
        logits = np.zeros(V, dtype=np.float32)
        out = _rules(logits, _state(last=TSB + 3, penult=7, max_ts=TSB + 3), 4)
        assert np.isneginf(out[1])             # text banned
        assert np.isfinite(out[TSB + 3])       # same timestamp closes pair
        eot_hot = np.full(V, -2.0, dtype=np.float32)
        eot_hot[EOT] = 6.0
        out2 = _rules(eot_hot,
                      _state(last=TSB + 3, penult=7, max_ts=TSB + 3), 4)
        assert np.isfinite(out2[EOT])          # EOT can still end the window

    def test_after_pair_bans_timestamps(self):
        # last two both timestamps -> text required.
        logits = np.zeros(V, dtype=np.float32)
        out = _rules(
            logits, _state(last=TSB + 4, penult=TSB + 4, max_ts=TSB + 4), 5
        )
        assert np.isneginf(out[TSB + 5])
        # text still possible unless the prob rule fires; give text mass
        logits[10] = 5.0
        out = _rules(
            logits, _state(last=TSB + 4, penult=TSB + 4, max_ts=TSB + 4), 5
        )
        assert np.isfinite(out[10])

    def test_monotonic_timestamps(self):
        logits = np.zeros(V, dtype=np.float32)
        logits[10] = 8.0  # keep the prob rule quiet
        out = _rules(logits, _state(last=8, penult=TSB + 5, max_ts=TSB + 5), 6)
        # new segment start: strictly greater required
        assert np.isneginf(out[TSB + 4])
        assert np.isneginf(out[TSB + 5])
        assert np.isfinite(out[TSB + 6])

    def test_prob_mass_forces_timestamp(self):
        logits = np.zeros(V, dtype=np.float32)
        logits[TSB:] = 2.0   # lots of timestamp mass
        logits[10] = 2.5     # best text token, but mass loses
        out = _rules(logits, _state(last=8, penult=9, max_ts=0), 6)
        assert np.isneginf(out[10])
        assert np.isfinite(out[TSB + 1])

    def test_update_state_tracks_max(self):
        s = update_state(_state(), jnp.asarray([TSB + 7], dtype=jnp.int32), CFG)
        assert int(s.max_ts[0]) == TSB + 7
        s2 = update_state(s, jnp.asarray([5], dtype=jnp.int32), CFG)
        assert int(s2.max_ts[0]) == TSB + 7
        assert int(s2.last[0]) == 5 and int(s2.penult[0]) == TSB + 7

    def test_render(self):
        assert render_timestamp(TSB, TSB) == "<|0.00|>"
        assert render_timestamp(TSB + 75, TSB) == "<|1.50|>"


class TestHFOracle:
    """Compare post-rule argmax against transformers'
    WhisperTimeStampLogitsProcessor on random logits + random valid
    histories."""

    def test_argmax_matches_hf_processor(self):
        transformers = pytest.importorskip("transformers")
        torch = pytest.importorskip("torch")
        from transformers.generation.logits_process import (
            WhisperTimeStampLogitsProcessor,
        )

        gen_cfg = transformers.GenerationConfig(
            no_timestamps_token_id=NO_TS,
            max_initial_timestamp_index=10,
            eos_token_id=EOT,
            decoder_start_token_id=3,
        )
        begin_index = 4  # prompt length
        proc = WhisperTimeStampLogitsProcessor(
            gen_cfg, begin_index=begin_index
        )

        rng = np.random.default_rng(0)
        prompt = [3, 50, 51, NO_TS]
        histories = [
            [],                                  # first token
            [TSB],                               # just opened a segment
            [TSB, 5, 6],                         # inside text
            [TSB, 5, 6, TSB + 8],                # needs pair close
            [TSB, 5, TSB + 3, TSB + 3, 7],       # after closed pair
        ]
        for hist in histories:
            for trial in range(6):
                logits = rng.normal(0, 3, V).astype(np.float32)
                ids = torch.tensor([prompt + hist], dtype=torch.long)
                want = (
                    proc(ids, torch.from_numpy(logits.copy()[None]))
                    .numpy()[0]
                )

                state = init_state(1, EOT)
                for t in hist:
                    state = update_state(
                        state, jnp.asarray([t], dtype=jnp.int32), CFG
                    )
                got = _rules(logits, state, len(hist))
                assert int(got.argmax()) == int(want.argmax()), (
                    f"hist={hist} trial={trial}: "
                    f"got {got.argmax()} want {want.argmax()}"
                )

    def test_eot_top_logit_matches_hf(self):
        """Adversarial EOT cases: random logits rarely rank EOT first, so
        the random sweep above misses the begin-rule and probability-mass
        EOT masking (HF masks [:timestamp_begin] in both, which includes
        EOT; a round-3 review caught this implementation exempting it)."""
        transformers = pytest.importorskip("transformers")
        torch = pytest.importorskip("torch")
        from transformers.generation.logits_process import (
            WhisperTimeStampLogitsProcessor,
        )

        gen_cfg = transformers.GenerationConfig(
            no_timestamps_token_id=NO_TS,
            max_initial_timestamp_index=10,
            eos_token_id=EOT,
            decoder_start_token_id=3,
        )
        begin_index = 4
        proc = WhisperTimeStampLogitsProcessor(
            gen_cfg, begin_index=begin_index
        )
        prompt = [3, 50, 51, NO_TS]

        cases = []
        # EOT dominant at the FIRST generated token.
        l0 = np.full(V, -2.0, np.float32)
        l0[EOT] = 4.0
        l0[TSB + 2] = 3.0
        cases.append(([], l0))
        # EOT slightly on top mid-text with timestamp mass winning:
        # 14 timestamps at 3.5 sum past one EOT at 4.0.
        l1 = np.full(V, -5.0, np.float32)
        l1[EOT] = 4.0
        l1[10] = 3.0
        l1[TSB + 5: TSB + 19] = 3.5
        cases.append(([TSB, 5, 6], l1))
        # Pair-close position: EOT must STAY allowed there (HF masks only
        # [:eos] after an unclosed timestamp).
        l2 = np.full(V, -2.0, np.float32)
        l2[EOT] = 4.0
        cases.append(([TSB, 5, 6, TSB + 8], l2))

        for hist, logits in cases:
            ids = torch.tensor([prompt + hist], dtype=torch.long)
            want = proc(ids, torch.from_numpy(logits.copy()[None])).numpy()[0]
            state = init_state(1, EOT)
            for t in hist:
                state = update_state(
                    state, jnp.asarray([t], dtype=jnp.int32), CFG
                )
            got = _rules(logits, state, len(hist))
            assert int(got.argmax()) == int(want.argmax()), (
                f"hist={hist}: got {got.argmax()} want {want.argmax()}"
            )
