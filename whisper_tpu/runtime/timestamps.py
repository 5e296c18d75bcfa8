"""Whisper timestamp decoding rules, vectorized for the on-device loop.

The reference's ``--timestamps`` flag only omits ``<|notimestamps|>`` from
the prompt and leaves the timestamp grammar unenforced (ref
src/main.rs:853-856; SURVEY.md §7 flags real timestamp decoding as net-new
work).  This module implements the standard Whisper timestamp grammar (the
behavior of HF's WhisperTimeStampLogitsProcessor / OpenAI's
ApplyTimestampRules) as a pure function over logits plus a tiny carried
state, so it runs inside ``lax.while_loop`` with no host sync:

1. ``<|notimestamps|>`` is always suppressed.
2. Timestamps come in pairs (except directly after a segment start): if the
   last token was a timestamp and the one before was not, the next token
   must close the pair (timestamp or EOT, no text); if the last two were
   timestamps, the next must be text (no timestamp).
3. Timestamps are non-decreasing: candidates below the furthest timestamp
   seen are banned (equality allowed only when closing a pair).
4. The first generated token must be a timestamp, capped at
   ``max_initial_timestamp_index`` (default 50 = 1.0 s).
5. If the total probability mass on timestamps exceeds the most likely text
   token, text is banned for this step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")  # python scalar: stays a jaxpr literal, never a hoisted const


class TimestampCfg(NamedTuple):
    timestamp_begin: int          # id of <|0.00|>
    eot_id: int
    no_timestamps_id: int
    max_initial_timestamp_index: int = 50  # 1.0 s


class TimestampState(NamedTuple):
    """Per-row carried state for the grammar."""

    last: jax.Array      # [B] previous token (eot if none yet)
    penult: jax.Array    # [B] token before that
    max_ts: jax.Array    # [B] largest timestamp id generated (0 = none)


def init_state(batch: int, eot_id: int) -> TimestampState:
    z = jnp.full((batch,), eot_id, dtype=jnp.int32)
    return TimestampState(last=z, penult=z,
                          max_ts=jnp.zeros((batch,), dtype=jnp.int32))


def apply_rules(
    logits: jax.Array,        # [B, V] float32
    state: TimestampState,
    step: jax.Array,          # scalar int32: 0 for the first generated token
    cfg: TimestampCfg,
) -> jax.Array:
    b, v = logits.shape
    col = jnp.arange(v)[None, :]
    tsb = cfg.timestamp_begin
    is_ts_col = col >= tsb
    is_text_col = col < cfg.eot_id

    logits = jnp.where(col == cfg.no_timestamps_id, NEG_INF, logits)

    last_was = (state.last >= tsb)[:, None]
    pen_was = jnp.logical_or(state.penult >= tsb, step < 2)[:, None]

    # Pair grammar (rule 2).
    logits = jnp.where(last_was & pen_was & is_ts_col, NEG_INF, logits)
    logits = jnp.where(last_was & ~pen_was & is_text_col, NEG_INF, logits)

    # Monotonic timestamps (rule 3): ban ts < bound, where the bound allows
    # equality only when closing a pair.
    closing = last_was & ~pen_was
    bound = jnp.where(closing[:, 0], state.max_ts, state.max_ts + 1)
    has_ts = (state.max_ts > 0)[:, None]
    logits = jnp.where(has_ts & is_ts_col & (col < bound[:, None]),
                       NEG_INF, logits)

    # First token must be a bounded timestamp (rule 4).  EOT is masked
    # too: HF's processor does `scores[:, :timestamp_begin] = -inf` at
    # the begin index and eot < timestamp_begin (a window always opens
    # with a timestamp; budget/EOT can end it only later).
    is_begin = step == 0
    init_cap = tsb + cfg.max_initial_timestamp_index
    begin_ban = jnp.logical_or(col < tsb, col > init_cap)
    logits = jnp.where(jnp.logical_and(is_begin, begin_ban), NEG_INF, logits)

    # Probability-mass rule (5).  Same HF semantics: when timestamp mass
    # wins, EVERYTHING below timestamp_begin is banned, incl. EOT (the
    # max_text comparison itself also includes EOT's logprob, matching
    # `logprobs[k, :timestamp_begin].max()`).
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_mass = jax.nn.logsumexp(
        jnp.where(is_ts_col, logprobs, NEG_INF), axis=-1
    )
    max_text = jnp.max(jnp.where(is_ts_col, NEG_INF, logprobs), axis=-1)
    force_ts = (ts_mass > max_text)[:, None]
    logits = jnp.where(force_ts & ~is_ts_col, NEG_INF, logits)
    return logits


def update_state(state: TimestampState, token: jax.Array,
                 cfg: TimestampCfg) -> TimestampState:
    """Advance the carried state after a token is selected."""
    new_max = jnp.where(token >= cfg.timestamp_begin,
                        jnp.maximum(state.max_ts, token), state.max_ts)
    return TimestampState(last=token, penult=state.last, max_ts=new_max)


def render_timestamp(token_id: int, timestamp_begin: int) -> str:
    """<|x.xx|> text for a timestamp token (0.02 s per step)."""
    return f"<|{(token_id - timestamp_begin) * 0.02:.2f}|>"
