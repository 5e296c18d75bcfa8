"""Speculative greedy decoding — draft model + single-pass verification.

A production latency lever with no reference counterpart: a small draft
decoder (e.g. a distil-Whisper decoder sharing the main encoder's states)
proposes ``k`` tokens with cheap steps; the full model verifies all of them
in ONE masked multi-token pass and commits the longest matching prefix plus
its own correction token.  Greedy output is **lossless**: for any drafter,
the committed sequence equals plain greedy decoding of the main model
(tested with an adversarially different drafter).

Cache bookkeeping exploits the static-shape design: rejected draft
positions leave stale K/V entries in both caches, but every attention mask
is position-bounded (``k_idx <= pos``), so stale entries beyond the
accepted position are never attended and get overwritten when real tokens
reach those positions.

Scope: batch size 1 (the latency-serving case speculative decoding exists
for). Per-row acceptance lengths diverge across a batch, which would need
per-row cache positions; that is future work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from whisper_tpu.models import whisper
from whisper_tpu.models.registry import WhisperDims


def _verify_pass(params, dims, tokens, pos, cache, precision):
    """Multi-token decoder pass: tokens [1, K] at positions [pos, pos+K);
    returns logits [1, K, V] and the updated cache (the reuse of
    decoder_prefill's blocks with an offset causal mask)."""
    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    k = tokens.shape[1]
    pos_emb = jax.lax.dynamic_slice_in_dim(dec["pos_embed"], pos, k, axis=0)
    x = dec["tok_emb"][tokens] + pos_emb.astype(dtype)[None]

    max_len = cache.self_k.shape[3]
    q_idx = jnp.arange(k)[:, None]
    k_idx = jnp.arange(max_len)[None, :]
    mask = k_idx <= (pos + q_idx)  # causal at offset

    x, cache = whisper._decoder_blocks(
        params, dims, x, cache, pos, mask, precision
    )
    return whisper._logits(params, x, precision), cache


def speculative_generate(
    params,
    dims: WhisperDims,
    draft_params,
    draft_dims: WhisperDims,
    enc_states: jax.Array,        # [1, T_enc, d] main-model encoder states
    draft_enc_states: jax.Array,  # [1, T_enc_d, d_d] drafter's encoder states
    prompt: jax.Array,            # [P] int32
    suppress_mask: jax.Array,
    first_suppress_mask: jax.Array,
    max_new_tokens: int,
    eot_id: int,
    draft_k: int = 4,
    *,
    precision=None,
):
    """Returns (tokens [1, max_new_tokens], n_rounds, n_committed).

    n_rounds counts verifier passes — with a good drafter,
    n_committed / n_rounds approaches draft_k + 1 tokens per full-model
    pass; with a useless drafter it degrades to ~1 (never below plain
    greedy correctness)."""
    assert enc_states.shape[0] == 1, "speculative decoding is batch-1"
    p = prompt.shape[0]
    # + draft_k slack: the last verify round may overrun before masking.
    max_len = p + max_new_tokens + draft_k
    tokens_p = prompt[None, :].astype(jnp.int32)

    logits, cache = whisper.decoder_prefill(
        params, dims, tokens_p, enc_states, max_len, precision=precision
    )
    first = jnp.argmax(
        logits[:, -1, :].astype(jnp.float32) + first_suppress_mask, axis=-1
    ).astype(jnp.int32)

    d_logits, d_cache = whisper.decoder_prefill(
        draft_params, draft_dims, tokens_p, draft_enc_states, max_len,
        precision=precision,
    )

    buf = jnp.full((1, max_new_tokens + draft_k), eot_id, dtype=jnp.int32)
    buf = buf.at[:, 0].set(first)

    def cond(state):
        n_gen, _, _, done, *_ = state
        return jnp.logical_and(n_gen < max_new_tokens, ~done)

    def body(state):
        n_gen, buf, last, done, cache, d_cache, rounds = state
        pos = p + n_gen - 1  # position of `last` in the full sequence

        # --- drafter proposes draft_k tokens ---
        def draft_step(i, carry):
            d_last, d_cache, drafts = carry
            lg, d_cache = whisper.decoder_step(
                draft_params, draft_dims, d_last, pos + i, d_cache,
                precision=precision,
            )
            nxt = jnp.argmax(
                lg.astype(jnp.float32) + suppress_mask, axis=-1
            ).astype(jnp.int32)
            drafts = drafts.at[i].set(nxt[0])
            return nxt, d_cache, drafts

        drafts0 = jnp.zeros((draft_k,), dtype=jnp.int32)
        _, d_cache, drafts = jax.lax.fori_loop(
            0, draft_k, draft_step, (last, d_cache, drafts0)
        )

        # --- verifier checks [last, d1..d_{k-1}] in one pass ---
        verify_in = jnp.concatenate(
            [last[None, :], drafts[None, :-1]], axis=1
        )  # [1, K]
        v_logits, cache = _verify_pass(
            params, dims, verify_in, pos, cache, precision
        )
        targets = jnp.argmax(
            v_logits.astype(jnp.float32) + suppress_mask[None, None, :],
            axis=-1,
        ).astype(jnp.int32)[0]  # [K] greedy targets after each input token

        # Longest accepted prefix: drafts[i] == targets[i].
        matches = drafts == targets
        n_accept = jnp.argmin(
            jnp.concatenate([matches.astype(jnp.int32), jnp.zeros(1, jnp.int32)])
        )
        # Commit drafts[:n_accept] then the verifier's token at the mismatch
        # (or the bonus token when everything matched) => n_accept+1 tokens.
        commit = jnp.where(
            jnp.arange(draft_k) < n_accept, drafts,
            jnp.where(jnp.arange(draft_k) == n_accept, targets, eot_id),
        )
        n_commit = jnp.minimum(n_accept + 1, draft_k)

        buf = jax.lax.dynamic_update_slice(buf, commit[None, :], (0, n_gen))
        # EOT inside the committed prefix ends generation.
        committed_eot = jnp.any(
            (jnp.arange(draft_k) < n_commit) & (commit == eot_id)
        )
        last = jax.lax.dynamic_slice(commit, (n_commit - 1,), (1,))
        n_gen = n_gen + n_commit
        done = jnp.logical_or(committed_eot, n_gen >= max_new_tokens)
        return n_gen, buf, last, done, cache, d_cache, rounds + 1

    done0 = first[0] == eot_id
    n_gen, buf, _, _, _, _, rounds = jax.lax.while_loop(
        cond, body,
        (jnp.int32(1), buf, first, done0, cache, d_cache, jnp.int32(0)),
    )

    # Positions never committed (incl. overrun slack) become EOT.
    valid = jnp.arange(max_new_tokens + draft_k) < n_gen
    buf = jnp.where(valid[None, :], buf, eot_id)[:, :max_new_tokens]
    return buf, rounds, n_gen
