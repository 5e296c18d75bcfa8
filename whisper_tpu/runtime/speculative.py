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

Batching: rows accept different draft lengths per round, so every decoder
pass runs at **per-row positions** — a ``pos`` vector flows into
``decoder_step`` / ``_decoder_blocks``, whose cache writes become per-row
scatters (models/whisper.py). Rows that finish early are frozen: their
commits are masked out and they pad with EOT while the rest of the batch
keeps speculating.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from whisper_tpu.models import whisper
from whisper_tpu.models.registry import WhisperDims


def _verify_pass(params, dims, tokens, pos, cache, precision,
                 cross_len=None, int8_mxu=False, mesh=None):
    """Multi-token decoder pass: tokens [B, K] at per-row positions
    [pos_r, pos_r+K); returns logits [B, K, V] and the updated cache (the
    reuse of decoder_prefill's blocks with per-row offset causal masks).

    With a head-packed cross cache (cross_len set), cross-attention runs
    the multi-query packed kernel (ops/cross_attention.py
    cross_attend_multi_packed): one KV stream per layer for all K tokens,
    per-query numerics identical to the single-token packed kernel."""
    dec = params["decoder"]
    dtype = dec["tok_emb"].dtype
    b, k = tokens.shape
    # Per-row position embeddings: row r uses positions pos_r .. pos_r+K-1.
    pos_idx = pos[:, None] + jnp.arange(k)[None, :]            # [B, K]
    x = dec["tok_emb"][tokens] + dec["pos_embed"][pos_idx].astype(dtype)

    max_len = cache.self_k.shape[3]
    q_idx = jnp.arange(k)[None, :, None]                       # [1, K, 1]
    k_idx = jnp.arange(max_len)[None, None, :]                 # [1, 1, S]
    mask = (k_idx <= (pos[:, None, None] + q_idx))[:, None]    # [B,1,K,S]

    x, cache = whisper._decoder_blocks(
        params, dims, x, cache, pos, mask, precision,
        cross_len=cross_len, int8_mxu=int8_mxu, mesh=mesh,
    )
    return whisper._logits(params, x, precision), cache


def speculative_generate(
    params,
    dims: WhisperDims,
    draft_params,
    draft_dims: WhisperDims,
    enc_states: jax.Array,        # [B, T_enc, d] main-model encoder states
    draft_enc_states: jax.Array,  # [B, T_enc_d, d_d] drafter's encoder states
    prompt: jax.Array,            # [P] int32 — same prompt for every row
    suppress_mask: jax.Array,
    first_suppress_mask: jax.Array,
    max_new_tokens: int,
    eot_id: int,
    draft_k: int = 4,
    *,
    precision=None,
    int8_cross_kv: bool = False,
    packed_draft: bool = False,   # head-pack the DRAFT's int8 cross cache:
                                  # its single-token steps then stream the
                                  # same full-128-lane kernels greedy's
                                  # decode loop uses (x4/x5). Drafts are
                                  # advisory — the verify pass re-derives
                                  # every committed token — so drafter
                                  # kernel rounding cannot change output.
    packed_main: bool = False,    # head-pack the MAIN model's int8 cross
                                  # cache too: the K+1-token verify pass
                                  # then runs the multi-query packed
                                  # kernel (one KV stream per layer per
                                  # round for all tokens). Per-query math
                                  # identical to the single-token packed
                                  # kernel, so output stays token-
                                  # identical to packed greedy (x4/x5).
    int8_mxu: bool = False,       # int8xint8 MXU dots in the packed draft
                                  # step (x5 layout: transposed K)
    mesh=None,                    # jax Mesh: run the packed kernels per
                                  # shard via shard_map (multi-chip; same
                                  # contract as greedy_generate's mesh arg)
):
    """Returns (tokens [B, max_new_tokens], n_rounds, n_committed [B]).

    n_rounds counts verifier passes — with a good drafter,
    n_committed / n_rounds approaches draft_k + 1 tokens per full-model
    pass; with a useless drafter it degrades to ~1 (never below plain
    greedy correctness).

    int8_cross_kv quantizes BOTH models' cross caches exactly as the
    greedy path does (decoder_prefill quantizes before the prompt pass,
    so prefill, drafts, and the verify pass all attend through the same
    int8 values) — with it, the committed sequence is token-identical to
    greedy_generate(int8_cross_kv=True), whose chain the packed x4/x5
    kernels are pinned against (tests/test_cross_attention.py). It also
    halves the cross-KV streaming of every draft step and verify pass."""
    if draft_k < 1:
        # draft_k=0 would draft nothing, commit nothing, and the on-device
        # while_loop would never terminate — a hung TPU program that can
        # wedge the shared tunnel (CLAUDE.md). Fail at trace time instead.
        raise ValueError(f"draft_k must be >= 1, got {draft_k}")
    b = enc_states.shape[0]
    p = prompt.shape[0]
    # + draft_k + 1 slack: the last verify round may overrun before masking
    # (each round commits up to draft_k + 1 tokens incl. the bonus token).
    max_len = p + max_new_tokens + draft_k + 1
    tokens_p = jnp.broadcast_to(prompt[None, :], (b, p)).astype(jnp.int32)

    logits, cache = whisper.decoder_prefill(
        params, dims, tokens_p, enc_states, max_len, precision=precision,
        int8_cross_kv=int8_cross_kv,
    )
    first = jnp.argmax(
        logits[:, -1, :].astype(jnp.float32) + first_suppress_mask, axis=-1
    ).astype(jnp.int32)  # [B]

    # Same packing gate as greedy_generate; prefill ran unpacked (exactly
    # as greedy's does), the verify passes then stream the packed layout.
    m_cross_len = None
    if (packed_main and int8_cross_kv and dims.head_dim == 64
            and dims.decoder_heads % 2 == 0):
        cache = whisper.pack_cross_cache(cache, transpose_k=int8_mxu)
        m_cross_len = enc_states.shape[1]

    d_logits, d_cache = whisper.decoder_prefill(
        draft_params, draft_dims, tokens_p, draft_enc_states, max_len,
        precision=precision, int8_cross_kv=int8_cross_kv,
    )
    # Same packing gate as greedy_generate (head pairs onto 128 lanes).
    d_cross_len = None
    if (packed_draft and int8_cross_kv and draft_dims.head_dim == 64
            and draft_dims.decoder_heads % 2 == 0):
        d_cache = whisper.pack_cross_cache(d_cache, transpose_k=int8_mxu)
        d_cross_len = draft_enc_states.shape[1]

    buf = jnp.full(
        (b, max_new_tokens + draft_k + 1), eot_id, dtype=jnp.int32
    )
    buf = buf.at[:, 0].set(first)
    ar_k1 = jnp.arange(draft_k + 1)[None, :]  # [1, K+1]

    def cond(state):
        _, _, _, done, *_ = state
        return ~jnp.all(done)

    def body(state):
        n_gen, buf, last, done, cache, d_cache, rounds = state
        pos = p + n_gen - 1  # [B] position of each row's `last` token

        # --- drafter proposes draft_k tokens per row ---
        def draft_step(i, carry):
            d_last, d_cache, drafts = carry
            lg, d_cache = whisper.decoder_step(
                draft_params, draft_dims, d_last, pos + i, d_cache,
                precision=precision, cross_len=d_cross_len,
                int8_mxu=int8_mxu if d_cross_len is not None else False,
                mesh=mesh,
            )
            nxt = jnp.argmax(
                lg.astype(jnp.float32) + suppress_mask, axis=-1
            ).astype(jnp.int32)  # [B]
            drafts = drafts.at[:, i].set(nxt)
            return nxt, d_cache, drafts

        drafts0 = jnp.zeros((b, draft_k), dtype=jnp.int32)
        _, d_cache, drafts = jax.lax.fori_loop(
            0, draft_k, draft_step, (last, d_cache, drafts0)
        )

        # --- verifier checks [last, d1..dK] in one K+1-token pass per row
        # (scoring the position AFTER the last draft too, so full acceptance
        # commits the true bonus token: draft_k + 1 tokens per round) ---
        verify_in = jnp.concatenate(
            [last[:, None], drafts], axis=1
        )  # [B, K+1]
        v_logits, cache = _verify_pass(
            params, dims, verify_in, pos, cache, precision,
            cross_len=m_cross_len,
            int8_mxu=int8_mxu if m_cross_len is not None else False,
            mesh=mesh,
        )
        targets = jnp.argmax(
            v_logits.astype(jnp.float32) + suppress_mask[None, None, :],
            axis=-1,
        ).astype(jnp.int32)  # [B, K+1] greedy targets after each input token

        # Longest accepted prefix per row: drafts[r, i] == targets[r, i].
        matches = (drafts == targets[:, :draft_k]).astype(jnp.int32)  # [B,K]
        n_accept = jnp.argmin(
            jnp.concatenate([matches, jnp.zeros((b, 1), jnp.int32)], axis=1),
            axis=1,
        )  # [B] in [0, K]
        # Commit drafts[:n_accept] then the verifier's token at the mismatch
        # (or the bonus token when everything matched) => n_accept+1 tokens.
        drafts_p = jnp.concatenate(
            [drafts, jnp.zeros((b, 1), jnp.int32)], axis=1
        )  # [B, K+1] (pad column never selected: ar_k1 < n_accept <= K)
        commit = jnp.where(
            ar_k1 < n_accept[:, None], drafts_p,
            jnp.where(ar_k1 == n_accept[:, None], targets, eot_id),
        )  # [B, K+1]
        n_commit = n_accept + 1  # in [1, K+1]
        n_commit = jnp.where(done, 0, n_commit)  # frozen rows commit nothing

        write = jax.vmap(
            lambda row, c, at: jax.lax.dynamic_update_slice(row, c, (at,))
        )(buf, commit, n_gen)
        buf = jnp.where(done[:, None], buf, write)

        committed_eot = jnp.any(
            (ar_k1 < n_commit[:, None]) & (commit == eot_id), axis=1
        )
        last_new = jnp.take_along_axis(
            commit, jnp.maximum(n_commit - 1, 0)[:, None], axis=1
        )[:, 0]
        last = jnp.where(done, last, last_new)
        n_gen = n_gen + n_commit
        done = jnp.logical_or(
            done, jnp.logical_or(committed_eot, n_gen >= max_new_tokens)
        )
        return n_gen, buf, last, done, cache, d_cache, rounds + 1

    done0 = first == eot_id
    n_gen, buf, _, _, _, _, rounds = jax.lax.while_loop(
        cond, body,
        (jnp.ones((b,), jnp.int32), buf, first, done0, cache, d_cache,
         jnp.int32(0)),
    )

    # Positions never committed (incl. overrun slack) become EOT.
    valid = (
        jnp.arange(max_new_tokens + draft_k + 1)[None, :] < n_gen[:, None]
    )
    buf = jnp.where(valid, buf, eot_id)[:, :max_new_tokens]
    return buf, rounds, n_gen
