"""On-device beam search with a static-shape KV cache.

The reference exposes beam search only through its Python SUTs
(``num_beams`` in benchmark_without_hf_pipeline.py:236-244 /
benchmark_faster_whisper.py beam_size); its Rust SUT is greedy-only.  The
TPU framework implements beam search natively, fully on device
(BASELINE.json config 4: whisper-large-v3 beam search on v5e).

Semantics (standard seq2seq beam search):
- prefill once per batch row, then the KV cache is tiled per beam;
- each step: log-softmax over suppressed logits; finished beams can only
  extend with EOT at zero cost (so their score freezes); top-K over the
  K*V candidate expansion per batch row; cache rows are re-gathered to
  follow their parent beams;
- the loop exits when every beam of every row is finished or at
  max_new_tokens; final selection maximizes score / length**length_penalty
  with length = generated tokens incl. EOT.

``num_beams=1`` reduces exactly to the greedy loop (tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from whisper_tpu.models import whisper
from whisper_tpu.models.registry import WhisperDims

NEG_INF = -1e30  # python scalar: stays a jaxpr literal, never a hoisted const


def _gather_beams(x, parent, b, k):
    """x: [B*K, ...] cache-like; parent: [B, K] parent beam ids."""
    flat = parent + (jnp.arange(b)[:, None] * k)     # [B, K] flat indices
    return jnp.take(x, flat.reshape(-1), axis=0)


def beam_generate(
    params,
    dims: WhisperDims,
    enc_states: jax.Array,            # [B, T_enc, d]
    prompt: jax.Array,                # [P] int32
    suppress_mask: jax.Array,         # [V]
    first_suppress_mask: jax.Array,   # [V]
    max_new_tokens: int,
    eot_id: int,
    num_beams: int,
    length_penalty: float = 1.0,
    *,
    ts_cfg=None,
    int8_cross_kv: bool = False,
    packed_cross: bool = False,
    int8_mxu: bool = False,
    mesh=None,
    precision=None,
    pad_count=None,               # [B] int32: left-pad slots in the prompt
                                  # (previous-text conditioning — sequential
                                  # long-form at num_beams > 1, matching the
                                  # Python SUT surface,
                                  # ref benchmark_without_hf_pipeline.py:236-244)
):
    """Returns (tokens [B, max_new_tokens] of the best beam, scores [B]).

    With ts_cfg, the Whisper timestamp grammar is enforced per beam (state
    rows follow their parent beams through the top-k regather)."""
    from whisper_tpu.runtime import timestamps as ts

    b = enc_states.shape[0]
    k = num_beams
    p = prompt.shape[0]
    v = dims.vocab_size
    max_len = p + max_new_tokens

    tokens_p = jnp.broadcast_to(prompt[None, :], (b, p)).astype(jnp.int32)
    prompt_mask = None
    if pad_count is not None:
        prompt_mask = jnp.arange(p)[None, :] >= pad_count[:, None]  # [B, P]
    logits, cache = whisper.decoder_prefill(
        params, dims, tokens_p, enc_states, max_len, precision=precision,
        int8_cross_kv=int8_cross_kv, prompt_mask=prompt_mask,
    )
    first_logits = logits[:, -1, :].astype(jnp.float32) + first_suppress_mask
    if ts_cfg is not None:
        first_logits = ts.apply_rules(
            first_logits, ts.init_state(b, eot_id), jnp.int32(0), ts_cfg
        )
    logp0 = jax.nn.log_softmax(first_logits, axis=-1)
    scores, first = jax.lax.top_k(logp0, k)          # [B, K]
    first = first.astype(jnp.int32)

    cross_len = None
    if (packed_cross and int8_cross_kv
            and dims.head_dim == 64 and dims.decoder_heads % 2 == 0):
        cache = whisper.pack_cross_cache(cache, transpose_k=int8_mxu)
        cross_len = enc_states.shape[1]

    # Tile cache per beam: [L, B, H, S, Dh] -> [L, B*K, H, S, Dh]
    # (scale fields [L, B, H, 1, 1] tile the same way; None passes through)
    def tile(x):
        return None if x is None else jnp.repeat(x, k, axis=1)

    cache = whisper.KVCache(*(tile(x) for x in cache))
    pad_bk = None if pad_count is None else jnp.repeat(pad_count, k, axis=0)

    buf = jnp.full((b, k, max_new_tokens), eot_id, dtype=jnp.int32)
    buf = buf.at[:, :, 0].set(first)
    done = first == eot_id
    lengths = jnp.ones((b, k), dtype=jnp.int32)      # generated incl. EOT

    # Distribution for finished beams: EOT at 0, everything else -inf.
    eot_only = jnp.full((v,), NEG_INF).at[eot_id].set(0.0)

    # Per-beam timestamp-grammar state, flattened to [B*K] rows.
    if ts_cfg is not None:
        ts_state = ts.init_state(b * k, eot_id)
        ts_state = ts.update_state(ts_state, first.reshape(b * k), ts_cfg)
    else:
        ts_state = None

    def cond(state):
        i, _, _, _, done, _, _, _ = state
        return jnp.logical_and(i < max_new_tokens, ~jnp.all(done))

    def body(state):
        i, buf, scores, last, done, lengths, cache, ts_state = state
        step_logits, new_cache = whisper.decoder_step(
            params, dims, last.reshape(b * k), p + i - 1, cache,
            precision=precision, cross_len=cross_len, int8_mxu=int8_mxu,
            mesh=mesh, pad_count=pad_bk,
        )
        step_logits = step_logits.astype(jnp.float32) + suppress_mask
        if ts_cfg is not None:
            step_logits = ts.apply_rules(step_logits, ts_state, i, ts_cfg)
        logp = jax.nn.log_softmax(step_logits, axis=-1).reshape(b, k, v)
        logp = jnp.where(done[:, :, None], eot_only[None, None, :], logp)

        total = scores[:, :, None] + logp            # [B, K, V]
        flat = total.reshape(b, k * v)
        new_scores, idx = jax.lax.top_k(flat, k)     # [B, K]
        parent = (idx // v).astype(jnp.int32)
        tok = (idx % v).astype(jnp.int32)

        # Reorder beam state to follow parents.
        buf = jnp.take_along_axis(buf, parent[:, :, None], axis=1)
        buf = jax.lax.dynamic_update_slice(
            buf, tok[:, :, None], (0, 0, i)
        )
        prev_done = jnp.take_along_axis(done, parent, axis=1)
        lengths = jnp.take_along_axis(lengths, parent, axis=1)
        lengths = jnp.where(prev_done, lengths, lengths + 1)
        done = jnp.logical_or(prev_done, tok == eot_id)
        # Only the SELF cache follows parent beams — the cross K/V (and
        # its scales) are identical for every beam of a batch row, and
        # regathering them would move the whole multi-MB cross cache per
        # step for nothing.
        cache = new_cache._replace(
            self_k=jax.vmap(
                lambda c: _gather_beams(c, parent, b, k)
            )(new_cache.self_k),
            self_v=jax.vmap(
                lambda c: _gather_beams(c, parent, b, k)
            )(new_cache.self_v),
        )
        if ts_cfg is not None:
            gathered = jax.tree.map(
                lambda s: _gather_beams(s, parent, b, k), ts_state
            )
            ts_state = ts.update_state(gathered, tok.reshape(b * k), ts_cfg)
        return i + 1, buf, new_scores, tok, done, lengths, cache, ts_state

    _, buf, scores, _, done, lengths, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(1), buf, scores, first, done, lengths, cache, ts_state),
    )

    # Length-normalized selection (score / len**penalty).
    norm = scores / (lengths.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm, axis=1)                  # [B]
    out = jnp.take_along_axis(buf, best[:, None, None], axis=1)[:, 0, :]
    best_scores = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
    return out, best_scores
