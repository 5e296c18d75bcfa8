"""On-device greedy generation with a static-shape KV cache.

The TPU-native replacement for the reference's per-token host loop
(`greedy_decode_with_past`, ref src/main.rs:753-829): the entire
prefill + token loop runs inside one jitted function using
``lax.while_loop``, so there is no host round-trip per token.  Semantics are
kept identical:

- prefill over the full prompt produces the first token, with suppression =
  base ∪ begin_suppress (ref src/main.rs:765-778);
- each subsequent step uses base suppression only (ref :817);
- generation stops at EOT or after ``max_new_tokens`` tokens (ref :793,
  :820-822) — batched rows that finish early keep emitting EOT, and the loop
  exits when every row is done;
- suppression is an additive ``-inf`` mask before argmax, equivalent to the
  reference's skip-in-argmax because a suppressed id can never win (ref
  :709-735); ``jnp.argmax`` and the reference's strict ``>`` scan both pick
  the first index on ties.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.models import whisper
from whisper_tpu.models.registry import WhisperDims


def build_suppress_mask(vocab_size: int, ids: Sequence[int] | None) -> np.ndarray:
    """Additive float32 mask [V]: 0 everywhere, -inf at suppressed ids
    (vectorized form of the reference's suppress sets, src/main.rs:102-106)."""
    mask = np.zeros(vocab_size, dtype=np.float32)
    if ids:
        idx = np.asarray([i for i in ids if 0 <= i < vocab_size], dtype=np.int64)
        mask[idx] = -np.inf
    return mask


def greedy_generate(
    params,
    dims: WhisperDims,
    enc_states: jax.Array,        # [B, T_enc, d]
    prompt: jax.Array,            # [P] int32 — same prompt for every row
    suppress_mask: jax.Array,     # [V] additive mask, steps 2..N
    first_suppress_mask: jax.Array,  # [V] additive mask, first token
    max_new_tokens: int,
    eot_id: int,
    *,
    ts_cfg=None,                  # TimestampCfg to enforce timestamp grammar
    int8_cross_kv: bool = False,  # store cross K/V int8 (halves KV streaming)
    step_weights=None,            # pre-fused weights -> hybrid fast step
    temperature: float = 0.0,     # 0 = greedy argmax; >0 = sampling
    rng_key=None,                 # required when temperature > 0
    return_logprobs: bool = False,
    precision=None,
    pad_count=None,               # [B] int32: left-pad slots in the prompt
                                  # (previous-text conditioning with static
                                  # shapes; see models/whisper.py)
    packed_cross: bool = False,   # head-packed int8 cross-KV: repack after
                                  # prefill so steps stream full 128-lane
                                  # tiles (ops/cross_attention.py)
    int8_mxu: bool = False,       # int8xint8 MXU attention in the packed
                                  # decode step (variant x5)
    int8_self: bool = False,      # int8-quantized SELF cache + int8-MXU
                                  # self-attention step (variant x7);
                                  # requires int8_mxu + packed_cross
    mesh=None,                    # jax Mesh: packed kernels run per shard
                                  # via shard_map (multi-chip x4/x5)
):
    """Returns generated tokens [B, max_new_tokens] (prompt excluded) —
    plus (sum_logprob [B], n_tokens [B]) when return_logprobs is set (the
    quality signal for temperature-fallback decoding).

    Rows finished early are padded with EOT; the host strips the prompt and
    trailing EOT exactly like the reference (src/main.rs:926-943).

    With ts_cfg set, the Whisper timestamp grammar
    (whisper_tpu.runtime.timestamps) is enforced at every step — real
    timestamp decoding, which the reference lacks (src/main.rs:853-856).

    temperature > 0 samples from softmax(logits / temperature) after
    suppression/grammar masking (openai-whisper's fallback rungs).
    """
    from whisper_tpu.runtime import timestamps as ts

    b = enc_states.shape[0]
    p = prompt.shape[0]
    max_len = p + max_new_tokens
    tokens = jnp.broadcast_to(prompt[None, :], (b, p)).astype(jnp.int32)
    if temperature > 0 and rng_key is None:
        raise ValueError("temperature > 0 requires rng_key")

    def pick(logits_f32, key):
        """Token choice + its log-probability under the masked distribution.
        The logprob is only computed when requested (static flag), so the
        plain greedy path pays nothing for it."""
        if temperature > 0:
            tok = jax.random.categorical(
                key, logits_f32 / temperature, axis=-1
            ).astype(jnp.int32)
        else:
            tok = jnp.argmax(logits_f32, axis=-1).astype(jnp.int32)
        if return_logprobs:
            logp = jax.nn.log_softmax(logits_f32, axis=-1)
            lp = jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0]
        else:
            lp = jnp.zeros(logits_f32.shape[0], jnp.float32)
        return tok, lp

    if step_weights is not None and pad_count is not None:
        # decoder_step_hybrid has no pad mask: it would attend the left
        # padding and offset positions on conditioned prompts.  The
        # session disables it for conditioned programs (session.py); this
        # guard makes the constraint local and loud.
        raise ValueError("step_weights (fused_decoder_step) does not "
                         "support pad_count-conditioned prompts")
    prompt_mask = None
    if pad_count is not None:
        prompt_mask = jnp.arange(p)[None, :] >= pad_count[:, None]  # [B, P]
    logits, cache = whisper.decoder_prefill(
        params, dims, tokens, enc_states, max_len, precision=precision,
        int8_cross_kv=int8_cross_kv, prompt_mask=prompt_mask,
    )
    cross_len = None
    if (packed_cross and int8_cross_kv and step_weights is None
            and dims.head_dim == 64 and dims.decoder_heads % 2 == 0):
        from whisper_tpu.ops.self_attention import (
            pack_self_cache,
            quantize_pack_self,
        )

        cache = whisper.pack_cross_cache(cache, transpose_k=int8_mxu)
        # Pack the self cache too: the step then runs fully on the packed
        # kernels with in-place KV updates (ops/self_attention.py).
        if int8_self and int8_mxu:
            # x7: int8 rows + per-row scale planes (row-major, same
            # head-packed layout as the bf16 cache) — the step is then
            # int8-MXU end to end (self AND cross dots).
            sk8, sv8, sks, svs = quantize_pack_self(cache.self_k,
                                                    cache.self_v)
            cache = cache._replace(self_k=sk8, self_v=sv8,
                                   self_k_scale=sks, self_v_scale=svs)
        else:
            cache = cache._replace(
                self_k=pack_self_cache(cache.self_k),
                self_v=pack_self_cache(cache.self_v),
            )
        cross_len = enc_states.shape[1]
    first_logits = logits[:, -1, :].astype(jnp.float32) + first_suppress_mask
    ts_state = ts.init_state(b, eot_id) if ts_cfg is not None else None
    if ts_cfg is not None:
        first_logits = ts.apply_rules(first_logits, ts_state, jnp.int32(0),
                                      ts_cfg)
    key0 = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    k_first, key0 = jax.random.split(key0)
    first, first_lp = pick(first_logits, k_first)
    if ts_cfg is not None:
        ts_state = ts.update_state(ts_state, first, ts_cfg)

    buf = jnp.full((b, max_new_tokens), eot_id, dtype=jnp.int32)
    buf = buf.at[:, 0].set(first)
    done = first == eot_id
    sum_lp = first_lp
    n_tok = jnp.ones((b,), jnp.int32)

    def cond(state):
        i = state[0]
        done = state[3]
        return jnp.logical_and(i < max_new_tokens, ~jnp.all(done))

    def body(state):
        i, buf, last, done, cache, ts_state, key, sum_lp, n_tok = state
        # `last` was generated as token index p+i-1 in the full sequence.
        if step_weights is not None:
            from whisper_tpu.ops.decoder_kernels import decoder_step_hybrid

            step_logits, cache = decoder_step_hybrid(
                params, step_weights, dims, last, p + i - 1, cache,
                interpret=jax.default_backend() != "tpu",
                precision=precision,
            )
        else:
            step_logits, cache = whisper.decoder_step(
                params, dims, last, p + i - 1, cache, precision=precision,
                pad_count=pad_count, cross_len=cross_len, int8_mxu=int8_mxu,
                mesh=mesh,
            )
        step_logits = step_logits.astype(jnp.float32) + suppress_mask
        if ts_cfg is not None:
            step_logits = ts.apply_rules(step_logits, ts_state, i, ts_cfg)
        k_step, key = jax.random.split(key)
        nxt, lp = pick(step_logits, k_step)
        nxt = jnp.where(done, eot_id, nxt)
        sum_lp = sum_lp + jnp.where(done, 0.0, lp)
        n_tok = n_tok + jnp.where(done, 0, 1)
        if ts_cfg is not None:
            ts_state = ts.update_state(ts_state, nxt, ts_cfg)
        buf = jax.lax.dynamic_update_slice(buf, nxt[:, None], (0, i))
        done = jnp.logical_or(done, nxt == eot_id)
        return i + 1, buf, nxt, done, cache, ts_state, key, sum_lp, n_tok

    _, buf, _, _, _, _, _, sum_lp, n_tok = jax.lax.while_loop(
        cond, body,
        (jnp.int32(1), buf, first, done, cache, ts_state, key0, sum_lp, n_tok),
    )
    if return_logprobs:
        return buf, sum_lp, n_tok
    return buf


def strip_generated(row: np.ndarray, eot_id: int) -> list[int]:
    """Host-side: cut a generated row at the first EOT (exclusive), matching
    the reference's strip of the trailing EOT (src/main.rs:926-943)."""
    out = []
    for t in row.tolist():
        if t == eot_id:
            break
        out.append(int(t))
    return out
