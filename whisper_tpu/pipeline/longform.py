"""Long-form transcription driver (ref transcribe_longform_chunked,
src/main.rs:834-1008), TPU-shaped:

1. whole-file log-mel once on device (preprocess_s)
2. chunk starts every chunk_len - overlap samples
3. all chunks stacked on a batch dimension -> ONE batched
   encoder + on-device greedy program per bucket (model_only_s) — the
   reference's rayon chunk pool (src/main.rs:884-925) becomes a batch axis
4. per-chunk detokenize (strip prompt/EOT, drop empties) + overlap-deduped
   stitching (decode_s)

Timing fields match the reference's `Timing` struct; device work is fenced
with block_until_ready so the breakdown is honest.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import numpy as np

from whisper_tpu.frontend import golden
from whisper_tpu.pipeline.chunk import chunk_starts, mel_frame_bucket
from whisper_tpu.pipeline.stitch import stitch_texts
from whisper_tpu.runtime.generate import strip_generated
from whisper_tpu.runtime.genconfig import GenerationCfg
from whisper_tpu.runtime.session import WhisperSession
from whisper_tpu.tokenizer.bpe import WhisperDetokenizer
from whisper_tpu.tokenizer.specials import special_tokens
from whisper_tpu.utils.timing import Timing

SAMPLE_RATE = 16_000


def compute_mel_full(session: WhisperSession, audio_16k: np.ndarray) -> Tuple[np.ndarray, int]:
    """Whole-file log-mel on device (ref src/main.rs:871). Returns
    ([n_mels, F_bucket] numpy, true frame count).

    Delegates to session.compute_mel (fused Pallas kernel for one-shot
    uploads when cfg.fused_frontend, streamed slab pipeline for multi-slab
    files when cfg.streamed_mel)."""
    audio_16k = np.asarray(audio_16k, dtype=np.float32)
    padded = golden.reflect_pad(audio_16k)
    n_valid = golden.num_frames(audio_16k.shape[0])
    bucket = mel_frame_bucket(n_valid)
    mel = session.compute_mel(padded, n_valid, bucket)
    return np.asarray(jax.block_until_ready(mel)), n_valid


def transcribe_longform(
    session: WhisperSession,
    audio_16k: np.ndarray,
    language: str,
    task: str,
    max_new_tokens: int,
    chunk_length_s: float = 30.0,
    overlap_s: float = 5.0,
    tokenizer: Optional[WhisperDetokenizer] = None,
    timestamps: bool = False,
    gen_cfg: Optional[GenerationCfg] = None,
    num_beams: int = 1,
    length_penalty: float = 1.0,
    precomputed_mel: Optional[Tuple] = None,
    word_collector: Optional[list] = None,
    initial_prompt_ids: Optional[list] = None,
    language_collector: Optional[list] = None,
    speculative: bool = False,
    draft_k: int = 4,
) -> Tuple[str, Timing]:
    """Transcribe one (already 16 kHz mono) audio array. Returns
    (stitched text, Timing).

    precomputed_mel: optional (device_mel, total_frames) pair, e.g. uploaded
    and computed by a prefetcher while the previous file was decoding —
    preprocess_s then only measures the residual wait.

    word_collector: pass a list to also produce word-level timestamps
    (cross-attention DTW, pipeline/words.py) — it is extended with
    {word, start, end} dicts in absolute file time, per decoded chunk."""
    t0 = time.perf_counter()
    gen_cfg = gen_cfg or GenerationCfg()

    detect = language == "auto"
    special = special_tokens("en" if detect else language, task, tokenizer)
    prompt = [special.sot, special.lang, special.task]
    # --initial-prompt: condition EVERY chunk on <|startofprev|> + the
    # prompt tokens — the HF pipeline's prompt_ids semantics (the P2
    # comparison SUT prepends them on each generate call).
    prefix = ([special.sot_prev] + list(initial_prompt_ids)
              if initial_prompt_ids else [])
    ts_cfg = None
    ts_begin = special.no_timestamps + 1
    if not timestamps:
        prompt.append(special.no_timestamps)
    else:
        # Real timestamp decoding (grammar enforced on device) — the
        # reference only toggles the prompt token (src/main.rs:853-856).
        from whisper_tpu.runtime.timestamps import TimestampCfg

        ts_cfg = TimestampCfg(
            timestamp_begin=ts_begin,
            eot_id=special.eot,
            no_timestamps_id=special.no_timestamps,
        )

    chunk_len = int(round(chunk_length_s * SAMPLE_RATE))
    overlap = int(round(overlap_s * SAMPLE_RATE))
    step = max(chunk_len - overlap, 1)

    # 1. whole-file mel on device (ref src/main.rs:871). The mel stays on
    # device: host<->device transfers over the tunnel are far slower than
    # the compute, so chunk slicing happens inside the jitted program.
    tp0 = time.perf_counter()
    audio_16k = np.asarray(audio_16k, dtype=np.float32)
    if precomputed_mel is not None:
        mel_dev, total_frames = precomputed_mel
        jax.block_until_ready(mel_dev)
    else:
        padded = golden.reflect_pad(audio_16k)
        total_frames = golden.num_frames(len(audio_16k))
        bucket = mel_frame_bucket(total_frames)
        mel_dev = jax.block_until_ready(
            session.compute_mel(padded, total_frames, bucket)
        )
    preprocess_s = time.perf_counter() - tp0

    # `--language auto`: detect from the first 30 s window (a capability
    # the reference lacks — its CLI requires an explicit language).
    if detect:
        from whisper_tpu.pipeline.chunk import CHUNK_FRAMES
        from whisper_tpu.runtime.langdetect import (
            detect_language,
            language_token_ids,
        )

        lang_ids = language_token_ids(tokenizer, special.sot,
                                      session.dims.vocab_size)
        mel0 = mel_dev[:, :CHUNK_FRAMES]
        detected = detect_language(session, mel0, special.sot, lang_ids)
        if detected is not None:
            prompt[1] = detected[1]
            if language_collector is not None:
                # Surface the detected code (e.g. the HTTP verbose_json
                # `language` field must report the detection, not "auto").
                language_collector.append(detected[0])

    starts = chunk_starts(len(audio_16k), chunk_len, step)
    frame_starts = [pos // golden.HOP for pos in starts]

    # 3. one batched chunk-slice + encoder + greedy program over all chunks
    tm0 = time.perf_counter()
    tokens = session.transcribe_from_mel(
        mel_dev,
        frame_starts,
        prompt=prefix + prompt,
        max_new_tokens=max_new_tokens,
        eot_id=special.eot,
        suppress_ids=gen_cfg.suppress_tokens,
        begin_suppress_ids=gen_cfg.begin_suppress_tokens,
        num_beams=num_beams,
        length_penalty=length_penalty,
        ts_cfg=ts_cfg,
        speculative=speculative,
        draft_k=draft_k,
    )
    model_only_s = time.perf_counter() - tm0

    # 4. detokenize + stitch (host)
    td0 = time.perf_counter()
    texts = []
    for row in tokens:
        gen = strip_generated(row, special.eot)
        if tokenizer is not None:
            text = tokenizer.decode(
                gen, skip_special_tokens=True,
                timestamp_begin=ts_begin if timestamps else None,
            )
        else:
            # No tokenizer: print ids, like the reference (src/main.rs:643-647).
            text = f"[TOKENS:{' '.join(str(t) for t in gen[:200])}]" if gen else ""
        if text.strip():
            texts.append(text)
    full_text = stitch_texts(texts)

    if word_collector is not None:
        from whisper_tpu.pipeline.chunk import CHUNK_FRAMES
        from whisper_tpu.pipeline.words import align_chunk_words

        import jax.numpy as jnp

        mel_pad = jnp.pad(mel_dev, ((0, 0), (0, CHUNK_FRAMES)))
        for i, row in enumerate(tokens):
            gen = [t for t in strip_generated(row, special.eot)
                   if t < ts_begin]  # text tokens only
            if not gen:
                continue
            chunk_mel = jax.lax.dynamic_slice(
                mel_pad, (0, frame_starts[i]),
                (session.dims.n_mels, CHUNK_FRAMES),
            )
            words = align_chunk_words(
                session, chunk_mel, prefix + prompt, gen, tokenizer,
                offset_s=frame_starts[i] * 0.01,
                audio_len_s=min(30.0,
                                (total_frames - frame_starts[i]) * 0.01),
            )
            word_collector.extend(w.to_dict() for w in words)
    decode_s = time.perf_counter() - td0

    timing = Timing(
        preprocess_s=preprocess_s,
        model_only_s=model_only_s,
        decode_s=decode_s,
        end_to_end_s=time.perf_counter() - t0,
    )
    return full_text, timing
