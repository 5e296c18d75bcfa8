"""Within-file pipelined long-form transcription (ROADMAP item 3).

The long-form e2e is wire-bound (docs/UPLOAD_PIPELINE.md): the H2D audio
upload costs ~2x the whole model. The exact-semantics streamed front end
(session.compute_mel_streamed) already hides the host encode and STFT
under the wire, but the encoder+decode tail cannot start until the LAST
slab lands, because whisper's mel normalization clamps at the whole-file
max (ref src/main.rs:871).

This mode trades that coupling away: chunks are normalized with their OWN
masked max — the per-chunk semantics of the reference's HF-pipeline
comparison SUT (/root/reference/benchmark_with_hf_pipeline.py: the
pipeline feature-extracts each 30 s window independently) — so a slab of
chunks decodes while the next slab's audio is still on the wire.  Chunk
geometry and zero-padded window slicing stay the rust SUT's
(src/main.rs:875-905); only the normalization scope changes.  Transcripts
can therefore differ from chunked mode near quiet regions (bins more than
8 log10 units below the file max), which is why this is opt-in
(--longform-mode pipelined).

Dispatch schedule (everything is async; the only syncs are the token
fetches after ALL slabs are dispatched):

  per slab k: host int16 encode -> async H2D -> STFT_k -> decode_k
              (decode_k enqueued IMMEDIATELY behind STFT_k: the device
              compute queue is FIFO, so this is what lets decode_k run
              while slab k+1 is still on the wire)
  then:       fetch tokens in slab order.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.frontend import golden
from whisper_tpu.frontend.golden import HOP
from whisper_tpu.pipeline.chunk import CHUNK_FRAMES, chunk_starts
from whisper_tpu.pipeline.stitch import stitch_texts
from whisper_tpu.runtime.generate import strip_generated
from whisper_tpu.runtime.genconfig import GenerationCfg
from whisper_tpu.runtime.session import WhisperSession
from whisper_tpu.tokenizer.bpe import WhisperDetokenizer
from whisper_tpu.tokenizer.specials import special_tokens
from whisper_tpu.utils.timing import Timing

SAMPLE_RATE = 16_000


def _slab_plan(frame_starts, total_frames: int, slab_chunks: int):
    """Partition chunks into slabs of `slab_chunks`; returns
    (slab_capacity_frames, [(f0, n_valid, [local_starts...]), ...]).
    One static capacity serves every slab (ragged tails are masked via
    n_valid), so the STFT program compiles once per file geometry."""
    c = len(frame_starts)
    slabs = [(k, min(k + slab_chunks, c))
             for k in range(0, c, slab_chunks)]
    cap = max(frame_starts[b - 1] - frame_starts[a] for a, b in slabs)
    cap += CHUNK_FRAMES
    plan = []
    for a, b in slabs:
        f0 = frame_starts[a]
        n_valid = max(0, min(total_frames - f0, cap))
        plan.append((f0, n_valid, [frame_starts[i] - f0 for i in range(a, b)]))
    return cap, plan


def transcribe_longform_pipelined(
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
    slab_chunks: int = 4,
    word_collector: Optional[list] = None,
    initial_prompt_ids: Optional[list] = None,
    speculative: bool = False,
    draft_k: int = 4,
) -> Tuple[str, Timing]:
    """Pipelined long-form transcription; same surface as
    pipeline.longform.transcribe_longform minus precomputed_mel (the
    upload schedule IS the point here).

    Timing attribution under overlap: preprocess_s covers host prep up to
    the first slab's dispatch; model_only_s absorbs the wire wait behind
    the token syncs (upload and decode are deliberately inseparable
    here)."""
    from whisper_tpu.frontend.mel import log_spec_slab

    t0 = time.perf_counter()
    gen_cfg = gen_cfg or GenerationCfg()

    detect = language == "auto"
    special = special_tokens("en" if detect else language, task, tokenizer)
    prompt = [special.sot, special.lang, special.task]
    # --initial-prompt: per-chunk <|startofprev|> conditioning (same HF
    # prompt_ids semantics as chunked mode, pipeline/longform.py).
    prefix = ([special.sot_prev] + list(initial_prompt_ids)
              if initial_prompt_ids else [])
    ts_cfg = None
    ts_begin = special.no_timestamps + 1
    if not timestamps:
        prompt.append(special.no_timestamps)
    else:
        from whisper_tpu.runtime.timestamps import TimestampCfg

        ts_cfg = TimestampCfg(
            timestamp_begin=ts_begin,
            eot_id=special.eot,
            no_timestamps_id=special.no_timestamps,
        )

    chunk_len = int(round(chunk_length_s * SAMPLE_RATE))
    overlap = int(round(overlap_s * SAMPLE_RATE))
    step = max(chunk_len - overlap, 1)

    # --- interleaved dispatch: upload_k -> STFT_k -> decode_k ------------
    # The device compute queue is FIFO, so decode_k must be ENQUEUED right
    # behind STFT_k: that way it runs while slabs k+1.. are still on the
    # wire (measured: a stage-separated schedule — all STFTs, then all
    # decodes — parks decode_0 behind the LAST upload and loses the whole
    # overlap).  No host sync happens until every slab is dispatched.
    tp0 = time.perf_counter()
    audio_16k = np.asarray(audio_16k, dtype=np.float32)
    padded = golden.reflect_pad(audio_16k)
    total_frames = golden.num_frames(len(audio_16k))
    starts = chunk_starts(len(audio_16k), chunk_len, step)
    frame_starts = [pos // HOP for pos in starts]
    if not frame_starts:
        # Zero-length audio: nothing to decode (chunked mode returns
        # empty text here too; _slab_plan would max() an empty sequence).
        return "", Timing(end_to_end_s=time.perf_counter() - t0)
    cap, plan = _slab_plan(frame_starts, total_frames, slab_chunks)

    need = (cap + 2) * HOP
    slab_ls, slab_pieces = [], []
    preprocess_s = 0.0
    for i, (f0, n_valid, local) in enumerate(plan):
        s0 = f0 * HOP
        enc = session.encode_host_slab(padded, s0, need)
        ls, _vmax = log_spec_slab(
            jnp.asarray(enc), jnp.int32(n_valid),
            n_mels=session.dims.n_mels, n_frames=cap,
            transfer=session._transfer_tag(),
        )
        slab_ls.append(ls)
        if i == 0:
            preprocess_s = time.perf_counter() - tp0
            # `--language auto`: detect from chunk 0 (normalized window
            # sliced from slab 0's raw log-spec; per-chunk max semantics).
            # The detection sync only waits on slab 0's upload.
            if detect:
                from whisper_tpu.runtime.langdetect import (
                    detect_language,
                    language_token_ids,
                )

                lang_ids = language_token_ids(tokenizer, special.sot,
                                              session.dims.vocab_size)
                mel0 = session.chunk_norm_window(ls, 0, n_valid)
                detected = detect_language(session, mel0, special.sot,
                                           lang_ids)
                if detected is not None:
                    prompt[1] = detected[1]
        slab_pieces.append(session.transcribe_from_mel_async(
            ls, local,
            prompt=prefix + prompt,
            max_new_tokens=max_new_tokens,
            eot_id=special.eot,
            suppress_ids=gen_cfg.suppress_tokens,
            begin_suppress_ids=gen_cfg.begin_suppress_tokens,
            num_beams=num_beams,
            length_penalty=length_penalty,
            ts_cfg=ts_cfg,
            chunk_norm_n_valid=n_valid,
            speculative=speculative,
            draft_k=draft_k,
        ))

    # --- sync: fetch tokens in slab order --------------------------------
    tm0 = time.perf_counter()
    token_rows = []
    for pieces, (f0, n_valid, local) in zip(slab_pieces, plan):
        toks = session.gather_tokens(pieces, len(local), max_new_tokens)
        token_rows.extend(toks)
    model_only_s = time.perf_counter() - tm0

    # --- detokenize + stitch (host) --------------------------------------
    td0 = time.perf_counter()
    texts = []
    for row in token_rows:
        gen = strip_generated(row, special.eot)
        if tokenizer is not None:
            text = tokenizer.decode(
                gen, skip_special_tokens=True,
                timestamp_begin=ts_begin if timestamps else None,
            )
        else:
            text = f"[TOKENS:{' '.join(str(t) for t in gen[:200])}]" if gen else ""
        if text.strip():
            texts.append(text)
    full_text = stitch_texts(texts)

    if word_collector is not None:
        from whisper_tpu.pipeline.words import align_chunk_words

        chunk_ix = 0
        for ls, (f0, n_valid, local) in zip(slab_ls, plan):
            for lstart in local:
                row = token_rows[chunk_ix]
                chunk_ix += 1
                gen = [t for t in strip_generated(row, special.eot)
                       if t < ts_begin]
                if not gen:
                    continue
                chunk_mel = session.chunk_norm_window(ls, lstart, n_valid)
                words = align_chunk_words(
                    session, chunk_mel, prefix + prompt, gen, tokenizer,
                    offset_s=(f0 + lstart) * 0.01,
                    audio_len_s=min(30.0, (total_frames - f0 - lstart) * 0.01),
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
