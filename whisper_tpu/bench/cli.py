"""Benchmark CLI — the reference binary's flag surface and driver shape
(ref `Args` src/main.rs:23-86 and `main` :1065-1271), TPU-native inside.

All 20 reference flags are accepted with identical names and defaults;
TPU-specific extras (--variant, --dtype, --matmul-precision, --max-batch,
--allow-random-init) are additive. `--onnx-dir` keeps its name for artifact
compatibility but points at a framework model dir (params.safetensors +
config.json + tokenizer.json + generation_config.json sidecars).

Run: python -m whisper_tpu.bench [flags]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from pathlib import Path
from typing import List, Optional

AUDIO_EXTS = (".wav", ".flac", ".mp3")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="whisper_tpu_bench",
        description="TPU-native Whisper inference benchmark "
                    "(reference-compatible CLI)",
    )
    # --- reference flag surface (ref src/main.rs:23-86) ---
    p.add_argument("--audio-dir", default="audio")
    p.add_argument("--model-id", default="openai/whisper-base")
    p.add_argument("--onnx-dir", default="whisper-base-with-past",
                   help="model dir (framework params + sidecars); reference "
                        "flag name kept for artifact compatibility")
    p.add_argument("--language", default="en",
                   help="language code, or 'auto' to detect from the first "
                        "30s window (detection is a whisper_tpu extension)")
    p.add_argument("--task", default="transcribe")
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--warmup", type=int, default=0)
    p.add_argument("--limit-files", type=int, default=0)
    p.add_argument("--discovery-best-json", default="")
    p.add_argument("--out-csv", default="results/benchmarks/inference_per_file.csv")
    p.add_argument("--out-json", default="results/benchmarks/inference_per_file.json")
    p.add_argument("--out-summary-json",
                   default="results/benchmarks/inference_summary.json")
    p.add_argument("--intra-op", type=int, default=0)
    p.add_argument("--inter-op", type=int, default=0)
    p.add_argument("--write-txt", action="store_true")
    p.add_argument("--write-srt", action="store_true",
                   help="write <stem>.srt subtitles next to the CSV; needs "
                        "a timing source: --word-timestamps or "
                        "--longform-mode sequential (bench/subtitles.py)")
    p.add_argument("--write-vtt", action="store_true",
                   help="write <stem>.vtt WebVTT subtitles (same timing "
                        "sources as --write-srt)")
    p.add_argument("--tokenizer-json", default="")
    p.add_argument("--timestamps", action="store_true")
    p.add_argument("--chunk-parallelism", type=int, default=0,
                   help="reference: rayon threads; here: chunk-batch cap "
                        "(rounded to a power of two)")
    p.add_argument("--chunk-length-s", type=float, default=30.0)
    p.add_argument("--overlap-s", type=float, default=5.0)
    p.add_argument("--num-beams", type=int, default=1,
                   help="beam search width (1 = greedy, matching the "
                        "reference rust SUT; >1 matches the python SUTs)")
    p.add_argument("--length-penalty", type=float, default=1.0)
    # --- TPU-native extras ---
    p.add_argument("--variant", default="",
                   choices=["", "x0", "x1", "x2", "x3", "x4", "x5", "x6",
                            "x7", "int8"],
                   help="optimization-ladder variant: x0..x7 or int8")
    p.add_argument("--dtype", default="", choices=["", "float32", "bfloat16"])
    p.add_argument("--matmul-precision", default="",
                   choices=["", "default", "high", "highest", "float32"])
    p.add_argument("--max-batch", type=int, default=0)
    p.add_argument("--audio-transfer", default="",
                   choices=["", "f32", "int16", "dint16", "dint16p",
                            "pcm12", "pcm14", "ulaw8", "auto", "auto-pcm"],
                   help="H2D audio upload encoding; 'auto' probes the "
                        "link at startup and picks int16 vs the delta "
                        "codings (tunnel compression is session-"
                        "dependent); 'auto-pcm' also races pcm12 "
                        "(bit-packed truncated PCM: 25%% fewer wire "
                        "bytes, quantization noise near the log-mel "
                        "clamp floor — utils/pcmpack.py; pcm14 is "
                        "explicit-only, its 12.5%% can't clear the probe "
                        "margin)")
    p.add_argument("--allow-random-init", action="store_true",
                   help="build random-weight params from --model-id when the "
                        "model dir has no params.safetensors (benchmarking "
                        "without converted weights)")
    p.add_argument("--draft-dir", default="",
                   help="model dir of a draft model (e.g. a distil decoder) "
                        "— enables lossless batched speculative decoding of "
                        "the chunked long-form path (token-identical to "
                        "greedy at the variant's precision and cross-KV "
                        "quantization; runtime/speculative.py)")
    p.add_argument("--draft-model-id", default="",
                   help="registry id for a random-init draft model "
                        "(random weights draft ~nothing useful; for shape/"
                        "perf exploration)")
    p.add_argument("--draft-k", type=int, default=4,
                   help="draft tokens proposed per verify round")
    p.add_argument("--draft-share-encoder", action="store_true",
                   help="feed the MAIN model's encoder states to the draft "
                        "decoder instead of running the draft encoder — "
                        "correct for distil-whisper drafts (their encoder "
                        "is a frozen copy of the teacher's); skips a full "
                        "draft encoder pass per chunk")
    p.add_argument("--temperatures", default="",
                   help="comma list (e.g. '0,0.2,0.4,0.6,0.8,1') enabling "
                        "openai-whisper-style temperature-fallback decoding")
    p.add_argument("--longform-mode", default="chunked",
                   choices=["chunked", "sequential", "pipelined"],
                   help="chunked = reference rust strategy (fixed 30s windows"
                        " + overlap stitching); sequential = HF-style"
                        " seek-based timestamped segmentation; pipelined ="
                        " chunked geometry with PER-CHUNK mel normalization"
                        " (HF-pipeline SUT semantics) so slab decodes overlap"
                        " the next slab's H2D upload (docs/UPLOAD_PIPELINE.md)")
    p.add_argument("--slab-chunks", type=int, default=4,
                   help="pipelined mode: chunks per upload/decode slab")
    p.add_argument("--word-timestamps", action="store_true",
                   help="emit word-level timestamps (cross-attention DTW "
                        "alignment) in the per-file JSON rows; chunked/"
                        "pipelined/sequential long-form modes")
    p.add_argument("--vad-filter", action="store_true",
                   help="cut silence before transcription (energy VAD, "
                        "audio/vad.py — the faster-whisper SUT's "
                        "vad_filter surface); word timestamps are mapped "
                        "back to original time; chunked long-form mode")
    p.add_argument("--vad-threshold-db", type=float, default=9.0,
                   help="VAD: speech is frames above the noise floor by "
                        "this many dB (floor = 15th percentile energy)")
    p.add_argument("--initial-prompt", default="",
                   help="free-text prompt to condition decoding on "
                        "(<|startofprev|> prefix; HF prompt_ids semantics "
                        "in chunked/pipelined modes, seeds the rolling "
                        "context in sequential mode with "
                        "--condition-on-prev-text; needs tokenizer.json)")
    p.add_argument("--condition-on-prev-text", action="store_true",
                   help="sequential mode: prefix each window's prompt with "
                        "<|startofprev|> + the previous text tokens "
                        "(openai-whisper/HF condition_on_prev_tokens)")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard chunk batches over N chips ('data' mesh axis)")
    p.add_argument("--tensor-parallel", type=int, default=0,
                   help="shard attention heads / MLP over N chips ('model' axis)")
    p.add_argument("--profile-dir", default="",
                   help="write a jax.profiler trace of the measured loop "
                        "to this directory (TensorBoard-compatible)")
    # Multi-host (DCN) launch: run one process per host with the same
    # coordinator address; the ('data','model') mesh then spans all
    # processes' devices (parallel.mesh.init_distributed; SURVEY.md §5.8 —
    # the reference has no multi-device story at all).
    p.add_argument("--dcn-coordinator", default="",
                   help="coordinator address host:port for "
                        "jax.distributed.initialize (multi-host pods)")
    p.add_argument("--dcn-num-processes", type=int, default=0)
    p.add_argument("--dcn-process-id", type=int, default=-1)
    return p


def list_audio_files(audio_dir: str, limit: int) -> List[str]:
    """Sorted wav/flac/mp3 file names (ref src/main.rs:1111-1128)."""
    files = sorted(
        e.name
        for e in Path(audio_dir).iterdir()
        if e.is_file() and e.suffix.lower() in AUDIO_EXTS
    )
    if limit > 0:
        files = files[:limit]
    return files


def _build_session(args, cfg):
    from whisper_tpu.models import convert
    from whisper_tpu.models.registry import get_dims
    from whisper_tpu.runtime.session import WhisperSession

    model_dir = args.onnx_dir
    params_path = os.path.join(model_dir, convert.PARAMS_FILE)
    if os.path.isfile(params_path):
        params, dims = convert.load_params(model_dir)
    elif args.allow_random_init:
        dims = get_dims(args.model_id)
        params = convert.init_params(dims, seed=0)
    else:
        raise SystemExit(
            f"model dir does not exist or has no {convert.PARAMS_FILE}: "
            f"{model_dir} (convert a checkpoint with whisper_tpu.models."
            f"convert.convert_hf_model_dir, or pass --allow-random-init)"
        )
    return WhisperSession(params, dims, cfg)


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if args.draft_k < 1:
        # draft_k=0 inside the on-device while_loop would never terminate
        # (hung TPU program — can wedge the shared tunnel); reject up front.
        print(f"error: --draft-k must be >= 1, got {args.draft_k}",
              file=sys.stderr)
        return 2

    from whisper_tpu.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()  # reuse remote-compiled executables
                                # across runs (minutes per program)

    if args.vad_filter and args.longform_mode != "chunked":
        raise SystemExit("--vad-filter is supported in chunked long-form "
                         "mode (timestamps from other modes would be in "
                         "condensed time)")
    if args.temperatures and (args.initial_prompt or args.num_beams > 1
                              or args.word_timestamps or args.timestamps
                              or args.write_srt or args.write_vtt):
        # The fallback ladder decodes greedy/sampled without prompts,
        # beams, or timing output; silently dropping those flags would
        # mislabel the run (review r3).
        raise SystemExit("--temperatures does not compose with "
                         "--initial-prompt/--num-beams/--timestamps/"
                         "--word-timestamps/--write-srt/--write-vtt")

    if (args.write_srt or args.write_vtt) and not (
        args.word_timestamps or args.longform_mode == "sequential"
    ):
        raise SystemExit(
            "--write-srt/--write-vtt need a cue timing source: pass "
            "--word-timestamps (any long-form mode) or "
            "--longform-mode sequential (timestamped segments)"
        )

    # Multi-host init must happen before any other jax backend use.
    if args.dcn_coordinator:
        from whisper_tpu.parallel.mesh import init_distributed

        init_distributed(args.dcn_coordinator, args.dcn_num_processes,
                         args.dcn_process_id)

    # Ensure output dirs (ref src/main.rs:1068-1071).
    for out in (args.out_csv, args.out_json, args.out_summary_json):
        parent = os.path.dirname(out)
        if parent:
            os.makedirs(parent, exist_ok=True)

    # Config resolution: heuristics < discovery json < CLI flags
    # (ref src/main.rs:1073-1084; SURVEY.md §5.6).
    from whisper_tpu.runtime.session import (
        load_best_cfg_from_discovery,
        suggested_cfg,
    )

    cfg = (
        load_best_cfg_from_discovery(args.discovery_best_json)
        if args.discovery_best_json
        else suggested_cfg()
    )
    if args.intra_op > 0:
        cfg.intra_op = args.intra_op
    if args.inter_op > 0:
        cfg.inter_op = args.inter_op

    variant_note = ""
    if args.variant:
        from whisper_tpu.variants.ladder import apply_variant

        cfg, spec = apply_variant(cfg, args.variant)
        variant_note = spec.description
    if args.dtype:
        cfg = dataclasses.replace(cfg, dtype=args.dtype)
    if args.matmul_precision:
        cfg = dataclasses.replace(cfg, matmul_precision=args.matmul_precision)
    if args.max_batch > 0:
        cfg = dataclasses.replace(cfg, max_batch=args.max_batch)
    if args.audio_transfer in ("auto", "auto-pcm"):
        # Probe THIS session's link (tunnel compression is session-
        # dependent, docs/UPLOAD_PIPELINE.md) and pick the upload encoding.
        from whisper_tpu.utils.wireprobe import choose_audio_transfer

        mode, mbps = choose_audio_transfer(
            allow_pcm=args.audio_transfer == "auto-pcm")
        rates = " ".join(f"{m}={v:.0f}MB/s" for m, v in mbps.items())
        print(f"[wire-probe] {rates} -> {mode}", file=sys.stderr)
        cfg = dataclasses.replace(cfg, audio_transfer=mode)
    elif args.audio_transfer:
        cfg = dataclasses.replace(cfg, audio_transfer=args.audio_transfer)
    if args.data_parallel > 0:
        cfg = dataclasses.replace(cfg, data_parallel=args.data_parallel)
    if args.tensor_parallel > 0:
        cfg = dataclasses.replace(cfg, tensor_parallel=args.tensor_parallel)
    if args.chunk_parallelism > 0 and args.max_batch <= 0:
        # Reference semantics: cap on concurrently-processed chunks.
        # Independent of the TP flag (it maps to max_batch); an explicit
        # --max-batch outranks it.
        b = 1
        while b < args.chunk_parallelism and b < 64:
            b <<= 1
        cfg = dataclasses.replace(cfg, max_batch=b)

    from whisper_tpu.runtime.genconfig import load_generation_cfg
    from whisper_tpu.tokenizer.specials import resolve_tokenizer

    tok = resolve_tokenizer(args.tokenizer_json, args.onnx_dir, args.model_id)
    tokenizer = tok[0] if tok else None
    tokenizer_path = str(tok[1]) if tok else ""
    gen_cfg = load_generation_cfg(
        os.path.join(args.onnx_dir, "generation_config.json")
    )

    initial_prompt_ids = None
    if args.initial_prompt:
        if not tokenizer_path:
            raise SystemExit("--initial-prompt needs a resolvable "
                             "tokenizer.json (pass --tokenizer-json or use "
                             "a model dir with one)")
        from whisper_tpu.tokenizer.bpe import encode_text

        initial_prompt_ids = encode_text(tokenizer_path, args.initial_prompt)

    session = _build_session(args, cfg)

    speculative = bool(args.draft_dir or args.draft_model_id)
    if speculative:
        if (args.longform_mode not in ("chunked", "pipelined")
                or args.num_beams > 1
                or args.timestamps or args.word_timestamps
                or args.temperatures):
            raise SystemExit(
                "--draft-dir/--draft-model-id (speculative decoding) "
                "composes with plain greedy chunked/pipelined modes only")
        from whisper_tpu.models import convert as _convert
        from whisper_tpu.models.registry import get_dims as _get_dims

        if args.draft_dir:
            d_params, d_dims = _convert.load_params(args.draft_dir)
        else:
            d_dims = _get_dims(args.draft_model_id)
            d_params = _convert.init_params(d_dims, seed=1)
        session.set_draft_model(d_params, d_dims,
                                share_encoder=args.draft_share_encoder)

    files = list_audio_files(args.audio_dir, args.limit_files)
    if not files:
        raise SystemExit(f"No audio files found in {args.audio_dir}")

    from whisper_tpu.audio.io import load_audio_16k_mono
    from whisper_tpu.pipeline.longform import transcribe_longform
    from whisper_tpu.bench.writers import (
        RowOut,
        build_summary,
        write_per_file_csv,
        write_per_file_json,
    )

    # Warmup (ref src/main.rs:1131-1152) — also triggers XLA compilation.
    # Beyond the reference's first-file warmup, pre-compile the batch
    # buckets every file in this run will hit, so no compile lands inside
    # the measured loop (chunk counts follow from durations, which the
    # audio loader gives us cheaply relative to a compile).
    def _vad_condense(audio):
        """Apply the same VAD the measured loop applies — warmup must
        compile the buckets of the CONDENSED durations, not the original
        ones, or the first measured file pays a multi-minute compile."""
        if not args.vad_filter:
            return audio
        from whisper_tpu.audio.vad import (
            VadOptions,
            collect_chunks,
            detect_speech,
        )

        spans = detect_speech(
            audio, VadOptions(threshold_db=args.vad_threshold_db))
        return collect_chunks(audio, spans)[0]

    if args.warmup > 0:
        audios = {}
        a0, sr0, _ = load_audio_16k_mono(os.path.join(args.audio_dir, files[0]))
        assert sr0 == 16_000
        a0 = _vad_condense(a0)
        audios[files[0]] = a0

        if args.longform_mode == "pipelined":
            # Pipelined mode compiles its own slab programs (slab STFT +
            # chunk-norm decode buckets); warm them with the real driver so
            # no compile lands in the measured loop.  Geometry follows the
            # file duration, so warm ONE file per distinct duration (mixed-
            # length runs previously compiled inside the measured loop for
            # every geometry the first file didn't cover — ADVICE r2).
            from whisper_tpu.pipeline.pipelined import (
                transcribe_longform_pipelined,
            )

            def _pipelined_warm(audio):
                transcribe_longform_pipelined(
                    session, audio, args.language, args.task,
                    args.max_new_tokens, args.chunk_length_s, args.overlap_s,
                    tokenizer, args.timestamps, gen_cfg, args.num_beams,
                    args.length_penalty, slab_chunks=args.slab_chunks,
                    initial_prompt_ids=initial_prompt_ids,
                    speculative=speculative, draft_k=args.draft_k,
                )

            seen_durs = {round(len(a0) / 16000.0, 3)}
            for f in files[1:]:
                a, _, dur = load_audio_16k_mono(
                    os.path.join(args.audio_dir, f))
                key = round(dur, 3)
                if key not in seen_durs:
                    seen_durs.add(key)
                    _pipelined_warm(a)
            for _ in range(args.warmup):
                _pipelined_warm(a0)
        else:
            from whisper_tpu.pipeline.warmup import warm_buckets

            durs = [
                (len(_vad_condense(load_audio_16k_mono(
                    os.path.join(args.audio_dir, f))[0])) / 16000.0
                 if args.vad_filter else
                 load_audio_16k_mono(os.path.join(args.audio_dir, f))[2])
                if f not in audios else len(audios[f]) / 16000.0
                for f in files
            ]
            warm_buckets(
                session,
                durations_s=[d for d in durs if d > 0],
                language=args.language, task=args.task,
                max_new_tokens=args.max_new_tokens,
                chunk_length_s=args.chunk_length_s, overlap_s=args.overlap_s,
                tokenizer=tokenizer, timestamps=args.timestamps,
                gen_cfg=gen_cfg,
                num_beams=args.num_beams, length_penalty=args.length_penalty,
                initial_prompt_ids=initial_prompt_ids,
                speculative=speculative, draft_k=args.draft_k,
            )
            for _ in range(args.warmup):
                if len(a0) == 0:     # vad condensed it to nothing
                    break
                transcribe_longform(
                    session, a0, args.language, args.task,
                    args.max_new_tokens, args.chunk_length_s, args.overlap_s,
                    tokenizer, args.timestamps, gen_cfg, args.num_beams,
                    args.length_penalty,
                    initial_prompt_ids=initial_prompt_ids,
                    speculative=speculative, draft_k=args.draft_k,
                )

    rows: List[RowOut] = []
    end2end, load_l, pre_l, model_l, dec_l, rtf_l = [], [], [], [], [], []
    txt_dir = os.path.dirname(args.out_csv) or "."

    # Host-side pipelining: with intra_op >= 2 (the TPU reading of the
    # reference's host-thread knob, src/main.rs:92-122) the next file's
    # decode+resample overlaps the current file's transcription; load_s
    # then measures only the wait actually incurred.
    executor = None
    next_future = None
    if cfg.intra_op >= 2 and len(files) > 1:
        from concurrent.futures import ThreadPoolExecutor

        executor = ThreadPoolExecutor(max_workers=1)

    def _load(fnm, with_mel=False):
        """Load + resample; with_mel additionally uploads the audio and
        computes the device mel — overlapping the previous file's decode
        when called from the prefetch thread.  With --vad-filter the
        audio is condensed to its speech spans HERE (so the prefetch
        thread also pays the VAD) and the SpeechMap rides along for
        timestamp restoration; dur stays the ORIGINAL duration
        (faster-whisper's RTF accounting)."""
        audio, sr, dur = load_audio_16k_mono(os.path.join(args.audio_dir, fnm))
        smap = None
        if args.vad_filter:
            from whisper_tpu.audio.vad import (
                VadOptions,
                collect_chunks,
                detect_speech,
            )

            spans = detect_speech(
                audio, VadOptions(threshold_db=args.vad_threshold_db))
            audio, smap = collect_chunks(audio, spans)
        pre_mel = None
        # The fallback ladder computes its own mel — prefetching one here
        # would upload + STFT every file twice.
        if (with_mel and args.longform_mode == "chunked" and len(audio)
                and not args.temperatures):
            from whisper_tpu.frontend import golden as _g
            from whisper_tpu.pipeline.chunk import mel_frame_bucket as _mfb

            padded = _g.reflect_pad(audio)
            total = _g.num_frames(len(audio))
            pre_mel = (session.compute_mel(padded, total, _mfb(total)), total)
        return audio, sr, dur, pre_mel, smap

    if executor is not None:
        next_future = executor.submit(_load, files[0], True)

    profile_ctx = None
    if args.profile_dir:
        import jax

        profile_ctx = jax.profiler.trace(args.profile_dir)
        profile_ctx.__enter__()

    try:
        for idx, fnm in enumerate(files):
            tl0 = time.perf_counter()
            if executor is not None:
                audio, sr, dur, pre_mel, smap = next_future.result()
            else:
                audio, sr, dur, pre_mel, smap = _load(fnm)
            load_s = time.perf_counter() - tl0
            assert sr == 16_000
            if executor is not None and idx + 1 < len(files):
                next_future = executor.submit(_load, files[idx + 1], True)

            words = None
            segments = None
            if args.vad_filter and len(audio) == 0:
                # All silence: nothing to transcribe (faster-whisper emits no
                # segments either).  Falls through to the normal row/transcript
                # writers so every input still gets its output files (empty).
                from whisper_tpu.utils.timing import Timing as _Timing

                words = [] if args.word_timestamps else None
                text, t = "", _Timing(0.0, 0.0, 0.0, 0.0)
            elif args.longform_mode == "pipelined":
                from whisper_tpu.pipeline.pipelined import (
                    transcribe_longform_pipelined,
                )

                words = [] if args.word_timestamps else None
                text, t = transcribe_longform_pipelined(
                    session, audio, args.language, args.task,
                    args.max_new_tokens, args.chunk_length_s, args.overlap_s,
                    tokenizer, args.timestamps, gen_cfg, args.num_beams,
                    args.length_penalty, slab_chunks=args.slab_chunks,
                    word_collector=words,
                    initial_prompt_ids=initial_prompt_ids,
                    speculative=speculative, draft_k=args.draft_k,
                )
            elif args.longform_mode == "sequential":
                from whisper_tpu.pipeline.sequential import transcribe_sequential

                words = [] if args.word_timestamps else None
                text, segments, t = transcribe_sequential(
                    session, audio, args.language, args.task,
                    args.max_new_tokens, tokenizer, gen_cfg,
                    condition_on_prev_text=args.condition_on_prev_text,
                    initial_prompt_ids=initial_prompt_ids,
                    num_beams=args.num_beams,
                    length_penalty=args.length_penalty,
                    word_collector=words,
                )
            elif args.temperatures:
                from whisper_tpu.pipeline.fallback import (
                    transcribe_longform_fallback,
                )

                temps = tuple(float(x) for x in args.temperatures.split(","))
                text, t, _info = transcribe_longform_fallback(
                    session, audio, args.language, args.task,
                    args.max_new_tokens, args.chunk_length_s, args.overlap_s,
                    tokenizer, gen_cfg, temperatures=temps,
                )
            else:
                words = [] if args.word_timestamps else None
                text, t = transcribe_longform(
                    session, audio, args.language, args.task, args.max_new_tokens,
                    args.chunk_length_s, args.overlap_s, tokenizer,
                    args.timestamps, gen_cfg, args.num_beams, args.length_penalty,
                    precomputed_mel=pre_mel,
                    word_collector=words,
                    initial_prompt_ids=initial_prompt_ids,
                    speculative=speculative, draft_k=args.draft_k,
                )

            if smap is not None and words:
                # Map condensed-signal times back to original file time
                # (faster-whisper's restore_speech_timestamps).
                for w in words:
                    w["start"] = round(smap.restore_time(w["start"]), 3)
                    w["end"] = round(smap.restore_time(w["end"]), 3)

            e2e = load_s + t.end_to_end_s
            rtf = e2e / max(dur, 1e-9)
            rows.append(RowOut.make(fnm, dur, e2e, rtf, text, words=words))
            load_l.append(load_s)
            pre_l.append(t.preprocess_s)
            model_l.append(t.model_only_s)
            dec_l.append(t.decode_s)
            end2end.append(e2e)
            rtf_l.append(rtf)

            if args.write_txt:
                stem = Path(fnm).stem
                with open(os.path.join(txt_dir, f"{stem}.transcript.txt"), "w") as f:
                    f.write(text.strip() + "\n")

            if args.write_srt or args.write_vtt:
                from whisper_tpu.bench.subtitles import (
                    cues_from_segments,
                    cues_from_words,
                    write_subtitles,
                )

                # Word timings are the finer source; sequential segments
                # otherwise (flag validation guaranteed one exists).
                cues = (cues_from_words(words) if words
                        else cues_from_segments(segments or []))
                stem = Path(fnm).stem
                if args.write_srt:
                    write_subtitles(os.path.join(txt_dir, f"{stem}.srt"), cues)
                if args.write_vtt:
                    write_subtitles(os.path.join(txt_dir, f"{stem}.vtt"), cues)

    finally:
        # Finalize the trace / stop the prefetcher even when a
        # file fails mid-loop (the trace matters MOST then).
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
        if executor is not None:
            executor.shutdown(wait=False)


    write_per_file_csv(rows, args.out_csv)
    write_per_file_json(rows, args.out_json)

    notes = {
        "longform": "TPU: chunked 30s windows with overlap; chunks batched "
                    "into one on-device encoder+greedy program",
        "token_decode": (
            "Tokenizer decode (skip_special_tokens=true)" if tokenizer
            else "Prints token IDs unless you provide tokenizer.json."
        ),
    }
    if variant_note:
        notes["variant"] = variant_note

    config_echo = cfg.to_dict()
    config_echo["num_beams"] = args.num_beams
    summary = build_summary(
        config_used=config_echo,
        rows=rows,
        end2end=end2end, load=load_l, preprocess=pre_l,
        model_only=model_l, decode=dec_l, rtf_end2end=rtf_l,
        model_id=args.model_id, onnx_dir=args.onnx_dir,
        language=args.language, task=args.task,
        max_new_tokens=args.max_new_tokens,
        tokenizer_json=tokenizer_path, timestamps=args.timestamps,
        notes=notes,
    )
    with open(args.out_summary_json, "w") as f:
        json.dump(summary, f, indent=2)

    # stdout report (ref src/main.rs:1261-1268)
    print("DONE")
    print("Config used:")
    print(json.dumps(cfg.to_dict(), indent=2))
    print(f"Per-file CSV: {args.out_csv}")
    print(f"Per-file JSON: {args.out_json}")
    print(f"Summary JSON: {args.out_summary_json}")
    p95 = summary["latency_end_to_end_s"]["p95"]
    print(f"End-to-end p95(s): {p95:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
