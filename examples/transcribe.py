#!/usr/bin/env python3
"""Minimal end-to-end example: transcribe one audio file.

    python examples/transcribe.py FILE.wav [--model-dir DIR]
        [--model-id openai/whisper-base] [--language en|auto]
        [--variant x4] [--timestamps] [--num-beams N]

Without --model-dir (no converted weights available), pass a registry
--model-id and weights are random-initialized — useful for smoke-testing
the pipeline; transcripts are meaningful only with converted weights
(see whisper_tpu.models.convert_cli).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("audio")
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--model-id", default="openai/whisper-base")
    ap.add_argument("--language", default="en")
    ap.add_argument("--task", default="transcribe")
    ap.add_argument("--variant", default="x4")
    ap.add_argument("--timestamps", action="store_true")
    ap.add_argument("--num-beams", type=int, default=1)
    ap.add_argument("--max-new-tokens", type=int, default=128)
    args = ap.parse_args()

    from whisper_tpu.audio.io import load_audio_16k_mono
    from whisper_tpu.models import convert
    from whisper_tpu.models.registry import get_dims
    from whisper_tpu.pipeline.longform import transcribe_longform
    from whisper_tpu.runtime.genconfig import load_generation_cfg
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.tokenizer.specials import resolve_tokenizer
    from whisper_tpu.variants.ladder import apply_variant

    if args.model_dir:
        params, dims = convert.load_params(args.model_dir)
    else:
        dims = get_dims(args.model_id)
        params = convert.init_params(dims, seed=0)

    cfg, _ = apply_variant(RuntimeCfg(), args.variant)
    session = WhisperSession(params, dims, cfg)
    tok = resolve_tokenizer("", args.model_dir, args.model_id)
    gen_cfg = load_generation_cfg(
        os.path.join(args.model_dir, "generation_config.json")
    ) if args.model_dir else None

    audio, _, duration = load_audio_16k_mono(args.audio)
    text, timing = transcribe_longform(
        session, audio, args.language, args.task, args.max_new_tokens,
        tokenizer=tok[0] if tok else None, timestamps=args.timestamps,
        gen_cfg=gen_cfg, num_beams=args.num_beams,
    )
    print(text)
    print(f"\n[{duration:.1f}s audio in {timing.end_to_end_s:.2f}s — "
          f"{duration / timing.end_to_end_s:.0f}x real-time]",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
