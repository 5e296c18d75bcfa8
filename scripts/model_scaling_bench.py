"""Model-family scaling numbers on the real chip (BASELINE configs 1-4).

Transcribes one 301.574 s synthetic file per model at variant x5 (or
--variant) in chunked long-form mode and reports median x-realtime of
--reps runs, mirroring bench.py's workload so rows are comparable to the
headline number and to round-2's recorded scaling table (CLAUDE.md).

Usage: python scripts/model_scaling_bench.py [--models base,small,...]
       [--variant x5] [--reps 3] [--max-new 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIO_SECONDS = 301.574

DEFAULT_MODELS = [
    "openai/whisper-base",
    "openai/whisper-small",
    "openai/whisper-medium",
    "openai/whisper-large-v3",
    "openai/whisper-large-v3-turbo",
    "distil-whisper/distil-large-v3",
]


def synth_audio(seconds: float, sr: int = 16_000) -> np.ndarray:
    n = int(seconds * sr)
    rng = np.random.default_rng(42)
    t = np.arange(n, dtype=np.float64) / sr
    x = (0.3 * np.sin(2 * np.pi * (180 + 60 * np.sin(2 * np.pi * 0.7 * t)) * t)
         + 0.15 * np.sin(2 * np.pi * 920 * t)
         + 0.04 * rng.standard_normal(n))
    return (0.5 * x).astype(np.float32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(DEFAULT_MODELS))
    ap.add_argument("--variant", default="x5")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--mode", default="chunked",
                    choices=["chunked", "pipelined"])
    args = ap.parse_args()

    from whisper_tpu.models.convert import init_params
    from whisper_tpu.models.registry import get_dims
    from whisper_tpu.pipeline.longform import transcribe_longform
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.variants.ladder import apply_variant

    if args.mode == "pipelined":
        from whisper_tpu.pipeline.pipelined import (
            transcribe_longform_pipelined as transcribe,
        )
    else:
        transcribe = transcribe_longform

    audio = synth_audio(AUDIO_SECONDS)
    results = {}
    for model_id in args.models.split(","):
        model_id = model_id.strip()
        dims = get_dims(model_id)
        params = init_params(dims, seed=0)
        cfg, _ = apply_variant(RuntimeCfg(), args.variant)
        sess = WhisperSession(params, dims, cfg)

        def run():
            _, t = transcribe(sess, audio, language="en", task="transcribe",
                              max_new_tokens=args.max_new,
                              chunk_length_s=30.0, overlap_s=5.0)
            return t

        t0 = time.perf_counter()
        run()  # compile + warm
        warm = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        x = AUDIO_SECONDS / med
        results[model_id] = round(x, 1)
        print(f"{model_id:36s} median {med:6.3f} s -> {x:7.1f}x realtime "
              f"(best {AUDIO_SECONDS/times[0]:7.1f}x, warm {warm:.0f}s)",
              flush=True)
        del sess, params

    print(json.dumps({"variant": args.variant, "mode": args.mode,
                      "x_realtime": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
