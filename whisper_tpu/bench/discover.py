"""Config autotuner — produces the ``--discovery-best-json`` artifact.

The reference consumes a tuned "best" ORT config from a discovery JSON
(``{"best": {...}}``, ref src/main.rs:124-167, example config.json:1-9) but
ships no tuner.  This tool closes the loop for the TPU framework: it sweeps
the variant ladder (and optionally batch caps) against a real or synthetic
workload, measures steady-state end-to-end latency, and writes the winning
RuntimeCfg in the discovery schema, ready for
``python -m whisper_tpu.bench --discovery-best-json best.json``.

Run: python -m whisper_tpu.bench.discover [--audio FILE | --synthetic-s 60]
         [--model-id ID | --model-dir DIR] [--variants x2,x4,x5,x7]
         [--max-batches 8,16] [--out best.json] [--runs 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from typing import List

import numpy as np


def _synthetic_audio(seconds: float) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * 16000)) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.04 * rng.standard_normal(len(t))
    return x.astype(np.float32)


def sweep(params, dims, audio, variants: List[str], max_batches: List[int],
          max_new_tokens: int, runs: int, verbose=print) -> List[dict]:
    from whisper_tpu.pipeline.longform import transcribe_longform
    from whisper_tpu.runtime.session import WhisperSession, suggested_cfg
    from whisper_tpu.variants.ladder import apply_variant

    results = []
    for variant in variants:
        for mb in max_batches:
            # Start from suggested_cfg, not a bare RuntimeCfg: the bare
            # default pins intra_op=0 into the written "best" config and
            # a consumer via --discovery-best-json then silently loses
            # the host prefetch pipelining (cli.py needs intra_op >= 2).
            base = dataclasses.replace(suggested_cfg(), max_batch=mb)
            cfg, _ = apply_variant(base, variant)
            session = WhisperSession(params, dims, cfg)
            transcribe_longform(session, audio, "en", "transcribe",
                                max_new_tokens)  # warm/compile
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                transcribe_longform(session, audio, "en", "transcribe",
                                    max_new_tokens)
                times.append(time.perf_counter() - t0)
            best = min(times)
            verbose(f"  variant={variant} max_batch={mb}: {best:.3f}s")
            results.append({
                "variant": variant, "max_batch": mb,
                "e2e_s": best, "cfg": dataclasses.asdict(cfg),
            })
            del session
    return sorted(results, key=lambda r: r["e2e_s"])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--audio", default="", help="wav file to tune against")
    ap.add_argument("--synthetic-s", type=float, default=60.0,
                    help="synthetic audio length when --audio is not given")
    ap.add_argument("--model-id", default="openai/whisper-base")
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--variants", default="x2,x4,x5,x7")
    ap.add_argument("--max-batches", default="16")
    ap.add_argument("--max-new-tokens", type=int, default=128)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="discovery_best.json")
    args = ap.parse_args(argv)

    from whisper_tpu.models import convert
    from whisper_tpu.models.registry import get_dims

    if args.model_dir:
        params, dims = convert.load_params(args.model_dir)
    else:
        dims = get_dims(args.model_id)
        params = convert.init_params(dims, seed=0)

    if args.audio:
        from whisper_tpu.audio.io import load_audio_16k_mono

        audio, _, _ = load_audio_16k_mono(args.audio)
    else:
        audio = _synthetic_audio(args.synthetic_s)

    variants = [v for v in args.variants.split(",") if v]
    max_batches = [int(b) for b in args.max_batches.split(",") if b]
    print(f"Sweeping {len(variants) * len(max_batches)} configs "
          f"({len(audio)/16000:.0f}s audio, {args.runs} runs each)...")
    results = sweep(params, dims, audio, variants, max_batches,
                    args.max_new_tokens, args.runs)

    best = results[0]
    out = {
        "best": best["cfg"],
        "metric": "end_to_end_s",
        "value": best["e2e_s"],
        "sweep": [
            {k: r[k] for k in ("variant", "max_batch", "e2e_s")}
            for r in results
        ],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"Best: variant={best['variant']} max_batch={best['max_batch']} "
          f"({best['e2e_s']:.3f}s) -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
