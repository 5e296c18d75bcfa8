"""Serving-path benchmark: N concurrent short streams through the
continuous-batching engine (BASELINE.json config 5; the reference has no
serving story — faster-whisper P3 is the closest comparison SUT).

Measures the aggregate real-time factor (total audio seconds / wall
seconds) and per-request latency percentiles for a burst of N streams of
S seconds each, submitted from worker threads like independent clients.
The engine's tick pipeline (serve/engine.py) keeps tick k+1's H2D upload
on the wire while tick k decodes, which is where the aggregate number is
won: a full 16x30 s tick is ~15 MB int16 through a ~30 MB/s link.

Usage: python scripts/serve_bench.py [--streams 64] [--seconds 30]
       [--variant x5] [--model-id openai/whisper-base] [--reps 3]
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--variant", default="x5")
    ap.add_argument("--model-id", default="openai/whisper-base")
    ap.add_argument("--max-new-tokens", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--draft-model-id", default="",
                    help="attach a random-init draft of this registry id: "
                         "the engine's ticks then take the speculative leg "
                         "(random drafts = the adversarial acceptance "
                         "endpoint; measures the speculative serving "
                         "path's overhead floor)")
    ap.add_argument("--draft-share-encoder", action="store_true")
    args = ap.parse_args()

    from whisper_tpu.models.convert import init_params
    from whisper_tpu.models.registry import get_dims
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.serve.engine import EngineConfig, StreamingEngine
    from whisper_tpu.variants.ladder import apply_variant

    dims = get_dims(args.model_id)
    params = init_params(dims, seed=0)
    cfg, _ = apply_variant(RuntimeCfg(), args.variant)
    session = WhisperSession(params, dims, cfg)
    if args.draft_model_id:
        d_dims = get_dims(args.draft_model_id)
        session.set_draft_model(init_params(d_dims, seed=1), d_dims,
                                share_encoder=args.draft_share_encoder)
    eng = StreamingEngine(
        session,
        cfg=EngineConfig(max_new_tokens=args.max_new_tokens,
                         batch_window_ms=20),
    )

    rng = np.random.default_rng(0)
    n_samp = int(args.seconds * 16000)
    streams = [
        (0.1 * np.sin(2 * np.pi * (150 + 10 * i)
                      * np.arange(n_samp) / 16000.0)
         + 0.03 * rng.standard_normal(n_samp)).astype(np.float32)
        for i in range(args.streams)
    ]

    print("warmup (compiles every short bucket)...", flush=True)
    t0 = time.perf_counter()
    eng.warmup()
    print(f"warmup done in {time.perf_counter() - t0:.0f}s", flush=True)

    total_audio = args.streams * args.seconds
    for rep in range(args.reps):
        lat = []

        def one(a):
            t = time.perf_counter()
            eng.transcribe(a, timeout=600)
            return time.perf_counter() - t

        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(args.streams) as ex:
            lat = list(ex.map(one, streams))
        wall = time.perf_counter() - t0
        lat.sort()
        p = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]
        print(f"rep{rep}: wall {wall:.2f}s -> {total_audio / wall:.0f}x "
              f"aggregate | latency p50 {p(0.5):.2f}s p95 {p(0.95):.2f}s "
              f"max {lat[-1]:.2f}s | ticks {eng.stats['batches']}",
              flush=True)
    eng.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
