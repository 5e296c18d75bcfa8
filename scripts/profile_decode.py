"""Profile the decode loop at whisper-base scale on the TPU.

Produces the op-level evidence for the decode-step roofline work
(docs/ROADMAP.md §1-2): runs the x4 chunk program (B=16, 128 new tokens)
under jax.profiler and prints the XLA-op breakdown via results/xplane.py.

Usage: python scripts/profile_decode.py [--variant x4] [--batch 16]
       [--max-new 128] [--out /tmp/decode_trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="x4")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--out", default="/tmp/decode_trace")
    ap.add_argument("--model-id", default="openai/whisper-base")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from whisper_tpu.models.convert import init_params
    from whisper_tpu.models.registry import get_dims
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.variants.ladder import apply_variant

    dims = get_dims(args.model_id)
    params = init_params(dims, seed=0)
    cfg, _ = apply_variant(RuntimeCfg(max_batch=args.batch), args.variant)
    sess = WhisperSession(params, dims, cfg)

    rng = np.random.default_rng(0)
    mel = rng.normal(0, 1, (args.batch, dims.n_mels, 3000)).astype(np.float32)
    prompt = [50258, 50259, 50359, 50363]

    def run():
        return sess.transcribe_chunks(
            mel, prompt=prompt, max_new_tokens=args.max_new, eot_id=50257
        )

    t0 = time.perf_counter()
    run()  # compile + warm
    print(f"warm (incl. compile): {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    run()
    per = time.perf_counter() - t0
    print(f"steady e2e: {per*1000:.1f} ms for {args.max_new} steps at "
          f"B={args.batch} -> {per/args.max_new*1000:.3f} ms/step "
          f"(incl. encoder+prefill)", flush=True)

    with jax.profiler.trace(args.out):
        for _ in range(args.reps):
            run()

    from whisper_tpu.results.xplane import report

    rows = report(args.out, top_n=40)
    # Aggregate convenience: total XLA-op time per rep.
    xla = [ms for line, _op, ms in rows if "XLA" in line or "Ops" in line]
    if xla:
        print(f"(top-op sum {sum(xla):.1f} ms over {args.reps} reps)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
