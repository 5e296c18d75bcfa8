"""A/B the fused encoder-block kernels on the real TPU.

Measures, at whisper-base bucket-16 (the serving/chunk workload):
  1. bare encoder forward (B=16 x 3000 frames) — unfused / fused_mlp /
     fused_block;
  2. the full chunk program (encoder + prefill + 128 greedy steps) under
     variant x5 with each encoder path.

Round-2 state to beat (docs/DECODE_ROOFLINE.md, CLAUDE.md): bucket-16 call
113.6 ms (x5) -> 102.0 ms (x5 + fused_encoder_mlp); target <= 95 ms
(VERDICT round-3 item 1).

Usage: python scripts/bench_encoder_block.py [--reps 30]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    # block_until_ready does not block through the axon tunnel; a 1-element
    # fetch does (~32 ms fixed round trip, CLAUDE.md).
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def _time(fn, reps):
    fn(); _sync(fn())  # warm (compile)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--model-id", default="openai/whisper-base")
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisper_tpu.models import whisper
    from whisper_tpu.models.convert import init_params
    from whisper_tpu.models.registry import get_dims
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.variants.ladder import apply_variant

    print("devices:", jax.devices(), flush=True)
    dims = get_dims(args.model_id)
    params = init_params(dims, seed=0)
    rng = np.random.default_rng(0)
    mel16 = rng.normal(0, 1, (args.batch, dims.n_mels, 3000)).astype(np.float32)

    # --- 1. bare encoder ---
    from whisper_tpu.models.convert import cast_params
    p_bf16 = cast_params(params, jnp.bfloat16)
    mel_dev = jnp.asarray(mel16)

    for label, kw in [
        ("unfused(+attn kernel)", dict(fused_attention=True)),
        ("fused_mlp", dict(fused_attention=True, fused_mlp=True)),
        ("fused_block", dict(fused_block=True)),
    ]:
        f = jax.jit(lambda p, m, kw=kw: whisper.encoder_apply(
            p, dims, m, **kw))
        med, best = _time(lambda: f(p_bf16, mel_dev), args.reps)
        print(f"encoder {label:24s} median {med*1e3:7.2f} ms  "
              f"best {best*1e3:7.2f} ms", flush=True)

    if args.skip_full:
        return 0

    # --- 2. full chunk program under x5 ---
    prompt = [50258, 50259, 50359, 50363]
    for label, patch in [
        ("x5", {}),
        ("x5+fused_mlp", {"fused_encoder_mlp": True}),
        ("x5+fused_block", {"fused_encoder_block": True}),
    ]:
        cfg, _ = apply_variant(RuntimeCfg(max_batch=args.batch), "x5")
        cfg = dataclasses.replace(cfg, **patch)
        sess = WhisperSession(params, dims, cfg)

        def run():
            return sess.transcribe_chunks(
                mel16, prompt=prompt, max_new_tokens=128, eot_id=50257)

        t0 = time.perf_counter(); run()
        print(f"[{label}] warm (incl. compile): "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter(); run()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        print(f"chunk16 {label:16s} median {med*1e3:7.1f} ms  "
              f"best {ts[0]*1e3:7.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
