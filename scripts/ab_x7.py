"""A/B the x7 (int8 self cache) decode against x5 on the real TPU.

Times the bucket-B chunk program (encoder + prefill + max_new greedy
steps) per variant with the N-vs-n delta method (scripts/tpu_timing.py),
and checks the two token chains agree (self-KV quantization should at
most tie-flip; report any diffs).

Usage: python scripts/ab_x7.py [--batch 16] [--max-new 128]
       [--model-id openai/whisper-base] [--variants x5,x7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tpu_timing import device_time  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--model-id", default="openai/whisper-base")
    ap.add_argument("--variants", default="x5,x7")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisper_tpu.models.convert import init_params
    from whisper_tpu.models.registry import get_dims
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.variants.ladder import apply_variant

    print(f"backend: {jax.default_backend()}", flush=True)
    dims = get_dims(args.model_id)
    params = init_params(dims, seed=0)
    rng = np.random.default_rng(0)
    mel_np = rng.normal(0, 1, (args.batch, dims.n_mels, 3000)).astype(
        np.float32)
    prompt = [50258, 50259, 50359, 50363]
    eot = 50257

    chains = {}
    for variant in args.variants.split(","):
        cfg, _ = apply_variant(RuntimeCfg(max_batch=args.batch), variant)
        sess = WhisperSession(params, dims, cfg)
        # Device-resident mel + the raw compiled chunk fn: time device work
        # only (upload/overheads identical across variants anyway).
        fn = sess._get_fn(args.batch, len(prompt), args.max_new, eot)
        sup, first = sess._get_masks(None, None)
        mel_dev = jax.device_put(jnp.asarray(mel_np, cfg.jnp_dtype))
        p_dev = jax.device_put(jnp.asarray(prompt, jnp.int32))
        fargs = (sess.params, sess._step_weights, mel_dev, p_dev, sup, first)

        t0 = time.perf_counter()
        out = fn(*fargs)
        toks = np.asarray(out)
        print(f"{variant}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        chains[variant] = toks
        per = device_time(fn, fargs)
        print(f"{variant}: chunk program {per*1000:.2f} ms "
              f"({per/args.max_new*1e3:.3f} ms/step upper bound, "
              f"B={args.batch}, {args.max_new} steps)", flush=True)

    names = list(chains)
    if len(names) == 2:
        a, b = chains[names[0]], chains[names[1]]
        diff = int((a != b).sum())
        print(f"token agreement {names[0]} vs {names[1]}: "
              f"{a.size - diff}/{a.size} equal ({diff} diffs)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
