"""A/B batched speculative decoding vs plain greedy on the real TPU
(VERDICT r3 item 5): batch-B chunk decoding at whisper-large-v3 dims with
a distil-large-v3-shaped drafter (2-layer decoder sharing encoder dims).

Random weights give honest endpoints real weights sit between:
- drafter == verifier ("self"): perfect acceptance — exercises the
  verify-pass machinery at its best case (but draft steps cost full-model
  steps, so wall time is not the win; tokens/round is).
- noise-perturbed verifier ("noisy"): the MAIN decoder with small relative
  weight noise (--noise-sigma) — argmax chains agree until logit gaps
  close, so acceptance lands MID-RANGE, giving a measured
  (alpha, tokens/round) point between the endpoints that checks the
  1 + alpha*k model empirically (drafter cost = full model here; the
  distil arm measures the cost side).  CAVEAT (measured 2026-08-19):
  on RANDOM-INIT weights the top-2 logit gaps are near zero, so even
  sigma=0.03 collapses acceptance to alpha~0.01 — the arm only lands
  mid-range on trained weights.  The breakeven math does not need it:
  alpha*=greedy-vs-round-cost uses the self (alpha=1) and distil
  (cost-floor) arms alone.
- independent random distil drafter ("distil"): ~zero acceptance — the
  per-round overhead floor.

From the measured greedy ms/token and speculative ms/round the script
prints the BREAKEVEN acceptance rate: real distil-large-v3 drafts hit
~70-90% token acceptance on speech, so speculative wins whenever
breakeven < that. Token chains are checked equal to greedy (losslessness).

Usage: python scripts/ab_speculative.py [--batch 16] [--max-new 32]
       [--model-id openai/whisper-large-v3]
       [--draft-model-id distil-whisper/distil-large-v3] [--k 4]
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
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--model-id", default="openai/whisper-large-v3")
    ap.add_argument("--draft-model-id",
                    default="distil-whisper/distil-large-v3")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--int8", action="store_true",
                    help="measure the production x5 configuration: greedy "
                         "runs int8 cross-KV + packed int8-MXU kernels; "
                         "speculative runs int8_cross_kv + packed_draft + "
                         "packed_main + int8_mxu (the config the session "
                         "plumbs)")
    ap.add_argument("--noise-sigma", type=float, default=0.03,
                    help="relative weight noise for the mid-acceptance "
                         "'noisy' drafter arm (0 disables the arm)")
    ap.add_argument("--hbm-gb", type=float, default=15.75,
                    help="chip HBM capacity used by the pre-compile "
                         "footprint gate (v5e default; 0 disables)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisper_tpu.models import whisper
    from whisper_tpu.models.convert import cast_params, init_params
    from whisper_tpu.models.registry import get_dims
    from whisper_tpu.runtime.generate import (
        build_suppress_mask,
        greedy_generate,
    )
    from whisper_tpu.runtime.speculative import speculative_generate

    print(f"backend: {jax.default_backend()}", flush=True)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dims = get_dims(args.model_id)
    d_dims = get_dims(args.draft_model_id)
    assert d_dims.d_model == dims.d_model, "draft must share encoder width"
    params = cast_params(init_params(dims, seed=0), dt)
    d_params = cast_params(init_params(d_dims, seed=1), dt)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.normal(0, 1, (args.batch, dims.n_mels, 3000)), dt)
    prompt = jnp.asarray([50258, 50259, 50359, 50363], jnp.int32)
    eot = 50257
    mask = jnp.asarray(build_suppress_mask(dims.vocab_size, []))

    enc = jax.jit(lambda p, m: whisper.encoder_apply(p, dims, m))(params, mel)
    enc_d = jax.jit(lambda p, m: whisper.encoder_apply(p, d_dims, m))(
        d_params, mel)
    jax.block_until_ready((enc, enc_d))

    # prompt/mask are ARGUMENTS, not closure captures: closure-captured jnp
    # arrays get hoisted as const-args and the jit dispatch fastpath loses
    # them on the 2nd+ call once a sibling program compiled (the jax-0.9
    # "supplied 57 buffers but expected 58" landmine — CLAUDE.md).
    q8 = bool(args.int8)
    g_fn = jax.jit(lambda p, e, pr, mk: greedy_generate(
        p, dims, e, pr, mk, mk,
        max_new_tokens=args.max_new, eot_id=eot,
        int8_cross_kv=q8, packed_cross=q8, int8_mxu=q8))
    t0 = time.perf_counter()
    g_toks = np.asarray(g_fn(params, enc, prompt, mask))
    print(f"greedy: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    t_g = device_time(g_fn, (params, enc, prompt, mask))
    ms_tok_g = t_g * 1e3 / args.max_new
    print(f"greedy: {t_g*1e3:.2f} ms/program, {ms_tok_g:.3f} ms/token "
          f"(B={args.batch}, {args.max_new} steps)", flush=True)

    arms = [("self", params, dims, enc)]
    if args.noise_sigma > 0:
        # Mid-acceptance drafter: the main model with small relative
        # weight noise on the DECODER only (encoder shared with the main
        # model, like a distil deployment).  Per-leaf noise scaled by the
        # leaf's own std keeps every layer in-distribution.
        nrng = np.random.default_rng(12345)

        def _perturb(x):
            a = np.asarray(x, dtype=np.float32)
            if a.ndim == 0:
                return x
            s = float(a.std()) or 1.0
            return jnp.asarray(
                a + args.noise_sigma * s
                * nrng.standard_normal(a.shape).astype(np.float32),
                dtype=x.dtype)

        n_params = dict(params)
        n_params["decoder"] = jax.tree_util.tree_map(
            _perturb, params["decoder"])
        arms.append(("noisy", n_params, dims, enc))
    arms.append(("distil", d_params, d_dims, enc_d))

    results = {}
    from whisper_tpu.utils import hbm

    for label, dp, dd, ed in arms:
        # Pre-compile HBM gate: a doomed config costs ~10-30 min of remote
        # XLA compile before the RESOURCE_EXHAUSTED arrives (the bf16
        # B=16 arm measured 17.52 GB needed vs 15.75 GB, 2026-08-19).
        if args.hbm_gb > 0:
            fp = hbm.decode_footprint(
                dims, args.batch, int(prompt.shape[0]) + args.max_new,
                weight_bytes=2 if args.dtype == "bfloat16" else 4,
                kv_bytes=2 if args.dtype == "bfloat16" else 4,
                int8_cross=q8, draft_dims=dd,
                shared_draft_params=(dp is params),
                cache_copies=2.0,
            )
            warn = hbm.check_fit(fp, int(args.hbm_gb * (1 << 30)),
                                 label=f"spec[{label}]")
            if warn:
                print(f"spec[{label}]: SKIPPED pre-compile — {warn}",
                      flush=True)
                continue
        s_fn = jax.jit(lambda p, dpp, e, edd, pr, mk, _dd=dd:
                       speculative_generate(
            p, dims, dpp, _dd, e, edd, pr, mk, mk,
            max_new_tokens=args.max_new, eot_id=eot, draft_k=args.k,
            int8_cross_kv=q8, packed_draft=q8, packed_main=q8,
            int8_mxu=q8))
        t0 = time.perf_counter()
        try:
            toks, rounds, n = jax.block_until_ready(
                s_fn(params, dp, enc, ed, prompt, mask))
        except Exception as e:  # noqa: BLE001 — isolate arms: an HBM OOM
            # on one arm (bf16 large-v3 keeps TWO full cross caches:
            # ~7.9 GB each at B=16 -> >15.75 GB HBM; measured 2026-08-19)
            # must not lose the remaining arms' measurements.
            msg = str(e).splitlines()[0][:200]
            print(f"spec[{label}]: FAILED ({type(e).__name__}: {msg}) — "
                  f"skipping arm; try a smaller --batch", flush=True)
            continue
        print(f"spec[{label}]: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        toks = np.asarray(toks)
        diff = int((toks != g_toks).sum())
        t_s = device_time(s_fn, (params, dp, enc, ed, prompt, mask))
        rounds = int(rounds)
        committed = int(np.asarray(n).sum())
        # First token per row comes from PREFILL, not a verify round —
        # exclude it so tokens/round maps cleanly onto 1 + alpha*k.
        tpr = (committed - args.batch) / max(rounds, 1) / args.batch
        ms_tok = t_s * 1e3 / args.max_new
        t_round = t_s / max(rounds, 1)
        alpha_m = max(0.0, (tpr - 1.0) / args.k)  # measured acceptance
        print(f"spec[{label}]: {t_s*1e3:.2f} ms/program, "
              f"{ms_tok:.3f} ms/token, {rounds} rounds, "
              f"{tpr:.2f} tokens/round/row (alpha~{alpha_m:.2f}), "
              f"lossless={'YES' if diff == 0 else f'NO ({diff} diffs)'}",
              flush=True)
        results[label] = (t_round, rounds)

    # Breakeven acceptance: per-round cost from the distil run (cheap
    # drafter), tokens/round = 1 + alpha*k -> alpha* solves
    # t_round/(1+alpha*k) = t_g/max_new.
    if "distil" not in results:
        print("breakeven: distil arm missing — no cheap-drafter round cost",
              flush=True)
        return 0
    t_round = results["distil"][0]
    per_tok_g = t_g / args.max_new
    alpha_star = (t_round / per_tok_g - 1.0) / args.k
    print(f"breakeven acceptance (k={args.k}): alpha* = {alpha_star:.2f} "
          f"(real distil drafts measure ~0.7-0.9 on speech)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
