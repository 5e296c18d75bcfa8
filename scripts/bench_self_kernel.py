"""Microbenchmark: bf16 vs int8 self-attention step kernels in isolation.

Separates the kernel's own device time from the surrounding XLA ops
(new-row quantization, scale reshapes) to locate the x7 overhead seen in
scripts/ab_x7.py.  Times, at whisper-base-like decode shapes:

  a) the bf16 packed kernel (x4/x5 path)       — self_attend_step_packed
  b) the int8 kernel (v3: in-kernel row quant) — self_attend_step_packed_int8
  c) the _quant_rows trio alone                — the host-side quantize the
     v3 kernel absorbed (for reference: it measured 224 us of pure XLA
     launch overhead, 3.4x the whole bf16 kernel)

Usage: python scripts/bench_self_kernel.py [--batch 16] [--heads 8]
       [--layers 6] [--s-pad 256]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tpu_timing import device_time  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--s-pad", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisper_tpu.ops import self_attention as sa

    b, h, l, s = args.batch, args.heads, args.layers, args.s_pad
    g = h // sa.PACK
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    q = jnp.asarray(rng.normal(0, 1, (b, h, 64)), dt)
    kn = jnp.asarray(rng.normal(0, 1, (b, h, 64)), dt)
    vn = jnp.asarray(rng.normal(0, 1, (b, h, 64)), dt)
    kc16 = jnp.asarray(rng.normal(0, 1, (l, b, g, s, 128)), dt)
    vc16 = jnp.asarray(rng.normal(0, 1, (l, b, g, s, 128)), dt)
    kc8 = jnp.asarray(rng.integers(-127, 128, (l, b, g, s, 128)), jnp.int8)
    vc8 = jnp.asarray(rng.integers(-127, 128, (l, b, g, s, 128)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (l, b, g, s, 2)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (l, b, g, s, 2)), jnp.float32)
    li = jnp.int32(0)
    pos = jnp.int32(s // 2)

    f16 = jax.jit(lambda *a: sa.self_attend_step_packed(*a))
    per = device_time(f16, (q, kn, vn, kc16, vc16, li, pos))
    print(f"bf16 kernel step:  {per*1e6:.1f} us  "
          f"(L={l} layers in one call? no — single layer slice)", flush=True)

    f8 = jax.jit(lambda *a: sa.self_attend_step_packed_int8(*a))
    per8 = device_time(f8, (q, kn, vn, kc8, vc8, ks, vs, li, pos))
    print(f"int8 kernel step:  {per8*1e6:.1f} us (v3, in-kernel quant)",
          flush=True)

    fq = jax.jit(lambda a, c, d: (sa._quant_rows(a), sa._quant_rows(c),
                                  sa._quant_rows(d)))
    perq = device_time(fq, (q, kn, vn))
    print(f"_quant_rows trio:  {perq*1e6:.1f} us", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
