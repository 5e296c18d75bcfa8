"""Direct H2D wire probe through the tunnel: raw int16 vs delta encodings.

Measures pure upload time for the headline file's audio payload under
several host encodings, via the N-vs-n delta method (enqueue N uploads,
each consumed by a trivial device reduction, sync once at the end —
per-upload time = (t_N - t_n)/(N - n); CLAUDE.md: wall-clocking a single
transfer measures the ~30 ms tunnel round trip instead).

Arms: f32 (raw), int16, dint16 (first differences), d2int16 (second
differences), shuffled-int16 (decorrelated control — incompressible).

Usage: python scripts/probe_wire.py [N=12] [n=4]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def encode(audio: np.ndarray, mode: str) -> np.ndarray:
    pcm = np.round(np.clip(audio, -1, 1) * 32767.0).astype(np.int16)
    if mode == "f32":
        return audio.astype(np.float32)
    if mode == "int16":
        return pcm
    if mode == "dint16":
        return np.diff(pcm.astype(np.int32),
                       prepend=np.int32(0)).astype(np.uint16)
    if mode == "d2int16":
        d = np.diff(pcm.astype(np.int32), prepend=np.int32(0))
        return np.diff(d, prepend=np.int32(0)).astype(np.uint16)
    if mode == "shuf16":
        rng = np.random.default_rng(7)
        return rng.permutation(pcm)
    raise ValueError(mode)


def main() -> None:
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import AUDIO_SECONDS, synth_audio

    audio = synth_audio(AUDIO_SECONDS)

    @jax.jit
    def consume(x):
        return jnp.sum(x.astype(jnp.float32))

    def run(payload: np.ndarray, reps: int) -> float:
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = consume(jnp.asarray(payload))
        float(np.asarray(acc))  # one sync at the end
        return time.perf_counter() - t0

    for mode in ["f32", "int16", "dint16", "d2int16", "shuf16"]:
        payload = encode(audio, mode)
        mb = payload.nbytes / 1e6
        run(payload, 2)  # warm the consume program + first transfer
        t_small = run(payload, n)
        t_big = run(payload, N)
        per = (t_big - t_small) / (N - n)
        print(f"{mode:8s} {mb:6.1f} MB  {per*1e3:7.1f} ms/upload "
              f"({mb/per:6.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
