"""Same-session A/B of the wire encodings (audio_transfer int16 vs dint16).

The tunnel's throughput varies hugely across sessions (CLAUDE.md), so
encoding comparisons are only meaningful ALTERNATED inside one process.
Runs the headline workload (bench.py: 301.574 s synthetic file, x5,
chunked) with two sessions that differ only in cfg.audio_transfer, and
reports per-run e2e + preprocess for each arm.

Usage: python scripts/ab_transfer.py [reps=5] [arms=int16,dint16]
"""

from __future__ import annotations

import dataclasses
import sys
import time


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    arms = (sys.argv[2].split(",") if len(sys.argv) > 2
            else ["int16", "dint16"])

    sys.path.insert(0, ".")
    from bench import AUDIO_SECONDS, synth_audio

    from whisper_tpu.models.convert import init_params
    from whisper_tpu.models.registry import get_dims
    from whisper_tpu.pipeline.longform import transcribe_longform
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.variants.ladder import apply_variant

    dims = get_dims("openai/whisper-base")
    params = init_params(dims, seed=0)
    base_cfg, _ = apply_variant(RuntimeCfg(), "x5")
    audio = synth_audio(AUDIO_SECONDS)

    sessions = {}
    texts = {}
    for arm in arms:
        cfg = dataclasses.replace(base_cfg, audio_transfer=arm)
        sessions[arm] = WhisperSession(params, dims, cfg)
        texts[arm], _ = transcribe_longform(  # warmup/compile
            sessions[arm], audio, language="en", task="transcribe",
            max_new_tokens=128, chunk_length_s=30.0, overlap_s=5.0)

    results = {arm: [] for arm in arms}
    for r in range(reps):
        for arm in arms:
            t0 = time.perf_counter()
            _, t = transcribe_longform(
                sessions[arm], audio, language="en", task="transcribe",
                max_new_tokens=128, chunk_length_s=30.0, overlap_s=5.0)
            e2e = time.perf_counter() - t0
            results[arm].append((e2e, t.preprocess_s))
            print(f"[rep {r}] {arm:7s} e2e {e2e:.3f}s "
                  f"preprocess {t.preprocess_s:.3f}s", flush=True)

    for arm in arms:
        es = sorted(e for e, _ in results[arm])
        ps = sorted(p for _, p in results[arm])
        med_e, med_p = es[len(es) // 2], ps[len(ps) // 2]
        print(f"{arm}: median e2e {med_e:.3f}s ({AUDIO_SECONDS/med_e:.0f}x)"
              f" preprocess {med_p:.3f}s  (all e2e: "
              + " ".join(f"{e:.3f}" for e, _ in results[arm]) + ")")
    pairs = [(a, b) for i, a in enumerate(arms) for b in arms[i + 1:]]
    for a, b in pairs:
        same = texts[a] == texts[b]
        print(f"transcripts {a} vs {b}: {'IDENTICAL' if same else 'DIFFER'}")


if __name__ == "__main__":
    main()
