"""faster-whisper SUT — the reference's `benchmark_faster_whisper.py`
counterpart (P3), runnable wherever faster-whisper/CTranslate2 is
installed (absent in this TPU image: the runner exits with the skip code).

Mirrors the reference: WhisperModel on CPU with the chosen compute type,
`transcribe(beam_size, temperature=0.0)`, segments joined
(ref benchmark_faster_whisper.py:76-122).

Usage: python -m whisper_tpu.suts.faster_whisper_sut --audio-dir DIR
       [--compute-type float32|int8] ...
"""

from __future__ import annotations

import os
import time

from whisper_tpu.suts import harness


def _transcribe(state, audio) -> harness.SutResult:
    model, beam_size, language, task = state
    t0 = time.perf_counter()
    segments, _info = model.transcribe(
        audio, language=language, task=task,
        beam_size=beam_size, best_of=beam_size, temperature=0.0,
    )
    text = " ".join(s.text.strip() for s in segments).strip()
    model_s = time.perf_counter() - t0
    return harness.SutResult(text, 0.0, model_s, 0.0)


def main(argv=None) -> int:
    p = harness.build_parser(__doc__)
    p.add_argument("--compute-type", default="float32",
                   choices=["float32", "int8"])
    args = p.parse_args(argv)
    try:
        from faster_whisper import WhisperModel
    except Exception as e:
        return harness.missing_dependency("faster-whisper", e, args)

    model = WhisperModel(
        args.model_dir or args.model_id, device="cpu",
        compute_type=args.compute_type,
        cpu_threads=os.cpu_count() or 4, num_workers=1,
    )
    state = (model, args.num_beams, args.language, args.task)
    return harness.run_benchmark(
        args, {"engine": "faster-whisper",
               "compute_type": args.compute_type,
               "num_beams": args.num_beams},
        _transcribe, state,
        sut_name=f"faster_whisper_{args.compute_type}",
    )


if __name__ == "__main__":
    raise SystemExit(main())
