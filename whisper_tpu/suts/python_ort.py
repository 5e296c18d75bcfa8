"""Optimum-ORT SUT — the reference's `benchmark_without_hf_pipeline.py`
counterpart (P1), runnable wherever optimum[onnxruntime] is installed.

Mirrors the reference's behavior: ORTModelForSpeechSeq2Seq with explicit
encoder/decoder/decoder_with_past filenames (ref
benchmark_without_hf_pipeline.py:154-186), long-form `generate` with
`return_timestamps=True` (the HF sequential algorithm, :236-244), same
output schemas. In this TPU image onnxruntime is absent, so the runner
exits with the skip code and the orchestrator moves on.

Usage: python -m whisper_tpu.suts.python_ort --audio-dir DIR
       --model-dir <onnx-export-dir> ...
"""

from __future__ import annotations

import time

from whisper_tpu.suts import harness


def _transcribe(state, audio) -> harness.SutResult:
    processor, model, max_new, language, task, num_beams = state

    t0 = time.perf_counter()
    inputs = processor(
        audio, sampling_rate=16_000, return_tensors="pt",
        truncation=False, padding="longest", return_attention_mask=True,
    )
    pre_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    try:
        out = model.generate(
            inputs["input_features"],
            attention_mask=inputs.get("attention_mask"),
            return_timestamps=True, language=language, task=task,
            max_new_tokens=max_new, num_beams=num_beams, do_sample=False,
        )
    except TypeError:
        # Older stacks: fall back to forced_decoder_ids (ref :246-254).
        forced = processor.get_decoder_prompt_ids(language=language,
                                                  task=task)
        out = model.generate(
            inputs["input_features"], forced_decoder_ids=forced,
            max_new_tokens=max_new, num_beams=num_beams, do_sample=False,
        )
    model_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    text = processor.batch_decode(out, skip_special_tokens=True)[0].strip()
    dec_s = time.perf_counter() - t0
    return harness.SutResult(text, pre_s, model_s, dec_s)


def main(argv=None) -> int:
    p = harness.build_parser(__doc__)
    args = p.parse_args(argv)
    try:
        from optimum.onnxruntime import ORTModelForSpeechSeq2Seq
        from transformers import AutoProcessor
    except Exception as e:
        return harness.missing_dependency("optimum[onnxruntime]", e, args)

    src = args.model_dir or args.model_id
    processor = AutoProcessor.from_pretrained(src)
    model = ORTModelForSpeechSeq2Seq.from_pretrained(
        src,
        encoder_file_name="encoder_model.onnx",
        decoder_file_name="decoder_model.onnx",
        decoder_with_past_file_name="decoder_with_past_model.onnx",
        use_cache=True,
    )
    state = (processor, model, args.max_new_tokens, args.language,
             args.task, args.num_beams)
    return harness.run_benchmark(
        args, {"engine": "onnxruntime-python", "num_beams": args.num_beams},
        _transcribe, state,
        sut_name="without_hf_pipeline_py",
    )


if __name__ == "__main__":
    raise SystemExit(main())
