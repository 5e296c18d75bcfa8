"""HF transformers SUT — the reference's `benchmark_with_hf_pipeline.py`
counterpart, runnable from this repo.

Two modes:
- full assets available (a model dir/id transformers can load end-to-end):
  uses `pipeline("automatic-speech-recognition", chunk_length_s=30)` exactly
  like the reference (ref benchmark_with_hf_pipeline.py:97-105);
- --allow-random-init (this environment: no weights, no tokenizer vocab):
  builds WhisperForConditionalGeneration from the registry dims with random
  weights + the stock WhisperFeatureExtractor, and greedy-generates over the
  same 30 s chunk grid; transcripts degrade to `[TOKENS:...]` but every
  timing row is a real measurement of the torch CPU engine.

Either way the output schemas are the reference's, so the rows land in the
same summary_table.md as the TPU SUT rows.

Usage: python -m whisper_tpu.suts.hf_pipeline --audio-dir DIR ...
"""

from __future__ import annotations

import time

from whisper_tpu.suts import harness

CHUNK_SAMPLES = 30 * 16_000
OVERLAP_SAMPLES = 5 * 16_000
SOT, EN, TRANSCRIBE, NOTS, EOT = 50258, 50259, 50359, 50363, 50257


def _build_random_init(model_id: str):
    import torch
    import transformers

    from whisper_tpu.models.registry import get_dims

    dims = get_dims(model_id)
    cfg = transformers.WhisperConfig(
        vocab_size=dims.vocab_size, num_mel_bins=dims.n_mels,
        d_model=dims.d_model, encoder_layers=dims.encoder_layers,
        encoder_attention_heads=dims.encoder_heads,
        decoder_layers=dims.decoder_layers,
        decoder_attention_heads=dims.decoder_heads,
        encoder_ffn_dim=dims.d_ffn, decoder_ffn_dim=dims.d_ffn,
        max_source_positions=dims.max_source_positions,
        max_target_positions=dims.max_target_positions,
        # Keep the special ids inside small test vocabs (real whisper dims
        # keep the stock 50k-range defaults).
        pad_token_id=min(50256, dims.vocab_size - 1),
        bos_token_id=min(50257, dims.vocab_size - 1),
        eos_token_id=min(50257, dims.vocab_size - 1),
        decoder_start_token_id=min(50258, dims.vocab_size - 1),
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(cfg).eval()
    fe = transformers.WhisperFeatureExtractor(feature_size=dims.n_mels)
    return model, fe


def _transcribe_random_init(state, audio) -> harness.SutResult:
    import torch

    model, fe, max_new, num_beams = state
    vocab = model.config.vocab_size
    prompt = [min(t, vocab - 1) for t in (SOT, EN, TRANSCRIBE, NOTS)]
    eot = min(EOT, vocab - 1)
    t0 = time.perf_counter()
    starts = harness.chunk_starts(len(audio), CHUNK_SAMPLES, OVERLAP_SAMPLES)
    feats = fe(
        [audio[s: s + CHUNK_SAMPLES] for s in starts],
        sampling_rate=16_000, return_tensors="pt",
    )["input_features"]
    pre_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    with torch.no_grad():
        out = model.generate(
            feats,
            decoder_input_ids=torch.tensor([prompt] * feats.shape[0]),
            max_new_tokens=max_new, do_sample=False, num_beams=num_beams,
        )
    model_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    toks = []
    for row in out.tolist():
        toks += [t for t in row[4:] if t != eot]
    text = f"[TOKENS:{' '.join(str(t) for t in toks[:200])}]" if toks else ""
    dec_s = time.perf_counter() - t0
    return harness.SutResult(text, pre_s, model_s, dec_s)


def _transcribe_pipeline(state, audio) -> harness.SutResult:
    pipe, generate_kwargs = state
    t0 = time.perf_counter()
    # Coarse timing, like the reference (benchmark_with_hf_pipeline.py:134).
    result = pipe({"array": audio, "sampling_rate": 16_000},
                  generate_kwargs=generate_kwargs or None)
    model_s = time.perf_counter() - t0
    return harness.SutResult(result["text"].strip(), 0.0, model_s, 0.0)


def main(argv=None) -> int:
    p = harness.build_parser(__doc__)
    args = p.parse_args(argv)
    try:
        import torch  # noqa: F401
        import transformers
    except Exception as e:  # pragma: no cover - present in this image
        return harness.missing_dependency("torch/transformers", e, args)

    config_used = {"engine": "transformers-torch-cpu",
                   "threads": __import__("torch").get_num_threads(),
                   "num_beams": args.num_beams}
    if args.allow_random_init:
        model, fe = _build_random_init(args.model_id)
        state = (model, fe, args.max_new_tokens, args.num_beams)
        return harness.run_benchmark(
            args, config_used, _transcribe_random_init, state,
            sut_name="hf_pipeline(random-init)",
        )
    src = args.model_dir or args.model_id
    pipe = transformers.pipeline(
        "automatic-speech-recognition", model=src,
        chunk_length_s=30, stride_length_s=(1, 1),
    )
    return harness.run_benchmark(
        args, config_used, _transcribe_pipeline,
        (pipe, {"num_beams": args.num_beams} if args.num_beams > 1 else {}),
        sut_name="hf_pipeline",
    )


if __name__ == "__main__":
    raise SystemExit(main())
