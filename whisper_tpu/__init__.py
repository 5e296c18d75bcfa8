"""whisper_tpu — a TPU-native Whisper inference framework.

Built from scratch in JAX/XLA/Pallas (with C++ host components for audio
decode) to provide the capabilities of the CPU/ONNX-Runtime benchmark suite
KrArunT/whisper-rust-ort with a TPU-first architecture:

- audio decode -> 16 kHz mono resample        (whisper_tpu.audio;   ref src/main.rs:207-316)
- fused log-mel front end                      (whisper_tpu.frontend + ops.pallas_mel; ref src/main.rs:322-509)
- JAX Whisper encoder/decoder                  (whisper_tpu.models;  ref src/main.rs:698-707 ONNX graphs)
- on-device greedy loop w/ static KV cache     (whisper_tpu.runtime; ref src/main.rs:709-829)
- 30s chunked long-form + stitching            (whisper_tpu.pipeline; ref src/main.rs:659-696, 834-1008)
- detokenizer + special-token map              (whisper_tpu.tokenizer; ref src/main.rs:518-657)
- benchmark harness w/ reference-compatible    (whisper_tpu.bench;   ref src/main.rs:23-86, 1021-1268)
  CLI flags and output schemas
- multi-chip sharding (DP over chunk batch,    (whisper_tpu.parallel; new — ref has none, SURVEY.md §2.4)
  TP for whisper-large)
"""

__version__ = "0.1.0"

# Subprocess platform pin.  The environment's TPU plugin re-exports
# JAX_PLATFORMS=axon during `import jax`, so a child process cannot select
# the CPU backend through JAX_PLATFORMS alone (it hangs connecting to the
# tunnel when the device link is down).  jax.config.update AFTER import is
# authoritative (same trick as tests/conftest.py) — honor an explicit
# WHISPER_TPU_PLATFORM env so CLI subprocesses (bench, serve, scripts) can
# run TPU-free:  WHISPER_TPU_PLATFORM=cpu python -m whisper_tpu.bench ...
import os as _os

_plat = _os.environ.get("WHISPER_TPU_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)
del _os, _plat
