"""Full-pipeline token parity vs torch at REAL whisper-base dimensions.

Real openai/whisper-base weights are unreachable in this environment (zero
network egress, no HF cache on disk — see docs/REAL_WEIGHTS.md), so this is
the strongest available stand-in for the reference's measured-transcription
oracle (ref src/main.rs:1208-1212): the complete chain

    audio -> log-mel -> encoder -> on-device greedy loop -> token ids

at the exact whisper-base architecture (d_model=512, 6+6 layers, 8 heads,
vocab 51865, 1500 encoder positions), random-initialized, token-for-token
against transformers' torch WhisperForConditionalGeneration fed by the HF
WhisperFeatureExtractor. This exercises every production code path (variant
x0) at production scale — not the toy dims of test_model_parity.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from whisper_tpu.models import convert  # noqa: E402
from whisper_tpu.models.registry import dims_from_hf_config  # noqa: E402

SOT, EN, TRANSCRIBE, NOTS, EOT = 50258, 50259, 50359, 50363, 50257
N_NEW = 8


@pytest.fixture(scope="module")
def base():
    cfg = transformers.WhisperConfig(
        vocab_size=51865,
        num_mel_bins=80,
        d_model=512,
        encoder_layers=6,
        encoder_attention_heads=8,
        decoder_layers=6,
        decoder_attention_heads=8,
        encoder_ffn_dim=2048,
        decoder_ffn_dim=2048,
        max_source_positions=1500,
        max_target_positions=448,
    )
    torch.manual_seed(42)
    model = transformers.WhisperForConditionalGeneration(cfg).eval()
    dims = dims_from_hf_config(cfg)
    params = convert.cast_params(
        convert.params_from_hf_state_dict(model.state_dict(), dims),
        jnp.float32,
    )
    return model, dims, params


@pytest.fixture(scope="module")
def audio_30s():
    """Exactly 30.0 s of deterministic structured audio: both mel paths then
    cover the full 3000-frame window with no padding-semantics ambiguity."""
    rng = np.random.default_rng(7)
    t = np.linspace(0.0, 30.0, 30 * 16000, endpoint=False)
    sig = (
        0.30 * np.sin(2 * np.pi * 220.0 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 0.7 * t))
        + 0.20 * np.sin(2 * np.pi * 523.25 * t + 1.0)
        + 0.05 * rng.normal(0.0, 1.0, t.shape)
    )
    return sig.astype(np.float32)


N_ROUNDS = 3  # suppression rounds -> distinct argmax decisions (see below)


@pytest.fixture(scope="module")
def torch_chains(base, audio_30s):
    """Oracle: HF feature extractor mel -> torch encoder -> manual greedy
    loops (ORT/reference semantics: stop at EOT, -inf suppression).

    Random-weight greedy collapses to a one-token attractor, so a single
    chain only probes one argmax decision. Each round therefore suppresses
    every token emitted by earlier rounds, forcing a fresh top-1 decision at
    a different point of the logit ranking — N_ROUNDS independent chains.
    """
    model, _, _ = base
    fe = transformers.WhisperFeatureExtractor()
    feats = fe(audio_30s, sampling_rate=16000, return_tensors="np")[
        "input_features"
    ]
    assert feats.shape == (1, 80, 3000)
    with torch.no_grad():
        enc = model.model.encoder(
            input_features=torch.from_numpy(feats)
        ).last_hidden_state
    from transformers.modeling_outputs import BaseModelOutput

    chains, suppressed = [], set()
    for _ in range(N_ROUNDS):
        seq = torch.tensor([[SOT, EN, TRANSCRIBE, NOTS]], dtype=torch.int64)
        chain = []
        for _ in range(N_NEW):
            with torch.no_grad():
                logits = model(
                    encoder_outputs=BaseModelOutput(last_hidden_state=enc),
                    decoder_input_ids=seq,
                ).logits[0, -1]
            if suppressed:
                logits[list(suppressed)] = float("-inf")
            tok = int(logits.argmax())
            if tok == EOT:
                break
            chain.append(tok)
            seq = torch.cat([seq, torch.tensor([[tok]])], dim=1)
        chains.append(chain)
        suppressed.update(t for t in chain if t != EOT)
    return feats[0], chains


def test_mel_parity_at_30s(audio_30s, torch_chains):
    """Our log-mel vs HF WhisperFeatureExtractor over the full 3000 frames."""
    from whisper_tpu.frontend.golden import log_mel_golden

    want = torch_chains[0]
    got = log_mel_golden(audio_30s)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_prefill_logits_fullscale(base, audio_30s, torch_chains):
    """Full-vocab prefill logits vs torch at whisper-base scale.

    Measured maxdiff is ~2e-6 (fp32, CPU); the 1e-4 bound leaves room for
    backend accumulation-order differences while staying far below the
    typical top-1 margin (~0.06 on this input)."""
    _, dims, params = base
    from whisper_tpu.frontend.mel import log_mel
    from whisper_tpu.models import whisper

    model = base[0]
    toks = np.array([[SOT, EN, TRANSCRIBE, NOTS]], dtype=np.int32)
    feats = torch_chains[0][None]
    with torch.no_grad():
        want = model(
            input_features=torch.from_numpy(feats),
            decoder_input_ids=torch.from_numpy(toks.astype(np.int64)),
        ).logits.numpy()
    mel = np.asarray(log_mel(audio_30s, bucket=3000))[None]
    enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
    logits, _ = whisper.decoder_prefill(
        params, dims, jnp.asarray(toks), enc, max_len=8
    )
    np.testing.assert_allclose(np.asarray(logits), want, atol=1e-4, rtol=0)


def test_fullscale_greedy_token_parity_x0(base, audio_30s, torch_chains):
    """audio -> our mel -> session (variant x0) greedy -> ids == torch ids,
    across N_ROUNDS suppression rounds (distinct argmax decisions each)."""
    from whisper_tpu.frontend.mel import log_mel
    from whisper_tpu.runtime.generate import strip_generated
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.variants.ladder import apply_variant

    _, dims, params = base
    _, want_chains = torch_chains

    cfg, _ = apply_variant(RuntimeCfg(max_batch=1), "x0")
    sess = WhisperSession(params, dims, cfg)
    mel = np.asarray(log_mel(audio_30s, bucket=3000))[None]

    suppressed: set[int] = set()
    for want in want_chains:
        toks = sess.transcribe_chunks(
            mel, prompt=[SOT, EN, TRANSCRIBE, NOTS],
            max_new_tokens=N_NEW, eot_id=EOT,
            suppress_ids=sorted(suppressed),
        )
        got = strip_generated(np.asarray(toks)[0], EOT)
        assert got == want
        suppressed.update(t for t in want if t != EOT)
    # The rounds must have probed more than one decision.
    assert len(suppressed) >= N_ROUNDS


@pytest.mark.slow
def test_fullscale_x5_matches_x4_chain(base, audio_30s):
    """x5 (int8-MXU attention: quantized q + 7-bit probs) vs x4 greedy
    chains at REAL whisper-base dimensions — the quantization noise must
    stay below the argmax margins on a full-scale model, not just the toy
    dims of test_cross_attention.  Kernels run in interpret mode on CPU;
    the TPU-measured counterpart is the identical-transcript A/B recorded
    in docs/DECODE_ROOFLINE.md."""
    import dataclasses

    from whisper_tpu.frontend.mel import log_mel
    from whisper_tpu.runtime.generate import strip_generated
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.variants.ladder import apply_variant

    _, dims, params = base
    mel = np.asarray(log_mel(audio_30s, bucket=3000))[None]

    chains = {}
    for name in ("x4", "x5"):
        cfg, _ = apply_variant(RuntimeCfg(max_batch=1), name)
        # Pallas front end / encoder attention are not under test and are
        # slow in interpret mode at full scale.
        cfg = dataclasses.replace(cfg, fused_frontend=False,
                                  fused_attention=False)
        sess = WhisperSession(params, dims, cfg)
        toks = sess.transcribe_chunks(
            mel, prompt=[SOT, EN, TRANSCRIBE, NOTS],
            max_new_tokens=6, eot_id=EOT,
        )
        chains[name] = strip_generated(np.asarray(toks)[0], EOT)
    assert chains["x5"] == chains["x4"]


@pytest.mark.slow
def test_fullscale_x7_matches_x5_chain(base, audio_30s):
    """x7 (int8 SELF cache, per-row scales) vs x5 greedy chains at REAL
    whisper-base dimensions — self-KV quantization noise must stay below
    the argmax margins at full scale, mirroring the x5-vs-x4 pin above.
    The TPU-measured counterpart is the token-agreement line printed by
    scripts/ab_x7.py."""
    import dataclasses

    from whisper_tpu.frontend.mel import log_mel
    from whisper_tpu.runtime.generate import strip_generated
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.variants.ladder import apply_variant

    _, dims, params = base
    mel = np.asarray(log_mel(audio_30s, bucket=3000))[None]

    chains = {}
    for name in ("x5", "x7"):
        cfg, _ = apply_variant(RuntimeCfg(max_batch=1), name)
        cfg = dataclasses.replace(cfg, fused_frontend=False,
                                  fused_attention=False)
        sess = WhisperSession(params, dims, cfg)
        toks = sess.transcribe_chunks(
            mel, prompt=[SOT, EN, TRANSCRIBE, NOTS],
            max_new_tokens=6, eot_id=EOT,
        )
        chains[name] = strip_generated(np.asarray(toks)[0], EOT)
    assert chains["x7"] == chains["x5"]


@pytest.mark.slow
def test_fullscale_pcm_transfer_chain(base, audio_30s):
    """pcm12/pcm14 wire encodings vs the f32 upload: greedy chains at REAL
    whisper-base dimensions must agree (the token-level quality gate for
    the truncated-PCM uploads, utils/pcmpack.py; measured mel deviation
    hierarchy is pinned in tests/test_frontend.py).  Random weights give
    the TIGHTEST argmax margins, so this is the conservative version of
    the real-weight transcript A/B."""
    from whisper_tpu.frontend.golden import num_frames, reflect_pad
    from whisper_tpu.frontend.mel import log_mel_jax
    from whisper_tpu.runtime.generate import strip_generated
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
    from whisper_tpu.utils.pcmpack import pack_pcm

    import jax.numpy as jnp

    _, dims, params = base
    sess = WhisperSession(
        params, dims,
        RuntimeCfg(dtype="float32", matmul_precision="highest", max_batch=1),
    )
    padded = reflect_pad(audio_30s)
    nf = num_frames(len(audio_30s))

    def chain(enc, transfer="auto"):
        mel = log_mel_jax(jnp.asarray(enc), jnp.int32(nf),
                          n_mels=80, n_frames=3000, transfer=transfer)
        toks = sess.transcribe_chunks(
            np.asarray(mel)[None], prompt=[SOT, EN, TRANSCRIBE, NOTS],
            max_new_tokens=N_NEW, eot_id=EOT,
        )
        return strip_generated(np.asarray(toks)[0], EOT)

    want = chain(padded)
    assert chain(pack_pcm(padded, "pcm14"), "pcm14") == want
    assert chain(pack_pcm(padded, "pcm12"), "pcm12") == want
