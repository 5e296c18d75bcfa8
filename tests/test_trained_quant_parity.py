"""int8 transcript preservation on a TRAINED checkpoint (VERDICT r3 weak
#3): the random-weight parity matrix can only argue that x4+ divergences
are tie-flips (near-zero logit margins that real checkpoints don't have).
This test removes the argument: it TRAINS a tiny Whisper on CPU until its
greedy chain has decisive margins, then requires the int8-MatMul-weight
variant (the reference's quantization scope, quantize_onnx_int8.py:37-42)
and the bf16 variant to reproduce the fp32 transcript EXACTLY — no
tie-flip tolerance.

Kernel-variant chain equality (x5 == x4) is pinned separately at real
whisper-base dims in tests/test_fullscale_parity.py; this file isolates
the QUANTIZATION quality claim from kernel numerics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from whisper_tpu.models import convert  # noqa: E402
from whisper_tpu.models.registry import dims_from_hf_config  # noqa: E402

pytestmark = pytest.mark.slow

TARGET = [10, 20, 30, 40, 50, 60, 2]  # ends at eos=2
PROMPT = [3]                          # decoder_start
EOS = 2


@pytest.fixture(scope="module")
def trained():
    """Train a tiny Whisper to emit TARGET for one fixed mel, to decisive
    logit margins (>2.0 at every greedy step)."""
    cfg = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=48,
        pad_token_id=0, bos_token_id=1, eos_token_id=EOS,
        decoder_start_token_id=PROMPT[0],
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(cfg)
    rng = np.random.default_rng(0)
    mel = rng.normal(0.0, 0.8, (1, 80, 3000)).astype(np.float32)
    mel_t = torch.from_numpy(mel)
    dec_in = torch.tensor([PROMPT + TARGET[:-1]], dtype=torch.int64)
    labels = torch.tensor([TARGET], dtype=torch.int64)

    opt = torch.optim.Adam(model.parameters(), lr=3e-3)
    lossfn = torch.nn.CrossEntropyLoss()
    model.train()
    for step in range(300):
        opt.zero_grad()
        logits = model(input_features=mel_t, decoder_input_ids=dec_in).logits
        loss = lossfn(logits[0], labels[0])
        loss.backward()
        opt.step()
        if float(loss) < 5e-3:
            break
    model.eval()

    # Greedy margins must be decisive, or the test degenerates back into
    # the tie-flip regime it exists to escape.
    with torch.no_grad():
        logits = model(input_features=mel_t, decoder_input_ids=dec_in).logits[0]
    margins = []
    for i, want in enumerate(TARGET):
        row = logits[i]
        top2 = torch.topk(row, 2)
        assert int(top2.indices[0]) == want, (
            f"training failed to fit step {i}: {int(top2.indices[0])} != {want}")
        margins.append(float(top2.values[0] - top2.values[1]))
    assert min(margins) > 2.0, f"margins not decisive: {margins}"

    dims = dims_from_hf_config(cfg)
    params = convert.params_from_hf_state_dict(model.state_dict(), dims)
    return dims, params, mel[0]


def _chain(dims, params, mel, runtime_cfg):
    from whisper_tpu.runtime.session import WhisperSession

    sess = WhisperSession(params, dims, runtime_cfg)
    toks = sess.transcribe_chunks(
        mel[None], prompt=PROMPT, max_new_tokens=12, eot_id=EOS)
    return list(np.asarray(toks)[0])


def test_int8_and_bf16_preserve_trained_transcript(trained):
    from whisper_tpu.runtime.session import RuntimeCfg

    dims, params, mel = trained
    want = _chain(dims, params, mel, RuntimeCfg(dtype="float32", max_batch=1))
    # Sanity: fp32 greedy reproduces the trained sequence then pads EOT.
    n = len(TARGET) - 1
    assert want[:n] == TARGET[:-1]
    assert all(t == EOS for t in want[n:])

    got_int8 = _chain(dims, params, mel,
                      RuntimeCfg(dtype="float32", max_batch=1,
                                 int8_weights=True))
    assert got_int8 == want, "int8 MatMul weights changed a decisive chain"

    got_bf16 = _chain(dims, params, mel,
                      RuntimeCfg(dtype="bfloat16", max_batch=1))
    assert got_bf16 == want, "bf16 changed a decisive chain"
