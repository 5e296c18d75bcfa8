"""Parameter initialization, HF-checkpoint conversion, and on-disk format.

Replaces the reference's ONNX export side-pipeline
(scripts/export_onnx_whisper.py:10-30): instead of exporting three ONNX
graphs, we convert HF Whisper weights (a torch state dict / safetensors
shards) into the framework's stacked-layer param pytree and store it as a
single safetensors file plus a ``config.json`` sidecar — keeping the
reference's model-directory convention (tokenizer.json /
generation_config.json sit next to the weights, ref src/main.rs:574-657).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.models.registry import WhisperDims
from whisper_tpu.models.whisper import sinusoid_position_embedding

PARAMS_FILE = "params.safetensors"
CONFIG_FILE = "config.json"


# ---------------------------------------------------------------------------
# Random init (used for tests and for weight-free benchmarking)
# ---------------------------------------------------------------------------

def init_params(dims: WhisperDims, seed: int = 0, dtype=jnp.float32) -> Dict:
    """Random-init params with the exact pytree structure of a converted
    checkpoint. Scale is kept small so fp32 greedy decoding is well-behaved."""
    rng = np.random.default_rng(seed)
    d, f = dims.d_model, dims.d_ffn

    def w(*shape, scale=0.02):
        return rng.normal(0.0, scale, size=shape).astype(np.float32)

    def zeros(*shape):
        return np.zeros(shape, dtype=np.float32)

    def ones(*shape):
        return np.ones(shape, dtype=np.float32)

    def attn(le, prefix=""):
        return {
            f"{prefix}q_w": w(le, d, d), f"{prefix}q_b": zeros(le, d),
            f"{prefix}k_w": w(le, d, d),
            f"{prefix}v_w": w(le, d, d), f"{prefix}v_b": zeros(le, d),
            f"{prefix}o_w": w(le, d, d), f"{prefix}o_b": zeros(le, d),
        }

    le, ld = dims.encoder_layers, dims.decoder_layers
    enc_blocks = {
        "attn_ln_s": ones(le, d), "attn_ln_b": zeros(le, d),
        **attn(le),
        "mlp_ln_s": ones(le, d), "mlp_ln_b": zeros(le, d),
        "fc1_w": w(le, d, f), "fc1_b": zeros(le, f),
        "fc2_w": w(le, f, d), "fc2_b": zeros(le, d),
    }
    dec_blocks = {
        "ln_s": ones(ld, d), "ln_b": zeros(ld, d),
        **attn(ld),
        "x_ln_s": ones(ld, d), "x_ln_b": zeros(ld, d),
        "xq_w": w(ld, d, d), "xq_b": zeros(ld, d),
        "xk_w": w(ld, d, d),
        "xv_w": w(ld, d, d), "xv_b": zeros(ld, d),
        "xo_w": w(ld, d, d), "xo_b": zeros(ld, d),
        "mlp_ln_s": ones(ld, d), "mlp_ln_b": zeros(ld, d),
        "fc1_w": w(ld, d, f), "fc1_b": zeros(ld, f),
        "fc2_w": w(ld, f, d), "fc2_b": zeros(ld, d),
    }
    params = {
        "encoder": {
            "conv1_w": w(3, dims.n_mels, d), "conv1_b": zeros(d),
            "conv2_w": w(3, d, d), "conv2_b": zeros(d),
            "pos_embed": sinusoid_position_embedding(
                dims.max_source_positions, d
            ),
            "blocks": enc_blocks,
            "ln_f_s": ones(d), "ln_f_b": zeros(d),
        },
        "decoder": {
            "tok_emb": w(dims.vocab_size, d),
            "pos_embed": w(dims.max_target_positions, d),
            "blocks": dec_blocks,
            "ln_f_s": ones(d), "ln_f_b": zeros(d),
        },
    }
    return cast_params(params, dtype)


def cast_params(params: Dict, dtype) -> Dict:
    """Cast floating-point leaves to `dtype` as jnp arrays.  Int8 QTensor
    leaves keep int8 storage + float32 scales (dequant happens at use)."""
    from whisper_tpu.variants.quant import QTensor

    def cast(x):
        if isinstance(x, QTensor):
            return QTensor(q=jnp.asarray(x.q), s=jnp.asarray(x.s))
        return jnp.asarray(x, dtype=dtype)

    return jax.tree.map(cast, params, is_leaf=lambda x: isinstance(x, QTensor))


# ---------------------------------------------------------------------------
# HF state-dict conversion
# ---------------------------------------------------------------------------

def _np(x) -> np.ndarray:
    """torch tensor / numpy array -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def params_from_hf_state_dict(sd: Dict[str, Any], dims: WhisperDims) -> Dict:
    """Convert a transformers WhisperForConditionalGeneration state dict into
    the framework pytree (stacked layers, [in, out] weight layout)."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    def lin_w(name):  # torch Linear stores [out, in]; we use [in, out]
        return _np(sd[name]).T

    def stack(fmt, n, fn):
        return np.stack([fn(fmt.format(i)) for i in range(n)])

    le, ld = dims.encoder_layers, dims.decoder_layers

    def attn_block(side, n, attr, pfx):
        base = f"{side}.layers.{{}}.{attr}"
        out = {
            f"{pfx}q_w": stack(base + ".q_proj.weight", n, lin_w),
            f"{pfx}q_b": stack(base + ".q_proj.bias", n, lambda k: _np(sd[k])),
            f"{pfx}k_w": stack(base + ".k_proj.weight", n, lin_w),
            f"{pfx}v_w": stack(base + ".v_proj.weight", n, lin_w),
            f"{pfx}v_b": stack(base + ".v_proj.bias", n, lambda k: _np(sd[k])),
            f"{pfx}o_w": stack(base + ".out_proj.weight", n, lin_w),
            f"{pfx}o_b": stack(base + ".out_proj.bias", n, lambda k: _np(sd[k])),
        }
        return out

    def vec(fmt, n):
        return stack(fmt, n, lambda k: _np(sd[k]))

    enc_blocks = {
        "attn_ln_s": vec("encoder.layers.{}.self_attn_layer_norm.weight", le),
        "attn_ln_b": vec("encoder.layers.{}.self_attn_layer_norm.bias", le),
        **attn_block("encoder", le, "self_attn", ""),
        "mlp_ln_s": vec("encoder.layers.{}.final_layer_norm.weight", le),
        "mlp_ln_b": vec("encoder.layers.{}.final_layer_norm.bias", le),
        "fc1_w": stack("encoder.layers.{}.fc1.weight", le, lin_w),
        "fc1_b": vec("encoder.layers.{}.fc1.bias", le),
        "fc2_w": stack("encoder.layers.{}.fc2.weight", le, lin_w),
        "fc2_b": vec("encoder.layers.{}.fc2.bias", le),
    }
    dec_blocks = {
        "ln_s": vec("decoder.layers.{}.self_attn_layer_norm.weight", ld),
        "ln_b": vec("decoder.layers.{}.self_attn_layer_norm.bias", ld),
        **attn_block("decoder", ld, "self_attn", ""),
        "x_ln_s": vec("decoder.layers.{}.encoder_attn_layer_norm.weight", ld),
        "x_ln_b": vec("decoder.layers.{}.encoder_attn_layer_norm.bias", ld),
        **{
            k.replace("q_", "xq_").replace("k_", "xk_")
             .replace("v_", "xv_").replace("o_", "xo_"): v
            for k, v in attn_block("decoder", ld, "encoder_attn", "").items()
        },
        "mlp_ln_s": vec("decoder.layers.{}.final_layer_norm.weight", ld),
        "mlp_ln_b": vec("decoder.layers.{}.final_layer_norm.bias", ld),
        "fc1_w": stack("decoder.layers.{}.fc1.weight", ld, lin_w),
        "fc1_b": vec("decoder.layers.{}.fc1.bias", ld),
        "fc2_w": stack("decoder.layers.{}.fc2.weight", ld, lin_w),
        "fc2_b": vec("decoder.layers.{}.fc2.bias", ld),
    }
    return {
        "encoder": {
            # torch Conv1d stores [out, in, width]; we use [width, in, out].
            "conv1_w": _np(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
            "conv1_b": _np(sd["encoder.conv1.bias"]),
            "conv2_w": _np(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
            "conv2_b": _np(sd["encoder.conv2.bias"]),
            "pos_embed": _np(sd["encoder.embed_positions.weight"]),
            "blocks": enc_blocks,
            "ln_f_s": _np(sd["encoder.layer_norm.weight"]),
            "ln_f_b": _np(sd["encoder.layer_norm.bias"]),
        },
        "decoder": {
            "tok_emb": _np(sd["decoder.embed_tokens.weight"]),
            "pos_embed": _np(sd["decoder.embed_positions.weight"]),
            "blocks": dec_blocks,
            "ln_f_s": _np(sd["decoder.layer_norm.weight"]),
            "ln_f_b": _np(sd["decoder.layer_norm.bias"]),
        },
    }


# ---------------------------------------------------------------------------
# On-disk format: params.safetensors + config.json sidecar
# ---------------------------------------------------------------------------

def _flatten(params: Dict, prefix="") -> Dict[str, np.ndarray]:
    from whisper_tpu.variants.quant import QTensor

    out = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, QTensor):
            out[key + ".q8"] = np.asarray(v.q)
            out[key + ".scale"] = np.asarray(v.s)
        elif isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    from whisper_tpu.variants.quant import QTensor

    out: Dict = {}
    pending_q: Dict[str, Dict[str, np.ndarray]] = {}
    for key, v in flat.items():
        if key.endswith(".q8") or key.endswith(".scale"):
            base, _, kind = key.rpartition(".")
            pending_q.setdefault(base, {})[kind] = v
            continue
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    for base, parts_q in pending_q.items():
        parts = base.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = QTensor(q=parts_q["q8"], s=parts_q["scale"])
    return out


def save_params(params: Dict, dims: WhisperDims, model_dir: str,
                extra_config: Dict | None = None) -> None:
    from safetensors.numpy import save_file

    os.makedirs(model_dir, exist_ok=True)
    # ascontiguousarray is load-bearing: np.stack over transposed views
    # (lin_w in params_from_hf_state_dict) returns a NON-contiguous array
    # on numpy 2.x, and safetensors 0.8.0 silently serializes the raw
    # buffer of a non-contiguous array — load(save(x)) != x, same shape,
    # permuted values (caught by tests/test_real_weights_path.py).
    flat = {k: np.ascontiguousarray(v) for k, v in _flatten(params).items()}
    save_file(flat, os.path.join(model_dir, PARAMS_FILE))
    cfg = {"whisper_tpu_dims": dims.to_dict()}
    if extra_config:
        cfg.update(extra_config)
    with open(os.path.join(model_dir, CONFIG_FILE), "w") as f:
        json.dump(cfg, f, indent=2)


def load_params(model_dir: str, dtype=None) -> tuple[Dict, WhisperDims]:
    from safetensors.numpy import load_file

    flat = load_file(os.path.join(model_dir, PARAMS_FILE))
    with open(os.path.join(model_dir, CONFIG_FILE)) as f:
        cfg = json.load(f)
    dims = WhisperDims(**cfg["whisper_tpu_dims"])
    params = _unflatten(dict(flat))
    if dtype is not None:
        params = cast_params(params, dtype)
    else:
        params = jax.tree.map(jnp.asarray, params)
    return params, dims


def save_params_orbax(params: Dict, dims: WhisperDims, model_dir: str) -> None:
    """Alternative on-disk format: an orbax-checkpoint directory (ecosystem
    interop with JAX training stacks); config.json sidecar as usual."""
    import orbax.checkpoint as ocp

    os.makedirs(model_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(model_dir, "orbax"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, params), force=True)
    with open(os.path.join(model_dir, CONFIG_FILE), "w") as f:
        json.dump({"whisper_tpu_dims": dims.to_dict(),
                   "format": "orbax"}, f, indent=2)


def load_params_orbax(model_dir: str, dtype=None,
                      shardings=None) -> tuple[Dict, WhisperDims]:
    """Restore an orbax checkpoint; with `shardings` (a NamedSharding
    pytree, e.g. parallel.mesh.param_shardings over a pod mesh) each leaf
    is restored DIRECTLY onto its devices — whisper-large params never
    materialize unsharded on one host (ROADMAP §11, pod loading)."""
    import orbax.checkpoint as ocp

    with open(os.path.join(model_dir, CONFIG_FILE)) as f:
        cfg = json.load(f)
    dims = WhisperDims(**cfg["whisper_tpu_dims"])
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(os.path.join(model_dir, "orbax"))
    if shardings is not None:
        meta = ckptr.metadata(path)
        tree = getattr(meta, "tree", None)
        if tree is None:
            item = getattr(meta, "item_metadata", meta)
            tree = getattr(item, "tree", item)

        def as_restore_arg(sharding, m):
            return ocp.ArrayRestoreArgs(
                sharding=sharding,
                global_shape=m.shape,
                dtype=m.dtype,
            )

        restore_args = jax.tree.map(as_restore_arg, shardings, tree)
        params = ckptr.restore(
            path, restore_args=restore_args
        )
    else:
        params = ckptr.restore(path)
    if dtype is not None:
        params = cast_params(params, dtype)
    return params, dims


def convert_hf_model_dir(hf_dir: str, out_dir: str, model_id: str | None = None) -> None:
    """Convert an HF checkpoint directory (model.safetensors +
    config.json) into a framework model dir; copies tokenizer.json and
    generation_config.json sidecars when present, mirroring the reference's
    artifact-dir convention (quantize_onnx_int8.py:28-31)."""
    import shutil

    from safetensors.numpy import load_file as st_load

    with open(os.path.join(hf_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    from whisper_tpu.models.registry import dims_from_hf_config

    dims = dims_from_hf_config(hf_cfg)
    sd = {}
    for name in sorted(os.listdir(hf_dir)):
        if name.endswith(".safetensors"):
            sd.update(st_load(os.path.join(hf_dir, name)))
    if not sd:
        raise FileNotFoundError(f"No .safetensors weights found in {hf_dir}")
    params = params_from_hf_state_dict(sd, dims)
    save_params(params, dims, out_dir,
                extra_config={"source": hf_dir, "model_id": model_id})
    for sidecar in ("tokenizer.json", "generation_config.json"):
        src = os.path.join(hf_dir, sidecar)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(out_dir, sidecar))
