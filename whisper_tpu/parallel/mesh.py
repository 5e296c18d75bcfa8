"""Device mesh and sharding rules — the framework's scale-out layer.

The reference is single-process CPU; its only intra-request parallelism is a
rayon thread pool over 30 s chunks (ref src/main.rs:884-925, SURVEY.md §2.4).
The TPU equivalents, all expressed through jax.sharding + GSPMD (XLA inserts
the collectives; they ride ICI inside a slice):

- data parallelism: the chunk/file batch dimension sharded over the 'data'
  mesh axis — the direct analog of the rayon pool;
- tensor parallelism: attention heads and MLP hidden dims of large Whisper
  variants sharded over the 'model' axis (BASELINE.json config 4);
- multi-host: jax.distributed.initialize over DCN (init_distributed), with
  the same mesh spanning all processes' devices.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Mesh with axes ('data', 'model') over the first n_devices devices.

    model_parallel must divide n_devices; the rest becomes the data axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide n_devices={n_devices}"
        )
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard the leading batch dim over 'data' (chunk/file batches)."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


# Tensor-parallel rules, keyed by stacked-param name ([L, ...] layouts from
# whisper_tpu.models.convert). Column-parallel projections (q/k/v, fc1) shard
# the output dim; row-parallel (o, fc2) shard the input dim so XLA inserts a
# psum on their outputs (Megatron-style, via GSPMD).
_TP_RULES: Dict[str, P] = {
    "q_w": P(None, None, MODEL_AXIS), "q_b": P(None, MODEL_AXIS),
    "k_w": P(None, None, MODEL_AXIS),
    "v_w": P(None, None, MODEL_AXIS), "v_b": P(None, MODEL_AXIS),
    "o_w": P(None, MODEL_AXIS, None), "o_b": P(None),
    "xq_w": P(None, None, MODEL_AXIS), "xq_b": P(None, MODEL_AXIS),
    "xk_w": P(None, None, MODEL_AXIS),
    "xv_w": P(None, None, MODEL_AXIS), "xv_b": P(None, MODEL_AXIS),
    "xo_w": P(None, MODEL_AXIS, None), "xo_b": P(None),
    "fc1_w": P(None, None, MODEL_AXIS), "fc1_b": P(None, MODEL_AXIS),
    "fc2_w": P(None, MODEL_AXIS, None), "fc2_b": P(None),
}


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a param pytree: block weights follow the TP
    rules over 'model'; everything else (convs, embeddings, norms) is
    replicated.

    Shape-aware: a rule axis is dropped on any dim the leaf cannot
    actually shard (size 1 or not divisible by the axis).  In particular
    int8 QTensor leaves carry a per-output-channel scale of shape
    [L, 1, out]; the row-parallel rules (o_w/xo_w/fc2_w: shard dim 1)
    would otherwise be prefix-applied to that size-1 dim and crash
    device_put (--variant x4/x5/x7/int8 + --tensor-parallel)."""
    axis_size = mesh.shape[MODEL_AXIS]

    def spec_for(path: str) -> P:
        leaf = path.rsplit("/", 1)[-1]
        if "/blocks/" in path and leaf in _TP_RULES:
            return _TP_RULES[leaf]
        return P()

    def fit(spec: P, shape) -> P:
        names = list(spec) + [None] * (len(shape) - len(spec))
        fitted = [
            (n if n is None or (shape[d] > 1 and shape[d] % axis_size == 0)
             else None)
            for d, n in enumerate(names[: len(shape)])
        ]
        while fitted and fitted[-1] is None:   # P(None,..) == P() semantics
            fitted.pop()
        return P(*fitted)

    def walk(node, prefix=""):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}/{k}") for k, v in node.items()}
        spec = spec_for(prefix)
        if hasattr(node, "q") and hasattr(node, "s"):   # QTensor
            return type(node)(
                q=NamedSharding(mesh, fit(spec, node.q.shape)),
                s=NamedSharding(mesh, fit(spec, node.s.shape)),
            )
        shape = getattr(node, "shape", ())
        return NamedSharding(mesh, fit(spec, shape))

    return walk(params)


def init_distributed(coordinator: str, num_processes: int = 0,
                     process_id: int = -1) -> None:
    """Multi-host init over DCN (no reference counterpart — SURVEY.md §5.8).

    The CLI's sentinel defaults (0 / -1 = "not given") map to None so
    jax.distributed.initialize auto-detects from the TPU environment;
    forwarding them verbatim is invalid and would fail any launch that
    passed only --dcn-coordinator."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes if num_processes > 0 else None,
        process_id=process_id if process_id >= 0 else None,
    )
