"""HBM resident-footprint estimator (utils/hbm.py).

Pins the estimator against the REAL allocations it prices: param_count vs
the init_params pytree, kv_cache_bytes vs the KVCache arrays
decoder_prefill allocates, and the check_fit gate against the measured
2026-08-19 OOM (whisper-large-v3 bf16 speculative at B=16 needed 17.52 GB
of 15.75 GB; B=8 fits).  The reference has no counterpart — its ORT
sessions size themselves lazily on CPU (/root/reference/src/main.rs:523).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from whisper_tpu.models import convert, whisper
from whisper_tpu.models.registry import get_dims
from whisper_tpu.utils import hbm


@pytest.mark.parametrize("model_id", ["test/whisper-nano",
                                      "openai/whisper-base"])
def test_param_count_matches_real_pytree(model_id):
    dims = get_dims(model_id)
    params = convert.init_params(dims, seed=0)
    real = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert hbm.param_count(dims) == real


def test_kv_cache_bytes_matches_init_cache():
    dims = get_dims("test/whisper-nano")
    batch, max_len, t_enc = 3, 24, dims.max_source_positions
    cache = whisper.init_cache(dims, batch, max_len, t_enc, np.float32)
    real = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in [cache.self_k, cache.self_v, cache.cross_k, cache.cross_v]
    )
    assert hbm.kv_cache_bytes(dims, batch, max_len, kv_bytes=4) == real


def test_int8_cross_halves_nothing_but_cross():
    dims = get_dims("openai/whisper-base")
    full = hbm.kv_cache_bytes(dims, 4, 32)
    q = hbm.kv_cache_bytes(dims, 4, 32, int8_cross=True)
    # cross shrinks 2 bytes -> 1 (+ tiny scales); self unchanged
    l, h, dh = dims.decoder_layers, dims.decoder_heads, dims.head_dim
    cross_el = 2 * l * 4 * h * dims.max_source_positions * dh
    assert q == full - cross_el + 2 * l * 4 * h * 4


def test_check_fit_flags_the_measured_oom_and_passes_b8():
    """The exact config that burned a ~27-min doomed remote compile:
    large-v3 bf16 speculative, B=16, self-drafter (two full caches)."""
    dims = get_dims("openai/whisper-large-v3")
    budget = int(15.75 * (1 << 30))

    def fp(batch):
        return hbm.decode_footprint(
            dims, batch, 36, draft_dims=dims, shared_draft_params=True,
            cache_copies=2.0,
        )

    assert hbm.check_fit(fp(16), budget, label="spec[self]") is not None
    assert "spec[self]" in hbm.check_fit(fp(16), budget, label="spec[self]")
    assert hbm.check_fit(fp(8), budget) is None


def test_budget_env_override(monkeypatch):
    monkeypatch.setenv("WHISPER_TPU_HBM_GB", "15.75")
    assert hbm.device_hbm_budget() == int(15.75 * (1 << 30))
    monkeypatch.setenv("WHISPER_TPU_HBM_GB", "bogus")
    assert hbm.device_hbm_budget() is None


def test_unknown_budget_never_warns():
    fp = {"params": 1 << 40, "total": 1 << 40}
    assert hbm.check_fit(fp, 0) is None


def test_set_draft_model_warns_on_tiny_budget(monkeypatch):
    """Attach-time sizing: a draft config that cannot fit the (env-
    declared) HBM budget raises a ResourceWarning at set_draft_model, not
    a RESOURCE_EXHAUSTED after a multi-minute remote compile."""
    from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

    dims = get_dims("test/whisper-nano")
    params = convert.init_params(dims, seed=0)
    sess = WhisperSession(params, dims,
                          RuntimeCfg(dtype="float32", max_batch=2))
    monkeypatch.setenv("WHISPER_TPU_HBM_GB", "0.001")
    with pytest.warns(ResourceWarning, match="speculative decode"):
        sess.set_draft_model(convert.init_params(dims, seed=1), dims)
    # A sane budget stays silent.
    monkeypatch.setenv("WHISPER_TPU_HBM_GB", "15.75")
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error", ResourceWarning)
        sess.set_draft_model(convert.init_params(dims, seed=1), dims)
