"""Bucket pre-warm tests: all compile shapes for a file set are built during
warmup so no XLA compile lands in the measured loop."""

import os

import numpy as np

from whisper_tpu.models.convert import init_params
from whisper_tpu.models.registry import get_dims
from whisper_tpu.pipeline.warmup import _batch_buckets, _shape_key, warm_buckets
from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession


def test_batch_buckets_with_remainder():
    # 20 chunks, cap 16 -> one full 16 bucket + one 4 bucket.
    assert _batch_buckets(20, 16) == frozenset({16, 4})
    assert _batch_buckets(12, 16) == frozenset({16})
    assert _batch_buckets(1, 16) == frozenset({1})
    assert _batch_buckets(3, 2) == frozenset({2, 1})


def test_shape_key_distinguishes_mel_buckets():
    k30 = _shape_key(30.0, 30.0, 5.0, 16)
    k31 = _shape_key(31.0, 30.0, 5.0, 16)
    assert k30 != k31  # 31 s crosses into the next mel bucket + 2 chunks


def test_warm_buckets_compiles_all_shapes():
    dims = get_dims("test/whisper-nano")
    sess = WhisperSession(
        init_params(dims), dims,
        RuntimeCfg(dtype="float32", max_batch=2),
    )
    # 70 s (3 chunks -> buckets {2,1}) and 3 s (1 chunk -> {1}); plus a
    # duplicate that must be deduped.
    n = warm_buckets(
        sess, [70.0, 3.0, 70.0],
        language="en", task="transcribe", max_new_tokens=2,
        chunk_length_s=30.0, overlap_s=5.0,
    )
    assert n == 2
    mel_keys = [k for k in sess._fns if k[0] == "mel"]
    batches = {k[2] for k in mel_keys}
    assert batches == {1, 2}

    # A real file with those durations now hits only compiled programs.
    from whisper_tpu.pipeline.longform import transcribe_longform

    audio = np.zeros(70 * 16000, dtype=np.float32)
    before = len(sess._fns)
    transcribe_longform(sess, audio, "en", "transcribe", 2)
    assert len(sess._fns) == before  # no new compile


class TestCompilationCache:
    """Persistent XLA executable cache (utils/compilecache.py): fresh
    processes must not repay the 1-5 min remote compiles."""

    def test_enable_sets_config_and_creates_dir(self, tmp_path, monkeypatch):
        import jax

        from whisper_tpu.utils.compilecache import enable_compilation_cache

        d = str(tmp_path / "xla_cache")
        monkeypatch.delenv("WHISPER_TPU_CACHE_DIR", raising=False)
        assert enable_compilation_cache(d) == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

    def test_env_zero_disables(self, monkeypatch):
        from whisper_tpu.utils.compilecache import enable_compilation_cache

        monkeypatch.setenv("WHISPER_TPU_CACHE_DIR", "0")
        assert enable_compilation_cache() is None

    def test_cache_populates_and_is_reused(self, tmp_path):
        """Subprocess-isolated: JAX initializes the persistent cache once
        per process, so an in-process dir change after another test has
        compiled would be silently ignored."""
        import subprocess
        import sys

        d = str(tmp_path / "xla_cache2")
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "from whisper_tpu.utils.compilecache import"
            " enable_compilation_cache\n"
            f"enable_compilation_cache({d!r})\n"
            "jax.config.update("
            "'jax_persistent_cache_min_compile_time_secs', 0.0)\n"
            "jax.config.update("
            "'jax_persistent_cache_min_entry_size_bytes', 0)\n"
            "import jax.numpy as jnp\n"
            "f = jax.jit(lambda x: (x @ x).sum() * 3.0)\n"
            "f(jnp.ones((128, 128))).block_until_ready()\n"
        )
        subprocess.run([sys.executable, "-c", code], check=True,
                       timeout=300, env={**os.environ,
                                         "JAX_PLATFORMS": "cpu"})
        assert any("cache" in n for n in os.listdir(d))
