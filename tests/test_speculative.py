"""Speculative decoding tests.

The defining property is LOSSLESSNESS: for any drafter — adversarially
different, or identical — the committed greedy sequence must equal plain
greedy decoding of the main model. A perfect drafter must also cut the
number of full-model rounds to ~1/draft_k."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.models import whisper
from whisper_tpu.models.convert import init_params
from whisper_tpu.models.registry import get_dims
from whisper_tpu.runtime.generate import build_suppress_mask, greedy_generate
from whisper_tpu.runtime.speculative import speculative_generate


@pytest.fixture(scope="module")
def setup():
    dims = get_dims("test/whisper-nano")
    params = init_params(dims, seed=0)       # verifier
    draft = init_params(dims, seed=99)       # adversarially different drafter
    rng = np.random.default_rng(1)
    mel = rng.normal(0, 1, (1, dims.n_mels, 3000)).astype(np.float32)
    enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
    enc_draft = whisper.encoder_apply(draft, dims, jnp.asarray(mel))
    return dims, params, draft, enc, enc_draft


def _greedy(params, dims, enc, prompt, max_new, suppress=()):
    mask = jnp.asarray(build_suppress_mask(dims.vocab_size, list(suppress)))
    return np.asarray(greedy_generate(
        params, dims, enc, jnp.asarray(prompt, dtype=jnp.int32),
        mask, mask, max_new_tokens=max_new, eot_id=2,
    ))[0]


def _spec(params, dims, draft, enc, enc_d, prompt, max_new, k, suppress=()):
    mask = jnp.asarray(build_suppress_mask(dims.vocab_size, list(suppress)))
    toks, rounds, n = speculative_generate(
        params, dims, draft, dims, enc, enc_d,
        jnp.asarray(prompt, dtype=jnp.int32), mask, mask,
        max_new_tokens=max_new, eot_id=2, draft_k=k,
    )
    return np.asarray(toks)[0], int(rounds), int(np.asarray(n)[0])


class TestLossless:
    @pytest.mark.parametrize(
        "k", [2, pytest.param(4, marks=pytest.mark.slow)])
    def test_adversarial_drafter_matches_greedy(self, setup, k):
        dims, params, draft, enc, enc_d = setup
        want = _greedy(params, dims, enc, [3, 5], 12)
        got, rounds, n = _spec(params, dims, draft, enc, enc_d, [3, 5], 12, k)
        np.testing.assert_array_equal(got, want)
        assert rounds >= 1

    @pytest.mark.slow
    def test_with_suppression(self, setup):
        dims, params, draft, enc, enc_d = setup
        sup = [7, 8, 9]
        want = _greedy(params, dims, enc, [3], 10, suppress=sup)
        got, _, _ = _spec(params, dims, draft, enc, enc_d, [3], 10, 3,
                          suppress=sup)
        np.testing.assert_array_equal(got, want)
        assert not (set(got.tolist()) - {2}) & set(sup)


class TestBatched:
    """Speculation at B>1 with per-row cache positions (VERDICT r1 #5):
    rows accept different draft lengths and finish at different steps, yet
    every row must equal its own plain-greedy decode."""

    @pytest.mark.parametrize(
        "k", [2, pytest.param(4, marks=pytest.mark.slow)])
    def test_batched_adversarial_matches_rowwise_greedy(self, setup, k):
        dims, params, draft, _, _ = setup
        rng = np.random.default_rng(7)
        mel = rng.normal(0, 1, (4, dims.n_mels, 3000)).astype(np.float32)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        enc_d = whisper.encoder_apply(draft, dims, jnp.asarray(mel))

        mask = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        prompt = jnp.asarray([3, 5], dtype=jnp.int32)
        want = np.asarray(greedy_generate(
            params, dims, enc, prompt, mask, mask,
            max_new_tokens=12, eot_id=2,
        ))
        got, rounds, n = speculative_generate(
            params, dims, draft, dims, enc, enc_d, prompt, mask, mask,
            max_new_tokens=12, eot_id=2, draft_k=k,
        )
        np.testing.assert_array_equal(np.asarray(got), want)
        assert np.asarray(n).shape == (4,)

    def test_batched_rows_finish_at_different_lengths(self, setup):
        """Force one row to hit EOT early (suppress everything except EOT
        for no row — instead craft rows whose greedy chains genuinely
        differ in length by checking the greedy reference first)."""
        dims, params, draft, _, _ = setup
        rng = np.random.default_rng(11)
        mel = rng.normal(0, 1, (8, dims.n_mels, 3000)).astype(np.float32)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        enc_d = whisper.encoder_apply(draft, dims, jnp.asarray(mel))

        mask = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        prompt = jnp.asarray([3], dtype=jnp.int32)
        want = np.asarray(greedy_generate(
            params, dims, enc, prompt, mask, mask,
            max_new_tokens=10, eot_id=2,
        ))
        got, _, n = speculative_generate(
            params, dims, draft, dims, enc, enc_d, prompt, mask, mask,
            max_new_tokens=10, eot_id=2, draft_k=3,
        )
        np.testing.assert_array_equal(np.asarray(got), want)


class TestAcceptance:
    @pytest.mark.slow
    def test_perfect_drafter_cuts_rounds(self, setup):
        """Drafter == verifier: every proposal accepted -> ~max_new/k rounds."""
        dims, params, _, enc, _ = setup
        max_new, k = 12, 4
        want = _greedy(params, dims, enc, [3, 5], max_new)
        got, rounds, n = _spec(params, dims, params, enc, enc, [3, 5],
                               max_new, k)
        np.testing.assert_array_equal(got, want)
        assert rounds <= -(-max_new // k) + 1  # ceil + slack


class TestServingIntegration:
    @pytest.mark.slow
    def test_lone_request_takes_speculative_path_same_text(self):
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
        from whisper_tpu.serve.engine import EngineConfig, StreamingEngine

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=0)
        rng = np.random.default_rng(3)
        audio = rng.normal(0, 0.1, 2 * 16000).astype(np.float32)

        plain_sess = WhisperSession(
            params, dims, RuntimeCfg(dtype="float32", max_batch=2))
        eng = StreamingEngine(plain_sess, cfg=EngineConfig(max_new_tokens=6))
        try:
            want = eng.transcribe(audio)
        finally:
            eng.close()

        spec_sess = WhisperSession(
            params, dims, RuntimeCfg(dtype="float32", max_batch=2))
        spec_sess.set_draft_model(init_params(dims, seed=42), dims)
        eng2 = StreamingEngine(spec_sess, cfg=EngineConfig(max_new_tokens=6))
        try:
            got = eng2.transcribe(audio)
            assert eng2.stats["speculative"] == 1
        finally:
            eng2.close()
        assert got == want  # lossless through the serving surface

    @pytest.mark.slow
    def test_concurrent_requests_batched_speculative_same_text(self):
        """A burst of short requests with a draft attached must fuse into
        speculative batches and still match the plain engine's texts."""
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
        from whisper_tpu.serve.engine import EngineConfig, StreamingEngine

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=0)
        rng = np.random.default_rng(5)
        audios = [rng.normal(0, 0.1, 2 * 16000).astype(np.float32)
                  for _ in range(4)]

        plain_sess = WhisperSession(
            params, dims, RuntimeCfg(dtype="float32", max_batch=4))
        eng = StreamingEngine(
            plain_sess, cfg=EngineConfig(max_new_tokens=5,
                                         batch_window_ms=50))
        try:
            eng.warmup(batch=4)
            want = [f.result(timeout=300)
                    for f in [eng.submit(a) for a in audios]]
        finally:
            eng.close()

        spec_sess = WhisperSession(
            params, dims, RuntimeCfg(dtype="float32", max_batch=4))
        spec_sess.set_draft_model(init_params(dims, seed=42), dims)
        eng2 = StreamingEngine(
            spec_sess, cfg=EngineConfig(max_new_tokens=5,
                                        batch_window_ms=50))
        try:
            eng2.warmup(batch=4)
            got = [f.result(timeout=300)
                   for f in [eng2.submit(a) for a in audios]]
            assert eng2.stats["speculative"] == 4
            assert eng2.stats["batches"] <= 2
        finally:
            eng2.close()
        assert got == want


class TestChunkedLongformSpeculative:
    """Speculative decoding on the CHUNK-BATCHED long-form path — the path
    that produces every headline number (VERDICT r3 item 5). Losslessness
    must hold through transcribe_from_mel's device chunk slicing and the
    longform driver."""

    def test_longform_text_matches_greedy(self):
        from whisper_tpu.pipeline.longform import transcribe_longform
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=0)
        rng = np.random.default_rng(7)
        audio = rng.normal(0, 0.1, int(16000 * 65)).astype(np.float32)

        sess = WhisperSession(params, dims,
                              RuntimeCfg(dtype="float32", max_batch=4))
        want, _ = transcribe_longform(
            sess, audio, language="en", task="transcribe", max_new_tokens=6)

        sess.set_draft_model(init_params(dims, seed=99), dims)  # adversarial
        got, _ = transcribe_longform(
            sess, audio, language="en", task="transcribe", max_new_tokens=6,
            speculative=True, draft_k=3)
        assert got == want

        # perfect drafter: same text again
        sess2 = WhisperSession(params, dims,
                               RuntimeCfg(dtype="float32", max_batch=4))
        sess2.set_draft_model(params, dims)
        got2, _ = transcribe_longform(
            sess2, audio, language="en", task="transcribe", max_new_tokens=6,
            speculative=True, draft_k=3)
        assert got2 == want

    def test_requires_draft_and_plain_greedy(self):
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        sess = WhisperSession(init_params(dims, seed=0), dims,
                              RuntimeCfg(dtype="float32", max_batch=2))
        mel = jnp.zeros((dims.n_mels, 3000), dtype=jnp.float32)
        with pytest.raises(RuntimeError, match="set_draft_model"):
            sess.transcribe_from_mel(mel, [0], [3], 4, 2, speculative=True)
        sess.set_draft_model(init_params(dims, seed=1), dims)
        with pytest.raises(ValueError, match="plain greedy"):
            sess.transcribe_from_mel(mel, [0], [3], 4, 2, speculative=True,
                                     num_beams=2)

    def test_draft_k_zero_rejected(self, setup):
        """draft_k < 1 would never advance n_gen and the on-device
        while_loop would hang a TPU program (ADVICE r4, medium) — the
        trace-time guard and the CLI both reject it."""
        dims, params, draft, enc, enc_d = setup
        mask = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        prompt = jnp.asarray([3], dtype=jnp.int32)
        for bad in (0, -1):
            with pytest.raises(ValueError, match="draft_k"):
                speculative_generate(
                    params, dims, draft, dims, enc, enc_d, prompt, mask,
                    mask, max_new_tokens=4, eot_id=2, draft_k=bad,
                )

        from whisper_tpu.bench.cli import main as cli_main
        rc = cli_main(["--audio-dir", "/nonexistent",
                       "--model-id", "test/whisper-nano",
                       "--allow-random-init",
                       "--draft-model-id", "test/whisper-nano",
                       "--draft-k", "0", "--out-csv", "/tmp/never.csv"])
        assert rc == 2

    def test_pipelined_text_matches_greedy(self):
        """Pipelined mode (per-chunk norm, the headline-mode candidate)
        composes with speculation: same text as pipelined greedy."""
        from whisper_tpu.pipeline.pipelined import (
            transcribe_longform_pipelined,
        )
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=0)
        rng = np.random.default_rng(8)
        audio = rng.normal(0, 0.1, int(16000 * 65)).astype(np.float32)

        sess = WhisperSession(params, dims,
                              RuntimeCfg(dtype="float32", max_batch=4))
        want, _ = transcribe_longform_pipelined(
            sess, audio, language="en", task="transcribe", max_new_tokens=5)

        sess.set_draft_model(init_params(dims, seed=99), dims)
        got, _ = transcribe_longform_pipelined(
            sess, audio, language="en", task="transcribe", max_new_tokens=5,
            speculative=True, draft_k=3)
        assert got == want

    def test_share_encoder_lossless(self):
        """share_encoder=True feeds the MAIN encoder states to the draft
        decoder (the distil-whisper deployment: its decoder was distilled
        against the frozen teacher encoder). The draft only PROPOSES, so
        losslessness must hold even for an adversarial draft decoder fed
        the 'wrong' (= main) encoder states."""
        from whisper_tpu.pipeline.longform import transcribe_longform
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=0)
        rng = np.random.default_rng(13)
        audio = rng.normal(0, 0.1, int(16000 * 40)).astype(np.float32)

        sess = WhisperSession(params, dims,
                              RuntimeCfg(dtype="float32", max_batch=4))
        want, _ = transcribe_longform(
            sess, audio, language="en", task="transcribe", max_new_tokens=6)

        sess.set_draft_model(init_params(dims, seed=99), dims,
                             share_encoder=True)
        got, _ = transcribe_longform(
            sess, audio, language="en", task="transcribe", max_new_tokens=6,
            speculative=True, draft_k=3)
        assert got == want

    def test_share_encoder_requires_matching_width(self):
        import dataclasses

        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession

        dims = get_dims("test/whisper-nano")
        sess = WhisperSession(init_params(dims, seed=0), dims,
                              RuntimeCfg(dtype="float32", max_batch=2))
        narrow = dataclasses.replace(
            dims, d_model=dims.d_model // 2,
            encoder_heads=max(1, dims.encoder_heads // 2),
            decoder_heads=max(1, dims.decoder_heads // 2))
        with pytest.raises(ValueError, match="share_encoder"):
            sess.set_draft_model(init_params(narrow, seed=1), narrow,
                                 share_encoder=True)

    def test_engine_long_lane_speculative_same_text(self):
        """The serving engine's long-form lane takes the speculative
        program when a draft is attached — text identical to the plain
        engine's."""
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
        from whisper_tpu.serve.engine import EngineConfig, StreamingEngine

        dims = get_dims("test/whisper-nano")
        params = init_params(dims, seed=0)
        rng = np.random.default_rng(9)
        audio = rng.normal(0, 0.1, int(16000 * 40)).astype(np.float32)

        sess = WhisperSession(params, dims,
                              RuntimeCfg(dtype="float32", max_batch=2))
        eng = StreamingEngine(sess, cfg=EngineConfig(max_new_tokens=4))
        try:
            want = eng.submit(audio).result(timeout=600)
        finally:
            eng.close()

        sess2 = WhisperSession(params, dims,
                               RuntimeCfg(dtype="float32", max_batch=2))
        sess2.set_draft_model(init_params(dims, seed=99), dims)
        eng2 = StreamingEngine(sess2, cfg=EngineConfig(max_new_tokens=4))
        try:
            got = eng2.submit(audio).result(timeout=600)
            assert eng2.stats["longform"] == 1
        finally:
            eng2.close()
        assert got == want


class TestInt8CrossKV:
    """cfg.int8_kv_cache plumbing (round 4): with int8_cross_kv the
    committed sequence must equal greedy_generate(int8_cross_kv=True) —
    the unpacked int8 chain the packed x4/x5 kernels are pinned against
    (tests/test_cross_attention.py) — NOT the bf16/fp32 chain."""

    def test_matches_int8_greedy_batched(self, setup):
        dims, params, draft, _, _ = setup
        rng = np.random.default_rng(11)
        mel = rng.normal(0, 1, (3, dims.n_mels, 3000)).astype(np.float32)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        enc_d = whisper.encoder_apply(draft, dims, jnp.asarray(mel))

        mask = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        prompt = jnp.asarray([3, 5], dtype=jnp.int32)
        want = np.asarray(greedy_generate(
            params, dims, enc, prompt, mask, mask,
            max_new_tokens=12, eot_id=2, int8_cross_kv=True,
        ))
        got, rounds, n = speculative_generate(
            params, dims, draft, dims, enc, enc_d, prompt, mask, mask,
            max_new_tokens=12, eot_id=2, draft_k=3, int8_cross_kv=True,
        )
        np.testing.assert_array_equal(np.asarray(got), want)
        assert rounds >= 1

    @pytest.mark.slow
    def test_session_x4_draft_matches_x4_greedy_text(self):
        """Through the long-form driver at variant x4 (int8 weights + KV +
        packed kernels, interpret mode on CPU): draft-attached transcripts
        must equal the plain x4 run's — the claim the CLI --draft-dir help
        makes for quantized variants."""
        from whisper_tpu.models.convert import init_params as ip
        from whisper_tpu.pipeline.longform import transcribe_longform
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
        from whisper_tpu.variants.ladder import apply_variant

        dims = get_dims("test/whisper-nano")
        rng = np.random.default_rng(3)
        audio = rng.normal(0, 0.2, int(16000 * 42)).astype(np.float32)

        def text(with_draft):
            cfg, _ = apply_variant(RuntimeCfg(max_batch=2), "x4")
            sess = WhisperSession(ip(dims, seed=0), dims, cfg)
            if with_draft:
                sess.set_draft_model(ip(dims, seed=99), dims)
            out, _ = transcribe_longform(
                sess, audio, language="en", task="transcribe",
                max_new_tokens=6, chunk_length_s=30.0, overlap_s=5.0,
            )
            return out

        assert text(True) == text(False)

    @pytest.mark.parametrize("mxu", [False, True])
    def test_packed_drafter_lossless(self, mxu):
        """packed_draft routes the DRAFTER's single-token steps through the
        head-packed x4/x5 kernels (interpret mode on CPU). Drafts are
        advisory, so kernel rounding in the drafter must never change the
        committed tokens: output still equals greedy(int8_cross_kv=True)."""
        from whisper_tpu.models.registry import WhisperDims

        dims = WhisperDims(
            n_mels=80, d_model=128, encoder_layers=2, encoder_heads=2,
            decoder_layers=2, decoder_heads=2, vocab_size=256,
            max_source_positions=96, max_target_positions=64,
        )  # head_dim = 64 -> one packed head pair per layer
        params = init_params(dims, seed=0)
        draft = init_params(dims, seed=99)
        rng = np.random.default_rng(5)
        mel = rng.normal(
            0, 1, (2, dims.n_mels, 2 * dims.max_source_positions)
        ).astype(np.float32)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        enc_d = whisper.encoder_apply(draft, dims, jnp.asarray(mel))

        mask = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        prompt = jnp.asarray([3, 5], dtype=jnp.int32)
        want = np.asarray(greedy_generate(
            params, dims, enc, prompt, mask, mask,
            max_new_tokens=10, eot_id=2, int8_cross_kv=True,
        ))
        got, rounds, _ = speculative_generate(
            params, dims, draft, dims, enc, enc_d, prompt, mask, mask,
            max_new_tokens=10, eot_id=2, draft_k=3, int8_cross_kv=True,
            packed_draft=True, int8_mxu=mxu,
        )
        np.testing.assert_array_equal(np.asarray(got), want)
        assert rounds >= 1

    @pytest.mark.parametrize("mxu", [False, True])
    def test_packed_main_verify_lossless(self, mxu):
        """packed_main packs the MAIN model's cross cache too: the
        K+1-token verify pass runs the multi-query packed kernel
        (ops/cross_attention.py cross_attend_multi_packed, interpret mode
        on CPU). Per-query math is identical to the single-token packed
        kernel, so committed tokens still equal the
        greedy(int8_cross_kv=True) chain the x4/x5 kernels are pinned
        against."""
        from whisper_tpu.models.registry import WhisperDims

        dims = WhisperDims(
            n_mels=80, d_model=128, encoder_layers=2, encoder_heads=2,
            decoder_layers=2, decoder_heads=2, vocab_size=256,
            max_source_positions=96, max_target_positions=64,
        )  # head_dim = 64 -> one packed head pair per layer
        params = init_params(dims, seed=0)
        draft = init_params(dims, seed=99)
        rng = np.random.default_rng(6)
        mel = rng.normal(
            0, 1, (2, dims.n_mels, 2 * dims.max_source_positions)
        ).astype(np.float32)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        enc_d = whisper.encoder_apply(draft, dims, jnp.asarray(mel))

        mask = jnp.asarray(build_suppress_mask(dims.vocab_size, []))
        prompt = jnp.asarray([3, 5], dtype=jnp.int32)
        want = np.asarray(greedy_generate(
            params, dims, enc, prompt, mask, mask,
            max_new_tokens=10, eot_id=2, int8_cross_kv=True,
        ))
        got, rounds, _ = speculative_generate(
            params, dims, draft, dims, enc, enc_d, prompt, mask, mask,
            max_new_tokens=10, eot_id=2, draft_k=3, int8_cross_kv=True,
            packed_draft=True, packed_main=True, int8_mxu=mxu,
        )
        np.testing.assert_array_equal(np.asarray(got), want)
        assert rounds >= 1

        # Perfect drafter (draft == main) through the packed verify too:
        # the full-acceptance bonus-token branch also stays lossless.
        got2, _, _ = speculative_generate(
            params, dims, params, dims, enc, enc, prompt, mask, mask,
            max_new_tokens=10, eot_id=2, draft_k=3, int8_cross_kv=True,
            packed_draft=True, packed_main=True, int8_mxu=mxu,
        )
        np.testing.assert_array_equal(np.asarray(got2), want)

    @pytest.mark.slow
    def test_short_serving_x4_spec_matches_plain(self):
        """The serving short lane at x4 (packed kernels + packed drafter,
        interpret on CPU): transcribe_short_speculative must be
        token-identical to transcribe_short_batch under the same session."""
        from whisper_tpu.models.registry import WhisperDims
        from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
        from whisper_tpu.variants.ladder import apply_variant

        dims = WhisperDims(
            n_mels=80, d_model=128, encoder_layers=2, encoder_heads=2,
            decoder_layers=2, decoder_heads=2, vocab_size=256,
            max_source_positions=1500, max_target_positions=64,
        )  # head_dim = 64 -> packed gates engage
        cfg, _ = apply_variant(RuntimeCfg(max_batch=2), "x4")
        sess = WhisperSession(init_params(dims, seed=0), dims, cfg)
        sess.set_draft_model(init_params(dims, seed=99), dims)
        rng = np.random.default_rng(0)
        audio = rng.normal(0, 0.1, (2, 16000 * 3 + 400)).astype(np.float32)
        nvf = np.array([300, 280], dtype=np.int32)
        spec = sess.transcribe_short_speculative(audio, nvf, [3, 5], 8, 2)
        plain = sess.transcribe_short_batch(audio, nvf, [3, 5], 8, 2)
        np.testing.assert_array_equal(spec, plain)


@pytest.mark.slow
def test_randomized_lossless_sweep():
    """Seeded property sweep: random (batch, draft_k, max_new, suppression,
    drafter-fidelity) configs must all commit exactly the greedy chain —
    the bug class this guards (acceptance/bonus/boundary bookkeeping in
    the while-loop state machine) is exactly where hand-picked cases go
    stale."""
    dims = get_dims("test/whisper-nano")
    params = init_params(dims, seed=0)
    rng = np.random.default_rng(2024)

    for trial in range(10):
        b = int(rng.integers(1, 5))
        k = int(rng.integers(1, 6))
        max_new = int(rng.integers(2, 20))
        n_sup = int(rng.integers(0, 4))
        suppress = rng.choice(
            np.arange(3, dims.vocab_size), size=n_sup, replace=False
        ).tolist() if n_sup else []
        fidelity = trial % 3  # 0: adversarial, 1: perfect, 2: noisy
        if fidelity == 0:
            draft = init_params(dims, seed=100 + trial)
        elif fidelity == 1:
            draft = params
        else:
            import jax

            nr = np.random.default_rng(trial)
            draft = jax.tree_util.tree_map(
                lambda x: x + 0.05 * float(np.asarray(x).std() or 1.0)
                * jnp.asarray(nr.standard_normal(np.shape(x)),
                              dtype=x.dtype)
                if np.ndim(x) else x,
                params)

        mel = rng.normal(0, 1, (b, dims.n_mels, 3000)).astype(np.float32)
        enc = whisper.encoder_apply(params, dims, jnp.asarray(mel))
        enc_d = whisper.encoder_apply(draft, dims, jnp.asarray(mel))
        mask = jnp.asarray(build_suppress_mask(dims.vocab_size, suppress))
        prompt = jnp.asarray([3, 5], dtype=jnp.int32)

        want = np.asarray(greedy_generate(
            params, dims, enc, prompt, mask, mask,
            max_new_tokens=max_new, eot_id=2,
        ))
        got, rounds, n_gen = speculative_generate(
            params, dims, draft, dims, enc, enc_d, prompt, mask, mask,
            max_new_tokens=max_new, eot_id=2, draft_k=k,
        )
        np.testing.assert_array_equal(
            np.asarray(got), want,
            err_msg=f"trial {trial}: b={b} k={k} max_new={max_new} "
                    f"sup={suppress} fidelity={fidelity}")
