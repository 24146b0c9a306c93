"""Beam gang batching (runtime/gang.py): concurrent same-shape beam
windows coalesce into one batched decode with unchanged results, and
failures reject (never orphan) every member's future."""

import dataclasses
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.config import Settings
from sentiric_stt_whisper_service_tpu.models import (
    TokenIds,
    build_suppress_mask,
    config_for,
    init_params,
)
from sentiric_stt_whisper_service_tpu.models.beam import decode_window_beam
from sentiric_stt_whisper_service_tpu.models.whisper import (
    encoder_apply,
    precompute_xa_kv,
)
from sentiric_stt_whisper_service_tpu.runtime.gang import BeamGang, GangKey
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer


@pytest.fixture(scope="module")
def stack():
    cfg = config_for("test")
    params = init_params(cfg, jax.random.key(0))
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, ()))
    sot = tok.sot_sequence("en")
    return cfg, params, ids, sup, sot


def _window(cfg, params, seed):
    mel = jnp.asarray(
        np.random.default_rng(seed).standard_normal((1, 96, cfg.n_mels)),
        jnp.float32,
    )
    return precompute_xa_kv(cfg, params, encoder_apply(cfg, params, mel))


def test_gang_matches_solo_decode(stack):
    cfg, params, ids, sup, sot = stack
    gang = BeamGang(cfg, params, ids, sup, window_ms=200, max_gang=4)
    try:
        n = 3
        ctx = cfg.n_text_ctx
        rows, xas = [], []
        for i in range(n):
            row = np.full((ctx,), ids.eot, np.int32)
            row[: len(sot)] = sot
            rows.append(row)
            xas.append(_window(cfg, params, seed=10 + i))
        key = GangKey(
            sample_begin=len(sot), sot_index=0, beam_size=3,
            max_len=len(sot) + 24, prefill_len=8,
            xa_f=xas[0]["k"].shape[-1], use_timestamps=True,
        )
        # Submit from separate threads (the serving pattern).
        futs = [None] * n

        def go(i):
            futs[i] = gang.submit(xas[i], rows[i], key)

        ts = [threading.Thread(target=go, args=(i,)) for i in range(n)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        results = [f.result(timeout=300) for f in futs]

        for i, res in enumerate(results):
            solo = decode_window_beam(
                cfg, params, xas[i], jnp.asarray(rows[i][None]),
                key.sample_begin, key.sot_index, ids, sup,
                beam_size=key.beam_size, max_len=key.max_len,
                prefill_len=key.prefill_len,
            )
            assert res.tokens.shape[0] == 1
            np.testing.assert_array_equal(
                np.asarray(res.tokens), np.asarray(solo.tokens)
            )
            np.testing.assert_allclose(
                np.asarray(res.sum_logprobs), np.asarray(solo.sum_logprobs),
                rtol=1e-4, atol=1e-4,
            )
    finally:
        gang.shutdown()


def test_gang_pads_to_batch_bucket(stack, monkeypatch):
    """A gang of 3 decodes at the power-of-two bucket batch (4): every
    distinct gang size would otherwise be a fresh XLA shape class that
    compiles at serve time (ADVICE r2 medium). Results of the real
    members are unaffected by the padding rows."""
    import sentiric_stt_whisper_service_tpu.runtime.gang as gang_mod

    cfg, params, ids, sup, sot = stack
    batches = []
    orig = gang_mod.decode_window_beam

    def spy(cfg_, params_, xa_kv, tinit, *a, **kw):
        batches.append(int(tinit.shape[0]))
        return orig(cfg_, params_, xa_kv, tinit, *a, **kw)

    monkeypatch.setattr(gang_mod, "decode_window_beam", spy)
    gang = BeamGang(cfg, params, ids, sup, window_ms=300, max_gang=8)
    try:
        ctx = cfg.n_text_ctx
        rows, xas = [], []
        for i in range(3):
            row = np.full((ctx,), ids.eot, np.int32)
            row[: len(sot)] = sot
            rows.append(row)
            xas.append(_window(cfg, params, seed=30 + i))
        key = GangKey(
            sample_begin=len(sot), sot_index=0, beam_size=3,
            max_len=len(sot) + 16, prefill_len=8,
            xa_f=xas[0]["k"].shape[-1], use_timestamps=True,
        )
        futs = [gang.submit(xas[i], rows[i], key) for i in range(3)]
        results = [f.result(timeout=300) for f in futs]
        assert batches and max(batches) == 4  # 3 members → bucket 4
        solo = decode_window_beam(
            cfg, params, xas[1], jnp.asarray(rows[1][None]),
            key.sample_begin, key.sot_index, ids, sup,
            beam_size=key.beam_size, max_len=key.max_len,
            prefill_len=key.prefill_len,
        )
        np.testing.assert_array_equal(
            np.asarray(results[1].tokens), np.asarray(solo.tokens)
        )
    finally:
        gang.shutdown()
    assert gang.batch_bucket(1) == 1
    assert gang.batch_bucket(2) == 2
    assert gang.batch_bucket(3) == 4
    assert gang.batch_bucket(5) == 8
    assert gang.batch_bucket(9) == 8  # capped at max_gang


def test_gang_shutdown_rejects_queued(stack):
    """shutdown() must reject — not orphan — items still queued or
    deferred when the worker exits (ADVICE r2 low: callers blocked in
    fut.result() hung until timeout during engine shutdown)."""
    cfg, params, ids, sup, sot = stack
    gang = BeamGang(cfg, params, ids, sup, window_ms=50, max_gang=4)
    # Kill the worker first so submissions can never be served.
    gang._stop.set()
    gang._q.put(None)
    gang._worker.join(timeout=10)
    row = np.full((cfg.n_text_ctx,), ids.eot, np.int32)
    row[: len(sot)] = sot
    xa = _window(cfg, params, seed=50)
    key = GangKey(
        sample_begin=len(sot), sot_index=0, beam_size=3,
        max_len=len(sot) + 8, prefill_len=8,
        xa_f=xa["k"].shape[-1], use_timestamps=True,
    )
    f1 = gang.submit(xa, row, key)
    f2 = gang.submit(xa, row, key)
    gang.shutdown()
    with pytest.raises(RuntimeError):
        f1.result(timeout=5)
    with pytest.raises(RuntimeError):
        f2.result(timeout=5)


def test_gang_lone_request_skips_wait(stack, monkeypatch):
    """When the engine's in-flight hint says nobody else could join, the
    gang must not burn the full collection window per decode (ADVICE r2
    low: a lone long-form request paid +window_ms x N windows of idle)."""
    import time as _time

    import sentiric_stt_whisper_service_tpu.runtime.gang as gang_mod
    from sentiric_stt_whisper_service_tpu.models.sampling import DecodeResult

    cfg, params, ids, sup, sot = stack

    def instant(cfg_, params_, xa_kv, tinit, *a, **kw):
        B, ctx = tinit.shape
        return DecodeResult(
            tokens=jnp.asarray(tinit),
            lengths=jnp.full((B,), len(sot) + 1, jnp.int32),
            sum_logprobs=jnp.zeros((B,)),
            avg_logprobs=jnp.zeros((B,)),
            no_speech_probs=jnp.zeros((B,)),
            token_logprobs=jnp.zeros((B, ctx)),
        )

    monkeypatch.setattr(gang_mod, "decode_window_beam", instant)
    row = np.full((cfg.n_text_ctx,), ids.eot, np.int32)
    row[: len(sot)] = sot
    xa = _window(cfg, params, seed=60)
    key = GangKey(
        sample_begin=len(sot), sot_index=0, beam_size=3,
        max_len=len(sot) + 8, prefill_len=8,
        xa_f=xa["k"].shape[-1], use_timestamps=True,
    )
    # Hint = 1 (only this request in flight) → no collection wait.
    gang = BeamGang(cfg, params, ids, sup, window_ms=1500, max_gang=4,
                    others_hint=lambda: 1)
    try:
        t0 = _time.monotonic()
        gang.submit(xa, row, key).result(timeout=30)
        fast = _time.monotonic() - t0
    finally:
        gang.shutdown()
    assert fast < 1.0, fast
    # Control: without the hint the same submission waits out the window.
    gang2 = BeamGang(cfg, params, ids, sup, window_ms=1500, max_gang=4)
    try:
        t0 = _time.monotonic()
        gang2.submit(xa, row, key).result(timeout=30)
        slow = _time.monotonic() - t0
    finally:
        gang2.shutdown()
    assert slow >= 1.2, slow


def test_gang_failure_rejects_all_futures(stack):
    """A poisoned member (bad leaf shapes) must reject — not hang — every
    future in its gang (round-1 orphaned-future lesson)."""
    cfg, params, ids, sup, sot = stack
    gang = BeamGang(cfg, params, ids, sup, window_ms=100, max_gang=4)
    try:
        ctx = cfg.n_text_ctx
        row = np.full((ctx,), ids.eot, np.int32)
        row[: len(sot)] = sot
        bad_xa = {"k": jnp.zeros((1, 1, 2, 2, 2)), "v": jnp.zeros((1, 1, 2, 2, 2))}
        key = GangKey(
            sample_begin=len(sot), sot_index=0, beam_size=3,
            max_len=len(sot) + 8, prefill_len=8, xa_f=2, use_timestamps=True,
        )
        f1 = gang.submit(bad_xa, row, key)
        f2 = gang.submit(bad_xa, row, key)
        with pytest.raises(Exception):
            f1.result(timeout=120)
        with pytest.raises(Exception):
            f2.result(timeout=120)
    finally:
        gang.shutdown()


def test_engine_routes_beam_through_gang(stack):
    """Engine-level: two concurrent beam transcriptions with
    parallel_requests=2 both complete and the gang was engaged."""
    from sentiric_stt_whisper_service_tpu.runtime.engine import (
        RequestOptions,
        SttEngine,
    )

    s = Settings(
        enable_vad=False, beam_size=3, best_of=1, parallel_requests=2,
        compute_type="float32", gang_window_ms=150,
    )
    eng = SttEngine(s, model_name="test", random_init=True)
    try:
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(16000) * 3276).astype(np.int16)
        outs = [None, None]
        errs = []

        def go(i):
            try:
                outs[i] = eng.transcribe_pcm16(
                    audio, 16000, RequestOptions(language="en")
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=go, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        assert outs[0] is not None and outs[1] is not None
        assert eng._beam_gang is not None  # the gang path was engaged
    finally:
        eng.shutdown()


def test_gang_warmup_bucketed_ctx_no_serve_compile(monkeypatch):
    """Under AUDIO_CTX=-1 with beam defaults, warmup() must pre-compile
    every executable the first live coalescence of two requests needs
    (VERDICT r3 #8): beam-strategy windows collapse to FULL audio ctx
    (engine._transcribe_longform), so the warmup set is one shape class
    per gang batch bucket — no serve-time XLA compile may fire, counted
    via jax_log_compiles."""
    import logging

    import sentiric_stt_whisper_service_tpu.runtime.gang as gang_mod
    from sentiric_stt_whisper_service_tpu.runtime.engine import (
        RequestOptions,
        SttEngine,
    )

    s = Settings(
        enable_vad=False, beam_size=2, best_of=1, parallel_requests=2,
        compute_type="float32", gang_window_ms=1000, audio_ctx=-1,
        max_batch_size=2, quality_gate="off", logprob_threshold=-1e9,
        no_speech_threshold=2.0, min_segment_avg_prob=0.0,
        no_timestamps=True,
    )
    batches = []
    orig = gang_mod.decode_window_beam

    def spy(cfg_, params_, xa_kv, tinit, *a, **kw):
        batches.append(int(tinit.shape[0]))
        return orig(cfg_, params_, xa_kv, tinit, *a, **kw)

    monkeypatch.setattr(gang_mod, "decode_window_beam", spy)
    eng = SttEngine(s, model_name="test", random_init=True)
    records = []

    class Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = Grab(level=logging.WARNING)
    loggers = [
        logging.getLogger("jax._src.interpreters.pxla"),
        logging.getLogger("jax._src.dispatch"),
    ]
    try:
        eng.warmup()
        jax.config.update("jax_log_compiles", True)
        for lg in loggers:
            lg.addHandler(handler)

        rng = np.random.default_rng(0)
        # 2 s clip: audio_ctx=-1 would bucket this at 384 positions, but
        # the beam strategy must force the full-ctx class warmup compiled.
        audio = (rng.standard_normal(32000) * 3276).astype(np.int16)
        outs = [None, None]
        errs = []

        def go(i):
            try:
                outs[i] = eng.transcribe_pcm16(
                    audio, 16000, RequestOptions(language="en")
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=go, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        # Non-vacuous: the two requests actually coalesced into one
        # gang decode (batch 2) during the live phase.
        assert 2 in batches, batches
        serve_compiles = [
            m
            for m in records
            if "Compiling" in m
            and any(k in m for k in ("decode", "beam", "encode", "align",
                                     "detect", "mel", "audio"))
        ]
        assert not serve_compiles, serve_compiles
    finally:
        jax.config.update("jax_log_compiles", False)
        for lg in loggers:
            lg.removeHandler(handler)
        eng.shutdown()


def test_engine_beam_abort_stops_mid_decode(stack):
    """A cancelled request (should_abort flips true mid-window) stops a
    BEAM decode inside the window — reference abort-callback semantics
    (stt_engine.cpp:215-219) on the gang path the default config uses."""
    from sentiric_stt_whisper_service_tpu.runtime.engine import (
        RequestOptions,
        SttEngine,
    )

    s = Settings(
        enable_vad=False, beam_size=3, best_of=1, parallel_requests=2,
        compute_type="float32", gang_window_ms=30,
    )
    eng = SttEngine(s, model_name="test", random_init=True)
    try:
        rng = np.random.default_rng(1)
        audio = (rng.standard_normal(32000) * 3276).astype(np.int16)
        polls = []

        def abort():
            polls.append(1)
            # let language-detect/encode pass, then cancel mid-decode
            return len(polls) > 3

        out = eng.transcribe_pcm16(
            audio, 16000, RequestOptions(language="en", should_abort=abort)
        )
        assert out == []  # window aborted before any segment completed
        assert len(polls) > 3  # the callback WAS polled inside the decode
    finally:
        eng.shutdown()
