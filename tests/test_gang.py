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
