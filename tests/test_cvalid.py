"""Bucketed self-slab reads (c_valid): numerics and plumbing.

A decode step at position p only needs cache rows <= p; decoder_step's
``c_valid`` slices the slab read and decode_window lax.switches between
row buckets (SSTW_CVALID_ROWS, models/sampling.cvalid_buckets). Exactness
is per-step: the valid rows' scores are identical, masked rows contribute
exact zeros — but reduction TREES differ between slice widths, so a long
greedy loop on random near-uniform logits may flip argmax near-ties
(same class of variation as any XLA shape change; real-checkpoint logit
gaps dwarf it). The tests therefore pin step-level closeness and the
bucket machinery, not loop-level token equality across widths.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.models import config_for, init_params
from sentiric_stt_whisper_service_tpu.models.sampling import cvalid_buckets
from sentiric_stt_whisper_service_tpu.models.whisper import (
    decoder_apply,
    decoder_step,
    encoder_apply,
    init_kv_cache,
    pairing_ok,
    precompute_xa_kv,
)


@pytest.fixture(scope="module")
def setup():
    cfg = config_for("test")
    params = init_params(cfg, jax.random.key(0))
    B = 3
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 96, cfg.n_mels)), jnp.float32
    )
    xa = precompute_xa_kv(cfg, params, encoder_apply(cfg, params, mel))
    kv = init_kv_cache(cfg, B, 160, paired=pairing_ok(cfg))
    toks = jnp.asarray(
        np.random.default_rng(1).integers(0, 1000, (B, 70)), jnp.int32
    )
    _, kv, _ = decoder_apply(cfg, params, toks, jnp.int32(0), kv, xa)
    return cfg, params, kv, xa, B


@pytest.mark.parametrize("cb", [96, 128])
def test_step_logits_match_full_read(setup, cb):
    cfg, params, kv, xa, B = setup
    t1 = jnp.asarray(np.random.default_rng(2).integers(0, 1000, (B,)), jnp.int32)
    lf, kvf = decoder_step(cfg, params, t1, jnp.int32(70), kv, xa)
    lb, kvb = decoder_step(cfg, params, t1, jnp.int32(70), kv, xa, c_valid=cb)
    np.testing.assert_allclose(
        np.asarray(lf), np.asarray(lb), rtol=2e-5, atol=2e-5
    )
    # the cache write is identical regardless of the read bucket
    np.testing.assert_array_equal(np.asarray(kvf["k"]), np.asarray(kvb["k"]))


def test_cvalid_ignored_in_ring_mode(setup):
    """Ring validity wraps around the slab — slicing would be WRONG there,
    so decoder_step must ignore c_valid when ring_row is given."""
    cfg, params, kv, xa, B = setup
    t1 = jnp.asarray([5, 6, 7], jnp.int32)
    pos = jnp.asarray([30, 40, 50], jnp.int32)
    lf, _ = decoder_step(cfg, params, t1, pos, kv, xa, ring_row=jnp.int32(70))
    lb, _ = decoder_step(
        cfg, params, t1, pos, kv, xa, ring_row=jnp.int32(70), c_valid=96
    )
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lb))


def test_bucket_list():
    assert cvalid_buckets(160, 64) == [64, 128, 160]
    assert cvalid_buckets(160, 32) == [32, 64, 96, 128, 160]
    assert cvalid_buckets(64, 64) == [64]
    assert cvalid_buckets(160, -1) == [160]  # non-positive disables
    old = os.environ.get("SSTW_CVALID_ROWS")
    os.environ["SSTW_CVALID_ROWS"] = "0"  # env 0 disables too
    try:
        assert cvalid_buckets(160) == [160]
    finally:
        if old is None:
            os.environ.pop("SSTW_CVALID_ROWS", None)
        else:
            os.environ["SSTW_CVALID_ROWS"] = old


def test_decode_window_runs_with_buckets(setup):
    """The lax.switch plumbing: a multi-bucket greedy decode completes and
    yields sane lengths/logprobs (tiny granularity to force >1 bucket)."""
    from sentiric_stt_whisper_service_tpu.models import (
        TokenIds,
        build_suppress_mask,
        decode_window,
    )
    from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

    cfg, params, _, xa, B = setup
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, ()))
    sot = tok.sot_sequence("en")
    tinit = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    old = os.environ.get("SSTW_CVALID_ROWS")
    os.environ["SSTW_CVALID_ROWS"] = "16"
    try:
        jax.clear_caches()  # bucket list is read at trace time
        res = decode_window(
            cfg, params, xa, jnp.asarray(tinit), len(sot), 0, ids, sup,
            jnp.float32(0.0), jax.random.key(1), max_len=len(sot) + 60,
        )
        lengths = np.asarray(res.lengths)
        assert (lengths > len(sot)).all()
        assert np.isfinite(np.asarray(res.avg_logprobs)).all()
    finally:
        if old is None:
            os.environ.pop("SSTW_CVALID_ROWS", None)
        else:
            os.environ["SSTW_CVALID_ROWS"] = old
        jax.clear_caches()
