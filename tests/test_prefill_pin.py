"""Pinned prefill buckets + traced sample caps (streaming tick classes).

The engine pins greedy single-window decodes to a FIXED prefill bucket
(engine.TICK_PREFILL for capped ticks, PROMPT_BUCKETS[-1] for full
windows) so carried-prompt growth never creates a new XLA shape class at
serve time. decode_window's contract makes this output-identical:
positions in [sample_begin, prefill_len) are never-attended EOT padding,
and the traced ``sample_cap`` bounds SAMPLED tokens relative to
``sample_begin`` (max_len alone would over-run once prefill_len >
prompt bucket).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.models import (
    TokenIds,
    build_suppress_mask,
    config_for,
    decode_window,
    encode_xa_kv,
    init_params,
)
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = config_for("test")
    params = init_params(cfg, jax.random.key(0))
    tok = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, ()))
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 96, cfg.n_mels)),
        jnp.float32,
    )
    xa = encode_xa_kv(cfg, params, mel)
    sot = list(tok.sot_sequence("en"))
    return cfg, params, xa, ids, sup, sot


def _run(setup, prefill_len, sample_cap, prompt=(), cap=16):
    cfg, params, xa, ids, sup, sot = setup
    init = list(prompt) + sot
    tinit = np.full((1, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[0, : len(init)] = init
    sb = len(init)
    max_len = min(cfg.n_text_ctx, prefill_len + cap)
    return decode_window(
        cfg, params, xa, jnp.asarray(tinit), sb, len(prompt), ids, sup,
        jnp.float32(0.0), jax.random.key(1), max_len=max_len,
        prefill_len=prefill_len, sample_cap=sample_cap,
    ), sb


def test_pinned_prefill_tokens_identical(setup):
    """prefill pinned WIDER than the prompt bucket + sample_cap ≡ the
    natural bucket decode, token for token."""
    cfg, params, xa, ids, sup, sot = setup
    want, sb = _run(setup, prefill_len=4, sample_cap=16, cap=16)
    got, sb2 = _run(setup, prefill_len=64, sample_cap=16, cap=16)
    assert sb == sb2
    nw = int(want.lengths[0])
    ng = int(got.lengths[0])
    assert nw == ng
    np.testing.assert_array_equal(
        np.asarray(want.tokens[0])[:nw], np.asarray(got.tokens[0])[:ng]
    )
    np.testing.assert_allclose(
        float(want.avg_logprobs[0]), float(got.avg_logprobs[0]),
        rtol=1e-5, atol=1e-5,
    )


def test_sample_cap_bounds_sampled_tokens(setup):
    """With a pinned 64-prefill and cap 8, at most 8 tokens are sampled
    even though max_len - sample_begin is much larger."""
    res, sb = _run(setup, prefill_len=64, sample_cap=8, cap=32)
    sampled = int(res.lengths[0]) - sb
    assert 0 < sampled <= 8 + 1  # +1: EOT written at the stop position


def test_pinned_prefill_with_prompt(setup):
    """Carried-prompt decode at the pinned bucket matches the natural
    bucket (prompt in [0, sample_begin), sot_index at the prompt end)."""
    cfg, params, xa, ids, sup, sot = setup
    sp = fallback_tokenizer(cfg.n_vocab).special
    prompt = [sp.sot_prev, 101, 102, 103]
    want, _ = _run(setup, prefill_len=8, sample_cap=16, prompt=prompt, cap=16)
    got, _ = _run(setup, prefill_len=64, sample_cap=16, prompt=prompt, cap=16)
    nw, ng = int(want.lengths[0]), int(got.lengths[0])
    assert nw == ng
    np.testing.assert_array_equal(
        np.asarray(want.tokens[0])[:nw], np.asarray(got.tokens[0])[:ng]
    )


def test_engine_fused_packed_roundtrip():
    """The engine's packed one-pull carrier reproduces the DecodeResult
    fields exactly (f32 is exact for token ids: vocab < 2**24)."""
    from sentiric_stt_whisper_service_tpu.runtime.engine import (
        _unpack_decode_result,
    )

    ctx = 12
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 50000, ctx).astype(np.int32)
    tlps = rng.standard_normal(ctx).astype(np.float32)
    packed = np.concatenate(
        [tokens.astype(np.float32), tlps,
         np.asarray([7, -3.5, -0.25, 0.125], np.float32)]
    )
    res = _unpack_decode_result(packed, ctx)
    np.testing.assert_array_equal(res.tokens[0], tokens)
    np.testing.assert_array_equal(res.token_logprobs[0], tlps)
    assert int(res.lengths[0]) == 7
    assert float(res.sum_logprobs[0]) == -3.5
    assert float(res.avg_logprobs[0]) == -0.25
    assert float(res.no_speech_probs[0]) == 0.125
