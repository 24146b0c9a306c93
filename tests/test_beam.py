"""Beam-search decode: gather-free KV plumbing vs full-recompute oracle.

The beam path (models/beam.py + whisper.decoder_step_beam) never reorders
the KV cache — beams own physical slots and parent adoption rewrites only
an ancestry mask, while the cross slab is shared across beams. These tests
pin that plumbing to ground truth:

  * step logits under random forced parent/token choices must equal a
    cache-free full-prefix recompute of every hypothesis;
  * beam_size=1 must reproduce greedy ``decode_window`` exactly;
  * the K>1 search returns well-formed, internally consistent results.
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
    decoder_apply,
    encoder_apply,
    init_kv_cache,
    init_params,
    precompute_xa_kv,
)
from sentiric_stt_whisper_service_tpu.models.beam import decode_window_beam
from sentiric_stt_whisper_service_tpu.models.whisper import decoder_step_beam
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, log_mel_spectrogram
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = config_for("test", dtype=jnp.float32)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, N_SAMPLES)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(audio)
    xa = encoder_apply(cfg, params, mel)
    xa_kv = precompute_xa_kv(cfg, params, xa)
    return cfg, params, xa_kv


def test_beam_step_matches_full_recompute(setup):
    """Ancestry-masked slot cache == cache-free recompute of each prefix."""
    cfg, params, xa_kv = setup
    B, K, C = 2, 3, 64
    BK = B * K
    rng = np.random.default_rng(7)
    prefix = np.array([[50258, 50259, 50359]] * B, np.int32)
    P = prefix.shape[1]

    kv_b = init_kv_cache(cfg, B, C)
    _, kv_b, _ = decoder_apply(
        cfg, params, jnp.asarray(prefix), jnp.int32(0), kv_b, xa_kv
    )
    # Slot cache [L, B*K, H, C, hd]; prompt prefill in slot 0.
    kv = {
        name: jnp.zeros((v.shape[0], B, K) + v.shape[2:], v.dtype)
        .at[:, :, 0]
        .set(v)
        .reshape((v.shape[0], BK) + v.shape[2:])
        for name, v in kv_b.items()
    }
    anc = np.zeros((B, K, K, C), bool)
    anc[:, :, 0, :P] = True
    hyps = [[list(prefix[b]) for _ in range(K)] for b in range(B)]
    eye = np.eye(K, dtype=bool)

    xa_kv_bk = {k: jnp.repeat(v, K, axis=1) for k, v in xa_kv.items()}
    for t in range(P, P + 5):
        parent = rng.integers(0, K, size=(B, K))
        toks = rng.integers(100, 40000, size=(B, K)).astype(np.int32)
        hyps = [
            [hyps[b][parent[b, k]] + [int(toks[b, k])] for k in range(K)]
            for b in range(B)
        ]
        anc = anc[np.arange(B)[:, None], parent]
        anc[:, :, :, t] = eye[None]

        logits, kv = decoder_step_beam(
            cfg, params, jnp.asarray(toks.reshape(BK)), jnp.int32(t),
            kv, xa_kv, jnp.asarray(anc), K,
        )

        flat = jnp.asarray(
            np.array([hyps[b][k] for b in range(B) for k in range(K)], np.int32)
        )
        want, _, _ = decoder_apply(
            cfg, params, flat, jnp.int32(0), init_kv_cache(cfg, BK, C), xa_kv_bk
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(want[:, -1]), atol=2e-3, rtol=1e-3
        )


def test_beam_k1_matches_greedy(setup):
    """beam_size=1 degenerates to greedy argmax — same tokens as
    decode_window at temperature 0."""
    cfg, params, xa_kv = setup
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot_seq = tok.sot_sequence("en")
    B = 2
    tokens = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
    tokens[:, : len(sot_seq)] = sot_seq
    tokens = jnp.asarray(tokens)

    greedy = decode_window(
        cfg, params, xa_kv, tokens, len(sot_seq), len(sot_seq) - 1, ids, sup,
        jnp.float32(0.0), jax.random.key(0), max_len=32,
    )
    beam = decode_window_beam(
        cfg, params, xa_kv, tokens, len(sot_seq), len(sot_seq) - 1, ids, sup,
        beam_size=1, max_len=32,
    )
    for b in range(B):
        n = int(greedy.lengths[b])
        assert int(beam.lengths[b]) == n
        np.testing.assert_array_equal(
            np.asarray(beam.tokens[b, :n]), np.asarray(greedy.tokens[b, :n])
        )
    np.testing.assert_allclose(
        np.asarray(beam.no_speech_probs),
        np.asarray(greedy.no_speech_probs),
        atol=1e-5,
    )


def test_beam_search_well_formed(setup):
    cfg, params, xa_kv = setup
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot_seq = tok.sot_sequence("en")
    B = 2
    tokens = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
    tokens[:, : len(sot_seq)] = sot_seq
    tokens = jnp.asarray(tokens)

    res = decode_window_beam(
        cfg, params, xa_kv, tokens, len(sot_seq), len(sot_seq) - 1, ids, sup,
        beam_size=3, max_len=48,
    )
    assert res.tokens.shape[0] == B
    assert np.isfinite(np.asarray(res.avg_logprobs)).all()
    assert np.isfinite(np.asarray(res.sum_logprobs)).all()
    for b in range(B):
        n = int(res.lengths[b])
        assert len(sot_seq) < n <= 48
        seq = np.asarray(res.tokens[b, len(sot_seq):n])
        # a finished hypothesis ends with EOT (unless it hit max_len)
        if n < 48:
            assert seq[-1] == ids.eot
    # deterministic
    res2 = decode_window_beam(
        cfg, params, xa_kv, tokens, len(sot_seq), len(sot_seq) - 1, ids, sup,
        beam_size=3, max_len=48,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(res2.tokens))


def test_beam_int8_path_runs(setup):
    """The engine's compute_type=int8 config feeds quantized params and an
    int8 cross slab into the beam path (runtime/engine.py) — exercise the
    fused-QKV + int8-slab branches of decoder_step_beam."""
    from sentiric_stt_whisper_service_tpu.ops.quant import (
        fuse_decoder_qkv,
        quantize_params,
        quantize_xa_kv,
    )

    cfg, params, xa_kv = setup
    qparams = fuse_decoder_qkv(quantize_params(params))
    xa_q = quantize_xa_kv(xa_kv)
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot_seq = tok.sot_sequence("en")
    tokens = np.full((2, cfg.n_text_ctx), ids.eot, np.int32)
    tokens[:, : len(sot_seq)] = sot_seq
    res = decode_window_beam(
        cfg, qparams, xa_q, jnp.asarray(tokens), len(sot_seq),
        len(sot_seq) - 1, ids, sup, beam_size=3, max_len=32,
    )
    assert np.isfinite(np.asarray(res.avg_logprobs)).all()
    assert (np.asarray(res.lengths) > len(sot_seq)).all()


def test_topk_small_matches_lax_top_k():
    """topk_small (k iterative argmax passes — the cheap exact top-k the
    beam loop uses over [BK, V]) must match lax.top_k exactly, including
    tie order and -inf rows."""
    from sentiric_stt_whisper_service_tpu.models.beam import topk_small

    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 513)).astype(np.float32)
    # force ties, and suppression-style NEG_INF entries (the contract
    # requires ≥ k entries above the sentinel per row — always true in
    # the beam loop, see topk_small docstring)
    x[0, 10] = x[0, 99] = x[0, 200] = 3.14
    x[1, 5:] = -1e30
    x[2, :5] = 7.0
    xj = jnp.asarray(x)
    for k in (1, 3, 5):
        want_v, want_i = jax.lax.top_k(xj, k)
        got_v, got_i = topk_small(xj, k)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def _eot_boost_mask(cfg, ids, boost=14.0):
    """Additive logit mask that makes EOT dominate from the second sampled
    token on (the start-of-sample rule still bans it at the first): every
    beam banks a finished hypothesis within a few steps — the EOT-early
    regime the banked-K termination exists for."""
    base = np.asarray(build_suppress_mask(cfg.n_vocab, ids, ()), np.float32)
    base[ids.eot] += boost
    return jnp.asarray(base)


def test_beam_early_stop_output_identical(setup):
    """Banked-K termination must be output-identical to running the loop
    to max_len (VERDICT r2 weak #5 'done' criterion), on both EOT-early
    and never-finishing (random-weight) windows."""
    cfg, params, xa_kv = setup
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sot = tok.sot_sequence("en")
    B = 2
    tinit = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)

    plain = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, ()))
    for sup in (plain, _eot_boost_mask(cfg, ids)):
        a = decode_window_beam(
            cfg, params, xa_kv, tinit, len(sot), 0, ids, sup, beam_size=3,
            max_len=len(sot) + 32, early_stop=True,
        )
        b = decode_window_beam(
            cfg, params, xa_kv, tinit, len(sot), 0, ids, sup, beam_size=3,
            max_len=len(sot) + 32, early_stop=False,
        )
        np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
        np.testing.assert_array_equal(
            np.asarray(a.lengths), np.asarray(b.lengths)
        )
        np.testing.assert_allclose(
            np.asarray(a.sum_logprobs), np.asarray(b.sum_logprobs), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(a.avg_logprobs), np.asarray(b.avg_logprobs), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(a.token_logprobs), np.asarray(b.token_logprobs),
            atol=1e-5,
        )


def test_beam_eot_early_banks_and_terminates(setup):
    """On an EOT-early window the banked winner ends in EOT right after
    the first sampled token, and its logprob accounting is consistent
    (sum == Σ token logprobs, avg == sum/n)."""
    cfg, params, xa_kv = setup
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = _eot_boost_mask(cfg, ids)
    sot = tok.sot_sequence("en")
    B = 2
    tinit = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    res = decode_window_beam(
        cfg, params, xa_kv, jnp.asarray(tinit), len(sot), 0, ids, sup,
        beam_size=3, max_len=len(sot) + 48,
    )
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    for b in range(B):
        seq = toks[b, len(sot) : lens[b]]
        assert seq[-1] == ids.eot  # banked hypothesis ends in EOT
        assert lens[b] <= len(sot) + 4  # EOT-early, not max_len
        lps = np.asarray(res.token_logprobs)[b, len(sot) : lens[b]]
        n = lens[b] - len(sot)
        assert float(res.sum_logprobs[b]) == pytest.approx(lps.sum(), abs=1e-4)
        assert float(res.avg_logprobs[b]) == pytest.approx(
            float(res.sum_logprobs[b]) / n, abs=1e-5
        )


def test_beam_abortable_chunked_output_identical(setup):
    """The host-chunked abortable path (should_abort given, never firing)
    must be output-identical to the single-launch impl — the chunk
    boundary only splits the while_loop, never the math (reference abort
    contract: stt_engine.cpp:215-219)."""
    cfg, params, xa_kv = setup
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, ()))
    sot = tok.sot_sequence("en")
    B = 2
    tinit = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)

    a = decode_window_beam(
        cfg, params, xa_kv, tinit, len(sot), 0, ids, sup, beam_size=3,
        max_len=len(sot) + 40,
    )
    calls = []
    b = decode_window_beam(
        cfg, params, xa_kv, tinit, len(sot), 0, ids, sup, beam_size=3,
        max_len=len(sot) + 40,
        should_abort=lambda: calls.append(1) is None and False,
        abort_chunk=16,
    )
    assert len(calls) >= 3  # polled between chunks
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(b.lengths))
    np.testing.assert_allclose(
        np.asarray(a.sum_logprobs), np.asarray(b.sum_logprobs), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.token_logprobs), np.asarray(b.token_logprobs), atol=1e-5
    )


def test_beam_abort_stops_mid_decode(setup):
    """Flipping the abort callback after N polls stops the window before
    max_len and returns None."""
    cfg, params, xa_kv = setup
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, ()))
    sot = tok.sot_sequence("en")
    tinit = np.full((2, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)

    polls = []

    def abort():
        polls.append(1)
        return len(polls) > 2

    res = decode_window_beam(
        cfg, params, xa_kv, tinit, len(sot), 0, ids, sup, beam_size=3,
        max_len=len(sot) + 120, should_abort=abort, abort_chunk=8,
    )
    assert res is None
    # stopped after ~2 chunks, far short of the 120-step budget
    assert len(polls) <= 5
