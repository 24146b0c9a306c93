"""Weight-only int8 quantization (ops/quant.py; reference compute_type=int8,
/root/reference/src/config.h:45)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.models import (
    TokenIds,
    build_suppress_mask,
    config_for,
    decode_window,
    init_params,
)
from sentiric_stt_whisper_service_tpu.models.whisper import (
    dense,
    decoder_apply,
    encoder_apply,
    init_kv_cache,
    precompute_xa_kv,
    xa_batch_size,
)
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, compute_log_mel
from sentiric_stt_whisper_service_tpu.ops.quant import (
    dequantize_weight,
    is_quantized,
    quantize_params,
    quantize_weight,
    quantize_xa_kv,
)
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

CFG = config_for("test")


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.key(0))
    qparams = quantize_params(params)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, N_SAMPLES)) * 0.05).astype(np.float32)
    mel = compute_log_mel(audio, n_mels=CFG.n_mels, dtype=CFG.dtype)
    xa = encoder_apply(CFG, params, mel)
    xa_kv = precompute_xa_kv(CFG, params, xa)
    return params, qparams, xa_kv, quantize_xa_kv(xa_kv)


def test_quantize_roundtrip_error_bound():
    w = jax.random.normal(jax.random.key(1), (64, 96), jnp.float32)
    w_q, scale = quantize_weight(w, axis=-2)
    assert w_q.dtype == jnp.int8
    assert scale.shape == (96,)
    back = dequantize_weight(w_q, scale, axis=-2)
    # symmetric per-channel: error ≤ scale/2 per element
    assert float(jnp.max(jnp.abs(back - w) / scale[None, :])) <= 0.5 + 1e-6


def test_dense_int8_close_to_fp():
    key = jax.random.key(2)
    w = jax.random.normal(key, (64, 64), jnp.float32)
    b = jax.random.normal(jax.random.key(3), (64,), jnp.float32)
    x = jax.random.normal(jax.random.key(4), (8, 64), jnp.bfloat16)
    y_ref = np.asarray(dense(x, {"w": w.astype(jnp.bfloat16), "b": b.astype(jnp.bfloat16)}), np.float32)
    w_q, scale = quantize_weight(w)
    y_q = np.asarray(
        dense(x, {"w_q": w_q, "scale": scale, "b": b.astype(jnp.bfloat16)}),
        np.float32,
    )
    denom = np.abs(y_ref).max() + 1e-9
    assert np.abs(y_q - y_ref).max() / denom < 0.03


def test_quantize_params_structure(setup):
    params, qparams, _, _ = setup
    assert is_quantized(qparams) and not is_quantized(params)
    dec = qparams["decoder"]
    assert "tok_emb" not in dec and dec["tok_emb_q"].dtype == jnp.int8
    blk = dec["blocks"]
    assert blk["attn"]["q"]["w_q"].dtype == jnp.int8
    assert "w" not in blk["attn"]["q"]
    # layer norms untouched
    assert "g" in blk["attn_ln"]
    # stacked leading layer axis preserved
    assert blk["mlp_1"]["w_q"].shape[0] == CFG.n_text_layer
    assert blk["mlp_1"]["scale"].shape == (CFG.n_text_layer, 4 * CFG.n_text_state)


def test_quantized_xa_kv_format(setup):
    _, _, xa_kv, xa_q = setup
    assert xa_q["k_q"].dtype == jnp.int8
    # KF layout [L,B,H,hd,F]: per-position scales drop the hd axis.
    assert xa_q["k_scale"].shape == xa_kv["k"].shape[:3] + xa_kv["k"].shape[4:]
    assert xa_batch_size(xa_q) == xa_batch_size(xa_kv) == 2


def test_decoder_logits_close(setup):
    params, qparams, xa_kv, xa_q = setup
    tok = fallback_tokenizer(CFG.n_vocab)
    tokens = jnp.asarray(np.tile(np.asarray(tok.sot_sequence("en"), np.int32), (2, 1)))
    l_ref, _, _ = decoder_apply(
        CFG, params, tokens, jnp.int32(0), init_kv_cache(CFG, 2, 64), xa_kv
    )
    l_q, _, _ = decoder_apply(
        CFG, qparams, tokens, jnp.int32(0), init_kv_cache(CFG, 2, 64), xa_q
    )
    ref = np.asarray(l_ref, np.float32)
    q = np.asarray(l_q, np.float32)
    assert np.abs(ref - q).max() / (np.abs(ref).max() + 1e-9) < 0.05


def test_greedy_decode_agreement(setup):
    params, qparams, xa_kv, xa_q = setup
    tok = fallback_tokenizer(CFG.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(CFG.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")
    tinit = np.full((2, CFG.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)
    kw = dict(max_len=len(sot) + 16)
    r_ref = decode_window(
        CFG, params, xa_kv, tinit, len(sot), 0, ids, sup,
        jnp.float32(0.0), jax.random.key(1), **kw,
    )
    r_q = decode_window(
        CFG, qparams, xa_q, tinit, len(sot), 0, ids, sup,
        jnp.float32(0.0), jax.random.key(1), **kw,
    )
    a = np.asarray(r_ref.tokens[:, len(sot) : len(sot) + 16])
    b = np.asarray(r_q.tokens[:, len(sot) : len(sot) + 16])
    assert (a == b).mean() >= 0.9  # int8 may flip near-tie argmaxes


def test_fused_qkv_matches_unfused(setup):
    from sentiric_stt_whisper_service_tpu.ops.quant import fuse_decoder_qkv

    params, qparams, xa_kv, xa_q = setup
    tok = fallback_tokenizer(CFG.n_vocab)
    tokens = jnp.asarray(np.tile(np.asarray(tok.sot_sequence("en"), np.int32), (2, 1)))
    for p, xa in ((params, xa_kv), (qparams, xa_q)):
        fused = fuse_decoder_qkv(p)
        assert "qkv" in fused["decoder"]["blocks"]["attn"]
        l_ref, _, _ = decoder_apply(
            CFG, p, tokens, jnp.int32(0), init_kv_cache(CFG, 2, 64), xa
        )
        l_f, _, _ = decoder_apply(
            CFG, fused, tokens, jnp.int32(0), init_kv_cache(CFG, 2, 64), xa
        )
        np.testing.assert_allclose(
            np.asarray(l_f, np.float32), np.asarray(l_ref, np.float32),
            atol=2e-2, rtol=1e-2,
        )


def test_detect_language_quantized(setup):
    from sentiric_stt_whisper_service_tpu.models.sampling import detect_language

    _, qparams, _, xa_q = setup
    tok = fallback_tokenizer(CFG.n_vocab)
    sp = tok.special
    probs = detect_language(
        CFG, qparams, xa_q, sp.sot, sp.language_begin, sp.num_languages
    )
    p = np.asarray(probs)
    assert p.shape == (2, sp.num_languages)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-3)


def test_alignment_scores_quantized(setup):
    from sentiric_stt_whisper_service_tpu.models.timestamps import alignment_scores

    _, qparams, _, xa_q = setup
    tok = fallback_tokenizer(CFG.n_vocab)
    tokens = jnp.asarray(
        np.tile(np.asarray(tok.sot_sequence("en") + [300, 400], np.int64), (2, 1))
    )
    s = np.asarray(alignment_scores(CFG, qparams, xa_q, tokens))
    assert s.shape == (2, tokens.shape[1], CFG.n_audio_ctx)
    assert np.isfinite(s).all()


def test_engine_int8_end_to_end():
    from sentiric_stt_whisper_service_tpu.config import Settings
    from sentiric_stt_whisper_service_tpu.runtime.engine import (
        RequestOptions,
        SttEngine,
    )

    s = Settings(enable_vad=False, beam_size=1, parallel_requests=1,
                 compute_type="int8")
    eng = SttEngine(s, model_name="test", random_init=True)
    assert eng.quantized and is_quantized(eng.params)
    t = np.arange(16000, dtype=np.float32) / 16000
    clip = (0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    res = eng.transcribe(clip, 16000, RequestOptions(language="en"))
    assert isinstance(res, list)


def test_batcher_quantized_matches_decode_window(setup):
    from sentiric_stt_whisper_service_tpu.runtime.batcher import ContinuousBatcher

    params, qparams, xa_kv, xa_q = setup
    tok = fallback_tokenizer(CFG.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(CFG.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")

    b = ContinuousBatcher(CFG, qparams, ids, sup, max_slots=2, cache_len=64,
                          quantize_kv=True)
    try:
        xa1 = {k: v[:, :1] for k, v in xa_q.items()}
        fut = b.submit_encoded(xa1, list(sot), 0, max_tokens=16)
        out = fut.result(timeout=300)
    finally:
        b.shutdown()

    tinit = np.full((1, CFG.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    r_q = decode_window(
        CFG, qparams, {k: v[:, :1] for k, v in xa_q.items()},
        jnp.asarray(tinit), len(sot), 0, ids, sup,
        jnp.float32(0.0), jax.random.key(1), max_len=len(sot) + 16,
    )
    want = np.asarray(r_q.tokens[0, len(sot) : int(r_q.lengths[0])])
    want = want[want != ids.eot][:16]
    got = np.asarray(out["tokens"])[:16]
    n = min(len(want), len(got))
    assert n > 0 and (want[:n] == got[:n]).all()


# ---------------------------------------------------------------------------
# int4 cross-KV (packed carrier; compute_type=int4)
# ---------------------------------------------------------------------------


def test_pack_unpack_nibbles_roundtrip():
    from sentiric_stt_whisper_service_tpu.ops.quant import (
        _pack_nibbles,
        _unpack_nibbles,
    )

    rng = np.random.default_rng(5)
    vals = rng.integers(-7, 8, size=(3, 4, 16), dtype=np.int8)

    @jax.jit
    def roundtrip(q):
        return _unpack_nibbles(_pack_nibbles(q)).astype(jnp.int8)

    packed = np.asarray(jax.jit(_pack_nibbles)(jnp.asarray(vals)))
    assert packed.shape == (3, 4, 8) and packed.dtype == np.int8
    back = np.asarray(roundtrip(jnp.asarray(vals)))
    np.testing.assert_array_equal(back, vals)


def test_quantize_xa_kv_int4_carrier_format(setup):
    xa_kv, xa_q4 = setup[2], quantize_xa_kv(setup[2], 4)
    L, B, H, hd, F = xa_kv["k"].shape
    assert xa_q4["k_p"].dtype == jnp.int8
    assert xa_q4["k_p"].shape == (L, B, H, hd, F // 2)
    assert xa_q4["k_scale"].shape == (L, B, H, F)
    assert xa_batch_size(xa_q4) == B
    # eager ops on the carrier (slot slicing in the engine) must work
    sel = {k: v[:, :1] for k, v in xa_q4.items()}
    assert sel["k_p"].shape == (L, 1, H, hd, F // 2)


def test_unpack_xa_kv_matches_direct_int4(setup):
    """Packed carrier → unpack == direct int4 quantization values."""
    from sentiric_stt_whisper_service_tpu.ops.quant import unpack_xa_kv

    xa_kv = setup[2]

    @jax.jit
    def both(xa):
        direct_k = jnp.clip(
            jnp.round(
                xa["k"].astype(jnp.float32)
                / jnp.maximum(
                    jnp.max(jnp.abs(xa["k"].astype(jnp.float32)), axis=-2) / 7.0,
                    1e-12,
                )[..., None, :]
            ),
            -7, 7,
        ).astype(jnp.int8)
        unpacked = unpack_xa_kv(quantize_xa_kv(xa, 4))
        return direct_k, unpacked["k_q"].astype(jnp.int8)

    direct, unpacked = jax.tree.map(np.asarray, both(xa_kv))
    np.testing.assert_array_equal(direct, unpacked)


def test_decoder_logits_close_int4(setup):
    params, qparams, xa_kv, _ = setup
    xa_q4 = quantize_xa_kv(xa_kv, 4)
    tok = fallback_tokenizer(CFG.n_vocab)
    tokens = jnp.asarray(np.tile(np.asarray(tok.sot_sequence("en"), np.int32), (2, 1)))
    l_ref, _, _ = decoder_apply(
        CFG, params, tokens, jnp.int32(0), init_kv_cache(CFG, 2, 64), xa_kv
    )
    l_q, _, _ = decoder_apply(
        CFG, qparams, tokens, jnp.int32(0), init_kv_cache(CFG, 2, 64), xa_q4
    )
    ref = np.asarray(l_ref, np.float32)
    q = np.asarray(l_q, np.float32)
    # int4 KV + int8 weights: looser bound than the int8 test (0.05)
    assert np.abs(ref - q).max() / (np.abs(ref).max() + 1e-9) < 0.12


def test_greedy_decode_agreement_int4(setup):
    params, qparams, xa_kv, _ = setup
    xa_q4 = quantize_xa_kv(xa_kv, 4)
    tok = fallback_tokenizer(CFG.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(CFG.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")
    tinit = np.full((2, CFG.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)
    kw = dict(max_len=len(sot) + 16)
    r_ref = decode_window(
        CFG, params, xa_kv, tinit, len(sot), 0, ids, sup,
        jnp.float32(0.0), jax.random.key(1), **kw,
    )
    r_q = decode_window(
        CFG, qparams, xa_q4, tinit, len(sot), 0, ids, sup,
        jnp.float32(0.0), jax.random.key(1), **kw,
    )
    a = np.asarray(r_ref.tokens[:, len(sot) : len(sot) + 16])
    b = np.asarray(r_q.tokens[:, len(sot) : len(sot) + 16])
    assert (a == b).mean() >= 0.8  # int4 flips more near-ties than int8


def test_beam_and_alignment_accept_int4(setup):
    from sentiric_stt_whisper_service_tpu.models.beam import decode_window_beam
    from sentiric_stt_whisper_service_tpu.models.timestamps import alignment_scores

    _, qparams, xa_kv, _ = setup
    xa_q4 = quantize_xa_kv(xa_kv, 4)
    tok = fallback_tokenizer(CFG.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(CFG.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")
    tinit = np.full((2, CFG.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    r = decode_window_beam(
        CFG, qparams, xa_q4, jnp.asarray(tinit), len(sot), 0, ids, sup,
        beam_size=2, max_len=len(sot) + 8,
    )
    assert np.asarray(r.lengths).min() > len(sot)
    tokens = jnp.asarray(
        np.tile(np.asarray(tok.sot_sequence("en") + [300, 400], np.int64), (2, 1))
    )
    s = np.asarray(alignment_scores(CFG, qparams, xa_q4, tokens))
    assert np.isfinite(s).all()


def test_engine_int4_end_to_end():
    from sentiric_stt_whisper_service_tpu.config import Settings
    from sentiric_stt_whisper_service_tpu.runtime.engine import (
        RequestOptions,
        SttEngine,
    )

    # parallel_requests=2 routes greedy decodes through the continuous
    # batcher — the int4 packed carrier must survive the batcher's slot
    # state (round-1 regression: KeyError('k_q') hung the request).
    s = Settings(enable_vad=False, beam_size=1, parallel_requests=2,
                 compute_type="int4")
    eng = SttEngine(s, model_name="test", random_init=True)
    try:
        assert eng.quantized and eng.xa_bits == 4 and is_quantized(eng.params)
        t = np.arange(16000, dtype=np.float32) / 16000
        clip = (0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        res = eng.transcribe(clip, 16000, RequestOptions(language="en"))
        assert isinstance(res, list)
    finally:
        eng.shutdown()


def test_batcher_int4_carrier_matches_oneshot(setup):
    """A packed-int4 carrier submitted to a kv_bits=4 pool decodes to the
    same tokens as the one-shot int4 decode_window path (the unpacked
    int8 container holds the identical [-7,7] values + scales)."""
    from sentiric_stt_whisper_service_tpu.ops.quant import quantize_xa_kv
    from sentiric_stt_whisper_service_tpu.runtime.batcher import (
        ContinuousBatcher,
    )

    params, qparams, xa_kv, xa_q = setup
    tok = fallback_tokenizer(CFG.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(CFG.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")
    xa_p = quantize_xa_kv({k: v[:, :1] for k, v in xa_kv.items()}, bits=4)

    b = ContinuousBatcher(CFG, qparams, ids, sup, max_slots=2, cache_len=64,
                          kv_bits=4)
    try:
        fut = b.submit_encoded(xa_p, list(sot), 0, max_tokens=16)
        out = fut.result(timeout=300)
    finally:
        b.shutdown()

    tinit = np.full((1, CFG.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    want_res = decode_window(
        CFG, qparams, xa_p, jnp.asarray(tinit), len(sot), 0, ids, sup,
        jnp.float32(0.0), jax.random.key(1), max_len=len(sot) + 16,
    )
    want = np.asarray(want_res.tokens[0, len(sot) : int(want_res.lengths[0])])
    want = want[want != ids.eot][:16]
    got = np.asarray(out["tokens"])[:16]
    n = min(len(want), len(got))
    assert n > 0 and (want[:n] == got[:n]).all()


def test_poisoned_insert_rejects_future(setup):
    """A malformed submission must reject its future with the error (not
    hang), and the pool must keep serving afterwards (round-1 regression:
    admission failures orphaned the future forever)."""
    from sentiric_stt_whisper_service_tpu.runtime.batcher import (
        ContinuousBatcher,
    )

    params, qparams, xa_kv, xa_q = setup
    tok = fallback_tokenizer(CFG.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(CFG.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")

    b = ContinuousBatcher(CFG, qparams, ids, sup, max_slots=2, cache_len=64,
                          kv_bits=8)
    try:
        # bf16 {"k","v"} into a quantized pool is fine (auto-quantized);
        # a dict with garbage keys is not representable → must reject.
        bad = {"bogus": jnp.zeros((1,))}
        fut = b.submit_encoded(bad, list(sot), 0, max_tokens=8)
        with pytest.raises(Exception):
            fut.result(timeout=60)
        # Pool still alive: a good request completes.
        xa1 = {k: v[:, :1] for k, v in xa_q.items()}
        out = b.submit_encoded(xa1, list(sot), 0, max_tokens=8).result(timeout=300)
        assert len(out["tokens"]) >= 0
    finally:
        b.shutdown()
