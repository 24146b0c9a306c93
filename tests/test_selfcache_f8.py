"""float8_e4m3fn self-KV-cache storage (engine ``self_cache`` policy).

The self-attention slab is pure decode-step HBM traffic; storing it in
f8 halves the stream (measured on chip, tools/bench_selfcache_dtype.py)
at ~0.4% rms rounding — the same error class as the int8 cross slab, so
the quantized compute types (reference compute_type=int8/int4,
/root/reference/src/config.h:45) opt in by default.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.config import Settings
from sentiric_stt_whisper_service_tpu.models import (
    TokenIds,
    build_suppress_mask,
    config_for,
    decode_window,
    init_params,
)
from sentiric_stt_whisper_service_tpu.models.beam import decode_window_beam
from sentiric_stt_whisper_service_tpu.models.whisper import (
    decoder_apply,
    encoder_apply,
    init_kv_cache,
    precompute_xa_kv,
)
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, compute_log_mel
from sentiric_stt_whisper_service_tpu.runtime.engine import SttEngine
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

CFG = config_for("test")
F8 = jnp.float8_e4m3fn


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, N_SAMPLES)) * 0.05).astype(np.float32)
    mel = compute_log_mel(audio, n_mels=CFG.n_mels, dtype=CFG.dtype)
    xa = encoder_apply(CFG, params, mel)
    xa_kv = precompute_xa_kv(CFG, params, xa)
    tok = fallback_tokenizer(CFG.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(CFG.n_vocab, ids, tok.non_speech_tokens))
    return params, xa_kv, tok, ids, sup


def test_init_kv_cache_dtype_override():
    kv = init_kv_cache(CFG, 2, 64, dtype=F8)
    assert kv["k"].dtype == F8 and kv["v"].dtype == F8
    kv = init_kv_cache(CFG, 2, 64)
    assert kv["k"].dtype == CFG.dtype


def test_decoder_logits_close_f8_cache(setup):
    params, xa_kv, tok, ids, sup = setup
    tokens = jnp.asarray(
        np.tile(np.asarray(tok.sot_sequence("en"), np.int32), (2, 1))
    )
    l_ref, _, _ = decoder_apply(
        CFG, params, tokens, jnp.int32(0), init_kv_cache(CFG, 2, 64), xa_kv
    )
    l_f8, kv_f8, _ = decoder_apply(
        CFG, params, tokens, jnp.int32(0),
        init_kv_cache(CFG, 2, 64, dtype=F8), xa_kv,
    )
    assert kv_f8["k"].dtype == F8  # writes keep the slab dtype
    ref = np.asarray(l_ref, np.float32)
    f8 = np.asarray(l_f8, np.float32)
    assert np.abs(ref - f8).max() / (np.abs(ref).max() + 1e-9) < 0.05


def test_greedy_decode_agreement_f8(setup):
    params, xa_kv, tok, ids, sup = setup
    sot = tok.sot_sequence("en")
    tinit = np.full((2, CFG.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)
    kw = dict(max_len=len(sot) + 16)
    r_ref = decode_window(
        CFG, params, xa_kv, tinit, len(sot), 0, ids, sup,
        jnp.float32(0.0), jax.random.key(1), **kw,
    )
    r_f8 = decode_window(
        CFG, params, xa_kv, tinit, len(sot), 0, ids, sup,
        jnp.float32(0.0), jax.random.key(1), self_dtype=F8, **kw,
    )
    a = np.asarray(r_ref.tokens[:, len(sot) : len(sot) + 16])
    b = np.asarray(r_f8.tokens[:, len(sot) : len(sot) + 16])
    assert (a == b).mean() >= 0.9  # f8 may flip near-tie argmaxes
    assert np.isfinite(np.asarray(r_f8.avg_logprobs)).all()


def test_beam_decode_agreement_f8(setup):
    params, xa_kv, tok, ids, sup = setup
    sot = tok.sot_sequence("en")
    tinit = np.full((2, CFG.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)
    kw = dict(beam_size=3, max_len=len(sot) + 12)
    r_ref = decode_window_beam(
        CFG, params, xa_kv, tinit, len(sot), 0, ids, sup, **kw
    )
    r_f8 = decode_window_beam(
        CFG, params, xa_kv, tinit, len(sot), 0, ids, sup, self_dtype=F8, **kw
    )
    a = np.asarray(r_ref.tokens[:, len(sot) : len(sot) + 12])
    b = np.asarray(r_f8.tokens[:, len(sot) : len(sot) + 12])
    assert (a == b).mean() >= 0.75  # beam rank flips compound
    assert np.isfinite(np.asarray(r_f8.avg_logprobs)).all()


def test_engine_self_cache_policy():
    # auto: quantized compute types store f8, full-precision keeps bf16
    s = Settings(enable_vad=False, parallel_requests=1, compute_type="int8")
    eng = SttEngine(s, model_name="test", random_init=True)
    assert eng.self_dtype == F8
    s = Settings(enable_vad=False, parallel_requests=1, compute_type="float16")
    eng = SttEngine(s, model_name="test", random_init=True)
    assert eng.self_dtype is None
    # explicit overrides win over auto
    s = Settings(
        enable_vad=False, parallel_requests=1, compute_type="int8",
        self_cache="bf16",
    )
    eng = SttEngine(s, model_name="test", random_init=True)
    assert eng.self_dtype is None
    s = Settings(
        enable_vad=False, parallel_requests=1, compute_type="float16",
        self_cache="f8",
    )
    eng = SttEngine(s, model_name="test", random_init=True)
    assert eng.self_dtype == F8


def test_engine_int8_f8_end_to_end():
    """The default serving config (int8 + auto f8 self-cache) transcribes
    through the continuous batcher without error."""
    s = Settings(
        enable_vad=False, beam_size=1, parallel_requests=2,
        compute_type="int8", temperature=0.0,
    )
    eng = SttEngine(s, model_name="test", random_init=True)
    try:
        assert eng._get_batcher()._state.kv["k"].dtype == F8
        audio = (
            np.random.default_rng(3).standard_normal(16000) * 0.05
        ).astype(np.float32)
        from sentiric_stt_whisper_service_tpu.runtime.engine import (
            RequestOptions,
        )

        res = eng.transcribe(audio, 16000, RequestOptions(language="en"))
        assert isinstance(res, list)
    finally:
        eng.shutdown()
