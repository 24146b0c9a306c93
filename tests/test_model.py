import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.models import (
    TokenIds,
    WhisperConfig,
    apply_timestamp_rules,
    build_suppress_mask,
    config_for,
    decode_window,
    decoder_apply,
    encoder_apply,
    init_kv_cache,
    init_params,
    precompute_xa_kv,
)
from sentiric_stt_whisper_service_tpu.ops import log_mel_spectrogram, N_SAMPLES
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = config_for("test", dtype=jnp.float32)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, N_SAMPLES)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(audio)
    xa = encoder_apply(cfg, params, mel)
    return cfg, params, xa


def test_config_presets():
    lv3 = config_for("large-v3")
    assert lv3.n_mels == 128 and lv3.n_vocab == 51866 and lv3.n_audio_layer == 32
    turbo = config_for("large-v3-turbo")
    assert turbo.n_text_layer == 4 and turbo.n_audio_layer == 32
    tiny_en = config_for("tiny.en")
    assert tiny_en.n_vocab == 51864
    med = config_for("medium")
    assert med.n_audio_state == 1024 and med.n_audio_head == 16
    # distil-whisper: full-size encoder, shallow decoder.
    dl3 = config_for("distil-large-v3")
    assert dl3.n_audio_layer == 32 and dl3.n_text_layer == 2
    assert dl3.n_mels == 128 and dl3.n_vocab == 51866
    dl2 = config_for("distil-large-v2")
    assert dl2.n_mels == 80 and dl2.n_vocab == 51865 and dl2.n_text_layer == 2
    dmed = config_for("distil-medium.en")
    assert dmed.n_audio_state == 1024 and dmed.n_text_layer == 2
    assert dmed.n_vocab == 51864
    dsm = config_for("distil-small.en")
    assert dsm.n_audio_state == 768 and dsm.n_text_layer == 4


def test_encoder_shape(setup):
    cfg, params, xa = setup
    assert xa.shape == (2, cfg.n_audio_ctx, cfg.n_audio_state)
    assert np.isfinite(np.asarray(xa)).all()


def test_prefill_matches_stepwise(setup):
    """Prefill logits at each position == incremental single-step logits."""
    cfg, params, xa = setup
    xa_kv = precompute_xa_kv(cfg, params, xa)
    toks = jnp.asarray([[50258, 50259, 50359, 123, 456], [50258, 50260, 50359, 789, 12]], jnp.int32)

    kv = init_kv_cache(cfg, 2)
    full_logits, _, _ = decoder_apply(cfg, params, toks, jnp.int32(0), kv, xa_kv)

    kv = init_kv_cache(cfg, 2)
    step_logits = []
    for t in range(toks.shape[1]):
        lg, kv, _ = decoder_apply(
            cfg, params, toks[:, t : t + 1], jnp.int32(t), kv, xa_kv
        )
        step_logits.append(lg[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(step_logits), atol=2e-3, rtol=1e-3
    )


def test_decode_deterministic_and_valid(setup):
    cfg, params, xa = setup
    xa_kv = precompute_xa_kv(cfg, params, xa)
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot_seq = tok.sot_sequence("en")
    tokens = np.full((2, cfg.n_text_ctx), ids.eot, np.int32)
    tokens[:, : len(sot_seq)] = sot_seq

    res1 = decode_window(
        cfg, params, xa_kv, jnp.asarray(tokens), len(sot_seq), 0, ids, sup,
        jnp.float32(0.0), jax.random.key(1), max_len=32,
    )
    res2 = decode_window(
        cfg, params, xa_kv, jnp.asarray(tokens), len(sot_seq), 0, ids, sup,
        jnp.float32(0.0), jax.random.key(99), max_len=32,
    )
    # Greedy is RNG-independent.
    np.testing.assert_array_equal(np.asarray(res1.tokens), np.asarray(res2.tokens))

    seq = np.asarray(res1.tokens[0])[len(sot_seq) : int(res1.lengths[0])]
    # First sampled token is a timestamp within max_initial (1.0 s).
    assert seq[0] >= ids.timestamp_begin
    assert seq[0] <= ids.timestamp_begin + ids.max_initial_timestamp_index
    # Second sampled token must be text (pairing rule).
    assert seq[1] < ids.timestamp_begin
    # Timestamps are monotonic.
    ts = [t for t in seq if t >= ids.timestamp_begin]
    assert all(a <= b for a, b in zip(ts, ts[1:]))
    # Suppressed specials never sampled.
    assert not any(ids.sot <= t < ids.timestamp_begin and t != ids.eot for t in seq)
    assert np.all(np.asarray(res1.no_speech_probs) >= 0)


def test_timestamp_rules_force_pairing():
    ids = TokenIds(
        eot=50257, sot=50258, sot_prev=50361, no_speech=50362,
        no_timestamps=50363, timestamp_begin=50364, n_vocab=51865,
    )
    B, V = 1, ids.n_vocab
    # Give EOT a dominant logit so the "timestamp probability mass beats the
    # best text token" rule does not also fire (it would mask EOT too, which
    # is faithful whisper behavior).
    logits = jnp.zeros((B, V)).at[:, ids.eot].set(10.0)
    ctx = 16
    sample_begin = 3
    # After [ts, text, ts] the next must be a timestamp (or EOT).
    tokens = jnp.asarray(
        [[1, 2, 3, ids.timestamp_begin + 5, 100, ids.timestamp_begin + 10] + [0] * (ctx - 6)],
        jnp.int32,
    )
    out = apply_timestamp_rules(logits, tokens, jnp.int32(6), sample_begin, ids)
    out = np.asarray(out[0])
    assert out[100] < -1e29  # text suppressed
    assert out[ids.eot] > -1e29  # EOT allowed
    assert out[ids.timestamp_begin + 10] > -1e29  # same ts allowed (lone ts)
    assert out[ids.timestamp_begin + 9] < -1e29  # earlier ts suppressed

    # After a completed pair [ts, text, ts, ts] no timestamp allowed.
    tokens2 = jnp.asarray(
        [[1, 2, 3, ids.timestamp_begin + 5, 100, ids.timestamp_begin + 10,
          ids.timestamp_begin + 10] + [0] * (ctx - 7)],
        jnp.int32,
    )
    out2 = np.asarray(
        apply_timestamp_rules(logits, tokens2, jnp.int32(7), sample_begin, ids)[0]
    )
    assert out2[ids.timestamp_begin + 20] < -1e29
    assert out2[100] > -1e29


def test_paired_cache_matches_unpaired(setup):
    """Head-paired self cache ([L,B,H/2,C,2·hd], zero-padded M=2 queries)
    must be numerically EQUIVALENT to the unpaired layout — prefill and
    per-step logits (fp32 mini model: exact up to contraction order)."""
    from sentiric_stt_whisper_service_tpu.models.whisper import (
        decoder_apply,
        init_kv_cache,
        precompute_xa_kv,
    )

    cfg, params, xa = setup
    xa_kv = precompute_xa_kv(cfg, params, xa)
    tok = fallback_tokenizer(cfg.n_vocab)
    prompt = jnp.asarray(
        np.tile(np.asarray(tok.sot_sequence("en"), np.int32), (2, 1))
    )

    outs = {}
    for paired in (False, True):
        kv = init_kv_cache(cfg, 2, 64, paired=paired)
        logits, kv, _ = decoder_apply(
            cfg, params, prompt, jnp.int32(0), kv, xa_kv
        )
        # two single-token steps on top of the prefill
        step_logits = []
        tok_next = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        pos = prompt.shape[1]
        for _ in range(2):
            l1, kv, _ = decoder_apply(
                cfg, params, tok_next[:, None], jnp.int32(pos), kv, xa_kv
            )
            step_logits.append(np.asarray(l1[:, 0], np.float32))
            tok_next = jnp.argmax(l1[:, 0], -1).astype(jnp.int32)
            pos += 1
        outs[paired] = (np.asarray(logits, np.float32), step_logits)

    np.testing.assert_allclose(outs[False][0], outs[True][0], atol=2e-4, rtol=1e-4)
    for a, b in zip(outs[False][1], outs[True][1]):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-4)
