"""Numerical parity vs HuggingFace transformers' Whisper implementation.

Instantiates a small random-init torch WhisperForConditionalGeneration
(no downloads), maps its weights through our HF loader, and checks that
the mel frontend, encoder, and teacher-forced decoder logits agree. This
is the external oracle for the from-scratch model stack (SURVEY.md §4
"numerical parity tests for mel/encoder/decoder vs. reference outputs").
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from sentiric_stt_whisper_service_tpu.checkpoint.safetensors_io import (
    params_from_hf_state,
)
from sentiric_stt_whisper_service_tpu.models import encoder_apply
from sentiric_stt_whisper_service_tpu.models.whisper import (
    decoder_apply,
    init_kv_cache,
    precompute_xa_kv,
)
from sentiric_stt_whisper_service_tpu.ops import log_mel_spectrogram


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.WhisperConfig(
        vocab_size=51865,
        num_mel_bins=80,
        d_model=128,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=512,
        decoder_ffn_dim=512,
        max_source_positions=1500,
        max_target_positions=448,
    )
    model = transformers.WhisperForConditionalGeneration(cfg).eval()
    return model


@pytest.fixture(scope="module")
def mapped(hf_model):
    state = {
        k: v.detach().numpy() for k, v in hf_model.model.state_dict().items()
    }
    cfg, params = params_from_hf_state(state, dtype=jnp.float32)
    assert cfg.n_audio_head == 2 and cfg.n_text_head == 2
    return cfg, params


def test_mel_matches_hf_feature_extractor(rng):
    fe = transformers.WhisperFeatureExtractor()
    audio = (rng.standard_normal(480000) * 0.1).astype(np.float32)
    want = fe(audio, sampling_rate=16000, return_tensors="np").input_features[0].T
    got = np.asarray(log_mel_spectrogram(audio))
    assert got.shape == want.shape == (3000, 80)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_encoder_matches_hf(hf_model, mapped, rng):
    cfg, params = mapped
    audio = (rng.standard_normal(480000) * 0.1).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(audio))  # [3000, 80]
    with torch.no_grad():
        want = (
            hf_model.model.encoder(
                torch.from_numpy(mel.T[None]).float()
            ).last_hidden_state.numpy()[0]
        )
    got = np.asarray(encoder_apply(cfg, params, jnp.asarray(mel[None])))[0]
    assert got.shape == want.shape == (1500, 128)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_decoder_logits_match_hf(hf_model, mapped, rng):
    cfg, params = mapped
    audio = (rng.standard_normal(480000) * 0.1).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(audio))
    dec_ids = np.array([[50258, 50259, 50359, 123, 4567, 891]], np.int64)
    with torch.no_grad():
        want = hf_model(
            input_features=torch.from_numpy(mel.T[None]).float(),
            decoder_input_ids=torch.from_numpy(dec_ids),
        ).logits.numpy()[0]

    xa = encoder_apply(cfg, params, jnp.asarray(mel[None]))
    xa_kv = precompute_xa_kv(cfg, params, xa)
    kv = init_kv_cache(cfg, 1)
    logits, _, _ = decoder_apply(
        cfg, params, jnp.asarray(dec_ids, jnp.int32), jnp.int32(0), kv, xa_kv
    )
    got = np.asarray(logits)[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
    # argmax agreement at every position (what decoding actually consumes)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_stepwise_decode_matches_hf(hf_model, mapped, rng):
    """Teacher-forced token-by-token decode through the FUSED single-token
    step (decoder_apply T=1 → decoder_step: unrolled layers, KF cross slab,
    position-major cache appends) against HF's full-sequence logits."""
    cfg, params = mapped
    audio = (rng.standard_normal(480000) * 0.1).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(audio))
    dec_ids = np.array([[50258, 50259, 50359, 123, 4567, 891]], np.int64)
    with torch.no_grad():
        want = hf_model(
            input_features=torch.from_numpy(mel.T[None]).float(),
            decoder_input_ids=torch.from_numpy(dec_ids),
        ).logits.numpy()[0]

    xa = encoder_apply(cfg, params, jnp.asarray(mel[None]))
    xa_kv = precompute_xa_kv(cfg, params, xa)
    kv = init_kv_cache(cfg, 1, 64)
    got = []
    for i in range(dec_ids.shape[1]):
        logits, kv, _ = decoder_apply(
            cfg, params, jnp.asarray(dec_ids[:, i : i + 1], jnp.int32),
            jnp.int32(i), kv, xa_kv,
        )
        got.append(np.asarray(logits)[0, 0])
    got = np.stack(got)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_greedy_decode_loop_token_exact_vs_hf(hf_model, mapped, rng):
    """Token-exact greedy DECODE LOOP equivalence (BASELINE.md WER-parity
    proxy for zero-egress CI): our fully-on-device ``decode_window`` (static
    suppression + begin-suppression + whisper timestamp rules + argmax,
    sampling.py) against an independent torch greedy loop driven by HF's
    own logits processors (SuppressTokens / SuppressTokensAtBegin /
    WhisperTimeStamp — transformers' port of openai-whisper's rules, the
    same semantics whisper.cpp implements for the reference at
    /root/reference/src/stt_engine.cpp:245). Every sampled token must
    match, with rule-feedback through the autoregressive loop."""
    from transformers import GenerationConfig
    from transformers.generation.logits_process import (
        SuppressTokensAtBeginLogitsProcessor,
        SuppressTokensLogitsProcessor,
        WhisperTimeStampLogitsProcessor,
    )

    from sentiric_stt_whisper_service_tpu.models import (
        TokenIds,
        build_suppress_mask,
        decode_window,
        encode_xa_kv,
    )
    from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

    cfg, params = mapped
    tok = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup_np = build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens)
    suppress_list = np.where(np.isneginf(sup_np))[0].tolist()

    audio = (rng.standard_normal(480000) * 0.1).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(audio))
    sot = list(tok.sot_sequence("en"))
    sample_begin = len(sot)
    max_new = 24  # random weights rarely emit EOT; bound the loop

    # --- ours: one jitted decode_window, greedy (temperature 0) ---
    tinit = np.full((1, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[0, :sample_begin] = sot
    xa_kv = encode_xa_kv(cfg, params, jnp.asarray(mel[None]))
    res = decode_window(
        cfg, params, xa_kv, jnp.asarray(tinit), sample_begin, 0, ids,
        jnp.asarray(sup_np), jnp.float32(0.0), jax.random.key(0),
        max_len=sample_begin + max_new,
    )
    end = int(res.lengths[0])  # includes EOT if emitted
    ours = [int(t) for t in np.asarray(res.tokens)[0][sample_begin:end]]
    if ours and ours[-1] == ids.eot:
        ours = ours[:-1]

    # --- theirs: torch greedy loop + HF logits processors ---
    gen_cfg = GenerationConfig(
        eos_token_id=ids.eot,
        no_timestamps_token_id=ids.no_timestamps,
        max_initial_timestamp_index=ids.max_initial_timestamp_index,
    )
    blank = tok.encode(" ")[0]
    procs = [
        SuppressTokensLogitsProcessor(suppress_list),
        SuppressTokensAtBeginLogitsProcessor([blank, ids.eot], sample_begin),
        WhisperTimeStampLogitsProcessor(gen_cfg, begin_index=sample_begin),
    ]
    seq = list(sot)
    theirs = []
    with torch.no_grad():
        enc = hf_model.model.encoder(
            torch.from_numpy(mel.T[None]).float()
        ).last_hidden_state
        for _ in range(max_new):
            dec_in = torch.tensor([seq])
            logits = hf_model(
                encoder_outputs=(enc,), decoder_input_ids=dec_in
            ).logits[:, -1].float()
            for p in procs:
                logits = p(dec_in, logits)
            nxt = int(logits.argmax(-1))
            if nxt == ids.eot:
                break
            theirs.append(nxt)
            seq.append(nxt)

    # EOT and blank are begin-suppressed, so a correct loop emits ≥1 token —
    # guards against a trivially-empty comparison.
    assert ours
    assert ours == theirs
