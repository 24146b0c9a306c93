"""audio_ctx speed curve on the real TPU: single-window serving latency
(encode + 32-token greedy decode, B=1, int8) at encoder contexts
{384, 768, 1152, 1500}. The win for short clips comes from both the
encoder pass and the per-step cross-KV streaming scaling with F."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sentiric_stt_whisper_service_tpu.models import (
    TokenIds,
    build_suppress_mask,
    config_for,
    decode_window,
    init_params,
)
from sentiric_stt_whisper_service_tpu.models.whisper import encode_xa_kv_q
from sentiric_stt_whisper_service_tpu.ops import compute_log_mel
from sentiric_stt_whisper_service_tpu.ops.quant import (
    fuse_decoder_qkv,
    quantize_params,
)
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
TOKENS = 32


def main():
    cfg = config_for(MODEL)
    params = jax.block_until_ready(
        fuse_decoder_qkv(quantize_params(init_params(cfg, jax.random.key(0))))
    )
    tok = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")
    tinit = np.full((1, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)
    rng = np.random.default_rng(0)

    for ctx in (384, 768, 1152, 1500):
        audio = jnp.asarray(
            (rng.standard_normal((1, ctx * 320)) * 0.05).astype(np.float32)
        )

        @jax.jit
        def pipeline(p, a):
            mel = compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype)
            xa_kv = encode_xa_kv_q(cfg, p, mel, 8)
            return decode_window(
                cfg, p, xa_kv, tinit, len(sot), 0, ids, sup,
                jnp.float32(0.0), jax.random.key(1),
                max_len=len(sot) + TOKENS,
            )

        res = pipeline(params, audio)
        _ = int(np.asarray(res.lengths).sum())
        t0 = time.perf_counter()
        for _ in range(5):
            res = pipeline(params, audio)
        _ = int(np.asarray(res.lengths).sum())
        dt = (time.perf_counter() - t0) / 5
        print(json.dumps({
            "metric": f"audio_ctx_{MODEL}_f{ctx}_latency_ms",
            "value": round(dt * 1e4) / 10,
        }), flush=True)


if __name__ == "__main__":
    main()
