"""Single-process greedy batch sweep (bench.py semantics, one JSON line
per B). The B=56 optimum was swept BEFORE the float8 self-cache landed;
smaller slabs may move it. Env: BENCH_BATCHES="48,56,64,72",
BENCH_COMPUTE=int8|int4|bf16, BENCH_SELF_CACHE=auto|bf16|f8,
BENCH_MODEL."""

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
    encode_xa_kv,
    init_params,
)
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, compute_log_mel
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
BATCHES = [int(b) for b in os.environ.get("BENCH_BATCHES", "48,56,64,72").split(",")]
COMPUTE = os.environ.get("BENCH_COMPUTE", "int8").lower()
DECODE_TOKENS = 128


def main():
    global encode_xa_kv
    cfg = config_for(MODEL)
    params = init_params(cfg, jax.random.key(0))
    if COMPUTE.startswith(("int8", "int4")):
        from sentiric_stt_whisper_service_tpu.models.whisper import encode_xa_kv_q
        from sentiric_stt_whisper_service_tpu.ops.quant import (
            fuse_decoder_qkv,
            quantize_params,
        )

        params = jax.block_until_ready(fuse_decoder_qkv(quantize_params(params)))
        kv_bits = 4 if COMPUTE.startswith("int4") else 8
        encode_xa_kv = lambda cfg, p, mel: encode_xa_kv_q(cfg, p, mel, kv_bits)
    sc = os.environ.get("BENCH_SELF_CACHE", "auto").lower()
    if sc in ("f8", "fp8", "float8") or (
        sc == "auto" and COMPUTE.startswith(("int8", "int4"))
    ):
        self_dtype = jnp.float8_e4m3fn
    else:
        self_dtype = None

    tok = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")
    max_len = len(sot) + DECODE_TOKENS
    rng = np.random.default_rng(0)

    for B in BATCHES:
        tinit = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
        tinit[:, : len(sot)] = sot
        tinit = jnp.asarray(tinit)
        audio = jnp.asarray(
            (rng.standard_normal((B, N_SAMPLES)) * 0.05).astype(np.float32)
        )

        @jax.jit
        def pipeline(p, audio_batch, tinit=tinit):
            mel = compute_log_mel(audio_batch, n_mels=cfg.n_mels, dtype=cfg.dtype)
            xa_kv = encode_xa_kv(cfg, p, mel)
            return decode_window(
                cfg, p, xa_kv, tinit, len(sot), 0, ids, sup,
                jnp.float32(0.0), jax.random.key(1), max_len=max_len,
                self_dtype=self_dtype,
            )

        for _ in range(3):
            res = pipeline(params, audio)
            _ = int(np.asarray(res.lengths).sum())
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            res = pipeline(params, audio)
        _ = int(np.asarray(res.lengths).sum())
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "metric": f"RTFx_offline_batch{B}_{MODEL}_greedy_{COMPUTE}",
            "value": round(B * 30.0 / dt, 1),
            "unit": "audio_sec/sec/chip",
        }), flush=True)


if __name__ == "__main__":
    main()
