"""Interleaved A/B of compute types in ONE process — chip state, tunnel,
and compile cache are shared, so the comparison is clean (process-to-
process RTFx varies ±10% on axon). Alternates full-pipeline runs:
int8 / int4 / int8 / int4 ... and prints per-mode means."""

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
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, compute_log_mel
from sentiric_stt_whisper_service_tpu.ops.quant import (
    fuse_decoder_qkv,
    quantize_params,
)
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
B = int(os.environ.get("BENCH_BATCH", "24"))
ROUNDS = int(os.environ.get("BENCH_ROUNDS", "4"))
DECODE_TOKENS = 128


def main():
    cfg = config_for(MODEL)
    params = jax.block_until_ready(
        fuse_decoder_qkv(quantize_params(init_params(cfg, jax.random.key(0))))
    )
    tok = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")
    tinit = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)
    max_len = len(sot) + DECODE_TOKENS
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((B, N_SAMPLES)) * 0.05).astype(np.float32))

    # Self-KV slab dtype mirrors bench.py's auto policy (f8 for the
    # quantized compute types) so the A/B decision maps 1:1 onto the
    # headline configuration; BENCH_SELF_CACHE=bf16 overrides.
    sc = os.environ.get("BENCH_SELF_CACHE", "auto").lower()
    self_dtype = None if sc in ("bf16", "bfloat16") else jnp.float8_e4m3fn

    def make(bits):
        @jax.jit
        def pipeline(p, a):
            mel = compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype)
            xa_kv = encode_xa_kv_q(cfg, p, mel, bits)
            return decode_window(
                cfg, p, xa_kv, tinit, len(sot), 0, ids, sup,
                jnp.float32(0.0), jax.random.key(1), max_len=max_len,
                self_dtype=self_dtype,
            )
        return pipeline

    fns = {"int8": make(8), "int4": make(4)}
    for f in fns.values():  # compile + warm
        _ = int(np.asarray(f(params, audio).lengths).sum())

    times: dict = {m: [] for m in fns}
    for _ in range(ROUNDS):
        for mode, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(3):
                res = f(params, audio)
            _ = int(np.asarray(res.lengths).sum())
            times[mode].append((time.perf_counter() - t0) / 3)

    for mode, ts in times.items():
        rtfx = [B * 30.0 / t for t in ts]
        print(json.dumps({
            "metric": f"ab_{MODEL}_b{B}_{mode}_rtfx",
            "value": round(float(np.mean(rtfx)), 1),
            "all": [round(r, 1) for r in rtfx],
        }), flush=True)


if __name__ == "__main__":
    main()
