"""Single-process A/B: bucketed self-cache reads (c_valid lax.switch in
models/beam.py) vs full-slab reads. Cross-process RTFx varies ±10% on
axon (docs/PERF.md), so both variants compile + run in ONE process.
Two JSON lines."""

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
    init_params,
)
from sentiric_stt_whisper_service_tpu.models.beam import decode_window_beam
from sentiric_stt_whisper_service_tpu.models.whisper import (
    encoder_apply,
    precompute_xa_kv,
)
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, compute_log_mel
from sentiric_stt_whisper_service_tpu.ops.quant import (
    fuse_decoder_qkv,
    quantize_params,
)
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
B = int(os.environ.get("BENCH_BATCH", "8"))
K = int(os.environ.get("BENCH_BEAM", "5"))
KV_BITS = 8 if os.environ.get("BENCH_COMPUTE", "int4").startswith("int8") else 4
DECODE_TOKENS = int(os.environ.get("BENCH_TOKENS", "128"))


def main():
    cfg = config_for(MODEL, dtype=jnp.bfloat16)
    params = init_params(cfg, seed=0)
    params = fuse_decoder_qkv(cfg, quantize_params(cfg, params))
    tok = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = build_suppress_mask(tok, ids)
    sot = [ids.sot, ids.sot + 1 + 50, ids.transcribe, ids.no_timestamps]

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((B, N_SAMPLES)) * 0.05, jnp.float32
    )
    tinit = jnp.zeros((B, cfg.n_text_ctx), jnp.int32).at[:, : len(sot)].set(
        jnp.asarray(sot, jnp.int32)
    )
    max_len = len(sot) + DECODE_TOKENS

    def mk(cache_buckets):
        @jax.jit
        def pipeline(p, a):
            mel = compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype)
            xa_kv = precompute_xa_kv(cfg, p, encoder_apply(cfg, p, mel), KV_BITS)
            return decode_window_beam(
                cfg, p, xa_kv, tinit, len(sot), 0, ids, sup,
                beam_size=K, max_len=max_len, cache_buckets=cache_buckets,
            )
        return pipeline

    for name, cache_buckets in (("full", False), ("bucketed", True)):
        pipeline = mk(cache_buckets)
        res = pipeline(params, audio)
        _ = int(np.asarray(res.lengths).sum())  # sync incl. compile
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            res = pipeline(params, audio)
        _ = int(np.asarray(res.lengths).sum())
        dt = (time.perf_counter() - t0) / iters
        rtfx = B * 30.0 / dt
        print(json.dumps({
            "metric": f"RTFx_beam{K}_B{B}_{MODEL}_kv{KV_BITS}_{DECODE_TOKENS}tok_{name}",
            "value": round(rtfx, 1),
            "unit": "audio_sec/sec/chip",
        }), flush=True)


if __name__ == "__main__":
    main()
