"""A/B: bucketed self-slab reads (SSTW_CVALID_ROWS) in the greedy
decode_window loop at the headline bench shape (large-v3, B=56, int8
weights + int8 cross-KV + f8 self cache).

The bucket list is read from the env at TRACE time, so the two variants
are materialized as separate cached executables by giving them distinct
``max_len`` (128 vs 129 decode tokens — times are reported per step).
Interleaved timed rounds in one process (docs/PERF.md methodology).
"""

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

B = int(os.environ.get("BENCH_BATCH", "56"))
MODEL = os.environ.get("BENCH_MODEL", "large-v3")
KV_BITS = int(os.environ.get("BENCH_KV_BITS", "8"))


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

    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((B, N_SAMPLES)) * 0.05).astype(np.float32))
    mel = jax.jit(lambda a: compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype))(audio)
    xa_kv = jax.block_until_ready(encode_xa_kv_q(cfg, params, mel, KV_BITS))
    self_dtype = jnp.float8_e4m3fn

    variants = {}  # name -> (max_len, rows_env)
    variants["full"] = (len(sot) + 128, "0")
    variants["rows64"] = (len(sot) + 129, "64")
    variants["rows32"] = (len(sot) + 130, "32")

    fns = {}
    for name, (max_len, rows) in variants.items():
        os.environ["SSTW_CVALID_ROWS"] = rows
        # trace+compile now (env read at trace time)
        res = decode_window(
            cfg, params, xa_kv, tinit, len(sot), 0, ids, sup,
            jnp.float32(0.0), jax.random.key(1), max_len=max_len,
            self_dtype=self_dtype,
        )
        _ = int(np.asarray(res.lengths).sum())
        fns[name] = max_len

    iters, rounds = 4, 4
    best = {name: float("inf") for name in variants}
    for _ in range(rounds):
        for name, (max_len, rows) in variants.items():
            os.environ["SSTW_CVALID_ROWS"] = rows
            t0 = time.perf_counter()
            for _ in range(iters):
                res = decode_window(
                    cfg, params, xa_kv, tinit, len(sot), 0, ids, sup,
                    jnp.float32(0.0), jax.random.key(1), max_len=max_len,
                    self_dtype=self_dtype,
                )
            _ = int(np.asarray(res.lengths).sum())
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)

    base_steps = 128
    for name, (max_len, _) in variants.items():
        steps = max_len - len(sot)
        per_step = best[name] / steps
        print(
            json.dumps(
                {
                    "variant": name,
                    "decode_s": round(best[name], 4),
                    "ms_per_step": round(per_step * 1e3, 3),
                    "decode_s_at_128": round(per_step * base_steps, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
