"""Split the production bench.py pipeline into timed stages on the real TPU:

  encode_s   : mel + encoder + (quantized) cross-KV precompute
  prefill_s  : + prompt prefill and first-token machinery (1 decode step)
  full_s     : + the remaining decode steps (bench.py's 128-token budget)

The per-step decode cost is (full - prefill) / (DECODE_TOKENS - 1); the
fixed (layer-count-independent) share of it can be read off by running with
BENCH_MODEL=large-v3 vs large-v3-turbo. All timings use the steady-state
queue-N-iterations-sync-once method (docs/PERF.md "methodology quirks").
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

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
B = int(os.environ.get("BENCH_BATCH", "24"))
DECODE_TOKENS = int(os.environ.get("BENCH_TOKENS", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))
# Mirror bench.py's auto policy: f8 self-KV slab for quantized compute.
_SC = os.environ.get("BENCH_SELF_CACHE", "auto").lower()
SELF_DTYPE = (
    jnp.float8_e4m3fn if _SC in ("auto", "f8", "fp8", "float8") else None
)


def timeit(fn, sync, iters=ITERS):
    out = fn()
    sync(out)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


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

    @jax.jit
    def encode_only(p, a):
        mel = compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype)
        return encode_xa_kv_q(cfg, p, mel)

    def pipeline_to(max_len):
        @jax.jit
        def run(p, a):
            mel = compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype)
            xa_kv = encode_xa_kv_q(cfg, p, mel)
            return decode_window(
                cfg, p, xa_kv, tinit, len(sot), 0, ids, sup,
                jnp.float32(0.0), jax.random.key(1), max_len=max_len,
                self_dtype=SELF_DTYPE,
            )
        return run

    def sync_kv(out):
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf[(0,) * leaf.ndim])

    def sync_res(out):
        _ = int(np.asarray(out.lengths).sum())

    enc = timeit(lambda: encode_only(params, audio), sync_kv)
    one = pipeline_to(len(sot) + 1)
    pre = timeit(lambda: one(params, audio), sync_res)
    full_fn = pipeline_to(len(sot) + DECODE_TOKENS)
    full = timeit(lambda: full_fn(params, audio), sync_res)

    step_ms = (full - pre) / (DECODE_TOKENS - 1) * 1e3
    for k, v in [
        ("encode_s", enc),
        ("prefill_s", pre),
        ("full_s", full),
        ("decode_step_ms", step_ms),
        ("rtfx_full", B * 30.0 / full),
    ]:
        print(json.dumps({"metric": f"split_{MODEL}_b{B}_{k}",
                          "value": round(v, 4)}), flush=True)


if __name__ == "__main__":
    main()
