"""Per-step cost of the sampling/timestamp epilogue at production shape.

decode_window's step runs, per token: suppress mask + blank mask +
apply_timestamp_rules (~10 [B,V] passes, V=51866) + log_softmax + argmax /
categorical + bookkeeping. This tool times the full pipeline with the
epilogue progressively stripped:

  full        : production decode_window
  no_ts       : use_timestamps=False (timestamp rules stripped)
  argmax_only : a decode loop variant with raw argmax — no suppress, no
                rules, no logprob bookkeeping (lower bound)

Differences give the epilogue's share of the 9.2 ms step at B=24.
"""

from __future__ import annotations

import functools
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
from sentiric_stt_whisper_service_tpu.models.whisper import (
    decoder_apply,
    encode_xa_kv_q,
    init_kv_cache,
)
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, compute_log_mel
from sentiric_stt_whisper_service_tpu.ops.quant import (
    fuse_decoder_qkv,
    quantize_params,
)
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
B = int(os.environ.get("BENCH_BATCH", "24"))
TOKENS = 96


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

    def prep(p, a):
        mel = compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype)
        return encode_xa_kv_q(cfg, p, mel)

    def run_full(p, a, use_ts):
        return decode_window(
            cfg, p, prep(p, a), tinit, len(sot), 0, ids, sup,
            jnp.float32(0.0), jax.random.key(1), max_len=len(sot) + TOKENS,
            use_timestamps=use_ts,
        ).lengths

    @jax.jit
    def run_argmax(p, a):
        xa_kv = prep(p, a)
        kv = init_kv_cache(cfg, B, 128)
        logits, kv, _ = decoder_apply(
            cfg, p, tinit[:, :4], jnp.int32(0), kv, xa_kv
        )
        def body(state):
            i, tok_prev, kv = state
            logits, kv, _ = decoder_apply(
                cfg, p, tok_prev[:, None], jnp.int32(4) + i, kv, xa_kv
            )
            return i + 1, jnp.argmax(logits[:, 0], -1).astype(jnp.int32), kv
        n, tok_last, _ = jax.lax.while_loop(
            lambda s: s[0] < TOKENS, body,
            (jnp.int32(0), jnp.argmax(logits[:, -1], -1).astype(jnp.int32), kv),
        )
        return tok_last

    fns = {
        "full": jax.jit(lambda p, a: run_full(p, a, True)),
        "no_ts": jax.jit(lambda p, a: run_full(p, a, False)),
        "argmax_only": run_argmax,
    }
    for name, f in fns.items():
        out = f(params, audio)
        _ = np.asarray(out).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(params, audio)
        _ = np.asarray(out).ravel()[0]
        t = (time.perf_counter() - t0) / 3
        print(json.dumps({
            "metric": f"samp_{MODEL}_b{B}_{name}_s",
            "value": round(t, 4),
            "per_step_ms": round(t / TOKENS * 1e4) / 10,
        }), flush=True)


if __name__ == "__main__":
    main()
