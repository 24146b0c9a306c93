"""Decode-path decomposition microbenchmark (run on the real TPU).

Times, per component, for the headline config (large-v3, B=8):
  encoder+xaKV  one batched 30 s window encode
  raw_step      decoder_step alone in an on-device while_loop (no sampling)
  full_window   decode_window (prefill + rules + sampling + step)
measured for bf16 and int8 params/KV. Prints one JSON line per entry.

Timing rule for axon: chain the loop on device and synchronize once by
pulling a scalar; per-op timers lie (block_until_ready returns early).
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
    decoder_step,
    encoder_apply,
    init_kv_cache,
    precompute_xa_kv,
)
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, compute_log_mel
from sentiric_stt_whisper_service_tpu.ops.quant import (
    quantize_params,
    quantize_xa_kv,
)
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
B = int(os.environ.get("BENCH_BATCH", "8"))
STEPS = int(os.environ.get("BENCH_STEPS", "128"))
CACHE_LEN = 256  # lane-aligned (multiple of 128)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps"))
def raw_decode_loop(cfg, n_steps, params, kv, xa_kv, tok0, pos0):
    """n_steps of decoder_step, argmax feedback, all on device."""

    def body(state):
        i, tok, pos, kv = state
        logits, kv = decoder_step(cfg, params, tok, pos, kv, xa_kv)
        return i + 1, jnp.argmax(logits, -1).astype(jnp.int32), pos + 1, kv

    def cond(state):
        return state[0] < n_steps

    _, tok, _, kv = jax.lax.while_loop(cond, body, (jnp.int32(0), tok0, pos0, kv))
    return tok


def timeit(fn, iters=3):
    out = fn()  # compile+warm
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]  # sync incl. compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]  # hard sync
    return (time.perf_counter() - t0) / iters


def main():
    cfg = config_for(MODEL)
    params = init_params(cfg, jax.random.key(0))
    tok = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((B, N_SAMPLES)) * 0.05).astype(np.float32)
    mel = compute_log_mel(audio, n_mels=cfg.n_mels, dtype=cfg.dtype)

    enc = jax.jit(
        lambda p, m: precompute_xa_kv(cfg, p, encoder_apply(cfg, p, m)),
        static_argnums=(),
    )
    # Time via a device-side scalar probe — pulling the xa_kv tree itself
    # would measure a 0.5 GB device→host transfer, not the encoder.
    enc_probe = jax.jit(
        lambda p, m: jnp.sum(enc(p, m)["k"][..., 0].astype(jnp.float32))
    )
    results = {}

    results["encoder_xakv_s"] = timeit(lambda: enc_probe(params, mel))
    xa_kv = jax.block_until_ready(enc(params, mel))
    xa_q = jax.block_until_ready(quantize_xa_kv(xa_kv))
    qparams = jax.block_until_ready(quantize_params(params))

    kv0 = init_kv_cache(cfg, B, CACHE_LEN)
    tok0 = jnp.full((B,), sot[0], jnp.int32)
    pos0 = jnp.zeros((B,), jnp.int32)

    for name, (p, xk) in {
        "bf16": (params, xa_kv),
        "int8": (qparams, xa_q),
    }.items():
        t = timeit(lambda p=p, xk=xk: raw_decode_loop(cfg, STEPS, p, kv0, xk, tok0, pos0))
        results[f"raw_step_ms_{name}"] = t / STEPS * 1e3

        tinit = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
        tinit[:, : len(sot)] = sot
        tinit = jnp.asarray(tinit)

        def full(p=p, xk=xk):
            return decode_window(
                cfg, p, xk, tinit, len(sot), 0, ids, sup,
                jnp.float32(0.0), jax.random.key(1), max_len=len(sot) + STEPS,
            )

        t = timeit(full)
        results[f"full_window_ms_per_step_{name}"] = t / STEPS * 1e3

    for k, v in results.items():
        print(json.dumps({"metric": k, "value": round(v * 1000) / 1000}))


if __name__ == "__main__":
    main()
