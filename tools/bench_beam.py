"""Beam-search decode RTFx on the real TPU (the reference's DEFAULT
serving config is beam_size=5, /root/reference/src/config.h:52). Measures
the full pipeline (mel → encoder → beam decode) for B windows × K beams.
One JSON line."""

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
# int4 cross-KV is the beam default: the shared cross slab is the beam
# step's dominant HBM stream and the serving engine ships int4 for beam.
KV_BITS = 8 if os.environ.get("BENCH_COMPUTE", "int4").startswith("int8") else 4
# bf16 self-slab default: a float8 slab REGRESSES the Pallas beam kernel
# (232.9 → 125.1 RTFx at B=8 int8 — the in-kernel fp8→bf16 convert runs
# per source slot), unlike the greedy path where fp8 storage wins.
SELF_DTYPE = (
    jnp.float8_e4m3fn
    if os.environ.get("BENCH_SELF_CACHE", "bf16").lower() in ("f8", "fp8", "float8")
    else None
)
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

    @jax.jit
    def pipeline(p, a):
        mel = compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype)
        # Quantization fused INTO the precompute scan: the bf16 slab is
        # never materialized (HBM-pressure cliff at large B, docs/PERF.md).
        xa_kv = precompute_xa_kv(cfg, p, encoder_apply(cfg, p, mel), KV_BITS)
        return decode_window_beam(
            cfg, p, xa_kv, tinit, len(sot), 0, ids, sup,
            beam_size=K, max_len=max_len, self_dtype=SELF_DTYPE,
            cache_buckets=os.environ.get("BENCH_CACHE_BUCKETS", "1") == "1",
        )

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
        "metric": f"RTFx_beam{K}_batch{B}_{MODEL}_kv{KV_BITS}_{DECODE_TOKENS}tok",
        "value": round(rtfx, 1),
        "unit": "audio_sec/sec/chip",
    }))

    if os.environ.get("BENCH_EOT_EARLY", "0") != "1":
        return

    # --- EOT-early regime (typical real-speech windows: beams finish in
    # tens of steps, not max_len). Random weights never emit EOT, so an
    # additive EOT boost on the suppress mask forces every beam to bank a
    # finished hypothesis within a few steps; banked-K termination
    # (models/beam.py early_stop) should then cut the window to a
    # fraction of max_len — measured against early_stop=False, which is
    # output-identical by construction.
    sup_boost = jnp.asarray(
        np.asarray(sup, np.float32) + np.eye(1, cfg.n_vocab, ids.eot)[0] * 14.0
    )

    def mk(early):
        @jax.jit
        def run(p, a):
            mel = compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype)
            xa_kv = precompute_xa_kv(cfg, p, encoder_apply(cfg, p, mel), KV_BITS)
            return decode_window_beam(
                cfg, p, xa_kv, tinit, len(sot), 0, ids, sup_boost,
                beam_size=K, max_len=max_len, self_dtype=SELF_DTYPE,
                early_stop=early,
            )
        return run

    for early in (True, False):
        run = mk(early)
        r = run(params, audio)
        _ = int(np.asarray(r.lengths).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            r = run(params, audio)
        _ = int(np.asarray(r.lengths).sum())
        d = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "metric": (
                f"RTFx_beam{K}_batch{B}_{MODEL}_eot_early_"
                f"{'banked_stop' if early else 'full_run'}"
            ),
            "value": round(B * 30.0 / d, 1),
            "unit": "audio_sec/sec/chip",
        }))


if __name__ == "__main__":
    main()
