"""Single-process beam batch sweep: one compile + timing per B value so
the comparison dodges the ±10% cross-process RTFx variance (docs/PERF.md).
One JSON line per B. Env: BENCH_BATCHES="8,16,24,32", BENCH_COMPUTE,
BENCH_BEAM, BENCH_MODEL, BENCH_TOKENS as in tools/bench_beam.py."""

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
BATCHES = [int(b) for b in os.environ.get("BENCH_BATCHES", "8,16,24").split(",")]
K = int(os.environ.get("BENCH_BEAM", "5"))
KV_BITS = 8 if os.environ.get("BENCH_COMPUTE", "int4").startswith("int8") else 4
DECODE_TOKENS = int(os.environ.get("BENCH_TOKENS", "128"))


def main():
    cfg = config_for(MODEL)
    params = jax.block_until_ready(
        fuse_decoder_qkv(quantize_params(init_params(cfg, jax.random.key(0))))
    )
    tok = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")
    max_len = len(sot) + DECODE_TOKENS
    rng = np.random.default_rng(0)

    for B in BATCHES:
        audio = jnp.asarray(
            (rng.standard_normal((B, N_SAMPLES)) * 0.05).astype(np.float32)
        )
        tinit_np = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
        tinit_np[:, : len(sot)] = sot
        tinit = jnp.asarray(tinit_np)

        # BENCH_SELF_CACHE=f8 stores the beam self slab as float8_e4m3fn
        # (the engine's auto policy for quantized compute types; honored
        # by the folded self path, models/beam._fold_self).
        sc = os.environ.get("BENCH_SELF_CACHE", "").lower()
        self_dtype = jnp.float8_e4m3fn if sc in ("f8", "fp8", "float8") else None

        @jax.jit
        def pipeline(p, a, tinit=tinit):
            mel = compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype)
            xa_kv = precompute_xa_kv(cfg, p, encoder_apply(cfg, p, mel), KV_BITS)
            return decode_window_beam(
                cfg, p, xa_kv, tinit, len(sot), 0, ids, sup,
                beam_size=K, max_len=max_len, self_dtype=self_dtype,
            )

        res = pipeline(params, audio)
        _ = int(np.asarray(res.lengths).sum())  # sync incl. compile
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            res = pipeline(params, audio)
        _ = int(np.asarray(res.lengths).sum())
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "metric": f"RTFx_beam{K}_B{B}_{MODEL}_kv{KV_BITS}_{DECODE_TOKENS}tok",
            "value": round(B * 30.0 / dt, 1),
            "unit": "audio_sec/sec/chip",
        }), flush=True)


if __name__ == "__main__":
    main()
