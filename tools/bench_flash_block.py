"""Encoder flash-attention BLOCK_Q sweep on the real TPU (large-v3 shape:
[B*H, 1500, 64]). Times the full encoder per block size."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sentiric_stt_whisper_service_tpu.ops.flash_attention as fa
from sentiric_stt_whisper_service_tpu.models import config_for, init_params
from sentiric_stt_whisper_service_tpu.models.whisper import encoder_apply
from sentiric_stt_whisper_service_tpu.ops.quant import quantize_params

B = int(os.environ.get("BENCH_BATCH", "8"))


def main():
    cfg = config_for("large-v3")
    params = jax.block_until_ready(
        quantize_params(init_params(cfg, jax.random.key(0)))
    )
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 3000, cfg.n_mels)) * 0.3, cfg.dtype)

    for block_q in (128, 256, 512, 768):
        fa.BLOCK_Q = block_q
        # flash_attention is itself jitted; drop its traces so the new
        # block size takes effect.
        fa.flash_attention.clear_cache()
        probe = jax.jit(
            lambda p, m: jnp.sum(encoder_apply(cfg, p, m).astype(jnp.float32))
        )
        _ = float(probe(params, mel))  # compile+sync
        t0 = time.perf_counter()
        for _ in range(5):
            x = float(probe(params, mel))
        dt = (time.perf_counter() - t0) / 5
        print(json.dumps({
            "metric": f"encoder_b{B}_blockq{block_q}_s",
            "value": round(dt * 1e4) / 1e4,
        }), flush=True)
        probe.clear_cache() if hasattr(probe, "clear_cache") else None


if __name__ == "__main__":
    main()
