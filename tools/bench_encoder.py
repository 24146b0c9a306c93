"""Encoder-path decomposition on the real TPU (large-v3, 8×30 s windows):
mel frontend, conv stem, transformer body, ln_post + cross-KV precompute.
One JSON line per stage; all timings via device-side scalar probes."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sentiric_stt_whisper_service_tpu.models import config_for, init_params
from sentiric_stt_whisper_service_tpu.models.whisper import (
    _conv1d,
    encoder_apply,
    layer_norm,
    precompute_xa_kv,
)
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, compute_log_mel
from sentiric_stt_whisper_service_tpu.ops.quant import quantize_params

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
B = int(os.environ.get("BENCH_BATCH", "8"))


def probe(fn):
    """jit a fn returning a pytree; time via scalar reduction pull."""
    f = jax.jit(lambda *a: jnp.sum(jax.tree.leaves(fn(*a))[0].astype(jnp.float32)))

    def timed(*a):
        _ = float(f(*a))  # compile+sync
        t0 = time.perf_counter()
        for _ in range(5):
            _ = float(f(*a))
        return (time.perf_counter() - t0) / 5

    return timed


def main():
    cfg = config_for(MODEL)
    params = jax.block_until_ready(
        quantize_params(init_params(cfg, jax.random.key(0)))
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((B, N_SAMPLES)) * 0.05).astype(np.float32))

    def mel_fn(a):
        return compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype)

    def stem(p, m):
        enc = p["encoder"]
        x = _conv1d(m.astype(cfg.dtype), enc["conv1"]["w"], enc["conv1"]["b"], 1)
        x = jax.nn.gelu(x, approximate=False)
        x = _conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2)
        return jax.nn.gelu(x, approximate=False)

    mel = jax.block_until_ready(mel_fn(audio))

    results = {
        "mel_s": probe(mel_fn)(audio),
        "conv_stem_s": probe(stem)(params, mel),
        "encoder_full_s": probe(lambda p, m: encoder_apply(cfg, p, m))(params, mel),
        "encoder_plus_xakv_s": probe(
            lambda p, m: precompute_xa_kv(cfg, p, encoder_apply(cfg, p, m))
        )(params, mel),
    }
    for k, v in results.items():
        print(json.dumps({"metric": f"enc_{MODEL}_b{B}_{k}",
                          "value": round(v * 1e4) / 1e4}), flush=True)


if __name__ == "__main__":
    main()
