"""Encoder ablation on the real TPU: where do the ~0.7 s at B=24 go?

Variants of the full encoder+xa-KV pass with components toggled:
  full_int8w  : production path (weight-only int8 params)
  full_bf16w  : same graph, bf16 weights (is the int8 dequant a tax on the
                compute-bound encoder?)
  no_attn     : attention blocks skipped (isolates MLP+LN+residual cost)
  no_mlp      : MLP blocks skipped (isolates attention cost)
  xla_attn    : flash kernel replaced by plain XLA attention
  no_ln       : layer norms replaced by identity (LN/bandwidth share)

Timings: steady-state, queue-5-sync-once (docs/PERF.md methodology).
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

from sentiric_stt_whisper_service_tpu.models import config_for, init_params
from sentiric_stt_whisper_service_tpu.models import whisper as W
from sentiric_stt_whisper_service_tpu.models.whisper import (
    _conv1d,
    attention,
    dense,
    layer_norm,
    mlp,
    precompute_xa_kv,
)
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, compute_log_mel
from sentiric_stt_whisper_service_tpu.ops.quant import quantize_params

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
B = int(os.environ.get("BENCH_BATCH", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))


def encoder_variant(cfg, params, mel, *, with_attn=True, with_mlp=True,
                    with_ln=True):
    enc = params["encoder"]
    x = mel.astype(cfg.dtype)
    x = _conv1d(x, enc["conv1"]["w"], enc["conv1"]["b"], stride=1)
    x = jax.nn.gelu(x, approximate=False)
    x = _conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], stride=2)
    x = jax.nn.gelu(x, approximate=False)
    x = x + enc["pos"][None, : x.shape[1]].astype(x.dtype)

    ln = layer_norm if with_ln else (lambda y, p: y)

    def block(carry, layer):
        h = carry
        if with_attn:
            h = h + attention(ln(h, layer["attn_ln"]), layer["attn"],
                              cfg.n_audio_head)
        if with_mlp:
            h = h + mlp(ln(h, layer["mlp_ln"]), layer["mlp_1"], layer["mlp_2"])
        return h, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return ln(x, enc["ln_post"])


def timeit(fn, iters=ITERS):
    out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    cfg = config_for(MODEL)
    params_bf = init_params(cfg, jax.random.key(0))
    params_q = jax.block_until_ready(quantize_params(params_bf))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (rng.standard_normal((B, N_SAMPLES)) * 0.05).astype(np.float32)
    )
    mel = jax.block_until_ready(
        jax.jit(lambda a: compute_log_mel(a, n_mels=cfg.n_mels, dtype=cfg.dtype))(audio)
    )

    def jfn(p, **kw):
        f = jax.jit(lambda pp, m: encoder_variant(cfg, pp, m, **kw))
        return lambda: f(p, mel)

    variants = {
        "full_int8w": jfn(params_q),
        "full_bf16w": jfn(params_bf),
        "no_attn": jfn(params_q, with_attn=False),
        "no_mlp": jfn(params_q, with_mlp=False),
        "no_ln": jfn(params_q, with_ln=False),
    }
    for name, fn in variants.items():
        t = timeit(fn)
        print(json.dumps({"metric": f"encabl_{MODEL}_b{B}_{name}",
                          "value": round(t, 4)}), flush=True)

    # Flash kernel vs XLA attention
    W.set_flash_attn(False)
    t = timeit(jfn(params_q))
    W.set_flash_attn(None)
    print(json.dumps({"metric": f"encabl_{MODEL}_b{B}_xla_attn",
                      "value": round(t, 4)}), flush=True)


if __name__ == "__main__":
    main()
