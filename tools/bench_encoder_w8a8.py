"""Prototype: W8A8 encoder matmuls (int8 x int8 on the MXU).

MXU throughput on chip: bf16 181 TFLOPS, int8 314 TOPS (1.73x) at
[24576,1280]x[1280,5120]. The encoder's QKVO+MLP matmuls are ~60% of its
time, so dynamic per-row activation quantization (symmetric, amax over d,
on post-LN inputs) could buy ~8% end-to-end. This measures the full
encoder in both forms and the output delta.
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

from sentiric_stt_whisper_service_tpu.models import config_for, init_params
from sentiric_stt_whisper_service_tpu.models.whisper import (
    _conv1d,
    layer_norm,
    mha,
)
from sentiric_stt_whisper_service_tpu.ops.quant import quantize_params

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
B = int(os.environ.get("BENCH_BATCH", "16"))


def dense_w8a8(x, p):
    """int8 activation x int8 weight -> int32, dequant in the epilogue.
    x bf16 [..., d_in]; p {"w_q" int8 [d_in, d_out], "scale" f32 [d_out]}."""
    xs = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True), 1e-6
    )
    x_q = jnp.round(x.astype(jnp.float32) / xs * 127.0).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, p["w_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (xs / 127.0) * p["scale"]
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def dense_w8(x, p):
    y = jnp.dot(x, p["w_q"].astype(x.dtype), preferred_element_type=jnp.float32)
    y = (y * p["scale"]).astype(x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def encoder_variant(cfg, params, mel, *, a8):
    enc = params["encoder"]
    d = dense_w8a8 if a8 else dense_w8
    x = mel.astype(cfg.dtype)
    x = _conv1d(x, enc["conv1"]["w"], enc["conv1"]["b"], stride=1)
    x = jax.nn.gelu(x, approximate=False)
    x = _conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], stride=2)
    x = jax.nn.gelu(x, approximate=False)
    x = x + enc["pos"][None, : x.shape[1]].astype(x.dtype)

    n_head = cfg.n_audio_head

    def block(carry, layer):
        h = carry
        y = layer_norm(h, layer["attn_ln"])
        q = d(y, layer["attn"]["q"])
        k = d(y, layer["attn"]["k"])
        v = d(y, layer["attn"]["v"])
        at = mha(q, k, v, n_head)
        h = h + d(at, layer["attn"]["o"])
        y = layer_norm(h, layer["mlp_ln"])
        h = h + d(jax.nn.gelu(d(y, layer["mlp_1"]), approximate=False), layer["mlp_2"])
        return h, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])


def main():
    cfg = config_for(MODEL)
    params = jax.block_until_ready(quantize_params(init_params(cfg, jax.random.key(0))))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 3000, cfg.n_mels)) * 0.3, cfg.dtype)

    outs = {}
    for name, a8 in (("w8", False), ("w8a8", True)):
        f = jax.jit(lambda p, m, a8=a8: encoder_variant(cfg, p, m, a8=a8))
        out = f(params, mel)
        outs[name] = np.asarray(out.astype(jnp.float32))
        g = jax.jit(lambda p, m, a8=a8: jnp.sum(
            encoder_variant(cfg, p, m, a8=a8).astype(jnp.float32)))
        _ = float(g(params, mel))
        t0 = time.perf_counter()
        for _ in range(5):
            o = g(params, mel)
        _ = float(o)
        t = (time.perf_counter() - t0) / 5
        print(json.dumps({"metric": f"encw8a8_{MODEL}_b{B}_{name}_s",
                          "value": round(t, 4)}), flush=True)

    d = np.abs(outs["w8"] - outs["w8a8"])
    ref = np.abs(outs["w8"]).max()
    print(json.dumps({
        "metric": "encw8a8_out_delta",
        "max_abs": round(float(d.max()), 4),
        "rel": round(float(d.max() / ref), 4),
        "rms_rel": round(float(np.sqrt((d**2).mean()) / np.sqrt((outs['w8']**2).mean())), 5),
    }), flush=True)


if __name__ == "__main__":
    main()
