"""Int8-MXU flash-attention probe for the encoder (SageAttention-style).

The production kernel (ops/flash_attention.py) runs ~27 TFLOPS at the
large-v3 encoder shape — bound by the K=64/N=64 matmul shapes where the
MXU runs at <=50% utilization (d=64 lane-padding, docs/PERF.md). The int8
MXU path is 1.73x the bf16 peak (measured 314 TOPS vs 181 TFLOPS,
tools/bench_encoder_w8a8.py), and unlike full-encoder W8A8 the
quantization here lives INSIDE the kernel on small tiles (q [BQ,64],
k [64,L], v [L,64]) — no extra HBM activation passes.

Variants:
  base  : production bf16 kernel
  qk8   : in-kernel per-row/per-tile int8 quantization of q,k; int8 QK^T;
          bf16 PV (SageAttention-1 style)
  full8 : qk8 + int8 PV (e scaled to [0,127] exactly, v per-channel int8)

Prints ms + achieved TFLOPS + max/rms relative error vs the fp32 XLA
reference for each variant. Run on the real chip.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sentiric_stt_whisper_service_tpu.ops.flash_attention import (
    BLOCK_Q,
    _round_up,
    attention_reference,
    flash_attention,
)

B = int(os.environ.get("BENCH_B", "16"))
H = int(os.environ.get("BENCH_H", "20"))
L = int(os.environ.get("BENCH_L", "1500"))
D = int(os.environ.get("BENCH_D", "64"))


def _quant_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, mode):
    q = q_ref[0].astype(jnp.float32)  # [BQ, d]
    k = k_ref[0].astype(jnp.float32)  # [d, L]
    # Per-row q scale (softmax is NOT invariant to per-row multiplicative
    # logit scaling, so the scale must be divided back out pre-softmax).
    qmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-6)
    kmax = jnp.maximum(jnp.max(jnp.abs(k)), 1e-6)
    q8 = jnp.round(q * (127.0 / qmax)).astype(jnp.int8)
    k8 = jnp.round(k * (127.0 / kmax)).astype(jnp.int8)
    s32 = jax.lax.dot_general(
        q8, k8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [BQ, L]
    scores = s32.astype(jnp.float32) * (qmax * (kmax / (127.0 * 127.0)))
    scores = scores + bias_ref[...]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    if mode == "qk8":
        v = v_ref[0]
        o = jax.lax.dot_general(
            e.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:  # full8
        v = v_ref[0].astype(jnp.float32)
        vmax = jnp.maximum(jnp.max(jnp.abs(v), axis=0, keepdims=True), 1e-6)
        v8 = jnp.round(v * (127.0 / vmax)).astype(jnp.int8)
        p8 = jnp.round(e * 127.0).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            p8, v8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o = o32.astype(jnp.float32) * (vmax / (127.0 * 127.0))
    o_ref[0] = (o / s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode",))
def flash_q8(q, k, v, mode="qk8"):
    Bb, Hh, Ll, d = q.shape
    l_pad = _round_up(Ll, BLOCK_Q)
    if l_pad != Ll:
        pad = [(0, 0), (0, 0), (0, l_pad - Ll), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    bh = Bb * Hh
    qf = q.reshape(bh, l_pad, d)
    kf = k.reshape(bh, l_pad, d).transpose(0, 2, 1)
    vf = v.reshape(bh, l_pad, d)
    bias = jnp.where(jnp.arange(l_pad) < Ll, 0.0, -1e30).astype(jnp.float32)[None]
    grid = (bh, l_pad // BLOCK_Q)
    out = pl.pallas_call(
        functools.partial(_quant_kernel, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, l_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, l_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l_pad * l_pad * d,
            bytes_accessed=4 * bh * l_pad * d * 2,
            transcendentals=bh * l_pad * l_pad,
        ),
    )(qf, kf, vf, bias)
    return out.reshape(Bb, Hh, l_pad, d)[:, :, :Ll]


def timeit(fn, iters=20):
    r = fn()
    jax.block_until_ready(r)
    _ = float(jnp.asarray(r).ravel()[0])  # hard sync
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    _ = float(jnp.asarray(r).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    shape = (B, H, L, D)
    scale = D**-0.25
    q = jnp.asarray(rng.standard_normal(shape) * scale, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal(shape) * scale, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    ref = np.asarray(attention_reference(q, k, v), np.float32)
    rstd = float(np.std(ref)) or 1.0

    flops = 4 * B * H * _round_up(L, BLOCK_Q) ** 2 * D
    variants = {
        "base": lambda: flash_attention(q, k, v),
        "qk8": lambda: flash_q8(q, k, v, "qk8"),
        "full8": lambda: flash_q8(q, k, v, "full8"),
    }
    for name, fn in variants.items():
        try:
            out = np.asarray(fn(), np.float32)
            err = out - ref
            dt = timeit(fn)
            print(json.dumps({
                "variant": name,
                "ms": round(dt * 1e3, 3),
                "tflops": round(flops / dt / 1e12, 1),
                "rel_rms_err": round(float(np.sqrt(np.mean(err**2))) / rstd, 5),
                "rel_max_err": round(float(np.max(np.abs(err))) / rstd, 5),
            }))
        except Exception as e:  # noqa: BLE001 — probe harness
            print(json.dumps({"variant": name, "error": repr(e)[:300]}))


if __name__ == "__main__":
    main()
