"""Isolated encoder flash-attention variants on the real TPU.

Shape: [B, H=20, L=1500, d=64] (large-v3). The production kernel runs one
program per (batch*head, q-block) — 640 programs of 302 MFLOP at B=16, and
measures ~40 TFLOPS inside the encoder. Candidates to fatten programs /
cut grid overhead:

  current    : ops/flash_attention.py as-is (BLOCK_Q=768)
  bq_full    : BLOCK_Q = whole padded L (1536) — grid (B*H,), one program
               per head, 604 MFLOP each
  hb{N}      : head-blocked grid (B, H/N, q-blocks); in-kernel fori_loop
               over N heads (fori so Mosaic reuses the score buffer — an
               unrolled python loop stack-OOMs VMEM)
  hb{N}_full : head block AND full-L q block
  xla        : plain XLA attention twin

Prints ms per single attention call and achieved TFLOPS.
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
    attention_reference,
    flash_attention,
)

B = int(os.environ.get("BENCH_BATCH", "16"))
H, L, D = 20, 1500, 64


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _hb_kernel(q_ref, k_ref, v_ref, o_ref, *, l_valid, hb):
    def body(j, _):
        q = q_ref[0, j]  # [BQ, d]
        k = k_ref[0, j]  # [L_pad, d]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l_pad = scores.shape[-1]
        if l_valid < l_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < l_valid, scores, jnp.float32(-1e30))
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        w = (e / s).astype(v_ref.dtype)
        o_ref[0, j] = jax.lax.dot_general(
            w, v_ref[0, j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hb, body, 0)


@functools.partial(jax.jit, static_argnames=("hb", "block_q"))
def flash_hb(q, k, v, hb: int, block_q: int):
    b, h, l, d = q.shape
    l_pad = _round_up(l, block_q)
    pad = [(0, 0), (0, 0), (0, l_pad - l), (0, 0)]
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)

    grid = (b, h // hb, l_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_hb_kernel, l_valid=l, hb=hb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, block_q, d), lambda bb, hh, i: (bb, hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, l_pad, d), lambda bb, hh, i: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, l_pad, d), lambda bb, hh, i: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, block_q, d), lambda bb, hh, i: (bb, hh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, l_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l_pad * l_pad * d,
            bytes_accessed=4 * b * h * l_pad * d * 2,
            transcendentals=b * h * l_pad * l_pad,
        ),
    )(qp, kp, vp)
    return out[:, :, :l]


def timeit(fn, iters=10):
    out = fn()
    _ = np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.3, jnp.bfloat16)

    variants = {
        "current": lambda: flash_attention(q, k, v),
        "xla": lambda: attention_reference(q, k, v),
        "bq_full": lambda: flash_hb(q, k, v, 1, 1536),
        "hb2": lambda: flash_hb(q, k, v, 2, 768),
        "hb4": lambda: flash_hb(q, k, v, 4, 768),
        "hb2_full": lambda: flash_hb(q, k, v, 2, 1536),
        "hb4_full": lambda: flash_hb(q, k, v, 4, 1536),
    }

    ref = np.asarray(attention_reference(q, k, v).astype(jnp.float32))
    flops = 4 * B * H * L * L * D
    for name, fn in variants.items():
        try:
            got = np.asarray(fn().astype(jnp.float32))
            err = float(np.max(np.abs(got - ref)))
            t = timeit(fn)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(json.dumps({"metric": f"flash_b{B}_{name}_ms",
                              "error": str(e)[:120]}), flush=True)
            continue
        print(json.dumps({
            "metric": f"flash_b{B}_{name}_ms",
            "value": round(t * 1e5) / 1e2,
            "tflops": round(flops / t / 1e12, 1),
            "max_err": round(err, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
