"""Probe: int4 cross-attention KV on the real TPU.

The decode step's dominant traffic is the int8 KF cross slab
([L,B,H,hd,1500] ~ 2.9 GB read per step for k+v at large-v3 B=24,
docs/PERF.md). Native XLA int4 (jnp.int4, 2 nibbles/byte in HBM) would
halve it. Axon quirk: int4 arrays break when passed ACROSS a jit boundary
(RecursionError in eager/arg paths), so quantization runs INSIDE the same
jit as the consumer chain — matching bench.py's single fused pipeline
executable. Measures a 32-layer cross-attention core chain:

  int8 / int4 / bf16 per-step ms + achieved GB/s, and the single-layer
  numeric delta of each quantized path vs fp32-exact attention.
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

B = int(os.environ.get("BENCH_BATCH", "24"))
L, H, HD, F = 8, 20, 64, 1500  # 8 layers: fits HBM incl. the fp32 base; per-layer cost is what matters
STEPS = 32


def quant(x, bits, axis=-2):
    qmax = 7.0 if bits == 4 else 127.0
    amax = jnp.max(jnp.abs(x), axis=axis)
    scale = jnp.maximum(amax / qmax, 1e-12)
    q = jnp.clip(jnp.round(x / jnp.expand_dims(scale, axis)), -qmax, qmax)
    return q.astype(jnp.int4 if bits == 4 else jnp.int8), scale


def attend_q(q, k_q, k_s, v_q, v_s):
    scores = jax.lax.dot_general(
        q, k_q.astype(q.dtype), (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    scores = scores * k_s[:, :, None, :]
    w = jax.nn.softmax(scores, axis=-1)
    wv = (w * v_s[:, :, None, :]).astype(q.dtype)
    return jax.lax.dot_general(
        wv, v_q.astype(q.dtype), (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )


def attend_bf(q, k, v):
    scores = jax.lax.dot_general(
        q, k, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jax.lax.dot_general(
        w, v, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("mode", "n"))
def chain(q0, k32, v32, mode, n):
    if mode == "bf16":
        kv = (k32, v32)
    else:
        bits = 4 if mode == "int4" else 8
        kq, ks = quant(k32, bits)
        vq, vs = quant(v32, bits)
        kv = (kq, ks, vq, vs)

    def layer_scan(q, xs):
        if mode == "bf16":
            out = attend_bf(q, xs[0], xs[1])
        else:
            out = attend_q(q, xs[0], xs[1], xs[2], xs[3])
        return out.astype(q.dtype), None

    def step(q, _):
        q, _ = jax.lax.scan(layer_scan, q, kv)
        return q, None

    q, _ = jax.lax.scan(step, q0, None, length=n)
    return q


def timeit(fn, iters=3):
    out = fn()
    _ = np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = np.asarray(out).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    k32 = jnp.asarray(rng.standard_normal((L, B, H, HD, F)) * 0.3, jnp.bfloat16)
    v32 = jnp.asarray(rng.standard_normal((L, B, H, HD, F)) * 0.3, jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((B, H, 1, HD)) * 0.3, jnp.bfloat16)
    jax.block_until_ready((k32, v32, q0))

    k1, v1 = k32[:1], v32[:1]
    outs = {m: np.asarray(chain(q0, k1, v1, m, 1), np.float32)
            for m in ("bf16", "int8", "int4")}
    for m in ("int8", "int4"):
        print(json.dumps({
            "metric": f"xa_{m}_1layer_max_abs_delta_vs_bf16",
            "value": round(float(np.max(np.abs(outs[m] - outs["bf16"]))), 4),
        }), flush=True)

    bytes_el = {"int8": 1.0, "int4": 0.5, "bf16": 2.0}
    for mode in ("int8", "int4", "bf16"):
        # subtract the in-jit quantization cost: time (quant + n steps) at
        # two n values; slope = per-step cost.
        t_small = timeit(lambda: chain(q0, k32, v32, mode, 4))
        t_big = timeit(lambda: chain(q0, k32, v32, mode, 4 + STEPS))
        t = (t_big - t_small) / STEPS
        gb = 2 * L * B * H * HD * F * bytes_el[mode] / 1e9
        print(json.dumps({
            "metric": f"xa_chain_{mode}_step_ms",
            "value": round(t * 1e5) / 1e2,
            "gbps": round(gb / t, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
