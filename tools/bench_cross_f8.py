"""Probe: float8_e4m3fn cross-KV slab vs int8 for the decode cross chain.

The int8 chain at B=56 is ELEMENT-rate-bound in its dequant stage
(~476 Gelem/s; int4 ~560 — tools/bench_cross_i8.py, bench_cross_fd.py,
bench_stream_rate.py: raw int8 DMA alone reaches the same rate, and
int8xint8 MXU does not help). The float8 SELF cache measured ~780
Gelem/s through the same dot-fused convert (no scale multiplies, cheap
exponent remap — tools/bench_selfcache_dtype.py). Same bytes as int8,
~1.6x the pipeline rate, and e4m3's per-element exponent replaces the
per-position scale: if that rate holds for the cross chain, the
dominant greedy per-step cost drops ~35%.

Variants: i8 (shipping), f8 (scale-free e4m3 slab). One JSON line each
with ms / 32-layer chain, effective element rate, rms error vs fp32.
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

S = int(os.environ.get("BENCH_BATCH", "56"))
H, HD = 20, 64
F = int(os.environ.get("BENCH_F", "1536"))
L = int(os.environ.get("BENCH_LAYERS", "32"))
SCALE = HD**-0.5


def attend_i8(q, k_q, v_q, k_s, v_s):
    scores = jnp.einsum(
        "shd,shdf->shf", q.astype(jnp.bfloat16), k_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * k_s
    w = jax.nn.softmax(scores, axis=-1) * v_s
    return jnp.einsum(
        "shf,shdf->shd", w.astype(jnp.bfloat16), v_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def attend_f8(q, k8, v8):
    scores = jnp.einsum(
        "shd,shdf->shf", q.astype(jnp.bfloat16), k8.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "shf,shdf->shd", w.astype(jnp.bfloat16), v8.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def timeit_chain(fn, q0, layers, iters=10):
    @jax.jit
    def run(q, layers):
        def body(carry, layer):
            return fn(carry, layer), None
        out, _ = jax.lax.scan(body, q, layers)
        return out

    out = run(q0, layers)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(q0, layers)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, H, HD)) * SCALE, jnp.bfloat16)
    kf1 = rng.standard_normal((S, H, HD, F)).astype(np.float32)
    vf1 = rng.standard_normal((S, H, HD, F)).astype(np.float32)
    ks1 = (np.abs(kf1).max(axis=2) / 127.0 + 1e-12).astype(np.float32)
    vs1 = (np.abs(vf1).max(axis=2) / 127.0 + 1e-12).astype(np.float32)
    kq1 = np.round(kf1 / ks1[:, :, None]).astype(np.int8)
    vq1 = np.round(vf1 / vs1[:, :, None]).astype(np.int8)

    def ref_attend(q, k, v):
        qf = q.astype(jnp.float32)
        sc = jnp.einsum("shd,shdf->shf", qf, k)
        w = jax.nn.softmax(sc, axis=-1)
        return jnp.einsum("shf,shdf->shd", w, v)

    ref = np.asarray(ref_attend(q, kf1, vf1))
    rstd = float(np.std(ref)) or 1.0
    elems = 2 * L * S * H * HD * F

    tile = jax.jit(lambda x: jnp.tile(x[None], (L,) + (1,) * x.ndim))

    layers = {
        "k": jax.block_until_ready(tile(jnp.asarray(kq1))),
        "v": tile(jnp.asarray(vq1)),
        "ks": tile(jnp.asarray(ks1)),
        "vs": tile(jnp.asarray(vs1)),
    }
    out = np.asarray(attend_i8(q, layers["k"][0], layers["v"][0],
                               layers["ks"][0], layers["vs"][0]), np.float32)
    err = float(np.sqrt(np.mean((out - ref) ** 2))) / rstd
    dt = timeit_chain(
        lambda c, l: attend_i8(c, l["k"], l["v"], l["ks"], l["vs"]),
        q, layers)
    print(json.dumps({"variant": "i8", "ms": round(dt * 1e3, 3),
                      "Gelem_per_s": round(elems / dt / 1e9, 1),
                      "rel_rms_err": round(err, 5)}), flush=True)
    del layers

    k8 = jax.jit(lambda x: x.astype(jnp.float8_e4m3fn))(jnp.asarray(kf1))
    v8 = jax.jit(lambda x: x.astype(jnp.float8_e4m3fn))(jnp.asarray(vf1))
    layers = {
        "k": jax.block_until_ready(tile(k8)),
        "v": tile(v8),
    }
    out = np.asarray(attend_f8(q, layers["k"][0], layers["v"][0]), np.float32)
    err = float(np.sqrt(np.mean((out - ref) ** 2))) / rstd
    dt = timeit_chain(lambda c, l: attend_f8(c, l["k"], l["v"]), q, layers)
    print(json.dumps({"variant": "f8", "ms": round(dt * 1e3, 3),
                      "Gelem_per_s": round(elems / dt / 1e9, 1),
                      "rel_rms_err": round(err, 5)}), flush=True)


if __name__ == "__main__":
    main()
