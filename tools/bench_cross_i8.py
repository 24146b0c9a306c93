"""Probe: int8-MXU decode cross-attention vs the shipping mixed path.

The per-step cross chain streams the int8 KF slab and XLA converts it to
bf16 on the way into the MXU (ops/decode_attention.decode_attention_reference:
``k.astype`` fused into the dot). If that convert is on the critical path,
an int8 x int8 dot (q quantized per row; softmax weights re-quantized with
v_scale folded in) should run closer to the 819 GB/s HBM roofline than the
measured ~700 GB/s effective.

Measures the 32-layer chain at BENCH_BATCH (56) on the real chip, plus
numeric error vs fp32. One JSON line per variant.
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
H = int(os.environ.get("BENCH_H", "20"))
HD = int(os.environ.get("BENCH_HD", "64"))
F = int(os.environ.get("BENCH_F", "1536"))
L = int(os.environ.get("BENCH_LAYERS", "32"))
SCALE = HD**-0.5


def attend_mixed(q, k_q, v_q, k_s, v_s):
    """Shipping path: bf16 q x int8 slab with fused astype."""
    qf = q.astype(jnp.float32) * SCALE
    scores = jnp.einsum(
        "shd,shdf->shf", qf.astype(jnp.bfloat16), k_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * k_s
    w = jax.nn.softmax(scores, axis=-1) * v_s
    return jnp.einsum(
        "shf,shdf->shd", w.astype(jnp.bfloat16), v_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def attend_i8(q, k_q, v_q, k_s, v_s):
    """int8 x int8 MXU: quantize q per (s,h) row; fold v_scale into the
    softmax weights, then quantize those per row too."""
    qf = q.astype(jnp.float32)
    qmax = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-6)
    q8 = jnp.round(qf * (127.0 / qmax)).astype(jnp.int8)
    s32 = jnp.einsum("shd,shdf->shf", q8, k_q, preferred_element_type=jnp.int32)
    scores = s32.astype(jnp.float32) * (k_s * (qmax * (SCALE / 127.0)))
    w = jax.nn.softmax(scores, axis=-1) * v_s  # [S,H,F] fp32
    wmax = jnp.maximum(jnp.max(w, axis=-1, keepdims=True), 1e-9)
    w8 = jnp.round(w * (127.0 / wmax)).astype(jnp.int8)
    o32 = jnp.einsum("shf,shdf->shd", w8, v_q, preferred_element_type=jnp.int32)
    return (o32.astype(jnp.float32) * (wmax / 127.0)).astype(jnp.bfloat16)


def attend_f32(q, k, v):
    qf = q.astype(jnp.float32) * SCALE
    scores = jnp.einsum("shd,shdf->shf", qf, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("shf,shdf->shd", w, v, preferred_element_type=jnp.float32)


def chain(fn):
    """32-layer loop over stacked slabs; returns a scalar to sync on."""

    @jax.jit
    def run(q, k_q, v_q, k_s, v_s):
        def body(carry, layer):
            out = fn(carry, layer["k"], layer["v"], layer["ks"], layer["vs"])
            return out, None

        out, _ = jax.lax.scan(body, q, {"k": k_q, "v": v_q, "ks": k_s, "vs": v_s})
        return out

    return run


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, H, HD)), jnp.bfloat16)
    # One layer generated on host, tiled L× on device (jnp.tile forces real
    # materialization so the chain streams 7 GB of distinct HBM like the
    # real decoder; host RAM stays ~440 MB).
    kf1 = rng.standard_normal((S, H, HD, F)).astype(np.float32)
    vf1 = rng.standard_normal((S, H, HD, F)).astype(np.float32)
    ks1 = (np.abs(kf1).max(axis=2) / 127.0).astype(np.float32)  # [S,H,F]
    vs1 = (np.abs(vf1).max(axis=2) / 127.0).astype(np.float32)
    kq1 = np.round(kf1 / ks1[:, :, None]).astype(np.int8)
    vq1 = np.round(vf1 / vs1[:, :, None]).astype(np.int8)
    del kf1, vf1
    tile = jax.jit(lambda x: jnp.tile(x[None], (L,) + (1,) * x.ndim))
    k_q = jax.block_until_ready(tile(jnp.asarray(kq1)))
    v_q = jax.block_until_ready(tile(jnp.asarray(vq1)))
    k_s = jax.block_until_ready(tile(jnp.asarray(ks1)))
    v_s = jax.block_until_ready(tile(jnp.asarray(vs1)))

    # error check (single layer, vs fp32 on the dequantized slab)
    deq = jax.jit(
        lambda kq, ks: kq.astype(jnp.float32) * ks[:, :, None]
    )
    ref = np.asarray(attend_f32(q, deq(k_q[0], k_s[0]), deq(v_q[0], v_s[0])))
    rstd = float(np.std(ref)) or 1.0
    bytes_per = 2 * L * S * H * HD * F  # int8 K+V slabs

    for name, fn in (("mixed", attend_mixed), ("i8", attend_i8)):
        out = np.asarray(fn(q, k_q[0], v_q[0], k_s[0], v_s[0]), np.float32)
        err = float(np.sqrt(np.mean((out - ref) ** 2))) / rstd
        run = chain(fn)
        r = run(q, k_q, v_q, k_s, v_s)
        _ = float(jnp.asarray(r).ravel()[0])
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            r = run(q, k_q, v_q, k_s, v_s)
        _ = float(jnp.asarray(r).ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "variant": name,
            "ms_32layer": round(dt * 1e3, 3),
            "eff_GBps": round(bytes_per / dt / 1e9, 1),
            "rel_rms_err": round(err, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
