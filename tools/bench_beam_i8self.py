"""Probe: int8 self-slab (per-row scales, in-kernel dequant) vs bf16 in
the fused beam attention kernel, at production shapes.

float8 storage REGRESSED this kernel 2× (Mosaic emulates the f8→bf16
convert); int8→bf16 is a native VPU convert, so the hypothesis is that
halving the slab DMA now wins. Times the 32-layer chain the way the
decode step runs it (sequential dependent calls inside one jit), plus a
numerics check against the XLA twin on dequantized slabs.

Env: BENCH_BATCH (16), BENCH_BEAM (5), BENCH_C (160).
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

from sentiric_stt_whisper_service_tpu.ops.beam_attention import (
    beam_attention,
    beam_attention_reference,
)

B = int(os.environ.get("BENCH_BATCH", "16"))
K = int(os.environ.get("BENCH_BEAM", "5"))
C = int(os.environ.get("BENCH_C", "160"))
L = 32
HP = 10  # paired head count (large-v3: 20 heads)
LANE = 128
HD = 64
ITERS = 20


def quantize_rows(x):
    """Per-row symmetric int8 over the 128-lane axis: returns (q, scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(x.astype(jnp.float32) / scale[..., None]).astype(jnp.int8)
    return q, scale


def main():
    rng = np.random.default_rng(0)
    BK = B * K
    k = jnp.asarray(rng.standard_normal((L, BK, HP, C, LANE)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((L, BK, HP, C, LANE)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((BK, 2 * HP, HD)), jnp.bfloat16)
    # Plausible ancestry: position c < C/2 on slot 0, beyond on own slot.
    anc = np.zeros((B, K, K, C), bool)
    anc[:, :, 0, : C // 2] = True
    for s in range(K):
        anc[:, s, s, C // 2 :] = True
    anc = jnp.asarray(anc)

    kq, ks = quantize_rows(k)
    vq, vs = quantize_rows(v)
    kq, ks, vq, vs = jax.block_until_ready((kq, ks, vq, vs))

    # Numerics: kernel(int8) vs XLA twin on dequantized slabs.
    out_i8 = beam_attention(
        q, kq[0], vq[0], anc, K, scale=0.125,
        k_scale=ks[0], v_scale=vs[0],
    )
    kd = (kq[0].astype(jnp.float32) * ks[0][..., None]).astype(jnp.bfloat16)
    vd = (vq[0].astype(jnp.float32) * vs[0][..., None]).astype(jnp.bfloat16)
    ref = beam_attention_reference(q, kd, vd, anc, K, scale=0.125)
    err = float(
        jnp.max(jnp.abs(out_i8.astype(jnp.float32) - ref.astype(jnp.float32)))
    )
    print(json.dumps({"metric": "i8self_max_abs_err_vs_twin", "value": err}))

    def chain_bf16(q, k, v, anc):
        x = q
        for li in range(L):
            x = beam_attention(x, k[li], v[li], anc, K, scale=0.125)
        return x

    def chain_i8(q, kq, vq, ks, vs, anc):
        x = q
        for li in range(L):
            x = beam_attention(
                x, kq[li], vq[li], anc, K, scale=0.125,
                k_scale=ks[li], v_scale=vs[li],
            )
        return x

    j_bf16 = jax.jit(chain_bf16)
    j_i8 = jax.jit(chain_i8)

    for name, fn, args in [
        ("bf16", j_bf16, (q, k, v, anc)),
        ("int8", j_i8, (q, kq, vq, ks, vs, anc)),
    ]:
        out = fn(*args)
        _ = np.asarray(out[0, 0, 0])  # compile+sync
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        _ = np.asarray(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        bytes_slab = 2 * L * BK * HP * C * LANE * (2 if name == "bf16" else 1)
        gbps = bytes_slab / (dt / 1e3) / 1e9
        print(json.dumps({
            "metric": f"beam_self_chain32_{name}_B{B}K{K}C{C}",
            "value": round(dt, 3), "unit": "ms",
            "slab_gbps": round(gbps, 1),
        }))


if __name__ == "__main__":
    main()
