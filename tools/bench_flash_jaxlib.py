"""Probe: our encoder flash kernel vs jax's bundled Pallas TPU kernel.

The production kernel (ops/flash_attention.py) measures ~23-27 TFLOPS at
the large-v3 encoder shape [B,20,1500,64] — well under the ~90 TFLOPS
bound set by K=64/N=64 MXU shapes (docs/PERF.md). jaxlib ships a heavily
tuned flash kernel (jax.experimental.pallas.ops.tpu.flash_attention);
if it lands materially faster at this exact shape, the encoder should
call it (library use, not reference-code copying).

Prints one JSON line per variant with ms and achieved TFLOPS.
BENCH_BATCH / BENCH_BQ / BENCH_BK env knobs.
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

from sentiric_stt_whisper_service_tpu.ops.flash_attention import (
    flash_attention as ours,
)

B = int(os.environ.get("BENCH_BATCH", "16"))
H, L, D = 20, 1500, 64
ITERS = 20


def timeit(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(out if os.environ.get("BENCH_CHAIN") == "1" else args[0],
                 *args[1:])
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.1, jnp.bfloat16)
    flops = 4 * B * H * L * L * D

    ref = None
    results = {}

    @jax.jit
    def run_ours(q, k, v):
        return ours(q, k, v)

    dt = timeit(run_ours, q, k, v)
    results["ours"] = dt
    out_ours = run_ours(q, k, v)
    print(json.dumps({"variant": "ours", "ms": round(dt * 1e3, 3),
                      "tflops": round(flops / dt / 1e12, 1)}), flush=True)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as theirs,
    )

    # jaxlib kernel wants the seq divisible by its blocks: pad 1500 → 1536
    # and mask the pad rows out via segment ids (pad gets segment 2).
    LP = 1536
    pad = ((0, 0), (0, 0), (0, LP - L), (0, 0))
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)
    seg_q = jnp.concatenate(
        [jnp.ones((B, L), jnp.int32), jnp.full((B, LP - L), 2, jnp.int32)], 1)
    seg = SegmentIds(q=seg_q, kv=seg_q)

    for name, bs in [
        ("jaxlib_default", None),
        ("jaxlib_512", BlockSizes(block_q=512, block_k_major=512,
                                  block_k=512, block_b=1)),
        ("jaxlib_768", BlockSizes(block_q=768, block_k_major=768,
                                  block_k=768, block_b=1)),
    ]:
        try:
            @jax.jit
            def run_theirs(q, k, v, bs=bs):
                return theirs(q, k, v, segment_ids=seg, sm_scale=1.0,
                              block_sizes=bs)

            dt = timeit(run_theirs, qp, kp, vp)
            out_t = run_theirs(qp, kp, vp)[:, :, :L]
            err = float(
                jnp.max(jnp.abs(out_t.astype(jnp.float32)
                                - out_ours.astype(jnp.float32)))
            )
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                              "tflops": round(flops / dt / 1e12, 1),
                              "max_abs_diff_vs_ours": round(err, 5)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — probe: report and move on
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
