"""Self-KV-cache dtype probe: can the paired self-attention slab stream
faster than bf16 without per-position scale storage?

Candidates: bf16 (today), float8_e4m3fn / float8_e5m2 (scale-free float
storage, industry-standard KV-cache dtype — convert should fuse into the
score/AV contractions like int8 does on the cross slab), int8-raw (no
scales — NOT numerically valid, measured only to bound the convert cost).

Mimics decoder_step's paired self-attention chain at the headline shape:
append one row per step (shared-pos DUS) + masked paired attention read,
64 steps in one on-device while_loop. The beam path reads K=5× this slab
per step, so a 2× dtype win is ~2× on beam throughput (docs/PERF.md).

Prints one JSON line per dtype. Env: BENCH_BATCH (56), BENCH_STEPS (64).
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

B = int(os.environ.get("BENCH_BATCH", "56"))
STEPS = int(os.environ.get("BENCH_STEPS", "64"))
L = int(os.environ.get("BENCH_LAYERS", "32"))
HP = 10  # large-v3 head pairs
C = 160
LANE = 128


@functools.partial(jax.jit, static_argnames=("n_steps",))
def loop(n_steps, k_slab, v_slab, q2, new_row):
    """Per step, per layer: append + paired masked attention read."""

    def body(state):
        i, k_all, v_all, acc = state
        pos = jnp.int32(64) + (i % 32)
        mask = (jnp.arange(C) <= pos)[None, None, None, :]  # [1,1,1,C]
        out_sum = acc
        for li in range(L):
            k_l = k_all[li]
            v_l = v_all[li]
            row = (new_row + 0.001 * i.astype(jnp.float32)).astype(k_all.dtype)
            k_all = jax.lax.dynamic_update_slice(
                k_all, row[None, :, :, None, :], (li, 0, 0, pos, 0)
            )
            scores = jax.lax.dot_general(
                q2, k_l.astype(jnp.bfloat16),
                dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            )  # [S,Hp,2,C]
            scores = jnp.where(mask, scores, -1e30)
            w = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                w, v_l.astype(jnp.bfloat16),
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            )  # [S,Hp,2,128]
            out_sum = out_sum + jnp.sum(out, axis=(1, 2, 3))
        return i + 1, k_all, v_all, out_sum

    _, _, _, acc = jax.lax.while_loop(
        lambda s: s[0] < n_steps, body,
        (jnp.int32(0), k_slab, v_slab, jnp.zeros((B,), jnp.float32)),
    )
    return acc


def main():
    rng = np.random.default_rng(0)
    q2np = (rng.standard_normal((B, HP, 2, LANE)) * 0.1).astype(np.float32)
    # zero-pad the pairing pattern like _pair_queries
    q2np[:, :, 0, 64:] = 0.0
    q2np[:, :, 1, :64] = 0.0
    q2 = jnp.asarray(q2np, jnp.bfloat16)
    slab_np = (rng.standard_normal((L, B, HP, C, LANE)) * 0.2).astype(np.float32)
    row_np = (rng.standard_normal((B, HP, LANE)) * 0.2).astype(np.float32)

    dtypes = [
        ("bf16", jnp.bfloat16),
        ("f8_e4m3", jnp.float8_e4m3fn),
        ("f8_e5m2", jnp.float8_e5m2),
        ("int8_raw", jnp.int8),
    ]
    for name, dt in dtypes:
        try:
            if dt == jnp.int8:
                k_slab = jnp.asarray(
                    np.clip(slab_np * 127, -127, 127).astype(np.int8)
                )
                v_slab = k_slab
                row = jnp.asarray((row_np * 127).astype(np.float32))
            else:
                k_slab = jnp.asarray(slab_np, dt)
                v_slab = jnp.asarray(slab_np, dt)
                row = jnp.asarray(row_np, jnp.float32)
            fn = lambda: loop(STEPS, k_slab, v_slab, q2, row)
            out = fn()
            _ = float(np.asarray(out)[0])  # sync incl. compile
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn()
            _ = float(np.asarray(out)[0])
            dt_s = (time.perf_counter() - t0) / 3
            ms = dt_s / STEPS * 1e3
            gbs = (2 * L * B * HP * C * LANE * jnp.dtype(dt).itemsize) / (
                dt_s / STEPS
            ) / 1e9
            print(
                json.dumps(
                    {
                        "metric": f"selfcache_{name}_b{B}",
                        "value": round(ms, 3),
                        "unit": "ms/step",
                        "actual_GBps": round(gbs, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — dtype unsupported on backend
            print(json.dumps({"metric": f"selfcache_{name}_b{B}",
                              "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
