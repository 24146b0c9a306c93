"""Beam self-attention layout microbench (real TPU, large-v3 shapes).

The gather-free beam step reads all K source slots per destination beam
through an ancestry mask. The dot_general's batch dims determine whether
XLA must relayout the cache slab every step. Variants:

  v1   cache [L, BK, H, C, hd], dot batch dims ((0,2),(0,2))   (shipped)
  v3   cache [L, B*H, K, C, hd], dot batch dims ((0,),(0,))    (batch-leading)
  ref  plain lockstep attention on [L, BK, H, C, hd] — no cross-beam
       term (WRONG results; pure append+read traffic floor)

Each variant runs STEPS iterations of (append one row to every layer's
slab + masked attention over all L layers) inside one on-device
while_loop, timed via a scalar pull. One JSON line per variant: ms per
decode step (all L layers).
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

B = int(os.environ.get("BENCH_BATCH", "8"))
K = int(os.environ.get("BENCH_BEAM", "5"))
H = 20
HD = 64
C = 192
L = int(os.environ.get("BENCH_LAYERS", "32"))
STEPS = int(os.environ.get("BENCH_STEPS", "64"))
DT = jnp.bfloat16
BK = B * K
NEG = jnp.float32(-1e30)


def make_anc(rng):
    """Random but valid ancestry: one source slot per (b, kd, c)."""
    src = rng.integers(0, K, size=(B, K, C))
    anc = np.zeros((B, K, K, C), bool)
    b, kd, c = np.meshgrid(
        np.arange(B), np.arange(K), np.arange(C), indexing="ij"
    )
    anc[b, kd, src, c] = True
    return jnp.asarray(anc)


@jax.jit
def run_v1(k_all, v_all, q0, anc):
    mask = anc[:, None]  # [B,1,Kd,Ks,C]

    def body(state):
        i, k_all, v_all, q = state
        pos = jax.lax.rem(i, C)
        for li in range(L):
            new = q  # [BK,H,hd] stand-in for the projected k/v row
            k_all = jax.lax.dynamic_update_slice(
                k_all, new[None, :, :, None, :], (li, 0, 0, pos, 0)
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, new[None, :, :, None, :], (li, 0, 0, pos, 0)
            )
            k = k_all[li].reshape(B, K, H, C, HD)
            v = v_all[li].reshape(B, K, H, C, HD)
            scores = jax.lax.dot_general(
                q.reshape(B, K, H, HD), k,
                dimension_numbers=(((3,), (4,)), ((0, 2), (0, 2))),
                preferred_element_type=jnp.float32,
            )  # [B,H,Kd,Ks,C]
            scores = jnp.where(mask, scores, NEG)
            w = jax.nn.softmax(
                scores.reshape(B, H, K, K * C), axis=-1
            ).reshape(B, H, K, K, C)
            sa = jax.lax.dot_general(
                w.astype(DT), v,
                dimension_numbers=(((3, 4), (1, 3)), ((0, 1), (0, 2))),
                preferred_element_type=jnp.float32,
            )  # [B,H,Kd,hd]
            q = sa.astype(DT).transpose(0, 2, 1, 3).reshape(BK, H, HD)
        return i + 1, k_all, v_all, q

    def cond(state):
        return state[0] < STEPS

    _, _, _, q = jax.lax.while_loop(cond, body, (jnp.int32(0), k_all, v_all, q0))
    return q


@jax.jit
def run_v3(k_all, v_all, q0, anc):
    # k_all/v_all [L, B*H, K, C, hd]; q0 [B*H, K, hd]
    mask = anc[:, None]  # [B,1,Kd,Ks,C]

    def body(state):
        i, k_all, v_all, q = state
        pos = jax.lax.rem(i, C)
        for li in range(L):
            new = q  # [BH, K, hd]
            k_all = jax.lax.dynamic_update_slice(
                k_all, new[None, :, :, None, :], (li, 0, 0, pos, 0)
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, new[None, :, :, None, :], (li, 0, 0, pos, 0)
            )
            k = k_all[li]
            v = v_all[li]
            scores = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((2,), (3,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [BH, Kd, Ks, C]
            s5 = scores.reshape(B, H, K, K, C)
            s5 = jnp.where(mask, s5, NEG)
            w = jax.nn.softmax(s5.reshape(B, H, K, K * C), axis=-1)
            w = w.reshape(B * H, K, K, C)
            sa = jax.lax.dot_general(
                w.astype(DT), v,
                dimension_numbers=(((2, 3), (1, 2)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [BH, Kd, hd]
            q = sa.astype(DT)
        return i + 1, k_all, v_all, q

    def cond(state):
        return state[0] < STEPS

    _, _, _, q = jax.lax.while_loop(cond, body, (jnp.int32(0), k_all, v_all, q0))
    return q


@jax.jit
def run_ref(k_all, v_all, q0):
    def body(state):
        i, k_all, v_all, q = state
        pos = jax.lax.rem(i, C)
        valid = (jnp.arange(C) <= pos)[None, None, None, :]
        for li in range(L):
            new = q
            k_all = jax.lax.dynamic_update_slice(
                k_all, new[None, :, :, None, :], (li, 0, 0, pos, 0)
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, new[None, :, :, None, :], (li, 0, 0, pos, 0)
            )
            k = k_all[li]
            v = v_all[li]
            scores = jax.lax.dot_general(
                q[:, :, None, :], k,
                dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            )  # [BK,H,1,C]
            scores = jnp.where(valid, scores, NEG)
            w = jax.nn.softmax(scores, axis=-1)
            sa = jax.lax.dot_general(
                w.astype(DT), v,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            )  # [BK,H,1,hd]
            q = sa.astype(DT)[:, :, 0]
        return i + 1, k_all, v_all, q

    def cond(state):
        return state[0] < STEPS

    _, _, _, q = jax.lax.while_loop(cond, body, (jnp.int32(0), k_all, v_all, q0))
    return q


@jax.jit
def run_pallas(k_all, v_all, q0, anc_flat):
    from sentiric_stt_whisper_service_tpu.ops.beam_attention import (
        beam_attention,
    )

    def body(state):
        i, k_all, v_all, q = state
        pos = jax.lax.rem(i, C)
        for li in range(L):
            new = q
            k_all = jax.lax.dynamic_update_slice(
                k_all, new[None, :, :, None, :], (li, 0, 0, pos, 0)
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, new[None, :, :, None, :], (li, 0, 0, pos, 0)
            )
            q = beam_attention(
                q, k_all[li], v_all[li], anc_flat, beam_size=K, scale=1.0
            ).astype(DT)
        return i + 1, k_all, v_all, q

    def cond(state):
        return state[0] < STEPS

    _, _, _, q = jax.lax.while_loop(cond, body, (jnp.int32(0), k_all, v_all, q0))
    return q


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / STEPS * 1000


def main():
    rng = np.random.default_rng(0)
    anc = make_anc(rng)
    q_bk = jnp.asarray(rng.standard_normal((BK, H, HD)), DT) * 0.1
    kv_bk = jnp.zeros((L, BK, H, C, HD), DT)
    ms = timeit(run_v1, kv_bk, kv_bk, q_bk, anc)
    print(json.dumps({"metric": "beam_self_attn_v1", "value": round(ms, 3), "unit": "ms/step"}))

    q_bh = jnp.asarray(rng.standard_normal((B * H, K, HD)), DT) * 0.1
    kv_bh = jnp.zeros((L, B * H, K, C, HD), DT)
    ms = timeit(run_v3, kv_bh, kv_bh, q_bh, anc)
    print(json.dumps({"metric": "beam_self_attn_v3", "value": round(ms, 3), "unit": "ms/step"}))

    ms = timeit(run_ref, kv_bk, kv_bk, q_bk)
    print(json.dumps({"metric": "beam_self_attn_floor", "value": round(ms, 3), "unit": "ms/step"}))

    anc_flat = anc.astype(jnp.float32)
    ms = timeit(run_pallas, kv_bk, kv_bk, q_bk, anc_flat)
    print(json.dumps({"metric": "beam_self_attn_pallas", "value": round(ms, 3), "unit": "ms/step"}))


if __name__ == "__main__":
    main()
