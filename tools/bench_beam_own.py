"""Probe: is the beam self-attention wall caused by the cross-slot masked
(all-pairs) formulation, or intrinsic to the slab shape?

Background (docs/PERF.md "Beam path"): every exact beam formulation —
Pallas kernel, folded XLA, slot-read XLA — lands at ~280-294 GB/s on the
paired bf16 self slab, HALF the ~568 GB/s the greedy decode chain gets.
All of those variants are ALL-PAIRS reads: each destination beam's scores
contract against every source slot with an ancestry mask. The one form
never measured is a PURE OWN-SLOT read at beam shapes (BK=80): M=2 paired
queries per slot, position mask only — exactly the greedy access pattern.

If own-slot at BK=80 streams ~568 GB/s, a periodic-compaction design wins:
every S steps physically gather the last S rows by ancestry into each
beam's own slot (cheap: S rows, amortized), then per-step attention =
fast own-slot read over the compacted prefix [0,P) + all-pairs read over
the small live window [P,pos) + exact joint softmax. This probe measures
that combined shape too.

Variants (32-layer chained loops, one process, bf16 paired slabs):
  allpairs : folded [B,Hp,K*C,128] masked XLA (today's wall, baseline)
  own      : [BK,Hp,C,128] own-slot, M=2 paired queries, position mask
  own_win  : own over [0,C-W) + all-pairs over [C-W,C) + joint softmax
  own56    : greedy shape [56,Hp,C,128] (the 568 GB/s reference, in-proc)
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

B = int(os.environ.get("BENCH_BATCH", "16"))
K = int(os.environ.get("BENCH_BEAM", "5"))
H, HD = 20, 64
C = int(os.environ.get("BENCH_C", "160"))
W = int(os.environ.get("BENCH_W", "32"))  # live (uncompacted) window rows
L = 32
NEG = jnp.float32(-1e30)
SCALE = HD**-0.5


def timeit_chain(fn, q, kvs, extra, iters=8):
    @jax.jit
    def run(q, kvs, extra):
        def body(carry, layer):
            return fn(carry, layer, extra), None

        out, _ = jax.lax.scan(body, q, kvs)
        return out

    out = run(q, kvs, extra)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(q, kvs, extra)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def report(name, dt, slab_bytes):
    print(
        json.dumps(
            {
                "variant": name,
                "ms_32layer": round(dt * 1e3, 3),
                "slab_GBps": round(slab_bytes / dt / 1e9, 1),
            }
        ),
        flush=True,
    )


def main():
    rng = np.random.default_rng(0)
    BK = B * K
    Hp = H // 2
    lane = 2 * HD
    tile = jax.jit(lambda x: jnp.tile(x[None], (L,) + (1,) * x.ndim))
    k5 = jax.block_until_ready(
        tile(jnp.asarray((rng.standard_normal((BK, Hp, C, lane)) * 0.3), jnp.bfloat16))
    )
    v5 = jax.block_until_ready(
        tile(jnp.asarray((rng.standard_normal((BK, Hp, C, lane)) * 0.3), jnp.bfloat16))
    )
    q = jnp.asarray(rng.standard_normal((BK, H, HD)) * 0.3, jnp.bfloat16)
    slab_bytes = 2 * L * BK * Hp * C * lane * 2

    def pair_q(qx):  # [BK,H,HD] → [BK,Hp,2,128] pre-scaled (greedy form)
        qr = (qx.astype(jnp.float32) * SCALE).astype(qx.dtype)
        qr = qr.reshape(BK, Hp, 2, HD)
        z = jnp.zeros_like(qr[:, :, :1])
        return jnp.concatenate(
            [
                jnp.concatenate([qr[:, :, :1], z], axis=-1),
                jnp.concatenate([z, qr[:, :, 1:]], axis=-1),
            ],
            axis=2,
        )  # [BK, Hp, 2, 128]

    pos_mask = jnp.ones((1, 1, 1, C), bool)

    # --- own: greedy-pattern own-slot read at BK=80 ---
    def own_fn(carry, layer, _):
        qx = carry.reshape(BK, H, HD)
        q2 = pair_q(qx)
        scores = jax.lax.dot_general(
            q2, layer["k"],
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [BK,Hp,2,C]
        scores = jnp.where(pos_mask, scores, NEG)
        w = jax.nn.softmax(scores, axis=-1).astype(layer["v"].dtype)
        o = jax.lax.dot_general(
            w, layer["v"],
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [BK,Hp,2,128]
        o6 = o.reshape(BK, Hp, 2, 2, HD)
        out = jnp.concatenate([o6[:, :, 0, 0], o6[:, :, 1, 1]], axis=-1)
        return out.reshape(BK, H * HD).astype(carry.dtype)

    dt = timeit_chain(own_fn, q.reshape(BK, H * HD), {"k": k5, "v": v5}, None)
    report("own", dt, slab_bytes)

    # --- allpairs: folded masked XLA (today's beam wall) ---
    kf = (
        k5.reshape(L, B, K, Hp, C, lane).transpose(0, 1, 3, 2, 4, 5)
        .reshape(L, B, Hp, K * C, lane)
    )
    vf = (
        v5.reshape(L, B, K, Hp, C, lane).transpose(0, 1, 3, 2, 4, 5)
        .reshape(L, B, Hp, K * C, lane)
    )
    anc = np.zeros((B, K, K, C), np.float32)
    anc[:, :, 0, :8] = 1.0
    for kd in range(K):
        anc[:, kd, kd, 8:] = 1.0
    anc_fold = jnp.asarray(anc.reshape(B, K, K * C))

    def pair_q_fold(qx):  # [BK,H,HD] → [B,Hp,2K,128]
        qr = (qx.astype(jnp.float32) * SCALE).astype(qx.dtype)
        qr = qr.reshape(B, K, Hp, 2, HD).transpose(0, 2, 3, 1, 4)
        z = jnp.zeros_like(qr[:, :, :1])
        return jnp.concatenate(
            [
                jnp.concatenate([qr[:, :, :1], z], axis=-1),
                jnp.concatenate([z, qr[:, :, 1:]], axis=-1),
            ],
            axis=2,
        ).reshape(B, Hp, 2 * K, lane)

    def unpair_fold(o):  # [B,Hp,2K,128] → [BK, H*HD]
        o6 = o.reshape(B, Hp, 2, K, 2, HD)
        per = jnp.stack([o6[:, :, 0, :, 0], o6[:, :, 1, :, 1]], axis=2)
        return per.transpose(0, 3, 1, 2, 4).reshape(BK, H * HD)

    def allpairs_fn(carry, layer, anc_):
        qx = carry.reshape(BK, H, HD)
        q_bh = pair_q_fold(qx)
        scores = jax.lax.dot_general(
            q_bh, layer["k"],
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [B,Hp,2K,KC]
        anc2 = jnp.concatenate([anc_, anc_], axis=1)
        scores = jnp.where(anc2[:, None] > 0, scores, NEG)
        w = jax.nn.softmax(scores, axis=-1)
        o = jax.lax.dot_general(
            w.astype(layer["v"].dtype), layer["v"],
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        ).astype(carry.dtype)
        return unpair_fold(o).astype(carry.dtype)

    dt = timeit_chain(
        allpairs_fn, q.reshape(BK, H * HD), {"k": kf, "v": vf}, anc_fold
    )
    report("allpairs", dt, slab_bytes)

    # --- own_win: compacted prefix own-read + live window all-pairs ---
    P = C - W
    kw = (
        k5[:, :, :, P:].reshape(L, B, K, Hp, W, lane)
        .transpose(0, 1, 3, 2, 4, 5).reshape(L, B, Hp, K * W, lane)
    )
    vw = (
        v5[:, :, :, P:].reshape(L, B, K, Hp, W, lane)
        .transpose(0, 1, 3, 2, 4, 5).reshape(L, B, Hp, K * W, lane)
    )
    anc_win = jnp.asarray(anc[:, :, :, P:].reshape(B, K, K * W))

    def own_win_fn(carry, layer, anc_):
        qx = carry.reshape(BK, H, HD)
        # part 1: own-slot prefix [0, P)
        q2 = pair_q(qx)
        s1 = jax.lax.dot_general(
            q2, layer["k"][:, :, :P],
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [BK,Hp,2,P]
        # part 2: live window all-pairs
        q_bh = pair_q_fold(qx)
        s2 = jax.lax.dot_general(
            q_bh, layer["kw"],
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [B,Hp,2K,KW]
        anc2 = jnp.concatenate([anc_, anc_], axis=1)
        s2 = jnp.where(anc2[:, None] > 0, s2, NEG)
        # joint softmax across both parts (exact): reshape s2 rows to s1's
        # [BK,Hp,2,KW] row order, concat on the score axis.
        s2r = (
            s2.reshape(B, Hp, 2, K, K * W).transpose(0, 3, 1, 2, 4)
            .reshape(BK, Hp, 2, K * W)
        )
        s = jnp.concatenate([s1, s2r], axis=-1)
        w = jax.nn.softmax(s, axis=-1).astype(layer["v"].dtype)
        o1 = jax.lax.dot_general(
            w[..., :P], layer["v"][:, :, :P],
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [BK,Hp,2,128]
        w2 = (
            w[..., P:].reshape(B, K, Hp, 2, K * W).transpose(0, 2, 3, 1, 4)
            .reshape(B, Hp, 2 * K, K * W)
        )
        o2 = jax.lax.dot_general(
            w2, layer["vw"],
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [B,Hp,2K,128]
        o2r = (
            o2.reshape(B, Hp, 2, K, lane).transpose(0, 3, 1, 2, 4)
            .reshape(BK, Hp, 2, lane)
        )
        o = o1 + o2r
        o6 = o.reshape(BK, Hp, 2, 2, HD)
        out = jnp.concatenate([o6[:, :, 0, 0], o6[:, :, 1, 1]], axis=-1)
        return out.reshape(BK, H * HD).astype(carry.dtype)

    dt = timeit_chain(
        own_win_fn, q.reshape(BK, H * HD),
        {"k": k5, "v": v5, "kw": kw, "vw": vw}, anc_win,
    )
    report(f"own_win_W{W}", dt, slab_bytes + 2 * L * BK * Hp * W * lane * 2)

    # --- own56: the greedy reference shape in this same process ---
    B56 = 56
    k56 = jax.block_until_ready(
        tile(jnp.asarray((rng.standard_normal((B56, Hp, C, lane)) * 0.3), jnp.bfloat16))
    )
    v56 = jax.block_until_ready(
        tile(jnp.asarray((rng.standard_normal((B56, Hp, C, lane)) * 0.3), jnp.bfloat16))
    )
    q56 = jnp.asarray(rng.standard_normal((B56, H, HD)) * 0.3, jnp.bfloat16)
    mask56 = jnp.ones((1, 1, 1, C), bool)

    def own56_fn(carry, layer, _):
        qx = carry.reshape(B56, H, HD)
        qr = (qx.astype(jnp.float32) * SCALE).astype(qx.dtype).reshape(B56, Hp, 2, HD)
        z = jnp.zeros_like(qr[:, :, :1])
        q2 = jnp.concatenate(
            [
                jnp.concatenate([qr[:, :, :1], z], axis=-1),
                jnp.concatenate([z, qr[:, :, 1:]], axis=-1),
            ],
            axis=2,
        )
        scores = jax.lax.dot_general(
            q2, layer["k"],
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(mask56, scores, NEG)
        w = jax.nn.softmax(scores, axis=-1).astype(layer["v"].dtype)
        o = jax.lax.dot_general(
            w, layer["v"],
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )
        o6 = o.reshape(B56, Hp, 2, 2, HD)
        out = jnp.concatenate([o6[:, :, 0, 0], o6[:, :, 1, 1]], axis=-1)
        return out.reshape(B56, H * HD).astype(carry.dtype)

    dt = timeit_chain(
        own56_fn, q56.reshape(B56, H * HD), {"k": k56, "v": v56}, None
    )
    report("own56", dt, 2 * L * B56 * Hp * C * lane * 2)


if __name__ == "__main__":
    main()
