"""Probe: HYBRID beam self-attention — periodic physical compaction.

The shipped beam step (decoder_step_beam + ops/beam_attention.py) reads
ALL K slots' caches through the ancestry mask every step; every measured
formulation of that masked cross-slot read tops out at ~280-294 GB/s —
HALF the ~568 GB/s the greedy chain streams on the same paired slabs
(docs/PERF.md "Beam self-attention platform wall"). VERDICT r3 #6.

Hybrid design measured here: compact the slab every M steps (physically
rewrite each beam's history into its own slot per the ancestry mask,
then reset the mask to identity on the compacted prefix). Between
compactions each destination beam's history splits into
  * COLD rows [0, t0): owned — its own slot, contiguous → the exact
    greedy-shaped batched attention ([BK] batch, paired M=2 query trick)
    that streams at ~568 GB/s;
  * HOT rows [t0, pos): slot-scattered — the masked cross-slot XLA form,
    but over only M rows (scores [B,Hp,2K,K,M] are tiny);
merged by a flash-style two-part online-softmax combine (exact).

Variants (paired slabs, lane=128, 32-layer chains, real chip):
  base        : production Pallas kernel over full C
  xla_slots   : masked cross-slot XLA over full C (kernel's XLA twin)
  hybrid      : cold greedy-shape [0,t0) + hot masked [t0,C) + merge
  compact     : the every-M-steps compaction rewrite itself (einsum
                one-hot adopt-parent copy over all 32 layers) — amortize
                by /M for the per-step equivalent
Numerics: hybrid vs beam_attention_reference under a compaction-shaped
ancestry (identity below t0, random one-hot above) — must match.
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

B = int(os.environ.get("BENCH_BATCH", "8"))
K = int(os.environ.get("BENCH_BEAM", "5"))
H, HD = 20, 64
C = int(os.environ.get("BENCH_C", "160"))
M = int(os.environ.get("BENCH_HOT", "32"))  # hot window (compact every M)
L = 32
NEG = jnp.float32(-1e30)
SCALE = HD**-0.5
T0 = C - M


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


def main():
    rng = np.random.default_rng(0)
    BK = B * K
    Hp = H // 2
    lane = 2 * HD
    tile = jax.jit(lambda x: jnp.tile(x[None], (L,) + (1,) * x.ndim))
    k5 = jax.block_until_ready(tile(jnp.asarray(
        (rng.standard_normal((BK, Hp, C, lane)) * 0.3).astype(np.float32),
        jnp.bfloat16)))
    v5 = jax.block_until_ready(tile(jnp.asarray(
        (rng.standard_normal((BK, Hp, C, lane)) * 0.3).astype(np.float32),
        jnp.bfloat16)))
    q = jnp.asarray(rng.standard_normal((BK, H, HD)) * 0.3, jnp.bfloat16)

    # Compaction-shaped ancestry: identity below t0 (each beam owns its
    # compacted prefix), random one-hot parents above (the live window).
    anc = np.zeros((B, K, K, C), np.float32)
    for kd in range(K):
        anc[:, kd, kd, :T0] = 1.0
    parents = rng.integers(0, K, size=(B, K, C - T0))
    for b in range(B):
        for kd in range(K):
            for i, ks in enumerate(parents[b, kd]):
                anc[b, kd, ks, T0 + i] = 1.0
    anc_j = jnp.asarray(anc)

    slab_bytes = 2 * L * BK * Hp * C * lane * 2

    # --- base: production kernel ---
    def base_fn(carry, layer, anc_):
        o = beam_attention(carry.reshape(BK, H, HD), layer["k"], layer["v"],
                           anc_, K, scale=SCALE)
        return o.reshape(BK, H * HD)

    dt = timeit_chain(base_fn, q.reshape(BK, H * HD), {"k": k5, "v": v5},
                      anc_j)
    print(json.dumps({"variant": "base_kernel",
                      "ms_32layer": round(dt * 1e3, 3),
                      "slab_GBps": round(slab_bytes / dt / 1e9, 1)}),
          flush=True)

    def pair_q(qx):  # [BK,H,HD] → [BK,Hp,2,128] pre-scaled (greedy trick)
        qr = (qx.astype(jnp.float32) * SCALE).astype(qx.dtype)
        qr = qr.reshape(BK, Hp, 2, HD)
        z = jnp.zeros_like(qr[:, :, :1])
        return jnp.concatenate(
            [jnp.concatenate([qr[:, :, :1], z], axis=-1),
             jnp.concatenate([z, qr[:, :, 1:]], axis=-1)], axis=2,
        )  # [BK, Hp, 2, 128]

    def unpair_o(o):  # [BK,Hp,2,128] → [BK,H,HD]
        o5 = o.reshape(BK, Hp, 2, 2, HD)
        return jnp.concatenate(
            [o5[:, :, 0, 0], o5[:, :, 1, 1]], axis=-1
        ).reshape(BK, H, HD)

    # --- xla_slots twin over full C (docs/PERF.md round-3 probe) ---
    def xla_slots_fn(carry, layer, anc_):
        qx = carry.reshape(BK, H, HD)
        qb = pair_q(qx).reshape(B, K, Hp, 2, lane).transpose(0, 2, 3, 1, 4)
        q_bh = qb.reshape(B, Hp, 2 * K, lane)  # rows: head r, beam k = r*K+k
        k5v = layer["k"].reshape(B, K, Hp, C, lane)
        v5v = layer["v"].reshape(B, K, Hp, C, lane)
        scores = jax.lax.dot_general(
            q_bh, k5v,
            dimension_numbers=(((3,), (4,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32,
        )  # [B, Hp, 2K, K, C]
        a2 = anc_.transpose(0, 2, 1, 3)  # [B, Ks, Kd, C] → broadcast rows
        a2 = jnp.concatenate([anc_, anc_], axis=1)  # [B, 2K, K, C]
        scores = jnp.where(a2[:, None] > 0, scores, NEG)
        sh = scores.shape
        w = jax.nn.softmax(scores.reshape(sh[:3] + (K * C,)), axis=-1
                           ).reshape(sh)
        o = jax.lax.dot_general(
            w.astype(v5v.dtype), v5v,
            dimension_numbers=(((3, 4), (1, 3)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32,
        ).astype(carry.dtype)  # [B, Hp, 2K, lane]
        o = o.reshape(B, Hp, 2, K, lane).transpose(0, 3, 1, 2, 4)
        return unpair_o(o.reshape(BK, Hp, 2, lane)).reshape(BK, H * HD)

    dt = timeit_chain(xla_slots_fn, q.reshape(BK, H * HD),
                      {"k": k5, "v": v5}, anc_j)
    print(json.dumps({"variant": "xla_slots",
                      "ms_32layer": round(dt * 1e3, 3),
                      "slab_GBps": round(slab_bytes / dt / 1e9, 1)}),
          flush=True)

    # --- hybrid: cold greedy-shape + hot masked slots + flash merge ---
    anc_hot = jnp.asarray(anc[:, :, :, T0:])  # [B, Kd, Ks, M]

    def hybrid_fn(carry, layer, anc_h):
        qx = carry.reshape(BK, H, HD)
        qp = pair_q(qx)  # [BK, Hp, 2, 128]

        # COLD: own slot, rows [0, t0) — exact greedy batched attention.
        kc = layer["k"][:, :, :T0]  # [BK, Hp, T0, lane]
        vc = layer["v"][:, :, :T0]
        s_c = jax.lax.dot_general(
            qp, kc,
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [BK, Hp, 2, T0]
        m_c = jnp.max(s_c, axis=-1, keepdims=True)
        e_c = jnp.exp(s_c - m_c)
        l_c = jnp.sum(e_c, axis=-1, keepdims=True)
        o_c = jax.lax.dot_general(
            e_c.astype(vc.dtype), vc,
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [BK, Hp, 2, 128] fp32

        # HOT: masked cross-slot over rows [t0, C) — M rows only.
        q_bh = (qp.reshape(B, K, Hp, 2, lane).transpose(0, 2, 3, 1, 4)
                .reshape(B, Hp, 2 * K, lane))
        kh = layer["k"][:, :, T0:].reshape(B, K, Hp, M, lane)
        vh = layer["v"][:, :, T0:].reshape(B, K, Hp, M, lane)
        s_h = jax.lax.dot_general(
            q_bh, kh,
            dimension_numbers=(((3,), (4,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32,
        )  # [B, Hp, 2K, K, M]
        a2 = jnp.concatenate([anc_h, anc_h], axis=1)  # [B, 2K, K, M]
        s_h = jnp.where(a2[:, None] > 0, s_h, NEG)
        sh = s_h.shape
        s_hf = s_h.reshape(sh[:3] + (K * M,))
        m_h = jnp.max(s_hf, axis=-1, keepdims=True)
        e_h = jnp.exp(s_hf - m_h)
        l_h = jnp.sum(e_h, axis=-1, keepdims=True)
        o_h = jax.lax.dot_general(
            e_h.reshape(sh).astype(vh.dtype), vh,
            dimension_numbers=(((3, 4), (1, 3)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32,
        )  # [B, Hp, 2K, 128] fp32

        # Align hot → cold row layout [BK, Hp, 2, ...].
        o_h = (o_h.reshape(B, Hp, 2, K, lane).transpose(0, 3, 1, 2, 4)
               .reshape(BK, Hp, 2, lane))
        m_h = (m_h.reshape(B, Hp, 2, K, 1).transpose(0, 3, 1, 2, 4)
               .reshape(BK, Hp, 2, 1))
        l_h = (l_h.reshape(B, Hp, 2, K, 1).transpose(0, 3, 1, 2, 4)
               .reshape(BK, Hp, 2, 1))

        # Flash merge (exact two-part softmax combine).
        m = jnp.maximum(m_c, m_h)
        wc = jnp.exp(m_c - m)
        wh = jnp.exp(m_h - m)
        o = (o_c * wc + o_h * wh) / (l_c * wc + l_h * wh)
        return unpair_o(o.astype(carry.dtype).reshape(BK, Hp, 2, lane)
                        ).reshape(BK, H * HD)

    dt = timeit_chain(hybrid_fn, q.reshape(BK, H * HD),
                      {"k": k5, "v": v5}, anc_hot)
    print(json.dumps({"variant": f"hybrid_hot{M}",
                      "ms_32layer": round(dt * 1e3, 3),
                      "slab_GBps": round(slab_bytes / dt / 1e9, 1)}),
          flush=True)

    # --- cold_only: PURE greedy-shaped attention over the full C rows of
    # each beam's own slot (what the hybrid's cold part would cost if the
    # whole history were compacted) — isolates the stream rate of the
    # greedy formulation at this row count, no mask, no merge. ---
    def cold_only_fn(carry, layer, _):
        qx = carry.reshape(BK, H, HD)
        qp = pair_q(qx)
        s_c = jax.lax.dot_general(
            qp, layer["k"],
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )
        w = jax.nn.softmax(s_c, axis=-1)
        o = jax.lax.dot_general(
            w.astype(layer["v"].dtype), layer["v"],
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        ).astype(carry.dtype)
        return unpair_o(o).reshape(BK, H * HD)

    dt = timeit_chain(cold_only_fn, q.reshape(BK, H * HD),
                      {"k": k5, "v": v5}, anc_hot)
    print(json.dumps({"variant": "cold_only_greedy_shape",
                      "ms_32layer": round(dt * 1e3, 3),
                      "slab_GBps": round(slab_bytes / dt / 1e9, 1)}),
          flush=True)

    # numerics: hybrid vs reference under the compaction-shaped ancestry
    o_hy = hybrid_fn(q.reshape(BK, H * HD), {"k": k5[0], "v": v5[0]}, anc_hot)
    o_ref = beam_attention_reference(q, k5[0], v5[0], anc_j, K, scale=SCALE)
    err = float(jnp.max(jnp.abs(o_hy.reshape(BK, H, HD).astype(jnp.float32)
                                - o_ref.astype(jnp.float32))))
    print(json.dumps({"check": "hybrid_vs_ref_maxabs",
                      "value": round(err, 5)}), flush=True)

    # --- compaction rewrite cost (einsum one-hot adopt-parent copy of
    # rows [0, t0) for all layers; amortized per step = /M) ---
    anc_cold = jnp.asarray(anc[:, :, :, :T0])  # identity here, but the
    # rewrite cost is mask-independent (dense one-hot contraction)

    @jax.jit
    def compact(kv, anc_):
        def body(c, layer):
            k6 = layer["k"].reshape(B, K, Hp, C, lane)
            v6 = layer["v"].reshape(B, K, Hp, C, lane)
            kc = jnp.einsum("bdsc,bshcl->bdhcl", anc_,
                            k6[:, :, :, :T0].astype(jnp.bfloat16))
            vc = jnp.einsum("bdsc,bshcl->bdhcl", anc_,
                            v6[:, :, :, :T0].astype(jnp.bfloat16))
            nk = jax.lax.dynamic_update_slice(
                k6, kc.astype(k6.dtype), (0, 0, 0, 0, 0))
            nv = jax.lax.dynamic_update_slice(
                v6, vc.astype(v6.dtype), (0, 0, 0, 0, 0))
            return c + jnp.float32(jnp.sum(nk[..., :1].astype(jnp.float32))), None

        out, _ = jax.lax.scan(body, jnp.float32(0), kv)
        return out

    out = compact({"k": k5, "v": v5}, anc_cold)
    _ = float(out)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        out = compact({"k": k5, "v": v5}, anc_cold)
    _ = float(out)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": "compact_rewrite",
                      "ms_32layer": round(dt * 1e3, 3),
                      "per_step_amortized_ms": round(dt * 1e3 / M, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
