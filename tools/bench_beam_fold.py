"""Probe: beam self-attention kernel v2 — fold the K slot axis into the
cache-row axis.

The production kernel (ops/beam_attention.py) runs an online softmax over
the K source slots: a python loop of K small batched dots per program.
At B=16 K=5 the in-situ cost is ~6.3 ms/step across 32 layers vs a
~2.6 ms slab-traffic floor (tools/bench_beam_parts.py) — per-program
latency, not bandwidth.

Variants (paired slabs, lane=128):
  base   : production kernel, cache [BK, Hp, C, lane]
  fold   : cache stored [B, Hp, K*C, lane] (K folded into rows); kernel
           does ONE scores dot [Hb,R,lane]x[Hb,KC,lane]^T and one PV dot
           per program — no slot loop. Ancestry mask [Kd, K*C].
  freed  : cache layout unchanged; single dot_general with TWO free dims
           on the rhs ([K, Hb, C, lane], free K+C) — tests whether Mosaic
           fuses the slot loop itself.
Also times the 6-D interior DUS append for the folded layout vs the 5-D
shared-row append (the folded layout's append writes row s*C+pos per
slot — a [*, B, Hp, K, 1, lane] DUS on the 6-D view), since the old
"beam-slot layout" note blames exactly that DUS for a 3.5x regression.

One JSON line per measurement; chained 32-layer loops, real chip.
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

from sentiric_stt_whisper_service_tpu.ops.beam_attention import (
    beam_attention,
    beam_attention_reference,
)

B = int(os.environ.get("BENCH_BATCH", "16"))
K = int(os.environ.get("BENCH_BEAM", "5"))
H, HD = 20, 64
C = int(os.environ.get("BENCH_C", "160"))
L = 32
NEG = -1e30
SCALE = HD**-0.5


# --- folded kernel: cache [B, Hp, K*C, 128], one dot pair per program ---
def _fold_kernel(q_ref, k_ref, v_ref, anc_ref, o_ref, *, k_beams):
    R = q_ref.shape[2]
    dt = k_ref.dtype
    q = q_ref[0].astype(dt)  # [Hb, R, lane] (pre-scaled)
    scores = jax.lax.dot_general(
        q, k_ref[0],  # [Hb,R,lane] x [Hb,KC,lane]
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hb, R, KC]
    anc = anc_ref[0]  # [Kd, KC]
    anc2 = jnp.concatenate([anc, anc], axis=0)  # [2Kd, KC] (paired rows)
    scores = jnp.where(anc2[None] > 0, scores, NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores - m)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        w.astype(dt), v_ref[0],  # [Hb,R,KC] x [Hb,KC,lane]
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k_beams",))
def fold_attention(q_bh, k, v, anc_f, k_beams):
    """q_bh [B, Hp, 2K, 128] (paired, pre-scaled); k/v [B, Hp, K*C, 128];
    anc_f [B, K(dst), K*C] one-hot float. → [B, Hp, 2K, 128]."""
    Bq, Hp, R, lane = q_bh.shape
    KC = k.shape[2]
    Hb = Hp
    while Hb > 1 and 2 * 2 * Hb * KC * lane * k.dtype.itemsize > 8 * 2**20:
        div = next(d for d in range(2, Hb + 1) if Hb % d == 0)
        Hb //= div
    return pl.pallas_call(
        functools.partial(_fold_kernel, k_beams=k_beams),
        grid=(Bq, Hp // Hb),
        in_specs=[
            pl.BlockSpec((1, Hb, R, lane), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hb, KC, lane), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hb, KC, lane), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_beams, KC), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hb, R, lane), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq, Hp, R, lane), q_bh.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * Bq * Hp * R * KC * lane,
            bytes_accessed=2 * Bq * Hp * KC * lane * k.dtype.itemsize,
            transcendentals=Bq * Hp * R * KC,
        ),
    )(q_bh, k, v, anc_f)


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
    ONLY = __import__('os').environ.get('BENCH_ONLY', '')
    rng = np.random.default_rng(0)
    BK = B * K
    Hp = H // 2
    lane = 2 * HD
    # One layer generated on host, tiled L x on device (keeps host RAM and
    # tunnel transfer small; jnp.tile materializes distinct HBM).
    tile = jax.jit(lambda x: jnp.tile(x[None], (L,) + (1,) * x.ndim))
    k5 = jax.block_until_ready(tile(jnp.asarray(
        (rng.standard_normal((BK, Hp, C, lane)) * 0.3).astype(np.float32),
        jnp.bfloat16)))
    v5 = jax.block_until_ready(tile(jnp.asarray(
        (rng.standard_normal((BK, Hp, C, lane)) * 0.3).astype(np.float32),
        jnp.bfloat16)))
    q = jnp.asarray(rng.standard_normal((BK, H, HD)) * 0.3, jnp.bfloat16)

    # valid ancestry: beam kd reads prompt rows from slot 0, own rows from
    # slot kd (an arbitrary but valid one-hot pattern)
    anc = np.zeros((B, K, K, C), np.float32)
    anc[:, :, 0, :8] = 1.0
    for kd in range(K):
        anc[:, kd, kd, 8 : C - 8] = 1.0
    anc_j = jnp.asarray(anc)

    # --- base: production kernel, chained over layers ---
    def base_fn(carry, layer, anc_):
        o = beam_attention(carry.reshape(BK, H, HD), layer["k"], layer["v"],
                           anc_, K, scale=SCALE)
        return o.reshape(BK, H * HD)

    dt = timeit_chain(base_fn, q.reshape(BK, H * HD), {"k": k5, "v": v5},
                      anc_j)
    slab_bytes = 2 * L * BK * Hp * C * lane * 2
    print(json.dumps({"variant": "base", "ms_32layer": round(dt * 1e3, 3),
                      "slab_GBps": round(slab_bytes / dt / 1e9, 1)}),
          flush=True)

    # --- fold: [B, Hp, K*C, 128] layout ---
    kf = (k5.reshape(L, B, K, Hp, C, lane).transpose(0, 1, 3, 2, 4, 5)
          .reshape(L, B, Hp, K * C, lane))
    vf = (v5.reshape(L, B, K, Hp, C, lane).transpose(0, 1, 3, 2, 4, 5)
          .reshape(L, B, Hp, K * C, lane))
    anc_fold = jnp.asarray(anc.transpose(0, 1, 2, 3).reshape(B, K, K * C))

    def pair_q(qx):  # [BK,H,HD] → [B,Hp,2K,128] pre-scaled
        qr = (qx.astype(jnp.float32) * SCALE).astype(qx.dtype)
        qr = qr.reshape(B, K, Hp, 2, HD).transpose(0, 2, 3, 1, 4)
        z = jnp.zeros_like(qr[:, :, :1])
        return jnp.concatenate(
            [jnp.concatenate([qr[:, :, :1], z], axis=-1),
             jnp.concatenate([z, qr[:, :, 1:]], axis=-1)], axis=2
        ).reshape(B, Hp, 2 * K, lane)

    def unpair_o(o):  # [B,Hp,2K,128] → [BK,H,HD]
        o5 = o.reshape(B, Hp, 2, K, lane)
        per = jnp.stack([o5[:, :, 0, :, :HD], o5[:, :, 1, :, HD:]], axis=2)
        return per.transpose(0, 3, 1, 2, 4).reshape(BK, H, HD)

    def fold_fn(carry, layer, anc_):
        qx = carry.reshape(BK, H, HD)
        o = fold_attention(pair_q(qx), layer["k"], layer["v"], anc_, K)
        return unpair_o(o).reshape(BK, H * HD)

    dt = timeit_chain(fold_fn, q.reshape(BK, H * HD), {"k": kf, "v": vf},
                      anc_fold)
    print(json.dumps({"variant": "fold", "ms_32layer": round(dt * 1e3, 3),
                      "slab_GBps": round(slab_bytes / dt / 1e9, 1)}),
          flush=True)

    # --- xla_fold: plain XLA attention over the folded [B,Hp,KC,lane]
    # layout (one dot pair + masked softmax; intermediates are only
    # [B,Hp,2K,KC] fp32 ≈ 10 MB/layer at B=16 — the greedy-path _attend
    # pattern that streams paired slabs at ~678 GB/s) ---
    NEGF = jnp.float32(-1e30)

    def xla_fold_fn(carry, layer, anc_):
        qx = carry.reshape(BK, H, HD)
        q_bh = pair_q(qx)  # [B, Hp, 2K, 128] pre-scaled
        scores = jax.lax.dot_general(
            q_bh, layer["k"],
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [B, Hp, 2K, KC]
        anc2 = jnp.concatenate([anc_, anc_], axis=1)  # [B, 2K, KC]
        scores = jnp.where(anc2[:, None] > 0, scores, NEGF)
        w = jax.nn.softmax(scores, axis=-1)
        o = jax.lax.dot_general(
            w.astype(layer["v"].dtype), layer["v"],
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        ).astype(carry.dtype)  # [B, Hp, 2K, lane]
        return unpair_o(o).reshape(BK, H * HD)

    dt = timeit_chain(xla_fold_fn, q.reshape(BK, H * HD),
                      {"k": kf, "v": vf}, anc_fold)
    print(json.dumps({"variant": "xla_fold",
                      "ms_32layer": round(dt * 1e3, 3),
                      "slab_GBps": round(slab_bytes / dt / 1e9, 1)}),
          flush=True)
    o_xf = xla_fold_fn(q.reshape(BK, H * HD), {"k": kf[0], "v": vf[0]},
                       anc_fold)
    o_ref0 = beam_attention_reference(q, k5[0], v5[0], anc_j, K, scale=SCALE)
    err = float(jnp.max(jnp.abs(
        o_xf.reshape(BK, H, HD).astype(jnp.float32)
        - o_ref0.astype(jnp.float32))))
    print(json.dumps({"check": "xla_fold_vs_ref_maxabs",
                      "value": round(err, 5)}), flush=True)

    # --- xla_slots: the 5-D slot cache (fast append) read by ONE XLA
    # dot_general with TWO rhs free dims (K, C): batch (B, Hp), contract
    # lane. Intermediates [B,Hp,2K,K,C] fp32 ≈ 5 MB/layer; slab DMA is
    # the paired full-lane pattern that streams at ~568 GB/s in the
    # greedy path. If this lands near 2.1 GB / 568 GB/s ≈ 3.7 ms, it
    # beats the kernel AND takes f8 storage. ---
    def xla_slots_fn(carry, layer, anc_):
        qx = carry.reshape(BK, H, HD)
        q_bh = pair_q(qx)  # [B, Hp, 2K, 128]
        k5v = layer["k"].reshape(B, K, Hp, C, lane)
        v5v = layer["v"].reshape(B, K, Hp, C, lane)
        if k5v.dtype != q_bh.dtype:
            k5v = k5v.astype(q_bh.dtype)
            v5v = v5v.astype(q_bh.dtype)
        scores = jax.lax.dot_general(
            q_bh, k5v,
            dimension_numbers=(((3,), (4,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32,
        )  # [B, Hp, 2K, K, C]
        anc2 = jnp.concatenate([anc_, anc_], axis=1)  # [B, 2K, K, C]
        scores = jnp.where(anc2[:, None] > 0, scores, jnp.float32(-1e30))
        sh = scores.shape
        w = jax.nn.softmax(
            scores.reshape(sh[:3] + (K * C,)), axis=-1
        ).reshape(sh)
        o = jax.lax.dot_general(
            w.astype(v5v.dtype), v5v,
            dimension_numbers=(((3, 4), (1, 3)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32,
        ).astype(carry.dtype)  # [B, Hp, 2K, lane]
        return unpair_o(o).reshape(BK, H * HD)

    anc_slots = jnp.asarray(anc)  # [B, Kd, Ks, C]
    for nm, cast in (("xla_slots", None), ("xla_slots_f8", jnp.float8_e4m3fn)):
        ks = {"k": k5, "v": v5}
        if cast is not None:
            ks = jax.tree.map(lambda a: a.astype(cast), ks)
            ks = jax.block_until_ready(ks)
        dt = timeit_chain(xla_slots_fn, q.reshape(BK, H * HD), ks, anc_slots)
        nb = slab_bytes if cast is None else slab_bytes // 2
        print(json.dumps({"variant": nm, "ms_32layer": round(dt * 1e3, 3),
                          "slab_GBps_own_bytes": round(nb / dt / 1e9, 1)}),
              flush=True)
    o_xs = xla_slots_fn(q.reshape(BK, H * HD), {"k": k5[0], "v": v5[0]},
                        anc_slots)
    o_ref1 = beam_attention_reference(q, k5[0], v5[0], anc_j, K, scale=SCALE)
    err = float(jnp.max(jnp.abs(
        o_xs.reshape(BK, H, HD).astype(jnp.float32)
        - o_ref1.astype(jnp.float32))))
    print(json.dumps({"check": "xla_slots_vs_ref_maxabs",
                      "value": round(err, 5)}), flush=True)

    # --- xla_hm: HEAD-MAJOR slot cache [Hp, BK, C, lane] — batch dims
    # (Hp, B) adjacent and leading, free dims (K, C) adjacent → XLA needs
    # NO operand transpose (the greedy cache's winning property; every
    # (B, .., Hp, ..) beam layout above forces a per-layer slab copy).
    # Append stays a shared-offset DUS on the C axis. ---
    def xla_hm_fn(carry, layer, anc_):
        qx = carry.reshape(BK, H, HD)
        q_bh = pair_q(qx).transpose(1, 0, 2, 3)  # [Hp, B, 2K, 128]
        k5v = layer["k"].reshape(Hp, B, K, C, lane)
        v5v = layer["v"].reshape(Hp, B, K, C, lane)
        if k5v.dtype != q_bh.dtype:
            k5v = k5v.astype(q_bh.dtype)
            v5v = v5v.astype(q_bh.dtype)
        scores = jax.lax.dot_general(
            q_bh, k5v,
            dimension_numbers=(((3,), (4,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [Hp, B, 2K, K, C]
        anc2 = jnp.concatenate([anc_, anc_], axis=1)  # [B, 2K, K, C]
        scores = jnp.where(anc2[None] > 0, scores, jnp.float32(-1e30))
        sh = scores.shape
        w = jax.nn.softmax(
            scores.reshape(sh[:3] + (K * C,)), axis=-1
        ).reshape(sh)
        o = jax.lax.dot_general(
            w.astype(v5v.dtype), v5v,
            dimension_numbers=(((3, 4), (2, 3)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        ).astype(carry.dtype)  # [Hp, B, 2K, lane]
        return unpair_o(o.transpose(1, 0, 2, 3)).reshape(BK, H * HD)

    to_hm = jax.jit(
        lambda a: a.transpose(0, 2, 1, 3, 4).reshape(L, Hp, BK, C, lane))
    k_hm = jax.block_until_ready(to_hm(k5))
    v_hm = jax.block_until_ready(to_hm(v5))
    for nm, cast in (("xla_hm", None), ("xla_hm_f8", jnp.float8_e4m3fn)):
        ks = {"k": k_hm, "v": v_hm}
        if cast is not None:
            ks = jax.block_until_ready(
                jax.tree.map(lambda a: a.astype(cast), ks))
        dt = timeit_chain(xla_hm_fn, q.reshape(BK, H * HD), ks,
                          jnp.asarray(anc))
        nb = slab_bytes if cast is None else slab_bytes // 2
        print(json.dumps({"variant": nm, "ms_32layer": round(dt * 1e3, 3),
                          "slab_GBps_own_bytes": round(nb / dt / 1e9, 1)}),
              flush=True)
    o_hm = xla_hm_fn(q.reshape(BK, H * HD), {"k": k_hm[0], "v": v_hm[0]},
                     jnp.asarray(anc))
    o_ref2 = beam_attention_reference(q, k5[0], v5[0], anc_j, K, scale=SCALE)
    err = float(jnp.max(jnp.abs(
        o_hm.reshape(BK, H, HD).astype(jnp.float32)
        - o_ref2.astype(jnp.float32))))
    print(json.dumps({"check": "xla_hm_vs_ref_maxabs",
                      "value": round(err, 5)}), flush=True)

    # head-major append cost: DUS at (li, 0, 0, pos, 0), update
    # [1, Hp, BK, 1, lane] — same class as the production append.
    new_hm = jnp.asarray(rng.standard_normal((Hp, BK, lane)), jnp.bfloat16)

    @jax.jit
    def app_hm(cache, new, pos):
        def body(c, li):
            c = jax.lax.dynamic_update_slice(
                c, new[None, :, :, None, :], (li, 0, 0, pos, 0))
            return c, None
        out, _ = jax.lax.scan(body, cache, jnp.arange(L))
        return out

    out = app_hm(k_hm, new_hm, 64)
    _ = float(jnp.sum(out[0, 0, 0, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(8):
        out = app_hm(out, new_hm, 64)
    _ = float(jnp.sum(out[0, 0, 0, :1].astype(jnp.float32)))
    print(json.dumps({"variant": "append_hm",
                      "ms_32layer": round((time.perf_counter() - t0) / 8 * 1e3,
                                          3)}), flush=True)

    # numerics: fold vs XLA reference twin
    o_ref = beam_attention_reference(q, k5[0], v5[0], anc_j, K, scale=SCALE)
    o_fold = unpair_o(fold_attention(pair_q(q), kf[0], vf[0], anc_fold, K))
    err = float(jnp.max(jnp.abs(o_fold.astype(jnp.float32)
                                - o_ref.astype(jnp.float32))))
    print(json.dumps({"check": "fold_vs_ref_maxabs", "value": round(err, 5)}),
          flush=True)

    # --- append cost: 5-D shared-row DUS vs 6-D folded DUS ---
    new = jnp.asarray(rng.standard_normal((BK, Hp, lane)), jnp.bfloat16)

    @jax.jit
    def app5(cache, new, pos):
        def body(c, _):
            c = jax.lax.dynamic_update_slice(
                c, new[None, :, :, None, :], (0, 0, 0, pos, 0))
            return c, None
        out, _ = jax.lax.scan(body, cache, None, length=L)
        return out

    @jax.jit
    def app6(cache, new, pos):
        # cache [L,B,Hp,KC,lane] viewed [L,B,Hp,K,C,lane]; row s*C+pos.
        c6 = cache.reshape(L, B, Hp, K, C, lane)
        n6 = new.reshape(B, K, Hp, lane).transpose(0, 2, 1, 3)[None, :, :, :, None, :]

        def body(c, _):
            c = jax.lax.dynamic_update_slice(c, n6, (0, 0, 0, 0, pos, 0))
            return c, None
        out, _ = jax.lax.scan(body, c6, None, length=L)
        return out.reshape(L, B, Hp, K * C, lane)

    for name, fn_, cache in (("append5", app5, k5), ("append6", app6, kf)):
        out = fn_(cache, new, 64)
        _ = float(jnp.sum(out[0, 0, 0, :1].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn_(out, new, 64)
        _ = float(jnp.sum(out[0, 0, 0, :1].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 8
        print(json.dumps({"variant": name,
                          "ms_32layer": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
