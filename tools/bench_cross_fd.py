"""Probe: fused greedy cross-attention over a PAIRED-KF slab.

The shipping decode cross chain (ops/decode_attention.
decode_attention_reference on [L,B,H,hd,F] int8 slabs) measured
~497 GB/s effective at B=56 (tools/bench_cross_i8.py): the fp32
[B,H,1,F] score intermediates round-trip HBM between the two dots, and
the slab's hd=64 sublane dim is half padding in VMEM staging.

This kernel pairs adjacent heads on the SUBLANE axis instead:
slab [B, Hp, 2*hd=128, F] — k_h0 in sublanes 0:63, k_h1 in 64:127, F on
lanes. Queries ride the zero-pad trick ([q_h0|0], [0|q_h1] rows), so one
[R=2,128]x[128,F] dot yields both heads' scores with exact-zero cross
terms; softmax + v_scale stay in VMEM; PV is [2,F]x[F->128]^T
(TRANS_B). MXU time is negligible (M=2 pad 8) — the kernel should be
DMA-bound at the int8 slab's streaming rate.

Variants: xla (shipping), fd8 (kernel, int8), fd4 (kernel, int4 packed
as nibble-pairs on the sublane axis: byte[s,f] = k_h0[s,f] | k_h1[s,f]<<4
— the unpack IS the pairing). One JSON line each: ms/32-layer chain,
effective GB/s vs the variant's own slab bytes, rms error vs fp32.
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

S = int(os.environ.get("BENCH_BATCH", "56"))
H, HD = 20, 64
F = int(os.environ.get("BENCH_F", "1536"))
L = int(os.environ.get("BENCH_LAYERS", "32"))
SCALE = HD**-0.5
Hp = H // 2


def _fd_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *, nibble):
    """One program per (b, head-pair block). Blocks:
    q [Hb, R=2, 128]; k/v [Hb, 128, F] int8 (or [Hb, 64, F] nibble-packed);
    ks/vs [Hb, 2, F] f32; out [Hb, 2, 128]."""
    Hb = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32)  # [Hb, 2, 128], pre-scaled
    outs = []
    for h in range(Hb):  # serial over heads in block; dots are tiny
        kq = k_ref[0, h]
        vq = v_ref[0, h]
        if nibble:
            lo = jnp.left_shift(kq, 4)
            k128 = jnp.concatenate(
                [jnp.right_shift(lo, 4), jnp.right_shift(kq, 4)], axis=0
            ).astype(jnp.bfloat16)  # [128, F]
            lo = jnp.left_shift(vq, 4)
            v128 = jnp.concatenate(
                [jnp.right_shift(lo, 4), jnp.right_shift(vq, 4)], axis=0
            ).astype(jnp.bfloat16)
        else:
            k128 = kq.astype(jnp.bfloat16)
            v128 = vq.astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            q[h].astype(jnp.bfloat16), k128,  # [2,128] x [128,F]
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [2, F]
        scores = scores * ks_ref[0, h]
        m = jnp.max(scores, axis=-1, keepdims=True)
        w = jnp.exp(scores - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        w = (w * vs_ref[0, h]).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            w, v128,  # [2,F] x [128,F] contracting F (TRANS_B)
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [2, 128]
        outs.append(o)
    o_ref[0] = jnp.stack(outs).astype(o_ref.dtype)


INTERPRET = os.environ.get("BENCH_INTERPRET", "0") == "1"


@functools.partial(jax.jit, static_argnames=("nibble",))
def fd_attention(q, k, v, ks, vs, nibble=False):
    """q [S,H,hd] bf16 pre-scaled; k/v [S,Hp,128,F] int8 (or [S,Hp,64,F]
    nibble-packed); ks/vs [S,Hp,2,F] f32. → [S,H,hd] bf16."""
    Sq = q.shape[0]
    qp = q.reshape(Sq, Hp, 2, HD)
    z = jnp.zeros_like(qp[:, :, :1])
    q2 = jnp.concatenate(
        [jnp.concatenate([qp[:, :, :1], z], axis=-1),
         jnp.concatenate([z, qp[:, :, 1:]], axis=-1)], axis=2
    )  # [S, Hp, 2, 128]
    rows = k.shape[2]
    Hb = Hp
    while Hb > 1 and 2 * 2 * Hb * rows * F * k.dtype.itemsize > 8 * 2**20:
        div = next(d for d in range(2, Hb + 1) if Hb % d == 0)
        Hb //= div
    out = pl.pallas_call(
        functools.partial(_fd_kernel, nibble=nibble),
        grid=(Sq, Hp // Hb),
        in_specs=[
            pl.BlockSpec((1, Hb, 2, 128), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hb, rows, F), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hb, rows, F), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hb, 2, F), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hb, 2, F), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hb, 2, 128), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sq, Hp, 2, 128), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * Sq * H * F * HD,
            bytes_accessed=2 * Sq * Hp * rows * F,
            transcendentals=Sq * H * F,
        ),
        interpret=INTERPRET,
    )(
        q2.reshape(Sq, Hp, 2, 128)[:, :, :, :],
        k, v, ks, vs,
    )
    # row 0 lanes [:hd] = head even, row 1 lanes [hd:] = head odd
    return jnp.concatenate(
        [out[:, :, 0, :HD], out[:, :, 1, HD:]], axis=-1
    ).reshape(Sq, H, HD)


def xla_chain(q, k_q, v_q, k_s, v_s):
    """Shipping formulation (decode_attention_reference style) on the
    [S,H,hd,F] int8 slab."""
    scores = jnp.einsum(
        "shd,shdf->shf", q.astype(jnp.bfloat16), k_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * k_s
    w = jax.nn.softmax(scores, axis=-1) * v_s
    return jnp.einsum(
        "shf,shdf->shd", w.astype(jnp.bfloat16), v_q.astype(jnp.bfloat16),
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

    # fp32 reference on the dequantized slab
    def ref_attend(q, k, v):
        qf = q.astype(jnp.float32)
        sc = jnp.einsum("shd,shdf->shf", qf, k)
        w = jax.nn.softmax(sc, axis=-1)
        return jnp.einsum("shf,shdf->shd", w, v)

    ref = np.asarray(ref_attend(q, kq1 * ks1[:, :, None], vq1 * vs1[:, :, None]))
    rstd = float(np.std(ref)) or 1.0

    tile = jax.jit(lambda x: jnp.tile(x[None], (L,) + (1,) * x.ndim))

    # --- xla shipping path ---
    layers = {
        "k": jax.block_until_ready(tile(jnp.asarray(kq1))),
        "v": tile(jnp.asarray(vq1)),
        "ks": tile(jnp.asarray(ks1)),
        "vs": tile(jnp.asarray(vs1)),
    }
    out = np.asarray(
        xla_chain(q, layers["k"][0], layers["v"][0], layers["ks"][0],
                  layers["vs"][0]), np.float32)
    err = float(np.sqrt(np.mean((out - ref) ** 2))) / rstd
    dt = timeit_chain(
        lambda c, l: xla_chain(c, l["k"], l["v"], l["ks"], l["vs"]),
        q, layers)
    bytes8 = 2 * L * S * H * HD * F
    print(json.dumps({"variant": "xla", "ms": round(dt * 1e3, 3),
                      "eff_GBps": round(bytes8 / dt / 1e9, 1),
                      "rel_rms_err": round(err, 5)}), flush=True)
    del layers

    # --- fd8: paired-KF int8 ---
    k8 = np.ascontiguousarray(
        kq1.reshape(S, Hp, 2, HD, F).transpose(0, 1, 2, 3, 4)
        .reshape(S, Hp, 2 * HD, F))
    v8 = np.ascontiguousarray(
        vq1.reshape(S, Hp, 2, HD, F).reshape(S, Hp, 2 * HD, F))
    ksp = ks1.reshape(S, Hp, 2, F)
    vsp = vs1.reshape(S, Hp, 2, F)
    layers = {
        "k": jax.block_until_ready(tile(jnp.asarray(k8))),
        "v": tile(jnp.asarray(v8)),
        "ks": tile(jnp.asarray(ksp)),
        "vs": tile(jnp.asarray(vsp)),
    }
    out = np.asarray(
        fd_attention(q, layers["k"][0], layers["v"][0], layers["ks"][0],
                     layers["vs"][0]), np.float32)
    err = float(np.sqrt(np.mean((out - ref) ** 2))) / rstd
    dt = timeit_chain(
        lambda c, l: fd_attention(c, l["k"], l["v"], l["ks"], l["vs"]),
        q, layers)
    print(json.dumps({"variant": "fd8", "ms": round(dt * 1e3, 3),
                      "eff_GBps": round(bytes8 / dt / 1e9, 1),
                      "rel_rms_err": round(err, 5)}), flush=True)
    del layers

    # --- fd4: nibble-paired int4 ---
    q4 = np.clip(np.round(kf1 / (np.abs(kf1).max(axis=2) / 7.0)[:, :, None]),
                 -7, 7).astype(np.int8)
    ks4 = (np.abs(kf1).max(axis=2) / 7.0 + 1e-12).astype(np.float32)
    v4 = np.clip(np.round(vf1 / (np.abs(vf1).max(axis=2) / 7.0)[:, :, None]),
                 -7, 7).astype(np.int8)
    vs4 = (np.abs(vf1).max(axis=2) / 7.0 + 1e-12).astype(np.float32)

    def nibble_pack(x):  # [S,H,HD,F] int8 → [S,Hp,HD,F] packed
        xp = x.reshape(S, Hp, 2, HD, F)
        return ((xp[:, :, 0] & 0x0F)
                | ((xp[:, :, 1] & 0x0F) << 4)).astype(np.int8)

    layers = {
        "k": jax.block_until_ready(tile(jnp.asarray(nibble_pack(q4)))),
        "v": tile(jnp.asarray(nibble_pack(v4))),
        "ks": tile(jnp.asarray(ks4.reshape(S, Hp, 2, F))),
        "vs": tile(jnp.asarray(vs4.reshape(S, Hp, 2, F))),
    }
    ref4 = np.asarray(ref_attend(q, q4 * ks4[:, :, None], v4 * vs4[:, :, None]))
    out = np.asarray(
        fd_attention(q, layers["k"][0], layers["v"][0], layers["ks"][0],
                     layers["vs"][0], nibble=True), np.float32)
    err = float(np.sqrt(np.mean((out - ref4) ** 2))) / rstd
    dt = timeit_chain(
        lambda c, l: fd_attention(c, l["k"], l["v"], l["ks"], l["vs"],
                                  nibble=True),
        q, layers)
    bytes4 = bytes8 // 2
    print(json.dumps({"variant": "fd4", "ms": round(dt * 1e3, 3),
                      "eff_GBps_of_int4_bytes": round(bytes4 / dt / 1e9, 1),
                      "rel_rms_err": round(err, 5)}), flush=True)


if __name__ == "__main__":
    main()
