"""Pallas fused beam self-attention over ancestry-masked slot caches.

The gather-free beam step (models/whisper.decoder_step_beam) reads, for
every destination beam, all K source slots of its batch item through a
one-hot ancestry mask. Expressed in XLA this materializes fp32
[B, H, Kd, Ks, C] score/weight tensors in HBM every layer — measured at
~15 ms/step for the 32-layer large-v3 stack at B=8, K=5 vs a 4.1 ms
pure-slab-traffic floor (tools/bench_beam_attn.py). This kernel keeps the
whole score→softmax→values chain in VMEM: one program per (batch item,
head) streams that item's [K, C, hd] K/V slabs through VMEM exactly once,
running an ONLINE softmax over the K source slots (the flash-attention
recurrence, with source slots as the chunk axis) so every in-kernel shape
is a clean [K, C] / [K, hd] tile — Mosaic cannot lower interior-singleton
shape casts, so no reshapes, no lane-axis slicing.

Layout contract (matches the position-major self cache, models/whisper.py
init_kv_cache): k/v are [B*K, H, C, hd] with slot s of item b at row
b*K + s — the K slots of one item are a contiguous axis-0 block, so the
BlockSpec needs no gather. The ancestry mask arrives as [B, Ks, Kd, C]
float32 (1.0 = position c of slot Ks is on beam Kd's path; it also
encodes causality since unwritten rows are never set).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, anc_ref, o_ref, *, scale, k_beams):
    """One program per (batch item, head block): all heads of the block
    attend in one shot; the online-softmax recurrence runs over the K
    source slots so every in-kernel shape is a clean [Hb,K,C]/[Hb,K,hd]
    tile (Mosaic cannot lower interior-singleton shape casts)."""
    K = k_beams
    dt = k_ref.dtype
    # bf16 operands / fp32 accumulation — the same numerics as the XLA
    # path (_attend scales q in bf16 and casts softmax weights back).
    q = (q_ref[0].astype(jnp.float32) * jnp.float32(scale)).astype(dt)
    Hb, _, hd = q.shape
    m = jnp.full((Hb, K, 1), NEG, jnp.float32)
    l = jnp.zeros((Hb, K, 1), jnp.float32)
    acc = jnp.zeros((Hb, K, hd), jnp.float32)
    for s in range(K):  # online softmax over source slots
        scores = jax.lax.dot_general(
            q, k_ref[s],  # [Hb, Kd, hd] x [Hb, C, hd]
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hb, Kd, C]
        scores = jnp.where(anc_ref[0, s][None] > 0, scores, NEG)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)  # masked cols: exp(NEG - m) == 0
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(dt), v_ref[s],  # [Hb, Kd, C] x [Hb, C, hd]
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hb, Kd, hd]
        acc = acc * alpha + pv
        m = m_new
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("beam_size", "scale", "interpret")
)
def beam_attention(
    q: jnp.ndarray,  # [B*K, H, hd]
    k: jnp.ndarray,  # [B*K, H, C, hd] bf16 — slot s of item b at b*K+s
    v: jnp.ndarray,  # [B*K, H, C, hd]
    anc: jnp.ndarray,  # [B, Kd, Ks, C] bool/float one-hot ancestry
    beam_size: int,
    scale: float = 1.0,  # score scale (applied to q, so hd**-0.5 total)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ancestry-masked beam attention. Returns [B*K, H, hd]."""
    BK, H, C, hd = k.shape
    K = beam_size
    B = BK // K

    q_bh = q.reshape(B, K, H, hd).transpose(0, 2, 1, 3)  # [B, H, Kd, hd]
    anc_s = anc.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, Ks, Kd, C]

    # Head-block size: big blocks amortize per-program overhead (the
    # (B, H) per-head grid measured 2.5× slower than (B, H//Hb)); cap so
    # a double-buffered K/V block set stays well inside VMEM.
    Hb = H
    while Hb > 1 and 2 * 2 * K * Hb * C * hd * k.dtype.itemsize > 8 * 2**20:
        div = next(d for d in range(2, Hb + 1) if Hb % d == 0)
        Hb //= div

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, k_beams=K),
        grid=(B, H // Hb),
        in_specs=[
            pl.BlockSpec((1, Hb, K, hd), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Hb, C, hd), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Hb, C, hd), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, K, C), lambda b, h: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Hb, K, hd), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, K, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * K * K * C * hd,
            bytes_accessed=2 * BK * H * C * hd * k.dtype.itemsize,
            transcendentals=B * H * K * K * C,
        ),
        interpret=interpret,
    )(q_bh, k, v, anc_s)
    return out.transpose(0, 2, 1, 3).reshape(BK, H, hd)


def beam_attention_reference(q, k, v, anc, beam_size, scale=1.0):
    """XLA twin with identical semantics (the pre-kernel formulation)."""
    BK, H, C, hd = k.shape
    K = beam_size
    B = BK // K
    k5 = k.reshape(B, K, H, C, hd)
    v5 = v.reshape(B, K, H, C, hd)
    qs = (q.astype(jnp.float32) * scale).reshape(B, K, H, hd)
    scores = jax.lax.dot_general(
        qs, k5.astype(jnp.float32),
        dimension_numbers=(((3,), (4,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32,
    )  # [B,H,Kd,Ks,C]
    mask = (anc > 0)[:, None]  # [B,1,Kd,Ks,C]
    scores = jnp.where(mask, scores, NEG)
    w = jax.nn.softmax(
        scores.reshape(B, H, K, K * C), axis=-1
    ).reshape(B, H, K, K, C)
    out = jax.lax.dot_general(
        w, v5.astype(jnp.float32),
        dimension_numbers=(((3, 4), (1, 3)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32,
    )  # [B,H,Kd,hd]
    return out.transpose(0, 2, 1, 3).reshape(BK, H, hd).astype(q.dtype)
