"""Pallas flash self-attention for the Whisper encoder.

The reference's flash_attn toggle enables fused attention inside
whisper.cpp/CUDA (/root/reference/src/stt_engine.cpp:31, config.h:64). The
TPU equivalent: a Pallas kernel that keeps the [BLOCK_Q, L] score tile in
VMEM — the [B, H, 1500, 1500] score tensor never touches HBM. At Whisper's
encoder shape one head's full K/V is only ~190 KB (1500 × 64 bf16), so the
kernel streams K/V per (batch·head) program and computes each query block
in a single fused matmul→softmax→matmul, fp32 accumulation on the MXU.

Interface: head-major [B, H, L, d] (the model's native layout). Falls back
to a pure-XLA path off-TPU; `interpret=True` under tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 768  # swept on chip: 128/256/512/768 -> 223/206/202/200 ms per 8-window encoder


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """One (batch·head, q-block) program: full attention for BLOCK_Q rows.

    Normalization is deferred: the 1/sum divide runs on the [BLOCK_Q, d]
    output instead of the [BLOCK_Q, L_pad] fp32 score tile (4.7 MB at the
    large-v3 shape — the kernel is VPU-bound on elementwise passes over it,
    ~22 TFLOPS, so every saved pass counts). The pad mask is a precomputed
    additive bias row (no per-program iota/where pass)."""
    q = q_ref[0]  # [BLOCK_Q, d]
    k = k_ref[0]  # [d, L_pad] — pre-transposed (see flash_attention)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLOCK_Q, L_pad]
    scores = scores + bias_ref[...]  # [1, L_pad] broadcast
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLOCK_Q, d]
    o_ref[0] = (o / s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jnp.ndarray,  # [B, H, L, d], pre-scaled
    k: jnp.ndarray,  # [B, H, L, d], pre-scaled
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Non-causal fused attention, head-major layout."""
    B, H, L, d = q.shape
    l_pad = _round_up(L, BLOCK_Q)
    if l_pad != L:
        pad = [(0, 0), (0, 0), (0, l_pad - L), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    bh = B * H
    qf = q.reshape(bh, l_pad, d)
    # K pre-transposed to [bh, d, L_pad]: the score matmul contracts the
    # minor axis of q against the MAJOR axis of k — no in-kernel transpose
    # of the K tile. Swept on chip: 7.46 → 6.98 ms at [16,20,1500,64]
    # including this XLA transpose.
    kf = k.reshape(bh, l_pad, d).transpose(0, 2, 1)
    vf = v.reshape(bh, l_pad, d)
    bias = jnp.where(jnp.arange(l_pad) < L, 0.0, -1e30).astype(jnp.float32)[None]

    grid = (bh, l_pad // BLOCK_Q)
    out = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, BLOCK_Q, d), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, d, l_pad), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, l_pad, d), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, l_pad), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, l_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l_pad * l_pad * d,
            bytes_accessed=3 * bh * l_pad * d * 2 + bh * l_pad * d * 2,
            transcendentals=bh * l_pad * l_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf, bias)
    return out.reshape(B, H, l_pad, d)[:, :, :L]


def attention_reference(q, k, v):
    """XLA fallback with identical numerics (fp32 softmax)."""
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jax.lax.dot_general(
        w, v,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def flash_attention_jaxlib(q, k, v):
    """Encoder attention via jaxlib's tuned Pallas TPU flash kernel.

    Measured 5.94 ms vs our kernel's 6.3-6.5 at [16,20,1500,64]
    (block 768 — tools/bench_flash_jaxlib.py); adopted for the unmasked
    encoder path on shapes the kernel's divisibility rules fit. The
    1500-position window pads to 1536 and pad rows are excluded exactly
    via segment ids (pad segment 2 never attends segment 1); q is
    pre-scaled by the caller, so sm_scale=1. Raises on unsupported
    shapes — callers fall back to our kernel (models/whisper.mha)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as _fa,
    )

    B, H, L, d = q.shape
    blk = 768 if L > 768 else _round_up(L, 128)
    l_pad = _round_up(L, blk)
    if l_pad != L:
        pad = [(0, 0), (0, 0), (0, l_pad - L), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    seg = jnp.broadcast_to(
        jnp.where(jnp.arange(l_pad) < L, 1, 2).astype(jnp.int32)[None],
        (B, l_pad),
    )
    bs = BlockSizes(block_q=blk, block_k_major=blk, block_k=blk, block_b=1)
    out = _fa(q, k, v, segment_ids=SegmentIds(q=seg, kv=seg), sm_scale=1.0,
              block_sizes=bs)
    return out[:, :, :L]
