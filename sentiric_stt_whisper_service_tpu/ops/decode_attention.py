"""Pallas fused single-token attention for the autoregressive decoder.

Every decode step of the reference's engine runs inside whisper.cpp's
fused CUDA attention (flash_attn, /root/reference/src/stt_engine.cpp:31).
The TPU counterpart: one Pallas program per (sequence, head) that streams
that head's K/V slab through VMEM once and produces the attended output —
replacing XLA's ~8-op chain (convert → dot → scale → softmax(3) → scale →
dot) whose per-op fixed costs dominate the decode step at M=1 shapes
(measured on-chip: the two attention blocks cost ~11 ms of a 13.4 ms
large-v3 step while the MLP's plain matmuls stream at ~700 GB/s).

Layout: K/V are stored "KF" — ``[S, H, hd, F]`` with the sequence/cache
axis minor — so the 128-lane dimension is the long axis (F = 1500 audio
positions or the KV-cache length) and per-(s,h) blocks are dense. With the
model's hd = 64, the conventional ``[.., F, hd]`` layout wastes half of
every VMEM lane.

Two kernels:
  * plain bf16 slabs (decode self-attention over the KV cache; ``pos``
    gates causality per sequence),
  * int8 slabs with per-position scales (quantized cross-attention,
    ops/quant.py): k_scale folds into the score row, v_scale into the
    softmax weights, so the slab crosses HBM as int8 bytes.

``f_valid`` masks lane padding when F is not a multiple of 128.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python scalar: a jnp constant would be captured by the kernel


def _softmax_row(scores, limit, pos):
    """scores [1, F] fp32 → softmax with col-index mask (< limit, ≤ pos)."""
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    keep = col < limit
    if pos is not None:
        keep = keep & (col <= pos)
    scores = jnp.where(keep, scores, NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _scores(q_ref, k_ref, scale):
    q = q_ref[0, 0].astype(jnp.float32) * jnp.float32(scale)  # [1, hd]
    k = k_ref[0, 0]  # [hd, F]
    return jax.lax.dot_general(
        q, k.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, F]


def _values(v_ref, w):
    v = v_ref[0, 0]  # [hd, F]
    out = jax.lax.dot_general(
        v.astype(jnp.float32), w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [hd, 1]
    return out[:, 0]


def _plain_kernel(q_ref, k_ref, v_ref, pos_ref, o_ref, *, scale, f_valid,
                  causal):
    scores = _scores(q_ref, k_ref, scale)
    pos = pos_ref[pl.program_id(0), 0] if causal else None
    w = _softmax_row(scores, f_valid, pos)
    o_ref[0, 0, 0] = _values(v_ref, w).astype(o_ref.dtype)


def _quant_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, pos_ref, o_ref, *,
                  scale, f_valid, causal):
    scores = _scores(q_ref, k_ref, scale) * ks_ref[0, 0]  # [1, F]
    pos = pos_ref[pl.program_id(0), 0] if causal else None
    w = _softmax_row(scores, f_valid, pos) * vs_ref[0, 0]
    o_ref[0, 0, 0] = _values(v_ref, w).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "out_dtype")
)
def decode_attention(
    q: jnp.ndarray,  # [S, H, hd]
    k: jnp.ndarray,  # [S, H, hd, F]  bf16 or int8 (KF layout)
    v: jnp.ndarray,  # [S, H, hd, F]
    k_scale: Optional[jnp.ndarray] = None,  # [S, H, F] f32 (int8 slabs)
    v_scale: Optional[jnp.ndarray] = None,
    pos: Optional[jnp.ndarray] = None,  # [S] int32: attend cols ≤ pos[s]
    scale: float = 1.0,  # score scale (hd**-0.5)
    interpret: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """Fused q_len=1 attention over per-head KF slabs. Returns [S, H, hd]."""
    S, H, hd = q.shape
    F = k.shape[-1]
    quantized = k_scale is not None
    causal = pos is not None
    out_dtype = out_dtype or q.dtype

    pos2d = (
        pos.reshape(S, 1).astype(jnp.int32)
        if causal
        else jnp.zeros((S, 1), jnp.int32)
    )
    # Mosaic block rule: each of the last two block dims must divide (8,128)
    # or equal the full array dim — a singleton axis before hd/F satisfies it
    # for the per-(s,h) row operands.
    q4 = q[:, :, None, :]  # [S, H, 1, hd]

    def spec(block, index):
        return pl.BlockSpec(block, index, memory_space=pltpu.VMEM)

    qkv_specs = [
        spec((1, 1, 1, hd), lambda s, h: (s, h, 0, 0)),
        spec((1, 1, hd, F), lambda s, h: (s, h, 0, 0)),
        spec((1, 1, hd, F), lambda s, h: (s, h, 0, 0)),
    ]
    scale_specs = [
        spec((1, 1, 1, F), lambda s, h: (s, h, 0, 0)),
        spec((1, 1, 1, F), lambda s, h: (s, h, 0, 0)),
    ]
    # Whole pos vector in SMEM (a (1,1) block would violate Mosaic's
    # block-divisibility rule); programs index it by program_id(0).
    pos_spec = pl.BlockSpec((S, 1), lambda s, h: (0, 0), memory_space=pltpu.SMEM)

    common = dict(scale=scale, f_valid=F, causal=causal)
    if quantized:
        kernel = functools.partial(_quant_kernel, **common)
        in_specs = qkv_specs + scale_specs + [pos_spec]
        args = (q4, k, v, k_scale[:, :, None, :], v_scale[:, :, None, :], pos2d)
    else:
        kernel = functools.partial(_plain_kernel, **common)
        in_specs = qkv_specs + [pos_spec]
        args = (q4, k, v, pos2d)

    out = pl.pallas_call(
        kernel,
        grid=(S, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, 1, hd), lambda s, h: (s, h, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, H, 1, hd), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * S * H * hd * F,
            bytes_accessed=2 * S * H * hd * F * k.dtype.itemsize,
            transcendentals=S * H * F,
        ),
        interpret=interpret,
    )(*args)
    return out[:, :, 0]


def _i4_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *, n_heads):
    """One fat program per sequence item: all H heads' int4 cross
    attention with the slab DMA'd once ([1,H,hd,F] int4 ≈ 1 MB at
    large-v3 — per-(s,h) programs are DMA-latency-bound at ~90 GB/s,
    per-item programs amortize to the bandwidth floor)."""

    # q/scales/out ride 4-D blocks [1, H, 1, lanes]: H sits on an UNTILED
    # dim so the per-head dynamic index lowers (dynamic indexing of a
    # sublane-tiled dim has no Mosaic lowering — the 3-D [1,H,lanes] form
    # fails on the q load).
    def body(h, _):
        qh = q_ref[0, h]  # [1, hd] bf16 (pre-scaled)
        scores = jax.lax.dot_general(
            qh, k_ref[0, h].astype(qh.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, F]
        scores = scores * ks_ref[0, h]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        ssum = jnp.sum(e, axis=-1, keepdims=True)
        w = (e * vs_ref[0, h]).astype(qh.dtype)
        ov = jax.lax.dot_general(
            w, v_ref[0, h].astype(qh.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, hd]
        o_ref[0, h] = (ov / ssum).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_heads, body, 0)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def decode_attention_i4(
    q: jnp.ndarray,  # [S, H, hd] bf16
    k_q: jnp.ndarray,  # [S, H, hd, F] int4 (in-jit value; axon cannot
    #   pass int4 across jit boundaries — ops/quant.py packed carrier)
    v_q: jnp.ndarray,
    k_scale: jnp.ndarray,  # [S, H, F] f32
    v_scale: jnp.ndarray,
    scale: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused single-token cross-attention over native-int4 slabs.
    Returns [S, H, hd].

    MEASURED NEGATIVE RESULT (kept for future tiling work, like the
    per-(s,h) kernels above): at [56,20,64,1500] the per-item fat
    program with an in-kernel head loop reaches only ~144 GB/s effective
    vs ~381 GB/s for the XLA formulation — the fori over 20 M=1 heads
    serializes compute that XLA pipelines as one batched contraction,
    and the DMA saving (int4 bytes vs the convert pass) doesn't cover
    it. Production keeps the XLA path (_attend_xa_step). Numerics match
    the reference to 6e-5."""
    S, H, hd = q.shape
    F = k_q.shape[-1]
    qs = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)[:, :, None, :]

    def spec(block):
        return pl.BlockSpec(block, lambda s: (s, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_i4_kernel, n_heads=H),
        grid=(S,),
        in_specs=[
            spec((1, H, 1, hd)),
            spec((1, H, hd, F)),
            spec((1, H, hd, F)),
            spec((1, H, 1, F)),
            spec((1, H, 1, F)),
        ],
        out_specs=spec((1, H, 1, hd)),
        out_shape=jax.ShapeDtypeStruct((S, H, 1, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * S * H * hd * F,
            bytes_accessed=S * H * hd * F + S * H * F * 8,
            transcendentals=S * H * F,
        ),
        interpret=interpret,
    )(qs, k_q, v_q, k_scale[:, :, None, :], v_scale[:, :, None, :])
    return out[:, :, 0]


def decode_attention_reference(q, k, v, k_scale=None, v_scale=None,
                               pos=None, scale=1.0, out_dtype=None):
    """XLA fallback with identical numerics (KF layout, fp32 softmax)."""
    out_dtype = out_dtype or q.dtype
    qf = q.astype(jnp.float32) * scale  # [S,H,hd]
    scores = jnp.einsum(
        "shd,shdf->shf", qf, k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if k_scale is not None:
        scores = scores * k_scale
    if pos is not None:
        col = jnp.arange(scores.shape[-1])[None, None, :]
        scores = jnp.where(col <= pos[:, None, None], scores, -1e30)
    w = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        w = w * v_scale
    out = jnp.einsum(
        "shf,shdf->shd", w, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)
