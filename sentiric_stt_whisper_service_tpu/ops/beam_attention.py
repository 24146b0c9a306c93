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


def _kernel(q_ref, k_ref, v_ref, anc_ref, ks_ref, vs_ref, o_ref, *,
            scale, k_beams, n_rows):
    """One program per (batch item, head block): all heads of the block
    attend in one shot; the online-softmax recurrence runs over the K
    source slots so every in-kernel shape is a clean [Hb,R,C]/[Hb,R,hd]
    tile (Mosaic cannot lower interior-singleton shape casts).

    With a head-PAIRED cache (rows [x_h0 | x_h1], lane dim 2·hd = 128)
    the q block carries ``n_rows = 2·K`` zero-padded query rows per head
    pair ([q_h0|0] for beams 0..K-1, then [0|q_h1]) — both heads' scores
    come out of one slab read and the cross terms hit exact zeros.
    Unpaired caches use ``n_rows = K``.

    int8 slabs (``ks_ref``/``vs_ref`` per-row scales, [Hb, C] blocks):
    the slab DMA moves HALF the bf16 bytes; the int8→bf16 convert is a
    native VPU op (unlike float8, which Mosaic emulates and which
    measured a 2× REGRESSION in this spot). Scales fold into the score
    row ((q·k_c)·ks_c) and the softmax weight row (p_c·vs_c) — exact
    per-row symmetric dequantization, same math as the XLA twin."""
    K = k_beams
    R = n_rows
    dt = k_ref.dtype
    # bf16 operands / fp32 accumulation — the same numerics as the XLA
    # path (_attend scales q in bf16 and casts softmax weights back).
    # A float8 slab converts to bf16 at the VMEM read; MXU operands are
    # never narrower than bf16.
    if dt in (jnp.float8_e4m3fn, jnp.float8_e5m2, jnp.int8):
        dt = jnp.bfloat16
    q = (q_ref[0].astype(jnp.float32) * jnp.float32(scale)).astype(dt)
    Hb, _, hd = q.shape
    m = jnp.full((Hb, R, 1), NEG, jnp.float32)
    l = jnp.zeros((Hb, R, 1), jnp.float32)
    acc = jnp.zeros((Hb, R, hd), jnp.float32)
    for s in range(K):  # online softmax over source slots
        scores = jax.lax.dot_general(
            q, k_ref[s].astype(dt),  # [Hb, R, hd] x [Hb, C, hd]
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hb, R, C]
        if ks_ref is not None:
            scores = scores * ks_ref[s][:, None, :]  # [Hb, 1, C]
        # anc arrives with the row axis already matching R (the paired
        # duplication happens in XLA, in the wrapper): an in-kernel
        # sublane-dim concatenate of the [Kd, C] tile MIS-LOWERS on real
        # TPU (odd rows read a garbage mask — wrong outputs for every
        # odd head; CPU interpret mode lowers it fine, which is why the
        # interpret-mode tests never caught it).
        anc = anc_ref[0, s]  # [R, C]
        scores = jnp.where(anc[None] > 0, scores, NEG)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)  # masked cols: exp(NEG - m) == 0
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if vs_ref is not None:
            pv_in = (p * vs_ref[s][:, None, :]).astype(dt)
        else:
            pv_in = p.astype(dt)
        pv = jax.lax.dot_general(
            pv_in, v_ref[s].astype(dt),  # [Hb, R, C] x [Hb, C, hd]
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hb, R, hd]
        acc = acc * alpha + pv
        m = m_new
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("beam_size", "scale", "interpret", "c_valid")
)
def beam_attention(
    q: jnp.ndarray,  # [B*K, H, hd]
    k: jnp.ndarray,  # [B*K, H, C, hd] bf16/int8 — slot s of item b at b*K+s
    v: jnp.ndarray,  # [B*K, H, C, hd]
    anc: jnp.ndarray,  # [B, Kd, Ks, C] bool/float one-hot ancestry
    beam_size: int,
    scale: float = 1.0,  # score scale (applied to q, so hd**-0.5 total)
    interpret: bool = False,
    c_valid: int = 0,  # 0 = read the full cache axis
    k_scale: jnp.ndarray | None = None,  # [B*K, Hk, C] f32 per-row scales
    v_scale: jnp.ndarray | None = None,  # (int8 slabs only)
) -> jnp.ndarray:
    """Fused ancestry-masked beam attention. Returns [B*K, H, hd].

    ``q`` is always per-head [B*K, H, hd]. ``k``/``v`` may be head-PAIRED
    [B*K, H/2, C, 2·hd] (models/whisper.init_kv_cache paired=True): full
    128-lane rows, so the slab DMA moves half the bytes of the unpaired
    hd=64 layout (whose minor dim is physically padded to 128).

    ``c_valid`` bounds the cache rows the kernel DMAs: every step streams
    the whole [.., C, ..] slab, so a decode at position p < c_valid gets
    exact numerics (rows ≥ p are ancestry-masked anyway) while reading
    only the first ``c_valid`` rows. Callers lax.switch between a few
    bucketed variants as the decode deepens (models/beam.py). Constraint:
    multiples of 128 (the ancestry mask's C axis is its LANE axis; K/V
    blocks themselves only need sublane-multiple-of-8)."""
    K = beam_size
    BK, H = q.shape[:2]
    hd = q.shape[-1]
    C = k.shape[2]
    if c_valid and c_valid < C:
        if c_valid % 128:
            raise ValueError(f"c_valid must be a multiple of 128, got {c_valid}")
        C = c_valid
    B = BK // K
    paired = k.shape[-1] == 2 * hd
    anc_s = anc.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, Ks, Kd, C]
    if paired:
        # Row axis must match the kernel's 2K query rows (same ancestry
        # for both head halves of a beam) — duplicated HERE in XLA; see
        # the kernel comment for why not in-kernel.
        anc_s = jnp.concatenate([anc_s, anc_s], axis=2)  # [B, Ks, 2Kd, C]

    if paired:
        Hk = H // 2
        rows = 2 * K
        # [B,K,Hk,2,hd] → [B,Hk,2,K,hd]: head-in-pair major, then beams.
        qr = q.reshape(B, K, Hk, 2, hd).transpose(0, 2, 3, 1, 4)
        z = jnp.zeros_like(qr[:, :, :1])
        q_bh = jnp.concatenate(
            [
                jnp.concatenate([qr[:, :, :1], z], axis=-1),
                jnp.concatenate([z, qr[:, :, 1:]], axis=-1),
            ],
            axis=2,
        ).reshape(B, Hk, rows, 2 * hd)  # [B, Hk, 2K, 128]
        lane = 2 * hd
    else:
        Hk = H
        rows = K
        q_bh = q.reshape(B, K, H, hd).transpose(0, 2, 1, 3)  # [B, H, Kd, hd]
        lane = hd

    # Head-block size: big blocks amortize per-program overhead (the
    # (B, H) per-head grid measured 2.5× slower than (B, H//Hb)); cap so
    # a double-buffered K/V block set stays inside VMEM (v5e: 128 MB —
    # SSTW_BEAM_VMEM_MB tunes the budget; 48 MB measured best, the old
    # 8 MB cap degraded deep cache buckets to per-head programs).
    import os

    budget = int(os.environ.get("SSTW_BEAM_VMEM_MB", "48")) * 2**20
    Hb = Hk
    while Hb > 1 and 2 * 2 * K * Hb * C * lane * k.dtype.itemsize > budget:
        div = next(d for d in range(2, Hb + 1) if Hb % d == 0)
        Hb //= div

    quant = k_scale is not None
    in_specs = [
        pl.BlockSpec((1, Hb, rows, lane), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, Hb, C, lane), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, Hb, C, lane), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, rows, C), lambda b, h: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q_bh, k, v, anc_s]
    if quant:
        # Per-row dequant scales ride their own [BK, Hk, C] slab (C on
        # lanes — broadcasts straight onto the [Hb, R, C] score tile).
        in_specs += [
            pl.BlockSpec((K, Hb, C), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Hb, C), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
        kern = functools.partial(_kernel, scale=scale, k_beams=K, n_rows=rows)
    else:
        kern = functools.partial(
            lambda qr, kr, vr, ar, orf, *, scale, k_beams, n_rows: _kernel(
                qr, kr, vr, ar, None, None, orf,
                scale=scale, k_beams=k_beams, n_rows=n_rows,
            ),
            scale=scale, k_beams=K, n_rows=rows,
        )

    out = pl.pallas_call(
        kern,
        grid=(B, Hk // Hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, Hb, rows, lane), lambda b, h: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hk, rows, lane), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * K * K * C * hd,
            bytes_accessed=2 * BK * Hk * C * lane * k.dtype.itemsize,
            transcendentals=B * H * K * K * C,
        ),
        interpret=interpret,
    )(*args)
    if paired:
        # [B,Hk,2K,128]: beam kd's head-even output is row kd lanes [:hd],
        # head-odd is row K+kd lanes [hd:].
        # MISCOMPILE GUARD: the obvious formulation — reshape to
        # [B,Hk,2,K,2hd], stack(o5[:,:,0,:,:hd], o5[:,:,1,:,hd:]) — is
        # MISCOMPILED by XLA:TPU (wrong odd-head values; the identical
        # graph is correct eagerly, on CPU, and under interpret mode, so
        # no test caught it — found by a hand ground-truth probe and
        # bisected to jit(unpair) alone, with no Pallas involved).
        # Splitting the lane axis with a reshape and INDEXING the
        # (half, lane-half) diagonal compiles correctly.
        o6 = out.reshape(B, Hk, 2, K, 2, hd)
        per_head = jnp.stack(
            [o6[:, :, 0, :, 0], o6[:, :, 1, :, 1]], axis=2
        )  # [B,Hk,2,K,hd]
        return (
            per_head.transpose(0, 3, 1, 2, 4).reshape(BK, H, hd)
        )
    return out.transpose(0, 2, 1, 3).reshape(BK, H, hd)


def _cross_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *, scale):
    """MEASURED NEGATIVE RESULT — kept (tested) as a base for future
    tiling work, NOT wired into the decode path. One program per (batch
    item, head block) keeping the fp32 [Hb, K, F] score chain in VMEM
    sounded right, but Mosaic lowers the per-head batched dots serially:
    22.5 ms vs 0.63 ms for XLA's _attend_xa formulation per layer-call at
    B=24 K=5 int8 (tools/bench_beam_cross.py) — the same failure mode as
    ops/decode_attention.decode_attention_i4."""
    dt = k_ref.dtype
    if dt not in (jnp.bfloat16, jnp.float32):
        dt = jnp.bfloat16  # int8/int4 slabs: MXU operands via bf16 convert
    q = (q_ref[0].astype(jnp.float32) * jnp.float32(scale)).astype(dt)
    scores = jax.lax.dot_general(
        q, k_ref[0].astype(dt),  # [Hb, R, hd] x [Hb, hd, F]
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hb, R, F]
    if ks_ref is not None:
        scores = scores * ks_ref[0][:, None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores - m)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    if vs_ref is not None:
        w = w * vs_ref[0][:, None, :]
    o_ref[0] = jax.lax.dot_general(
        w.astype(dt), v_ref[0].astype(dt),  # [Hb, R, F] x [Hb, hd, F]
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def beam_cross_attention(
    q: jnp.ndarray,  # [B, H, K, hd] — K beam queries per (item, head)
    k: jnp.ndarray,  # [B, H, hd, F] KF slab: bf16, int8 or native int4
    v: jnp.ndarray,  # [B, H, hd, F]
    k_scale=None,  # [B, H, F] f32 (quantized slabs, ops/quant.py)
    v_scale=None,
    scale: float = 1.0,  # applied to q (so hd**-0.5 total)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused beam cross-attention over the SHARED (untiled) KF slab.
    Returns [B, H, K, hd] in q.dtype. Same numerics as _attend_xa."""
    B, H, K, hd = q.shape
    F = k.shape[-1]
    R = max(8, -(-K // 8) * 8)  # sublane-pad the query rows
    if R != K:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, R - K), (0, 0)))

    # Head-block size: fit q/k/v/scores (+ double buffering of k/v) in VMEM.
    Hb = H
    while Hb > 1 and 2 * 2 * Hb * hd * F * k.dtype.itemsize > 8 * 2**20:
        div = next(d for d in range(2, Hb + 1) if Hb % d == 0)
        Hb //= div

    quant = k_scale is not None
    specs = [
        pl.BlockSpec((1, Hb, R, hd), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Hb, hd, F), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Hb, hd, F), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if quant:
        specs += [
            pl.BlockSpec((1, Hb, F), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hb, F), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
        kern = functools.partial(_cross_kernel, scale=scale)
    else:
        kern = functools.partial(
            lambda qr, kr, vr, orf, *, scale: _cross_kernel(
                qr, kr, vr, None, None, orf, scale=scale
            ),
            scale=scale,
        )

    out = pl.pallas_call(
        kern,
        grid=(B, H // Hb),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (1, Hb, R, hd), lambda b, h: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, R, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * K * F * hd,
            bytes_accessed=2 * B * H * hd * F * k.dtype.itemsize,
            transcendentals=B * H * K * F,
        ),
        interpret=interpret,
    )(*args)
    return out[:, :, :K]


def beam_cross_attention_reference(q, k, v, k_scale=None, v_scale=None,
                                   scale=1.0):
    """XLA twin with identical semantics (the _attend_xa formulation)."""
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    scores = jax.lax.dot_general(
        qf, k.astype(qf.dtype),
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B,H,K,F]
    if k_scale is not None:
        scores = scores * k_scale[:, :, None, :]
    w = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        w = w * v_scale[:, :, None, :]
    out = jax.lax.dot_general(
        w.astype(q.dtype), v.astype(q.dtype),
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def beam_attention_reference(q, k, v, anc, beam_size, scale=1.0):
    """XLA twin with identical semantics (the pre-kernel formulation).
    Accepts head-paired slabs by unpairing them first (off-TPU path)."""
    hd_q = q.shape[-1]
    if k.shape[-1] == 2 * hd_q:  # paired [BK, H/2, C, 2hd] → [BK, H, C, hd]
        BKp, Hp, Cp, _ = k.shape

        def unpair(x):
            return (
                x.reshape(BKp, Hp, Cp, 2, hd_q)
                .transpose(0, 1, 3, 2, 4)
                .reshape(BKp, 2 * Hp, Cp, hd_q)
            )

        k = unpair(k)
        v = unpair(v)
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
