"""Weight-only int8 quantization for the decode path.

The reference's default ``compute_type`` is int8 (whisper.cpp GGML quantized
checkpoints; the service downloads ``ggml-{size}.bin`` which ships q5/q8
variants — /root/reference/src/config.h:18-21). The TPU rebuild quantizes at
load time instead: checkpoints are dequantized to fp32 by the GGML parser,
then re-quantized here into a TPU-friendly layout.

Why weight-only int8 wins on TPU: autoregressive decode is HBM-bandwidth
bound — every step streams the full decoder (≈1.6 GB for large-v3 in bf16)
plus the cross-attention K/V (≈1 GB at batch 8) from HBM for a few MFLOPs of
work. Halving the bytes halves the step-time floor. Activations stay bf16:
the int8→bf16 convert fuses into the matmul's operand load (XLA operand
fusion), so the MXU still runs its native bf16 pipeline and accuracy loss is
limited to the ~0.4 % per-channel rounding error of the weights.

Layouts:
  * dense  ``{"w": [.., d_in, d_out]}`` → ``{"w_q": int8, "scale": f32
    [.., d_out]}`` — symmetric, per-output-channel (axis ``-2`` reduced).
  * embedding ``[V, d]`` → int8 + per-row scale ``[V]`` (works for both the
    gather and the tied logits matmul: ``logits[v] = (x · emb_q[v])·s[v]``).
  * cross-KV ``[L, B, H, 1500, hd]`` → int8 + per-position scale
    ``[L, B, H, 1500]`` (reduced over ``hd``); scores/values dequantize by
    folding the scale into the attention weights, never materializing a
    bf16 copy of the slab.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quantize_weight(w: jnp.ndarray, axis: int = -2):
    """Symmetric int8 quantization reducing over ``axis``.

    Returns (w_q int8, scale f32 with ``axis`` removed)."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=axis)
    scale = jnp.maximum(amax / 127.0, _EPS)
    w_q = jnp.clip(
        jnp.round(w32 / jnp.expand_dims(scale, axis)), -127, 127
    ).astype(jnp.int8)
    return w_q, scale


def dequantize_weight(w_q: jnp.ndarray, scale: jnp.ndarray, axis: int = -2,
                      dtype=jnp.float32) -> jnp.ndarray:
    return (w_q.astype(jnp.float32) * jnp.expand_dims(scale, axis)).astype(dtype)


def _quantize_dense(p: dict) -> dict:
    w_q, scale = quantize_weight(p["w"], axis=-2)
    out = {"w_q": w_q, "scale": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _quantize_blocks(blocks: dict) -> dict:
    """Quantize every dense leaf ({"w": ...} dict) inside a blocks pytree;
    layer norms ({"g","b"}) and anything without "w" pass through."""
    out = {}
    for name, sub in blocks.items():
        if isinstance(sub, dict):
            if "w" in sub:
                out[name] = _quantize_dense(sub)
            else:
                out[name] = _quantize_blocks(sub)
        else:
            out[name] = sub
    return out


def quantize_params(params: Any, encoder: bool = True,
                    embedding: bool = True) -> Any:
    """Quantize a Whisper param pytree to weight-only int8.

    Transformer-block dense weights (and optionally the token embedding)
    become int8; conv stems, positional embeddings, and layer norms stay in
    their original dtype (they are a rounding error of total bytes).
    ``models.whisper.dense`` dispatches on the presence of ``"w_q"``.
    """
    enc = dict(params["encoder"])
    dec = dict(params["decoder"])
    if encoder:
        enc["blocks"] = _quantize_blocks(enc["blocks"])
    dec["blocks"] = _quantize_blocks(dec["blocks"])
    if embedding:
        emb_q, emb_scale = quantize_weight(dec["tok_emb"], axis=-1)
        del dec["tok_emb"]
        dec["tok_emb_q"] = emb_q
        dec["tok_emb_scale"] = emb_scale
    return {"encoder": enc, "decoder": dec}


def fuse_decoder_qkv(params: Any) -> Any:
    """Concatenate each decoder block's self-attention q/k/v projections
    into one ``qkv`` dense ([.., d, 3d]) — one MXU launch instead of three
    on the fixed-cost-dominated decode path. Works on bf16 or int8 params
    (column-wise concat of w/w_q, scale, and bias with zeros for the
    bias-free k). Single-chip serving only: the concat interleaves the
    Megatron column-parallel boundaries, so tensor-parallel meshes keep
    the unfused form."""

    dec = dict(params["decoder"])
    blocks = dict(dec["blocks"])
    attn = blocks["attn"]
    if "qkv" in attn:  # already fused
        return params
    q, k, v = attn["q"], attn["k"], attn["v"]
    fused: dict = {}
    if "w_q" in q:
        fused["w_q"] = jnp.concatenate([q["w_q"], k["w_q"], v["w_q"]], axis=-1)
        fused["scale"] = jnp.concatenate(
            [q["scale"], k["scale"], v["scale"]], axis=-1
        )
    else:
        fused["w"] = jnp.concatenate([q["w"], k["w"], v["w"]], axis=-1)
    kb = k.get("b")
    if kb is None:
        kb = jnp.zeros_like(q["b"])
    fused["b"] = jnp.concatenate([q["b"], kb, v["b"]], axis=-1)
    blocks["attn"] = {"qkv": fused, "o": attn["o"]}
    dec["blocks"] = blocks
    return {"encoder": params["encoder"], "decoder": dec}


def is_quantized(params: Any) -> bool:
    dec = params.get("decoder", {})
    blocks = dec.get("blocks", {})
    return "tok_emb_q" in dec or any(
        isinstance(v, dict) and ("w_q" in v or any(
            isinstance(vv, dict) and "w_q" in vv for vv in v.values()
        ))
        for v in blocks.values()
    )


# ---------------------------------------------------------------------------
# Cross-attention KV quantization
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("bits",))
def quantize_xa_kv(xa_kv: dict, bits: int = 8) -> dict:
    """Quantize a cross-attention KV dict ``{"k","v"}: [L,B,H,hd,F]`` (KF
    layout).

    ``bits=8`` → ``{"k_q","v_q": int8, "k_scale","v_scale": f32 [L,B,H,F]}``.
    Per-position scales (reduced over ``hd``) keep the attention math exact
    up to 1/127 rounding: scores pick up ``k_scale`` after the q·k
    contraction; ``v_scale`` folds into the softmax weights before the
    values contraction (models/whisper._attend_xa and the fused kernel in
    ops/decode_attention.py).

    ``bits=4`` → a PACKED carrier ``{"k_p","v_p": int8 [L,B,H,hd,F/2]}``:
    byte j holds position j's nibble (low) and position j+F/2's (high).
    The slab every decode step streams from HBM is half the int8 bytes.
    Packed int8 — not ``jnp.int4`` — is the wire format because int4
    arrays cannot cross a jit boundary on the axon TPU backend (transfer
    and eager ops are unimplemented); decode entry points call
    :func:`unpack_xa_kv` ONCE per window (hoisted before the token loop)
    to materialize the native-int4 slab the loop reads."""
    if bits == 8:
        k_q, k_scale = quantize_weight(xa_kv["k"], axis=-2)
        v_q, v_scale = quantize_weight(xa_kv["v"], axis=-2)
        return {"k_q": k_q, "k_scale": k_scale, "v_q": v_q, "v_scale": v_scale}
    if bits != 4:
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def q4(x):
        x32 = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(x32), axis=-2)
        scale = jnp.maximum(amax / 7.0, _EPS)
        q = jnp.clip(jnp.round(x32 / scale[..., None, :]), -7, 7).astype(jnp.int8)
        return _pack_nibbles(q), scale

    k_p, k_scale = q4(xa_kv["k"])
    v_p, v_scale = q4(xa_kv["v"])
    return {"k_p": k_p, "k_scale": k_scale, "v_p": v_p, "v_scale": v_scale}


def _pack_nibbles(q: jnp.ndarray) -> jnp.ndarray:
    """int8 values in [-8, 7] along the last axis (even length F) →
    packed int8 [.., F/2]: byte j = (q[j + F/2] << 4) | (q[j] & 0xF)."""
    F = q.shape[-1]
    lo = q[..., : F // 2] & jnp.int8(0x0F)
    hi = jnp.left_shift(q[..., F // 2 :], 4)
    return (hi | lo).astype(jnp.int8)


def _unpack_nibbles(p: jnp.ndarray) -> jnp.ndarray:
    """Packed int8 [.., F/2] → native int4 [.., F] (original position
    order: low nibbles are positions [0, F/2), high nibbles the rest).
    Arithmetic right shifts sign-extend both nibbles."""
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int4)


def unpack_nibbles_i8(p: jnp.ndarray) -> jnp.ndarray:
    """Packed int8 [.., F/2] → int8 [.., F] holding the int4 values in
    [-7, 7] (the batcher's state container: int4 can't live across jit
    boundaries on axon, and its slot slabs persist between executables)."""
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    return jnp.concatenate([lo, hi], axis=-1)


def unpack_xa_kv(xa_kv: dict) -> dict:
    """Materialize a packed int4 carrier (``quantize_xa_kv(bits=4)``) as a
    native-int4 KV dict for the attention contractions. MUST run inside a
    jit, once per window — callers place it before the decode loop so the
    int4 slab (same HBM bytes as the carrier) is built once and streamed
    every step. Pass-through for non-packed dicts."""
    if "k_p" not in xa_kv:
        return xa_kv
    return {
        "k_q": _unpack_nibbles(xa_kv["k_p"]),
        "k_scale": xa_kv["k_scale"],
        "v_q": _unpack_nibbles(xa_kv["v_p"]),
        "v_scale": xa_kv["v_scale"],
    }


def is_quantized_kv(xa_kv: dict) -> bool:
    return "k_q" in xa_kv or "k_p" in xa_kv


def xa_kv_boundary_safe(xa_kv: dict) -> dict:
    """Make an unpacked cross-KV dict safe to pass BETWEEN executables:
    native int4 (S4) arrays cannot cross jit boundaries on the axon TPU
    plugin — the C++ jit rejects the S4 argument signature and the
    fallback recurses to a RecursionError (found driving the serving
    stack end-to-end, round 5). The host-chunked abortable decode paths
    therefore carry the slab as int8 holding the int4 values (2× the
    HBM bytes of native int4 — the cost of abortability; single-launch
    paths keep native int4 INSIDE their one executable). Integer dots on
    the widened values are bit-identical."""
    if "k_q" in xa_kv and xa_kv["k_q"].dtype == jnp.int4:
        return {
            **xa_kv,
            "k_q": xa_kv["k_q"].astype(jnp.int8),
            "v_q": xa_kv["v_q"].astype(jnp.int8),
        }
    return xa_kv
