"""From-scratch Whisper encoder–decoder in pure-functional JAX.

Replaces the whisper.cpp model stack the reference links against
(SURVEY.md §2.3; usage at /root/reference/src/stt_engine.cpp:245). The
design is TPU-first, not a port:

  * Parameters are a plain pytree of stacked per-layer arrays
    (``[n_layers, ...]``): the encoder body is a single ``jax.lax.scan``,
    the decode step optionally unrolls (``set_unroll_layers``), and
    sharding is one ``NamedSharding`` per stacked leaf (tensor parallelism
    shards the head/ffn axes; see ``parallel/``).
  * All attention runs in bf16 with fp32 softmax; matmuls are shaped
    [B*T, d] x [d, d] so XLA tiles them onto the MXU.
  * KV layouts are WRITE-DRIVEN (measured on chip, docs/PERF.md): the
    mutable self cache is position-major ``[L, B, H, cache_len, hd]`` so
    per-step appends land on the sublane axis (the only cheap direction in
    the tiled memory), and the big read-only cross slab is lane-major "KF"
    ``[L, B, H, hd, 1500]`` so hd=64 doesn't waste half of every vector.
    Static shapes throughout: the continuous batcher recycles slots (and
    rotates a global ring row) without recompiling.
  * Cross-attention K/V are precomputed once per 30 s window — optionally
    int8 with per-position scales (ops/quant.py) — and streamed every
    decode step (the reference gets this for free inside whisper.cpp;
    here it is explicit, batched, and quantized).

Architecture numerics follow openai-whisper: conv1(k3,s1)+GELU,
conv2(k3,s2)+GELU, sinusoidal audio positions, pre-LN blocks with
(d_head)^-0.25 scaling on both q and k, learned text positions, logits tied
to the token embedding.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Any  # nested dict pytree


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_vocab: int = 51865
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.n_audio_state // self.n_audio_head

    @property
    def is_multilingual(self) -> bool:
        return self.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        return 100 if self.n_vocab == 51866 else 99


# Official whisper model family dims (whisper.cpp loads the same shapes).
_PRESETS = {
    "tiny": dict(n_audio_state=384, n_audio_head=6, n_audio_layer=4,
                 n_text_state=384, n_text_head=6, n_text_layer=4),
    "base": dict(n_audio_state=512, n_audio_head=8, n_audio_layer=6,
                 n_text_state=512, n_text_head=8, n_text_layer=6),
    "small": dict(n_audio_state=768, n_audio_head=12, n_audio_layer=12,
                  n_text_state=768, n_text_head=12, n_text_layer=12),
    "medium": dict(n_audio_state=1024, n_audio_head=16, n_audio_layer=24,
                   n_text_state=1024, n_text_head=16, n_text_layer=24),
    "large": dict(n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
                  n_text_state=1280, n_text_head=20, n_text_layer=32),
}


def config_for(name: str, dtype=jnp.bfloat16) -> WhisperConfig:
    """Config by model name: tiny(.en), base(.en), small(.en), medium(.en),
    large-v1/v2/v3, large-v3-turbo, the distil-whisper family
    (distil-large-v2/v3, distil-medium.en, distil-small.en — full-size
    encoder, shallow decoder), plus 'test' (a mini model for CI)."""
    if name.startswith("distil-"):
        base_name = name[len("distil-"):]
        english = base_name.endswith(".en")
        if english:
            base_name = base_name[:-3]
        if base_name.startswith("large"):
            dims = dict(_PRESETS["large"])
            n_mels = 128 if base_name == "large-v3" else 80
            n_vocab = 51866 if base_name == "large-v3" else 51865
        else:
            dims = dict(_PRESETS[base_name])
            n_mels, n_vocab = 80, 51864 if english else 51865
        # distil-small.en keeps 4 decoder layers; the rest distil to 2.
        dims["n_text_layer"] = 4 if base_name == "small" else 2
        return WhisperConfig(n_mels=n_mels, n_vocab=n_vocab, dtype=dtype, **dims)
    if name == "test":
        return WhisperConfig(
            n_mels=80, n_vocab=51865, n_audio_ctx=1500,
            n_audio_state=64, n_audio_head=2, n_audio_layer=2,
            n_text_ctx=448, n_text_state=64, n_text_head=2, n_text_layer=2,
            dtype=dtype,
        )
    if name == "test-8h":
        # Mini CI model with 8 heads / 128 dims: tensor-parallel meshes up
        # to tp=8 divide the head count cleanly (engine-level mesh tests
        # and the multichip dryrun drive SttEngine with this).
        return WhisperConfig(
            n_mels=80, n_vocab=51865, n_audio_ctx=1500,
            n_audio_state=128, n_audio_head=8, n_audio_layer=2,
            n_text_ctx=448, n_text_state=128, n_text_head=8, n_text_layer=2,
            dtype=dtype,
        )
    english = name.endswith(".en")
    base_name = name[:-3] if english else name
    if base_name.startswith("large"):
        dims = dict(_PRESETS["large"])
        if base_name in ("large-v3", "large-v3-turbo", "turbo"):
            n_mels, n_vocab = 128, 51866
        else:
            n_mels, n_vocab = 80, 51865
        if base_name in ("large-v3-turbo", "turbo"):
            dims["n_text_layer"] = 4
        return WhisperConfig(n_mels=n_mels, n_vocab=n_vocab, dtype=dtype, **dims)
    dims = _PRESETS[base_name]
    return WhisperConfig(
        n_mels=80,
        n_vocab=51864 if english else 51865,
        dtype=dtype,
        **dims,
    )


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoidal position embedding for the encoder."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def _dense(key, d_in, d_out, dtype, bias=True):
    scale = 1.0 / math.sqrt(d_in)
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * scale
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p

def _ln(d, dtype):
    return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def _attn_block(key, d, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": _dense(ks[0], d, d, dtype),
        "k": _dense(ks[1], d, d, dtype, bias=False),
        "v": _dense(ks[2], d, d, dtype),
        "o": _dense(ks[3], d, d, dtype),
    }


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def init_params(cfg: WhisperConfig, key: jax.Array) -> Params:
    """Random-init parameters with the real Whisper shapes (for tests/bench
    and as the target layout for checkpoint loaders)."""
    dt = cfg.dtype
    keys = jax.random.split(key, 16)
    d_a, d_t = cfg.n_audio_state, cfg.n_text_state

    def enc_block(k):
        ks = jax.random.split(k, 4)
        return {
            "attn_ln": _ln(d_a, dt),
            "attn": _attn_block(ks[0], d_a, dt),
            "mlp_ln": _ln(d_a, dt),
            "mlp_1": _dense(ks[1], d_a, 4 * d_a, dt),
            "mlp_2": _dense(ks[2], 4 * d_a, d_a, dt),
        }

    def dec_block(k):
        ks = jax.random.split(k, 6)
        return {
            "attn_ln": _ln(d_t, dt),
            "attn": _attn_block(ks[0], d_t, dt),
            "cross_attn_ln": _ln(d_t, dt),
            "cross_attn": _attn_block(ks[1], d_t, dt),
            "mlp_ln": _ln(d_t, dt),
            "mlp_1": _dense(ks[2], d_t, 4 * d_t, dt),
            "mlp_2": _dense(ks[3], 4 * d_t, d_t, dt),
        }

    conv_scale1 = 1.0 / math.sqrt(3 * cfg.n_mels)
    conv_scale2 = 1.0 / math.sqrt(3 * d_a)
    return {
        "encoder": {
            "conv1": {
                "w": (jax.random.normal(keys[0], (3, cfg.n_mels, d_a)) * conv_scale1).astype(dt),
                "b": jnp.zeros((d_a,), dt),
            },
            "conv2": {
                "w": (jax.random.normal(keys[1], (3, d_a, d_a)) * conv_scale2).astype(dt),
                "b": jnp.zeros((d_a,), dt),
            },
            "pos": jnp.asarray(sinusoids(cfg.n_audio_ctx, d_a), dt),
            "blocks": _stack(
                [enc_block(k) for k in jax.random.split(keys[2], cfg.n_audio_layer)]
            ),
            "ln_post": _ln(d_a, dt),
        },
        "decoder": {
            "tok_emb": (
                jax.random.normal(keys[3], (cfg.n_vocab, d_t)) * 0.02
            ).astype(dt),
            "pos_emb": (
                jax.random.normal(keys[4], (cfg.n_text_ctx, d_t)) * 0.01
            ).astype(dt),
            "blocks": _stack(
                [dec_block(k) for k in jax.random.split(keys[5], cfg.n_text_layer)]
            ),
            "ln": _ln(d_t, dt),
        },
    }


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def layer_norm(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def dense(x, p):
    """Dense layer; dispatches on weight-only int8 params (ops/quant.py).

    The int8 path converts the weight inside the matmul's operand fusion —
    the int8 bytes are what crosses HBM (the whole point on the
    bandwidth-bound decode path) — and applies the per-output-channel scale
    in the f32 epilogue before casting back to the activation dtype."""
    if "w_q" in p:
        y = jnp.dot(
            x, p["w_q"].astype(x.dtype), preferred_element_type=jnp.float32
        )
        y = (y * p["scale"]).astype(x.dtype)
    else:
        y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def embed_tokens(dec: Params, tokens: jnp.ndarray) -> jnp.ndarray:
    """Token-embedding gather, int8-aware (per-row scales)."""
    if "tok_emb_q" in dec:
        rows = dec["tok_emb_q"][tokens].astype(jnp.float32)
        return rows * dec["tok_emb_scale"][tokens][..., None]
    return dec["tok_emb"][tokens]


def tied_logits(x: jnp.ndarray, dec: Params) -> jnp.ndarray:
    """Logits against the (possibly int8) tied token embedding.

    x [..., T, d] → [..., T, V] fp32. With int8 the embedding is the single
    biggest weight read of a decode step (133 MB bf16 for large-v3)."""
    if "tok_emb_q" in dec:
        logits = jnp.einsum(
            "...td,vd->...tv",
            x,
            dec["tok_emb_q"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        return logits * dec["tok_emb_scale"]
    return jnp.einsum(
        "...td,vd->...tv", x, dec["tok_emb"], preferred_element_type=jnp.float32
    )


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


_flash_attn_enabled: Optional[bool] = None
_unroll_layers: bool = True


def set_unroll_layers(enabled: bool):
    """Unroll the decode step's layer scan into a static python loop.
    Measured ~0.5 ms/step faster than lax.scan at large-v3 B=8 (no scan
    per-iteration machinery); costs longer XLA compiles. Default on."""
    global _unroll_layers
    _unroll_layers = enabled


def set_flash_attn(enabled: Optional[bool]):
    """Override flash-attention use (None = auto: on TPU only). Mirrors the
    reference's flash_attn setting (config.h:64)."""
    global _flash_attn_enabled
    _flash_attn_enabled = enabled


def _use_flash() -> bool:
    if _flash_attn_enabled is not None:
        return _flash_attn_enabled
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def mha(q, k, v, n_head: int, mask: Optional[jnp.ndarray] = None):
    """Multi-head attention. q,k,v: [B, T, d]; mask broadcastable to
    [B, H, Tq, Tk] (True = attend). fp32 softmax, head-major core.

    Unmasked long-sequence attention (the encoder's 1500-position
    self-attention) routes through the Pallas flash kernel on TPU."""
    b, t, d = q.shape
    scale = (d // n_head) ** -0.25

    def to_heads(x):
        return _split_heads(x, n_head).transpose(0, 2, 1, 3)

    qh, kh, vh = to_heads(q) * scale, to_heads(k) * scale, to_heads(v)
    if mask is None and t >= 512 and _use_flash():
        import os

        from ..ops.flash_attention import (
            flash_attention,
            flash_attention_jaxlib,
        )

        # jaxlib's tuned kernel wins in ISOLATION (5.94 vs 6.3-6.5 ms at
        # [16,20,1500,64], tools/bench_flash_jaxlib.py) but LOSES in the
        # full pipeline (455.5 vs 472.7 RTFx at B=56 int8): its
        # divisibility rules force a 1500 → 1536 pad of q/k/v plus an
        # output slice every layer, which costs more than the kernel
        # saves. Ours stays the default; SSTW_ENC_FLASH=jaxlib for A/B.
        if os.environ.get("SSTW_ENC_FLASH", "ours") == "jaxlib":
            try:
                out = flash_attention_jaxlib(qh, kh, vh)
            except Exception:  # unsupported shape/kernel rules
                out = flash_attention(qh, kh, vh)
        else:
            out = flash_attention(qh, kh, vh)
    else:
        out, _ = _attend(qh, kh, vh, mask)
    return out.transpose(0, 2, 1, 3).reshape(b, t, d)


def attention(x, p, n_head, mask=None, kv_x=None):
    kv_x = x if kv_x is None else kv_x
    q = dense(x, p["q"])
    k = dense(kv_x, p["k"])
    v = dense(kv_x, p["v"])
    return dense(mha(q, k, v, n_head, mask), p["o"])


def mlp(x, p1, p2):
    return dense(jax.nn.gelu(dense(x, p1), approximate=False), p2)


def encoder_apply(cfg: WhisperConfig, params: Params, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, 3000, n_mels] → audio features [B, 1500, d_audio]."""
    enc = params["encoder"]
    x = mel.astype(cfg.dtype)

    # conv1: k=3, s=1, SAME. Express as matmul over unfolded patches — a
    # [B*T, 3*n_mels] x [3*n_mels, d] MXU matmul.
    x = _conv1d(x, enc["conv1"]["w"], enc["conv1"]["b"], stride=1)
    x = jax.nn.gelu(x, approximate=False)
    x = _conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], stride=2)
    x = jax.nn.gelu(x, approximate=False)

    x = x + enc["pos"][None, : x.shape[1]].astype(x.dtype)

    # Sequence parallelism (SURVEY.md §5.7): under a mesh with an "sp"
    # axis the residual stream is sharded [dp, sp, -] so LN/MLP/
    # projections compute on a T/sp shard per device; GSPMD all-gathers
    # K/V for the full-window attention. No-op on dp×tp / single-chip.
    from ..parallel.mesh import seq_constraint

    x = seq_constraint(x)

    def block(carry, layer):
        h = carry
        h = h + attention(layer_norm(h, layer["attn_ln"]), layer["attn"], cfg.n_audio_head)
        h = seq_constraint(h)
        h = h + mlp(layer_norm(h, layer["mlp_ln"]), layer["mlp_1"], layer["mlp_2"])
        return seq_constraint(h), None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])


def _conv1d(x, w, b, stride: int):
    """x [B, T, Cin], w [K, Cin, Cout] → [B, T//stride, Cout] (SAME pad)."""
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=x.dtype,
    ) + b


# ---------------------------------------------------------------------------
# Decoder with KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(
    cfg: WhisperConfig,
    batch: int,
    cache_len: Optional[int] = None,
    paired: bool = False,
    dtype: Optional[jnp.dtype] = None,
) -> dict:
    """Static self-attention KV slab, position-major.

    Layout choice is write-driven: every decode step appends one K/V row
    per layer at a dynamic position. With the position axis on SUBLANES the
    append is a cheap masked vector store; on the 128-LANE axis it is
    physically impossible to address (Mosaic: DMA slices on the lane dim
    must be 128-aligned) and XLA's fallbacks cost ~7 ms/step (docs/PERF.md).

    ``paired=False`` → ``[L, B, H, C, hd]``. With hd = 64 the minor (lane)
    axis is HALF PADDING in the tiled memory: the slab physically streams
    2× its nominal bytes every step (measured 333 GB/s nominal,
    tools/bench_self_layout.py).

    ``paired=True`` → ``[L, B, H/2, C, 2·hd]``: adjacent heads share a
    128-lane row ``[x_h0 | x_h1]``. Appends still write one full row;
    reads fill every lane (678 GB/s nominal — 2× faster, exact numerics
    via zero-padded M=2 queries, see ``decoder_step``). Used by the greedy
    decode path; the beam kernel and the batcher's ring cache keep the
    unpaired form.

    ``dtype`` overrides the storage dtype (default ``cfg.dtype``).
    ``float8_e4m3fn`` halves the slab's HBM stream again (measured
    1.87 vs 2.64 ms/step at B=56, tools/bench_selfcache_dtype.py);
    values convert to the compute dtype inside the score/AV
    contractions, so nothing else changes. Scale-free storage: K/V
    activations fit e4m3's ±448 range with ~0.4% rms rounding — the
    same error class as the int8 cross slab, so the quantized compute
    types opt in (engine ``self_cache`` policy)."""
    hd = cfg.n_text_state // cfg.n_text_head
    if paired and cfg.n_text_head % 2 == 0:
        shape = (
            cfg.n_text_layer,
            batch,
            cfg.n_text_head // 2,
            cache_len or cfg.n_text_ctx,
            2 * hd,
        )
    else:
        shape = (
            cfg.n_text_layer,
            batch,
            cfg.n_text_head,
            cache_len or cfg.n_text_ctx,
            hd,
        )
    dt = cfg.dtype if dtype is None else dtype
    return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}


def _is_paired_cache(kv_cache: dict, hd: int) -> bool:
    return kv_cache["k"].shape[-1] == 2 * hd


def pairing_ok(cfg: WhisperConfig) -> bool:
    """True when the head-paired cache layout may be used: even head
    count AND no multi-device mesh active. Under a tensor-parallel mesh
    the paired reshape interacts badly with GSPMD's head-axis sharding
    (measured: collective rendezvous deadlock on the 8-device CPU mesh),
    so meshed decode keeps the unpaired [L,B,H,C,hd] slab — its lane
    padding is the price of sharded heads for now."""
    if cfg.n_text_head % 2:
        return False
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is not None and not mesh.empty and mesh.size > 1:
            return False
    except Exception:  # noqa: BLE001 — older JAX: no abstract mesh API
        pass
    return True


def _pair_queries(qr: jnp.ndarray) -> jnp.ndarray:
    """[.., 2, hd] head-pair queries → [.., 2, 2·hd] zero-padded rows
    ([q_h0 | 0], [0 | q_h1]) so one contraction over the paired slab
    yields both heads' scores (the cross terms hit zeros)."""
    z = jnp.zeros_like(qr[..., :1, :])
    row0 = jnp.concatenate([qr[..., :1, :], z], axis=-1)
    row1 = jnp.concatenate([z, qr[..., 1:, :]], axis=-1)
    return jnp.concatenate([row0, row1], axis=-2)




def precompute_xa_kv(
    cfg: WhisperConfig, params: Params, xa: jnp.ndarray, bits: int = 0
) -> dict:
    """Cross-attention K/V from encoder output, once per window.

    xa: [B, 1500, d] → {"k","v"}: [L, B, H, hd, 1500] (KF layout).

    ``bits`` = 8/4 quantizes INSIDE the per-layer scan, so the full bf16
    slab (≈6 GB at large-v3 B=24) is never materialized — only the
    int8/packed-int4 form leaves the scan. Same numerics as
    ``quantize_xa_kv`` applied afterwards."""
    blocks = params["decoder"]["blocks"]
    h = cfg.n_text_head

    def quant(x):  # [B, H, hd, F] bf16 → quantized leaves
        from ..ops.quant import _pack_nibbles

        x32 = x.astype(jnp.float32)
        qmax = 7.0 if bits == 4 else 127.0
        amax = jnp.max(jnp.abs(x32), axis=-2)
        scale = jnp.maximum(amax / qmax, 1e-12)
        q = jnp.clip(jnp.round(x32 / scale[..., None, :]), -qmax, qmax).astype(
            jnp.int8
        )
        if bits == 4:
            return _pack_nibbles(q), scale
        return q, scale

    def per_layer(carry, layer):
        ca = layer["cross_attn"]
        k = _split_heads(dense(xa, ca["k"]), h).transpose(0, 2, 3, 1)
        v = _split_heads(dense(xa, ca["v"]), h).transpose(0, 2, 3, 1)
        if bits:
            return carry, (*quant(k), *quant(v))
        return carry, (k, v)

    _, ys = jax.lax.scan(per_layer, None, blocks)
    if bits == 8:
        k_q, k_scale, v_q, v_scale = ys
        return {"k_q": k_q, "k_scale": k_scale, "v_q": v_q, "v_scale": v_scale}
    if bits == 4:
        k_p, k_scale, v_p, v_scale = ys
        return {"k_p": k_p, "k_scale": k_scale, "v_p": v_p, "v_scale": v_scale}
    ks, vs = ys
    return {"k": ks, "v": vs}


def _attend(q, k, v, mask=None):
    """Head-major attention core. q [B,H,T,c]; k,v [B,H,K,c]; fp32 softmax.

    Contractions are expressed so no operand needs a layout transpose:
    scores contract c (minor dim of both q and k), values contract K.
    A float8 KV slab (init_kv_cache dtype) converts to the compute dtype
    here — XLA fuses the convert into the contraction's read pipeline.
    """
    if k.dtype != q.dtype:
        k = k.astype(q.dtype)
    if v.dtype != q.dtype:
        v = v.astype(q.dtype)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B,H,T,K]
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        w, v,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B,H,T,c]
    return out.astype(v.dtype), w


def xa_batch_size(xa_kv: dict) -> int:
    """Batch dim of a cross-attention KV dict (bf16 / int8 / packed int4)."""
    leaf = xa_kv.get("k_q", xa_kv.get("k_p", xa_kv.get("k")))
    return leaf.shape[1]


def _attend_kf(q, k, v, mask=None):
    """Attention over KF-layout slabs. q [B,H,T,hd] (pre-scaled);
    k,v [B,H,hd,F]; mask broadcastable to [B,H,T,F]. fp32 softmax.
    Returns (out [B,H,T,hd], weights fp32)."""
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B,H,T,F]
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    w = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        w.astype(v.dtype), v,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B,H,T,hd]
    return out.astype(v.dtype), w


def _attend_xa(q, xa: dict, scale):
    """Cross-attention against one layer's audio K/V (XLA path, any T),
    int8-aware. q [B,H,T,hd]; xa holds either {"k","v"} [B,H,hd,F] (bf16)
    or {"k_q","v_q" int8 [B,H,hd,F], "k_scale","v_scale" f32 [B,H,F]}
    (ops/quant.py). The quantized path never materializes a bf16 copy of
    the slab: per-position k_scale multiplies the score matrix after the
    q·k contraction; v_scale folds into the softmax weights. Returns
    (out [B,H,T,hd], weights fp32 [B,H,T,F]).

    A packed-int4 carrier ("k_p", ops/quant.py) is unpacked here lazily —
    loop-based callers (decode_window/beam) unpack ONCE before their token
    loop instead, so this path only triggers on one-shot prefills."""
    if "k_p" in xa:
        from ..ops.quant import unpack_xa_kv

        xa = unpack_xa_kv(xa)
    if "k_q" not in xa:
        return _attend_kf(q * (scale * scale), xa["k"], xa["v"])
    scores = jax.lax.dot_general(
        q,
        xa["k_q"].astype(q.dtype),
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B,H,T,F]
    scores = scores * (xa["k_scale"] * (scale * scale))[:, :, None, :]
    w = jax.nn.softmax(scores, axis=-1)
    wv = (w * xa["v_scale"][:, :, None, :]).astype(q.dtype)
    out = jax.lax.dot_general(
        wv,
        xa["v_q"].astype(q.dtype),
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype), w


def _attend_xa_step(q1, xa: dict, scale):
    """Single-token cross-attention. q1 [S,H,hd] → [S,H,hd].

    XLA on the KF layout wins here: measured on-chip at large-v3 B=8, the
    32-layer cross core costs 1.85 ms vs 6.1 ms in the former
    cache-axis-minor layout, and vs 5.1 ms for a per-(s,h) Pallas kernel
    (ops/decode_attention.py — kept for future tiling work; its M=1
    programs don't pipeline as well as XLA's fused batched contraction)."""
    from ..ops.decode_attention import decode_attention_reference

    if "k_p" in xa:  # packed-int4 carrier (see _attend_xa)
        from ..ops.quant import unpack_xa_kv

        xa = unpack_xa_kv(xa)
    s2 = scale * scale
    if "k_q" in xa:
        return decode_attention_reference(
            q1, xa["k_q"], xa["v_q"], xa["k_scale"], xa["v_scale"], scale=s2
        )
    return decode_attention_reference(q1, xa["k"], xa["v"], scale=s2)




def decoder_apply(
    cfg: WhisperConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B, T] int32
    pos_offset: jnp.ndarray,  # scalar int32: position of tokens[:, 0]
    kv_cache: dict,
    xa_kv: dict,
    collect_cross_attn: bool = False,
    cross_attn_layer_begin: Optional[int] = None,
):
    """Run the decoder on ``tokens`` (prefill T>1 or single step T=1),
    updating the self-attn KV cache in place at [pos_offset, pos_offset+T).

    Returns (logits [B, T, n_vocab] fp32, new_kv_cache, cross_attn_weights).
    ``cross_attn_weights`` is [L, B, H, T, 1500] when ``collect_cross_attn``
    (for DTW word timestamps), else None.

    ``cross_attn_layer_begin`` (with ``collect_cross_attn``) switches to
    the REDUCED collection the DTW pass actually consumes: the
    head-mean of the weights, accumulated over layers ≥ the threshold
    INSIDE the scan, returned as [B, T, F]. The stacked form writes+reads
    an [L, B, H, T, F] slab through HBM (~1 GB at large-v3, measured
    ~2 s per alignment pass on chip — docs/PERF.md "tick anatomy");
    the reduction carries one [B, T, F] f32 accumulator instead.
    """
    dec = params["decoder"]
    B, T = tokens.shape
    h = cfg.n_text_head
    ctx = cfg.n_text_ctx
    collect_reduced = collect_cross_attn and cross_attn_layer_begin is not None

    if T == 1 and not collect_cross_attn:
        # Shared-position single-token step → the fused decode path. The
        # SCALAR position lets the cache append be one sublane-axis DUS
        # instead of a per-slot scatter.
        logits, kv_cache = decoder_step(
            cfg, params, tokens[:, 0], jnp.asarray(pos_offset, jnp.int32),
            kv_cache, xa_kv,
        )
        return logits[:, None], kv_cache, None

    x = embed_tokens(dec, tokens) + jax.lax.dynamic_slice_in_dim(
        dec["pos_emb"], pos_offset, T, axis=0
    )
    x = x.astype(cfg.dtype)

    cache_len = kv_cache["k"].shape[3]
    # Mask over cache positions: attend to [0, pos_offset + i] for query i.
    kpos = jnp.arange(cache_len)[None, :]  # [1, cache_len]
    qpos = pos_offset + jnp.arange(T)[:, None]  # [T, 1]
    self_mask = (kpos <= qpos)[None, None]  # [1, 1, T, cache_len]

    d = cfg.n_text_state
    hd = d // h
    scale = hd**-0.25
    paired = _is_paired_cache(kv_cache, hd)

    def to_heads(y):  # [B,T,d] → head-major [B,H,T,c]
        return _split_heads(y, h).transpose(0, 2, 1, 3)

    # Self-KV slabs ride the scan CARRY as the full stacked buffers with
    # one leading-axis dynamic update per layer — scan xs→ys round-trips
    # copy the slab every layer (measured ~2 ms/step at large-v3 B=8).
    def block(carry, inputs):
        if collect_reduced:
            hx, k_all, v_all, acc = carry
        else:
            hx, k_all, v_all = carry
        layer, xa, li = inputs

        # -- causal self-attention over the cache slab
        y = layer_norm(hx, layer["attn_ln"])
        if "qkv" in layer["attn"]:  # fused projection (ops/quant.py)
            qkv = dense(y, layer["attn"]["qkv"])
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
        else:
            qp = dense(y, layer["attn"]["q"])
            kp = dense(y, layer["attn"]["k"])
            vp = dense(y, layer["attn"]["v"])
        if paired:
            # Head-paired slab (see decoder_step): rows [x_h0 | x_h1],
            # M = 2·T zero-padded queries, one slab read per layer.
            hp = h // 2
            k_row = kp.reshape(B, T, hp, 2 * hd).transpose(0, 2, 1, 3)
            v_row = vp.reshape(B, T, hp, 2 * hd).transpose(0, 2, 1, 3)
            k_all = jax.lax.dynamic_update_slice(
                k_all, k_row[None].astype(k_all.dtype), (li, 0, 0, pos_offset, 0)
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, v_row[None].astype(v_all.dtype), (li, 0, 0, pos_offset, 0)
            )
            k_cache = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            qr = qp.reshape(B, T, hp, 2, hd).transpose(0, 2, 3, 1, 4)
            z = jnp.zeros_like(qr[:, :, :1])
            q5 = jnp.concatenate(
                [
                    jnp.concatenate([qr[:, :, :1], z], axis=-1),
                    jnp.concatenate([z, qr[:, :, 1:]], axis=-1),
                ],
                axis=2,
            )  # [B,Hp,2,T,2hd]
            cdt = hx.dtype  # compute dtype (f8 slabs convert on read)
            scores = jax.lax.dot_general(
                (q5 * (scale * scale)).astype(cdt), k_cache.astype(cdt),
                dimension_numbers=(((4,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            )  # [B,Hp,2,T,C]
            scores = jnp.where(self_mask[:, :, None], scores, jnp.float32(-1e30))
            aw = jax.nn.softmax(scores, axis=-1).astype(cdt)
            out5 = jax.lax.dot_general(
                aw, v_cache.astype(cdt),
                dimension_numbers=(((4,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            ).astype(hx.dtype)  # [B,Hp,2,T,2hd]
            # (lane-half extraction via reshape+index — the sliced form
            # miscompiles on XLA:TPU in the step paths; see decoder_step)
            out6 = out5.reshape(B, hp, 2, T, 2, hd)
            sa = jnp.concatenate(
                [out6[:, :, 0, :, 0], out6[:, :, 1, :, 1]], axis=-1
            )  # [B,Hp,T,2hd]
            sa = sa.transpose(0, 2, 1, 3).reshape(B, T, d)
        else:
            q = to_heads(qp)
            k_new = to_heads(kp)  # [B,H,T,hd]
            v_new = to_heads(vp)
            k_all = jax.lax.dynamic_update_slice(
                k_all, k_new[None].astype(k_all.dtype), (li, 0, 0, pos_offset, 0)
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, v_new[None].astype(v_all.dtype), (li, 0, 0, pos_offset, 0)
            )
            k_cache = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            sa, _ = _attend(q * (scale * scale), k_cache, v_cache, self_mask)
            sa = sa.transpose(0, 2, 1, 3).reshape(B, T, d)
        hx = hx + dense(sa, layer["attn"]["o"])

        # -- cross-attention against precomputed audio K/V (KF layout)
        y = layer_norm(hx, layer["cross_attn_ln"])
        q = to_heads(dense(y, layer["cross_attn"]["q"]))
        ca, w = _attend_xa(q, xa, scale)
        ca = ca.transpose(0, 2, 1, 3).reshape(B, T, d)
        hx = hx + dense(ca, layer["cross_attn"]["o"])

        hx = hx + mlp(layer_norm(hx, layer["mlp_ln"]), layer["mlp_1"], layer["mlp_2"])
        if collect_reduced:
            sel = jnp.where(li >= cross_attn_layer_begin, 1.0, 0.0)
            acc = acc + sel * w.astype(jnp.float32).mean(axis=1)  # [B,T,F]
            return (hx, k_all, v_all, acc), None
        return (hx, k_all, v_all), (w if collect_cross_attn else None)

    if collect_reduced:
        xa_f = (
            xa_kv["k_scale"].shape[-1] if "k_scale" in xa_kv
            else xa_kv["k"].shape[-1]
        )
        acc0 = jnp.zeros((B, T, xa_f), jnp.float32)
        (x, new_k, new_v, acc), _ = jax.lax.scan(
            block,
            (x, kv_cache["k"], kv_cache["v"], acc0),
            (dec["blocks"], xa_kv, jnp.arange(cfg.n_text_layer)),
        )
        n_sel = max(1, cfg.n_text_layer - cross_attn_layer_begin)
        cross_w = acc / n_sel
    else:
        (x, new_k, new_v), cross_w = jax.lax.scan(
            block,
            (x, kv_cache["k"], kv_cache["v"]),
            (dec["blocks"], xa_kv, jnp.arange(cfg.n_text_layer)),
        )
    x = layer_norm(x, dec["ln"])
    logits = tied_logits(x, dec)
    return logits, {"k": new_k, "v": new_v}, cross_w


def decoder_step(
    cfg: WhisperConfig,
    params: Params,
    tokens: jnp.ndarray,  # [S] int32: one new token per slot
    pos: jnp.ndarray,  # [S] int32 per-slot positions, or SCALAR (shared)
    kv_cache: dict,  # [L, S, H, cache_len, hd] (position-major)
    xa_kv: dict,  # [L, S, H, hd, 1500] KF (+ scales when int8)
    ring_row: Optional[jnp.ndarray] = None,  # scalar: ring write row
    c_valid: int = 0,
):
    """Single decode step with PER-SLOT positions — the continuous
    batcher's core op (SURVEY.md §7 hard-part #1): slots at different
    decode depths share one fused step.

    Cache-append modes, fastest first (docs/PERF.md "write-driven rules"):
      * ``pos`` scalar (lockstep batch): one shared sublane DUS.
      * ``ring_row`` scalar (continuous batching): every slot writes the
        SAME physical row of its lane; a slot's logical token i lives at
        row (ring_row - pos + i) mod C and its valid set is the circular
        arc of length pos+1 ending at ring_row — so heterogeneous decode
        depths still append with one shared DUS.
      * ``pos`` vector without ``ring_row``: per-slot scatter (slow;
        kept as the general fallback).

    ``c_valid`` (static): read only the first ``c_valid`` cache rows —
    exact while every slot's pos < c_valid (rows ≥ pos are masked anyway);
    decode_window lax.switches over row buckets so early steps don't
    stream the whole slab. Ignored in ring mode (the valid arc wraps).

    Returns (logits [S, V] fp32, new_kv_cache)."""
    dec = params["decoder"]
    S = tokens.shape[0]
    h = cfg.n_text_head
    d = cfg.n_text_state
    hd = d // h
    scale = hd**-0.25
    paired = _is_paired_cache(kv_cache, hd)
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (S,))

    x = embed_tokens(dec, tokens) + dec["pos_emb"][pos_vec]  # [S, d]
    x = x[:, None, :].astype(cfg.dtype)  # [S, 1, d]

    cache_len = kv_cache["k"].shape[3]
    cb = c_valid if (c_valid and c_valid < cache_len and ring_row is None) else 0
    kpos = jnp.arange(cb or cache_len)[None, :]
    if ring_row is not None:
        # Ring validity: the arc of pos+1 rows ending at ring_row.
        ages = (ring_row - kpos) % cache_len  # [1, C]
        self_mask = (ages <= pos_vec[:, None])[:, None, None]
    else:
        self_mask = (kpos <= pos_vec[:, None])[:, None, None]  # [S,1,1,C]

    shared_pos = jnp.ndim(pos) == 0

    def write_slot(cache_all, new, li):
        # cache_all [L,S,H,C,hd]; new [S,H,hd] appended at (li, s, :, row).
        # Position-major layout makes this a sublane-axis update — the only
        # direction the tiled memory can absorb a single-row write cheaply.
        if ring_row is not None:
            return jax.lax.dynamic_update_slice(
                cache_all,
                new[None, :, :, None, :].astype(cache_all.dtype),
                (li, 0, 0, ring_row, 0),
            )
        if shared_pos:
            # decode_window/beam advance all rows in lockstep: one DUS
            # instead of a per-slot scatter (the scatter costs ~2.5 ms/step
            # across 32 layers even on the sublane axis).
            return jax.lax.dynamic_update_slice(
                cache_all,
                new[None, :, :, None, :].astype(cache_all.dtype),
                (li, 0, 0, pos, 0),
            )
        return jax.vmap(
            lambda c, n, p: jax.lax.dynamic_update_slice(
                c, n[None, :, None, :].astype(c.dtype), (li, 0, p, 0)
            ),
            in_axes=(1, 0, 0),
            out_axes=1,
        )(cache_all, new, pos_vec)

    def block(carry, inputs):
        hx, k_all, v_all = carry
        layer, xa, li = inputs
        y = layer_norm(hx, layer["attn_ln"])

        def heads1(z):  # [S,1,d] → [S,H,hd] (contiguous split, no transpose)
            return z.reshape(S, h, hd)

        if "qkv" in layer["attn"]:  # fused projection (ops/quant.py)
            qkv = dense(y, layer["attn"]["qkv"])
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
        else:
            qp = dense(y, layer["attn"]["q"])
            kp = dense(y, layer["attn"]["k"])
            vp = dense(y, layer["attn"]["v"])
        if paired:
            # Head-paired slab [S, H/2, C, 2·hd] (init_kv_cache): full
            # 128-lane rows, one DUS appends BOTH heads, and the M=2
            # zero-padded query trick reads the slab once for both heads'
            # scores — 2× the effective bandwidth of the hd=64 layout
            # (tools/bench_self_layout.py; exact numerics).
            k_all = write_slot(k_all, kp.reshape(S, h // 2, 2 * hd), li)
            v_all = write_slot(v_all, vp.reshape(S, h // 2, 2 * hd), li)
            k_cache = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            if cb:  # bucketed read: stream only the first cb rows
                k_cache = k_cache[:, :, :cb]
                v_cache = v_cache[:, :, :cb]
            q2 = _pair_queries(qp.reshape(S, h // 2, 2, hd))  # [S,Hp,2,2hd]
            sa, _ = _attend(q2 * (scale * scale), k_cache, v_cache, self_mask)
            # [S,Hp,2,2hd]: head 0 in lanes [:hd] of row 0, head 1 in
            # [hd:] of row 1 (cross lanes are exact zeros of the pad).
            # MISCOMPILE GUARD: the direct lane-half slice form
            # (concat(sa[:,:,0,:hd], sa[:,:,1,hd:])) is MISCOMPILED by
            # XLA:TPU — wrong odd-head values, diverging step logits
            # (correct eagerly/on CPU, so CPU tests pass). Split the lane
            # axis by reshape and index the (row, lane-half) diagonal
            # instead (see ops/beam_attention.py, same bug).
            sa6 = sa.reshape(S, h // 2, 2, 2, hd)
            sa = jnp.concatenate(
                [sa6[:, :, 0, 0], sa6[:, :, 1, 1]], axis=-1
            ).reshape(S, 1, d)
        else:
            q = heads1(qp)[:, :, None, :]  # [S,H,1,hd]
            k_all = write_slot(k_all, heads1(kp), li)
            v_all = write_slot(v_all, heads1(vp), li)
            k_cache = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            if cb:  # bucketed read: stream only the first cb rows
                k_cache = k_cache[:, :, :cb]
                v_cache = v_cache[:, :, :cb]
            sa, _ = _attend(q * (scale * scale), k_cache, v_cache, self_mask)
            sa = sa.transpose(0, 2, 1, 3).reshape(S, 1, d)
        hx = hx + dense(sa.astype(hx.dtype), layer["attn"]["o"])

        y = layer_norm(hx, layer["cross_attn_ln"])
        q = heads1(dense(y, layer["cross_attn"]["q"]))
        ca = _attend_xa_step(q, xa, scale)
        hx = hx + dense(ca.reshape(S, 1, d).astype(hx.dtype), layer["cross_attn"]["o"])

        hx = hx + mlp(layer_norm(hx, layer["mlp_ln"]), layer["mlp_1"], layer["mlp_2"])
        return (hx, k_all, v_all), None

    carry = (x, kv_cache["k"], kv_cache["v"])
    if _unroll_layers:
        # Static python loop: no scan machinery, static-index cache
        # updates. ~0.5 ms/step faster at large-v3 B=8; longer compiles.
        for i in range(cfg.n_text_layer):
            layer_i = jax.tree.map(lambda a: a[i], dec["blocks"])
            xa_i = jax.tree.map(lambda a: a[i], xa_kv)
            carry, _ = block(carry, (layer_i, xa_i, jnp.int32(i)))
        x, new_k, new_v = carry
    else:
        (x, new_k, new_v), _ = jax.lax.scan(
            block, carry, (dec["blocks"], xa_kv, jnp.arange(cfg.n_text_layer))
        )
    x = layer_norm(x, dec["ln"])
    logits = tied_logits(x, dec)[:, 0]
    return logits, {"k": new_k, "v": new_v}


def decoder_step_beam(
    cfg: WhisperConfig,
    params: Params,
    tokens: jnp.ndarray,  # [B*K] int32: one new token per beam
    pos: jnp.ndarray,  # scalar int32 (beams decode in lockstep)
    kv_cache: dict,  # [L, B*K, H, C, hd] position-major; slot = b*K + k
    xa_kv: dict,  # [L, B, H, hd, 1500] KF — UNTILED, shared across beams
    anc_mask: jnp.ndarray,  # [B, K, K, C] bool: anc[b,kd,ks,c] = beam kd
    #   reads position c from physical slot ks (exactly one ks per valid c)
    beam_size: int,
    c_valid: int = 0,  # static: bound the self-cache rows the fused kernel
    #   reads (exact while pos < c_valid; models/beam.py lax.switches over
    #   128-row buckets as the decode deepens). 0 = full cache axis.
):
    """Beam-search decode step with no KV reordering (docs/PERF.md).

    The naive beam step gathers the whole self cache by parent every
    iteration (~a full slab read+write per step) and tiles the cross slab
    K× — both pure HBM traffic on a bandwidth-bound step. This version
    spends FLOPs instead, which are nearly free at M≤K on the MXU:

      * SELF: each beam appends K/V to its OWN physical slot, forever.
        Ancestry lives in a tiny one-hot mask [B, K, K, C] (~90 KB at
        large-v3 B=8 K=5). Attention contracts every destination beam
        against ALL K source slots in one dot_general ([B,H] batch,
        M=K_dst) — the slab is read ONCE for all destinations, so traffic
        equals a single plain attention read — then the mask selects the
        unique (slot, position) pairs on the beam's ancestry path before
        a joint softmax over (K_src, C). K× FLOPs, 1× bandwidth, and the
        parent "reorder" becomes a [B,K,K,C] boolean gather.
        (An alternative [L,B,H,K,C,hd] "beam-slot" layout that flattens to
        standard [B,H,K*C,hd] attention measured 3.5× SLOWER on chip —
        the 6-D interior-dim DUS defeats Mosaic; keep the 5-D slab.)
      * CROSS: all beams of a batch item attend the SAME audio window, so
        the (possibly int8) KF slab is never tiled: queries reshape to
        [B, H, K, hd] and the contraction serves all K beams from one
        slab read — K× less cross bandwidth AND a better MXU shape
        (M=K instead of M=1).

    Returns (logits [B*K, V] fp32, new_kv_cache)."""
    from ..ops.beam_attention import beam_attention as beam_attn
    from ..ops.beam_attention import beam_attention_reference as beam_attn_ref

    dec = params["decoder"]
    S = tokens.shape[0]
    K = beam_size
    B = S // K
    h = cfg.n_text_head
    d = cfg.n_text_state
    hd = d // h
    scale = hd**-0.25
    # FOLDED cache [L, B, H/2, K, C, 2·hd] (rank 6, always head-paired):
    # the K slot segments are adjacent to the position axis, so the slab
    # reshapes FREE (adjacent-dim merge) to [B, H/2, K·C, 2·hd] and beam
    # self-attention becomes ONE standard masked XLA attention — the
    # formulation that fuses a float8 slab's convert into the dot (the
    # greedy-path f8 win, init_kv_cache). The Pallas slot kernel path
    # (rank-5 cache) measured ~280 GB/s vs XLA's higher stream rate and
    # cannot take f8 (in-kernel converts regress 2×) —
    # tools/bench_beam_fold.py.
    folded = kv_cache["k"].ndim == 6
    paired = folded or _is_paired_cache(kv_cache, hd)

    x = embed_tokens(dec, tokens) + dec["pos_emb"][pos][None]  # [S, d]
    x = x[:, None, :].astype(cfg.dtype)  # [S, 1, d]

    def block(carry, inputs):
        hx, k_all, v_all = carry
        layer, xa, li = inputs
        y = layer_norm(hx, layer["attn_ln"])

        def heads1(z):  # [S,1,d] → [S,H,hd]
            return z.reshape(S, h, hd)

        if "qkv" in layer["attn"]:  # fused projection (ops/quant.py)
            qkv = dense(y, layer["attn"]["qkv"])
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
        else:
            qp = dense(y, layer["attn"]["q"])
            kp = dense(y, layer["attn"]["k"])
            vp = dense(y, layer["attn"]["v"])
        # Lockstep append into each beam's own slot: one shared-offset DUS.
        # Paired cache (init_kv_cache paired=True): rows [x_h0 | x_h1] fill
        # all 128 lanes — half the slab DMA of the hd=64 layout; the beam
        # kernel reads both heads' scores from one slab pass.
        def rows(z):
            if paired:
                return z.reshape(S, h // 2, 2 * hd)
            return heads1(z)

        if folded:
            # Append beam kd's row into its slot segment: one shared-offset
            # DUS on the position axis (update [1, B, Hp, K, 1, 2hd]).
            def fold_rows(z):
                return (
                    rows(z).reshape(B, K, h // 2, 2 * hd)
                    .transpose(0, 2, 1, 3)[None, :, :, :, None, :]
                )

            k_all = jax.lax.dynamic_update_slice(
                k_all, fold_rows(kp).astype(k_all.dtype), (li, 0, 0, 0, pos, 0)
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, fold_rows(vp).astype(v_all.dtype), (li, 0, 0, 0, pos, 0)
            )
            k_cache = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            C = k_cache.shape[3]
            cb = c_valid if (c_valid and c_valid < C) else C
            kc = k_cache[:, :, :, :cb].reshape(B, h // 2, K * cb, 2 * hd)
            vc = v_cache[:, :, :, :cb].reshape(B, h // 2, K * cb, 2 * hd)
            if kc.dtype != cfg.dtype:  # float8 slab: convert fuses into dot
                kc = kc.astype(cfg.dtype)
                vc = vc.astype(cfg.dtype)
            # Paired query rows [B, Hp, 2K, 2hd]: beams 0..K-1 of the even
            # head, then of the odd head (zero-padded lanes — exact).
            qr = (qp.reshape(S, d).astype(jnp.float32) * (scale * scale)).astype(
                cfg.dtype
            ).reshape(B, K, h // 2, 2, hd).transpose(0, 2, 3, 1, 4)
            z = jnp.zeros_like(qr[:, :, :1])
            q_bh = jnp.concatenate(
                [
                    jnp.concatenate([qr[:, :, :1], z], axis=-1),
                    jnp.concatenate([z, qr[:, :, 1:]], axis=-1),
                ],
                axis=2,
            ).reshape(B, h // 2, 2 * K, 2 * hd)
            scores = jax.lax.dot_general(
                q_bh, kc,
                dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            )  # [B, Hp, 2K, K·cb]
            # anc [B, Kd, Ks, C] → rows [B, 2K, Ks·cb] (same mask for both
            # head rows of a beam).
            m = anc_mask[:, :, :, :cb].reshape(B, K, K * cb)
            m2 = jnp.concatenate([m, m], axis=1)[:, None]  # [B, 1, 2K, K·cb]
            scores = jnp.where(m2 > 0, scores, jnp.float32(-1e30))
            w = jax.nn.softmax(scores, axis=-1)
            o = jax.lax.dot_general(
                w.astype(vc.dtype), vc,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            ).astype(cfg.dtype)  # [B, Hp, 2K, 2hd]
            # (reshape+index lane-half extraction — the sliced form
            # miscompiles on XLA:TPU; see decoder_step / beam_attention)
            o6 = o.reshape(B, h // 2, 2, K, 2, hd)
            sa = (
                jnp.stack([o6[:, :, 0, :, 0], o6[:, :, 1, :, 1]], axis=2)
                .transpose(0, 3, 1, 2, 4)
                .reshape(S, 1, d)
            )
        else:
            k_all = jax.lax.dynamic_update_slice(
                k_all, rows(kp)[None, :, :, None, :].astype(k_all.dtype),
                (li, 0, 0, pos, 0),
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, rows(vp)[None, :, :, None, :].astype(v_all.dtype),
                (li, 0, 0, pos, 0),
            )
            k_cache = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            # On TPU: the fused Pallas kernel keeps the [B,H,Kd,Ks,C] score
            # chain in VMEM (15.1 → 6.1 ms/step over the 32-layer stack,
            # tools/bench_beam_attn.py); elsewhere the XLA twin.
            if _use_flash():
                sa = beam_attn(
                    heads1(qp), k_cache, v_cache, anc_mask, K,
                    scale=scale * scale, c_valid=c_valid,
                )  # [S, H, hd]
            else:
                sa = beam_attn_ref(
                    heads1(qp), k_cache, v_cache, anc_mask, K,
                    scale=scale * scale,
                )
            sa = sa.reshape(S, 1, d)
        hx = hx + dense(sa.astype(hx.dtype), layer["attn"]["o"])

        # Cross-attention: K beam queries against ONE untiled KF slab.
        y = layer_norm(hx, layer["cross_attn_ln"])
        q = dense(y, layer["cross_attn"]["q"]).reshape(B, K, h, hd)
        q = q.transpose(0, 2, 1, 3)  # [B,H,K,hd]
        # XLA beats a fused Pallas kernel here (ops/beam_attention.
        # beam_cross_attention: 22.5 ms vs 0.63 ms per layer-call at
        # B=24 K=5 int8, tools/bench_beam_cross.py) — Mosaic lowers the
        # per-head batched dots serially, the same failure mode as
        # ops/decode_attention.decode_attention_i4.
        ca, _ = _attend_xa(q, xa, scale)
        ca = ca.transpose(0, 2, 1, 3).reshape(S, 1, d)
        hx = hx + dense(ca.astype(hx.dtype), layer["cross_attn"]["o"])

        hx = hx + mlp(layer_norm(hx, layer["mlp_ln"]), layer["mlp_1"], layer["mlp_2"])
        return (hx, k_all, v_all), None

    carry = (x, kv_cache["k"], kv_cache["v"])
    if _unroll_layers:
        for i in range(cfg.n_text_layer):
            layer_i = jax.tree.map(lambda a: a[i], dec["blocks"])
            xa_i = jax.tree.map(lambda a: a[i], xa_kv)
            carry, _ = block(carry, (layer_i, xa_i, jnp.int32(i)))
        x, new_k, new_v = carry
    else:
        (x, new_k, new_v), _ = jax.lax.scan(
            block, carry, (dec["blocks"], xa_kv, jnp.arange(cfg.n_text_layer))
        )
    x = layer_norm(x, dec["ln"])
    logits = tied_logits(x, dec)[:, 0]
    return logits, {"k": new_k, "v": new_v}


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# Jitted entry points (cfg is hashable → static).
encode = jax.jit(encoder_apply, static_argnums=0)
"""Jitted encoder: (cfg, params, mel [B,3000,n_mels]) → [B,1500,d]."""

encode_xa_kv = jax.jit(
    lambda cfg, params, mel: precompute_xa_kv(
        cfg, params, encoder_apply(cfg, params, mel)
    ),
    static_argnums=0,
)
"""Jitted encoder + cross-attention K/V precompute in one fused call."""


def _encode_xa_kv_q(cfg, params, mel, bits: int = 8):
    return precompute_xa_kv(cfg, params, encoder_apply(cfg, params, mel), bits)


encode_xa_kv_q = jax.jit(_encode_xa_kv_q, static_argnums=(0, 3))
"""Jitted encoder + quantized cross-attention K/V (compute_type=int8/int4):
the slab every decode step streams from HBM is half (int8) or a quarter
(int4 packed carrier, ops/quant.py) of the bf16 bytes."""
