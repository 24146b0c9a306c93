"""Decode-step ablation on the real TPU: which part of the ~13-16 ms step
costs what. Variants toggle self-attention, cross-attention, MLP, and the
tied-logits matmul; each runs STEPS iterations inside one on-device
while_loop. Prints one JSON line per variant."""

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

from sentiric_stt_whisper_service_tpu.models import config_for, init_params
from sentiric_stt_whisper_service_tpu.models.whisper import (
    _attend,
    _attend_xa_step,
    dense,
    embed_tokens,
    init_kv_cache,
    layer_norm,
    mlp,
    tied_logits,
)
from sentiric_stt_whisper_service_tpu.ops.quant import (
    quantize_params,
    quantize_xa_kv,
)

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
B = int(os.environ.get("BENCH_BATCH", "8"))
STEPS = int(os.environ.get("BENCH_STEPS", "64"))
CACHE_LEN = 256  # lane-aligned (multiple of 128)


def step_variant(cfg, params, tokens, pos, kv_cache, xa_kv, *, with_self,
                 with_cross, with_mlp, with_logits, no_write=False):
    """decoder_step with parts toggled (mirrors models/whisper.decoder_step)."""
    dec = params["decoder"]
    S = tokens.shape[0]
    h = cfg.n_text_head
    d = cfg.n_text_state
    hd = d // h
    scale = hd**-0.25

    x = embed_tokens(dec, tokens) + dec["pos_emb"][pos]
    x = x[:, None, :].astype(cfg.dtype)

    cache_len = kv_cache["k"].shape[3]
    kpos = jnp.arange(cache_len)[None, :]
    self_mask = (kpos <= pos[:, None])[:, None, None]

    def write_slot(cache_all, new, li):
        if no_write:  # isolate the cache-append cost
            return cache_all
        return jax.vmap(
            lambda c, n, p: jax.lax.dynamic_update_slice(
                c, n[None, :, None, :].astype(c.dtype), (li, 0, p, 0)
            ),
            in_axes=(1, 0, 0),
            out_axes=1,
        )(cache_all, new, pos)

    def block(carry, inputs):
        hx, k_all, v_all = carry
        layer, xa, li = inputs

        def heads1(z):
            return z.reshape(S, h, hd)

        if with_self:
            y = layer_norm(hx, layer["attn_ln"])
            q = heads1(dense(y, layer["attn"]["q"]))[:, :, None, :]
            k_all = write_slot(k_all, heads1(dense(y, layer["attn"]["k"])), li)
            v_all = write_slot(v_all, heads1(dense(y, layer["attn"]["v"])), li)
            k_cache = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            sa, _ = _attend(q * (scale * scale), k_cache, v_cache, self_mask)
            sa = sa.transpose(0, 2, 1, 3).reshape(S, 1, d)
            hx = hx + dense(sa.astype(hx.dtype), layer["attn"]["o"])

        if with_cross:
            y = layer_norm(hx, layer["cross_attn_ln"])
            q = heads1(dense(y, layer["cross_attn"]["q"]))
            ca = _attend_xa_step(q, xa, scale)
            hx = hx + dense(ca.reshape(S, 1, d).astype(hx.dtype), layer["cross_attn"]["o"])

        if with_mlp:
            hx = hx + mlp(layer_norm(hx, layer["mlp_ln"]), layer["mlp_1"], layer["mlp_2"])
        return (hx, k_all, v_all), None

    (x, new_k, new_v), _ = jax.lax.scan(
        block,
        (x, kv_cache["k"], kv_cache["v"]),
        (dec["blocks"], xa_kv, jnp.arange(cfg.n_text_layer)),
    )
    x = layer_norm(x, dec["ln"])
    if with_logits:
        out_tok = jnp.argmax(tied_logits(x, dec)[:, 0], -1).astype(jnp.int32)
    else:
        out_tok = (tokens + jnp.sum(x[:, 0, :8], -1).astype(jnp.int32) % 7) % 50000
    return out_tok, {"k": new_k, "v": new_v}


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "with_self", "with_cross", "with_mlp", "with_logits", "no_write"),
)
def loop(cfg, n_steps, params, kv, xa_kv, tok0, pos0, with_self=True,
         with_cross=True, with_mlp=True, with_logits=True, no_write=False):
    def body(state):
        i, tok, pos, kv = state
        tok, kv = step_variant(
            cfg, params, tok, pos, kv, xa_kv, with_self=with_self,
            with_cross=with_cross, with_mlp=with_mlp, with_logits=with_logits,
            no_write=no_write,
        )
        return i + 1, tok, pos + 1, kv

    _, tok, _, _ = jax.lax.while_loop(
        lambda s: s[0] < n_steps, body, (jnp.int32(0), tok0, pos0, kv)
    )
    return tok


def timeit(fn, iters=3):
    out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]  # sync incl. compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = np.asarray(out).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    cfg = config_for(MODEL)
    params = init_params(cfg, jax.random.key(0))
    hd = cfg.n_text_state // cfg.n_text_head
    rng = np.random.default_rng(0)
    xa_shape = (cfg.n_text_layer, B, cfg.n_text_head, hd, cfg.n_audio_ctx)
    xa_bf = {
        "k": jnp.asarray(rng.standard_normal(xa_shape) * 0.2, cfg.dtype),
        "v": jnp.asarray(rng.standard_normal(xa_shape) * 0.2, cfg.dtype),
    }
    which = os.environ.get("BENCH_DTYPE", "int8")
    if which == "int8":
        params = jax.block_until_ready(quantize_params(params))
        xa = jax.block_until_ready(quantize_xa_kv(xa_bf))
    else:
        xa = xa_bf

    kv0 = init_kv_cache(cfg, B, CACHE_LEN)
    tok0 = jnp.full((B,), 100, jnp.int32)
    pos0 = jnp.zeros((B,), jnp.int32)

    variants = {
        "full": dict(),
        "no_self": dict(with_self=False),
        "no_self_write": dict(no_write=True),
        "no_cross": dict(with_cross=False),
        "no_mlp": dict(with_mlp=False),
        "no_logits": dict(with_logits=False),
        "only_logits": dict(with_self=False, with_cross=False, with_mlp=False),
    }
    for name, kw in variants.items():
        t = timeit(lambda kw=kw: loop(cfg, STEPS, params, kv0, xa, tok0, pos0, **kw))
        print(json.dumps({
            "metric": f"step_ms_{which}_{name}",
            "value": round(t / STEPS * 1e6) / 1e3,
        }), flush=True)


if __name__ == "__main__":
    main()
