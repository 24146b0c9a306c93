"""Decode-step decomposition mirroring the REAL decode_window path
(head-paired self cache, shared-position sublane DUS append, unrolled
layers, int8 weights + fused QKV, int8/int4 cross-KV) at the headline
batch. Unlike tools/bench_ablate.py (which keeps the older unpaired
scatter layout for history), this measures today's shipped step.

Each variant is the full step with one component removed, run STEPS
iterations inside one on-device while_loop (axon timing rule: chained
loop, one scalar pull). Per-step cost of a component = full - variant.

Env: BENCH_BATCH (56), BENCH_STEPS (64), BENCH_MODEL (large-v3),
BENCH_KV_BITS (8|4). Prints one JSON line per variant.
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

from sentiric_stt_whisper_service_tpu.models import (
    TokenIds,
    build_suppress_mask,
    config_for,
    init_params,
)
from sentiric_stt_whisper_service_tpu.models.sampling import (
    apply_timestamp_rules,
)
from sentiric_stt_whisper_service_tpu.models.whisper import (
    _attend,
    _attend_xa_step,
    _pair_queries,
    dense,
    embed_tokens,
    init_kv_cache,
    layer_norm,
    mlp,
    tied_logits,
)
from sentiric_stt_whisper_service_tpu.ops.quant import (
    fuse_decoder_qkv,
    quantize_params,
    quantize_xa_kv,
    unpack_xa_kv,
)
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
B = int(os.environ.get("BENCH_BATCH", "56"))
STEPS = int(os.environ.get("BENCH_STEPS", "64"))
KV_BITS = int(os.environ.get("BENCH_KV_BITS", "8"))
CACHE_LEN = 160  # what a 131-token window decode allocates (32-row bucket)


def step_variant(cfg, params, ids, sup, tokens, pos, kv_cache, xa_kv, *,
                 with_self, with_cross, with_mlp, with_logits, with_rules,
                 no_write):
    """Mirrors models/whisper.decoder_step (paired + shared-pos DUS +
    unrolled) plus decode_window's sampling epilogue, with toggles."""
    dec = params["decoder"]
    S = tokens.shape[0]
    h = cfg.n_text_head
    d = cfg.n_text_state
    hd = d // h
    scale = hd**-0.25

    x = embed_tokens(dec, tokens) + dec["pos_emb"][pos][None]
    x = x[:, None, :].astype(cfg.dtype)

    cache_len = kv_cache["k"].shape[3]
    self_mask = (jnp.arange(cache_len) <= pos)[None, None, None, :]  # [1,1,1,C]

    def write_slot(cache_all, new, li):
        if no_write:
            return cache_all
        return jax.lax.dynamic_update_slice(
            cache_all,
            new[None, :, :, None, :].astype(cache_all.dtype),
            (li, 0, 0, pos, 0),
        )

    k_all, v_all = kv_cache["k"], kv_cache["v"]
    hx = x
    for i in range(cfg.n_text_layer):
        layer = jax.tree.map(lambda a: a[i], dec["blocks"])
        xa = jax.tree.map(lambda a: a[i], xa_kv)
        li = jnp.int32(i)
        if with_self:
            y = layer_norm(hx, layer["attn_ln"])
            qkv = dense(y, layer["attn"]["qkv"])
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
            k_all = write_slot(k_all, kp.reshape(S, h // 2, 2 * hd), li)
            v_all = write_slot(v_all, vp.reshape(S, h // 2, 2 * hd), li)
            k_cache = k_all[i]
            v_cache = v_all[i]
            q2 = _pair_queries(qp.reshape(S, h // 2, 2, hd))
            sa, _ = _attend(q2 * (scale * scale), k_cache, v_cache, self_mask)
            sa = jnp.concatenate(
                [sa[:, :, 0, :hd], sa[:, :, 1, hd:]], axis=-1
            ).reshape(S, 1, d)
            hx = hx + dense(sa.astype(hx.dtype), layer["attn"]["o"])
        if with_cross:
            y = layer_norm(hx, layer["cross_attn_ln"])
            q = dense(y, layer["cross_attn"]["q"]).reshape(S, h, hd)
            ca = _attend_xa_step(q, xa, scale)
            hx = hx + dense(
                ca.reshape(S, 1, d).astype(hx.dtype), layer["cross_attn"]["o"]
            )
        if with_mlp:
            hx = hx + mlp(
                layer_norm(hx, layer["mlp_ln"]), layer["mlp_1"], layer["mlp_2"]
            )

    hx = layer_norm(hx, dec["ln"])
    if with_logits:
        logits = tied_logits(hx, dec)[:, 0]
        if with_rules:
            logits = logits + sup[None, :]
            logits = apply_timestamp_rules(
                logits,
                jnp.full((S, 224), ids.eot, jnp.int32),
                jnp.broadcast_to(pos, (S,)) + 4,
                4,
                ids,
            )
        out_tok = jnp.argmax(logits, -1).astype(jnp.int32) % 50000
    else:
        out_tok = (tokens + jnp.sum(hx[:, 0, :8], -1).astype(jnp.int32) % 7) % 50000
    return out_tok, {"k": k_all, "v": v_all}


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "ids", "n_steps", "with_self", "with_cross", "with_mlp",
        "with_logits", "with_rules", "no_write",
    ),
)
def loop(cfg, ids, n_steps, params, sup, kv, xa_kv, tok0, *, with_self=True,
         with_cross=True, with_mlp=True, with_logits=True, with_rules=True,
         no_write=False):
    xa_kv = unpack_xa_kv(xa_kv)

    def body(state):
        i, tok, pos, kv = state
        tok, kv = step_variant(
            cfg, params, ids, sup, tok, pos, kv, xa_kv,
            with_self=with_self, with_cross=with_cross, with_mlp=with_mlp,
            with_logits=with_logits, with_rules=with_rules, no_write=no_write,
        )
        return i + 1, tok, pos + 1, kv

    _, tok, _, _ = jax.lax.while_loop(
        lambda s: s[0] < n_steps, body,
        (jnp.int32(0), tok0, jnp.int32(8), kv),
    )
    return tok


def timeit(fn, iters=3):
    out = fn()
    _ = np.asarray(out).ravel()[0]  # sync incl. compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = np.asarray(out).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    cfg = config_for(MODEL)
    params = init_params(cfg, jax.random.key(0))
    params = jax.block_until_ready(fuse_decoder_qkv(quantize_params(params)))
    hd = cfg.n_text_state // cfg.n_text_head
    rng = np.random.default_rng(0)
    xa_shape = (cfg.n_text_layer, B, cfg.n_text_head, hd, cfg.n_audio_ctx)
    xa_bf = {
        "k": jnp.asarray(rng.standard_normal(xa_shape) * 0.2, cfg.dtype),
        "v": jnp.asarray(rng.standard_normal(xa_shape) * 0.2, cfg.dtype),
    }
    xa = jax.block_until_ready(quantize_xa_kv(xa_bf, bits=KV_BITS))
    del xa_bf

    tok_ = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok_)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok_.non_speech_tokens))

    kv0 = init_kv_cache(cfg, B, CACHE_LEN, paired=True)
    tok0 = jnp.full((B,), 123, jnp.int32)

    variants = [
        ("full", {}),
        ("no_rules", {"with_rules": False}),
        ("no_logits", {"with_logits": False}),
        ("no_self", {"with_self": False}),
        ("no_cross", {"with_cross": False}),
        ("no_mlp", {"with_mlp": False}),
        ("no_write", {"no_write": True}),
        ("bare", {"with_self": False, "with_cross": False, "with_mlp": False,
                  "with_logits": False}),
    ]
    base = None
    for name, kw in variants:
        dt = timeit(lambda: loop(cfg, ids, STEPS, params, sup, kv0, xa, tok0, **kw))
        ms = dt / STEPS * 1e3
        rec = {"metric": f"step_b{B}_kv{KV_BITS}_{name}", "value": round(ms, 3),
               "unit": "ms/step"}
        if name == "full":
            base = ms
        elif base is not None:
            rec["delta_vs_full_ms"] = round(base - ms, 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
