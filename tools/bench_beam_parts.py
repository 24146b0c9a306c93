"""Beam-step decomposition at production shape (B=24, K=5, BK=120).

Times, on the real chip with slope-timed chained loops:
  decode_full : decode_window_beam on a precomputed xa_kv (per-step total)
  decode_nots : same with use_timestamps=False (rules share by difference)
  step_only   : chained decoder_step_beam (embed→32 layers→logits), argmax
                feedback — the pure model cost per step
  topk        : lax.top_k(K) over [BK, V] in a chained scan
  lse         : logsumexp over [BK, V] in a chained scan

Residual = decode_nots - step_only - topk - lse ≈ candidate bookkeeping
(ancestry update, gathers, while_loop machinery).
"""

from __future__ import annotations

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
from sentiric_stt_whisper_service_tpu.models.beam import decode_window_beam
from sentiric_stt_whisper_service_tpu.models.whisper import (
    decoder_apply,
    decoder_step_beam,
    encode_xa_kv_q,
    init_kv_cache,
    pairing_ok,
)
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, compute_log_mel
from sentiric_stt_whisper_service_tpu.ops.quant import (
    fuse_decoder_qkv,
    quantize_params,
    unpack_xa_kv,
)
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
B = int(os.environ.get("BENCH_BATCH", "24"))
K = int(os.environ.get("BENCH_BEAM", "5"))
KV_BITS = 8 if os.environ.get("BENCH_COMPUTE", "int4").startswith("int8") else 4
TOKENS = 128


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = config_for(MODEL)
    params = jax.block_until_ready(
        fuse_decoder_qkv(quantize_params(init_params(cfg, jax.random.key(0))))
    )
    tok = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")
    tinit = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)
    max_len = len(sot) + TOKENS

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (rng.standard_normal((B, N_SAMPLES)) * 0.05).astype(np.float32)
    )
    mel = compute_log_mel(audio, n_mels=cfg.n_mels, dtype=cfg.dtype)
    xa_kv = jax.block_until_ready(encode_xa_kv_q(cfg, params, mel, KV_BITS))
    BK = B * K
    V = cfg.n_vocab

    res = {}
    twin_only = os.environ.get("BENCH_TWIN_ONLY", "0") == "1"

    def full(p, kv):
        return decode_window_beam(
            cfg, p, kv, tinit, len(sot), 0, ids, sup,
            beam_size=K, max_len=max_len,
        )

    def nots(p, kv):
        return decode_window_beam(
            cfg, p, kv, tinit, len(sot), 0, ids, sup,
            beam_size=K, max_len=max_len, use_timestamps=False,
        )

    if not twin_only:
        res["decode_full_ms"] = timeit(full, params, xa_kv) / TOKENS * 1e3
        res["decode_nots_ms"] = timeit(nots, params, xa_kv) / TOKENS * 1e3

    # Pure model step: chained decoder_step_beam with argmax feedback.
    cache_len = -(-max_len // 32) * 32
    anc = (
        (jnp.arange(K)[None, None, :, None] == jnp.arange(K)[None, :, None, None])
        | (jnp.arange(cache_len) < len(sot))[None, None, None, :]
        & (jnp.arange(K) == 0)[None, None, :, None]
    )
    anc = jnp.broadcast_to(anc, (B, K, K, cache_len))

    def make_chained():
        return jax.jit(_chained_steps_impl)

    def _chained_steps_impl(p, kv_c):
        xk = unpack_xa_kv(kv_c)
        kv_b = init_kv_cache(cfg, B, cache_len, paired=pairing_ok(cfg))
        _, kv_b, _ = decoder_apply(
            cfg, p, tinit[:, : len(sot)], jnp.int32(0), kv_b, xk
        )
        kv = {
            name: jnp.zeros((v.shape[0], B, K) + v.shape[2:], v.dtype)
            .at[:, :, 0]
            .set(v)
            .reshape((v.shape[0], BK) + v.shape[2:])
            for name, v in kv_b.items()
        }

        def body(i, carry):
            tok_, kv_ = carry
            logits, kv_ = decoder_step_beam(
                cfg, p, tok_, len(sot) + i, kv_, xk, anc, K
            )
            return jnp.argmax(logits, -1).astype(jnp.int32), kv_

        tok0 = jnp.full((BK,), int(ids.eot), jnp.int32)
        tok_fin, _ = jax.lax.fori_loop(0, TOKENS, body, (tok0, kv))
        return tok_fin

    if not twin_only:
        res["step_only_ms"] = (
            timeit(make_chained(), params, xa_kv) / TOKENS * 1e3
        )

    # Self-attention share: stub the beam kernel (returns q unchanged) and
    # re-trace the identical chained loop. WRONG numerics, right traffic-free
    # shape — the difference is the kernel's true per-step cost in situ.
    # (decoder_step_beam imports the kernel at trace time, so a fresh jit
    # picks the stub up.)
    if os.environ.get("BENCH_ABLATE_SELF", "1") == "1" and not twin_only:
        from sentiric_stt_whisper_service_tpu.ops import beam_attention as ba

        real_attn = ba.beam_attention
        ba.beam_attention = (
            lambda q, k, v, anc, beam_size, scale=1.0, interpret=False: q
        )
        try:
            res["step_noself_ms"] = (
                timeit(make_chained(), params, xa_kv) / TOKENS * 1e3
            )
        finally:
            ba.beam_attention = real_attn
        res["self_kernel_ms"] = res["step_only_ms"] - res["step_noself_ms"]

    # Ablatable TWIN of decoder_step_beam (bench-only; may drift from the
    # production step — used to attribute per-step cost, not for numerics).
    from sentiric_stt_whisper_service_tpu.models import whisper as W
    from sentiric_stt_whisper_service_tpu.ops.beam_attention import (
        beam_attention,
    )

    def twin_steps(p, kv_c, *, cross=True, self_read=True, append=True,
                   do_mlp=True, do_logits=True):
        xk = unpack_xa_kv(kv_c)
        dec = p["decoder"]
        h, d = cfg.n_text_head, cfg.n_text_state
        hd = d // h
        scale = hd**-0.25
        kv_b = init_kv_cache(cfg, B, cache_len, paired=pairing_ok(cfg))
        _, kv_b, _ = decoder_apply(
            cfg, p, tinit[:, : len(sot)], jnp.int32(0), kv_b, xk
        )
        kv = {
            name: jnp.zeros((v.shape[0], B, K) + v.shape[2:], v.dtype)
            .at[:, :, 0]
            .set(v)
            .reshape((v.shape[0], BK) + v.shape[2:])
            for name, v in kv_b.items()
        }
        paired = kv["k"].shape[-1] == 2 * hd

        def step(tok_, pos, k_all_, v_all_):
            x = W.embed_tokens(dec, tok_) + dec["pos_emb"][pos][None]
            hx = x[:, None, :].astype(cfg.dtype)
            for li in range(cfg.n_text_layer):
                layer = jax.tree.map(lambda a: a[li], dec["blocks"])
                xa = jax.tree.map(lambda a: a[li], xk)
                y = W.layer_norm(hx, layer["attn_ln"])
                qkv = W.dense(y, layer["attn"]["qkv"])
                qp, kp, vp = jnp.split(qkv, 3, axis=-1)

                def rows(z):
                    if paired:
                        return z.reshape(BK, h // 2, 2 * hd)
                    return z.reshape(BK, h, hd)

                if append:
                    k_all_ = jax.lax.dynamic_update_slice(
                        k_all_,
                        rows(kp)[None, :, :, None, :].astype(k_all_.dtype),
                        (li, 0, 0, pos, 0),
                    )
                    v_all_ = jax.lax.dynamic_update_slice(
                        v_all_,
                        rows(vp)[None, :, :, None, :].astype(v_all_.dtype),
                        (li, 0, 0, pos, 0),
                    )
                if self_read:
                    k_c = jax.lax.dynamic_index_in_dim(k_all_, li, 0, False)
                    v_c = jax.lax.dynamic_index_in_dim(v_all_, li, 0, False)
                    sa = beam_attention(
                        qp.reshape(BK, h, hd), k_c, v_c, anc, K,
                        scale=scale * scale,
                    )
                    hx = hx + W.dense(
                        sa.reshape(BK, 1, d).astype(hx.dtype), layer["attn"]["o"]
                    )
                if cross:
                    y = W.layer_norm(hx, layer["cross_attn_ln"])
                    q = W.dense(y, layer["cross_attn"]["q"]).reshape(B, K, h, hd)
                    q = q.transpose(0, 2, 1, 3)
                    ca, _ = W._attend_xa(q, xa, scale)
                    ca = ca.transpose(0, 2, 1, 3).reshape(BK, 1, d)
                    hx = hx + W.dense(ca.astype(hx.dtype), layer["cross_attn"]["o"])
                if do_mlp:
                    hx = hx + W.mlp(
                        W.layer_norm(hx, layer["mlp_ln"]),
                        layer["mlp_1"], layer["mlp_2"],
                    )
            if do_logits:
                xo = W.layer_norm(hx, dec["ln"])
                return W.tied_logits(xo, dec)[:, 0], k_all_, v_all_
            return hx[:, 0, :64], k_all_, v_all_  # cheap stand-in

        def body(i, carry):
            tok_, k_all_, v_all_ = carry
            out, k_all_, v_all_ = step(tok_, len(sot) + i, k_all_, v_all_)
            return (
                jnp.argmax(out, -1).astype(jnp.int32) % cfg.n_vocab,
                k_all_,
                v_all_,
            )

        tok0 = jnp.full((BK,), int(ids.eot), jnp.int32)
        tok_fin, _, _ = jax.lax.fori_loop(
            0, TOKENS, body, (tok0, kv["k"], kv["v"])
        )
        return tok_fin

    import functools as ft

    variants = {
        "twin_full": {},
        "twin_nocross": {"cross": False},
        "twin_noself": {"self_read": False},
        "twin_noappend": {"append": False},
        "twin_nomlp": {"do_mlp": False},
        "twin_nologits": {"do_logits": False},
    }
    for name, kw in variants.items():
        fn = jax.jit(ft.partial(twin_steps, **kw))
        res[f"{name}_ms"] = timeit(fn, params, xa_kv) / TOKENS * 1e3

    # Isolated [BK, V] epilogue ops, chained through a scan.
    logits0 = jax.random.normal(jax.random.key(1), (BK, V), jnp.float32)

    @jax.jit
    def topk_loop(x):
        def body(c, _):
            v_, t_ = jax.lax.top_k(c, K)
            return c + v_[:, :1] * 1e-9, t_[:, 0]
        c, _ = jax.lax.scan(body, x, None, length=TOKENS)
        return c

    @jax.jit
    def lse_loop(x):
        def body(c, _):
            s = jax.nn.logsumexp(c, axis=-1)
            return c + s[:, None] * 1e-9, s[0]
        c, _ = jax.lax.scan(body, x, None, length=TOKENS)
        return c

    if not twin_only:
        res["topk_ms"] = timeit(topk_loop, logits0) / TOKENS * 1e3
        res["lse_ms"] = timeit(lse_loop, logits0) / TOKENS * 1e3
        res["rules_ms"] = res["decode_full_ms"] - res["decode_nots_ms"]
        res["residual_ms"] = (
            res["decode_nots_ms"] - res["step_only_ms"]
            - res["topk_ms"] - res["lse_ms"]
        )
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
