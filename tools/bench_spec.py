"""Speculative-decoding latency bench (single stream, B=1).

Spec decode's per-ROUND cost is acceptance-independent (the draft always
proposes gamma tokens and the target always verifies gamma+1 positions);
only the tokens emitted per round vary with acceptance alpha. Random
weights give alpha ~= 0, so this harness measures:

  * plain greedy decode_window at B=1: ms/token (the baseline),
  * decode_window_spec rounds with a turbo-class draft: ms/round,

and reports the IMPLIED speedup curve over alpha — with real
turbo-draft checkpoints, published Whisper acceptance rates sit around
0.7-0.9 on speech. Env: BENCH_MODEL, BENCH_DRAFT, BENCH_GAMMA,
BENCH_COMPUTE.
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
    decode_window,
    decode_window_spec,
    encoder_apply,
    init_params,
    precompute_xa_kv,
)
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES, compute_log_mel
from sentiric_stt_whisper_service_tpu.ops.quant import (
    fuse_decoder_qkv,
    quantize_params,
)
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
DRAFT = os.environ.get("BENCH_DRAFT", "large-v3-turbo")
GAMMA = int(os.environ.get("BENCH_GAMMA", "4"))
KV_BITS = 4 if os.environ.get("BENCH_COMPUTE", "int8").startswith("int4") else 8
TOKENS = 128


def main():
    cfg = config_for(MODEL)
    dcfg = config_for(DRAFT)
    params = jax.block_until_ready(
        fuse_decoder_qkv(quantize_params(init_params(cfg, jax.random.key(0)))))
    dparams = jax.block_until_ready(
        fuse_decoder_qkv(quantize_params(init_params(dcfg, jax.random.key(1)))))
    tok = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")
    sb = len(sot)
    max_len = sb + TOKENS

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (rng.standard_normal((1, N_SAMPLES)) * 0.05).astype(np.float32))
    mel = compute_log_mel(audio, n_mels=cfg.n_mels, dtype=cfg.dtype)
    xa = encoder_apply(cfg, params, mel)
    xa_kv = jax.block_until_ready(precompute_xa_kv(cfg, params, xa, KV_BITS))
    # turbo-class draft shares the target's frozen encoder: feed the SAME
    # encoder output through the draft's (4-layer) cross-KV projections.
    xa_kv_d = jax.block_until_ready(
        precompute_xa_kv(dcfg, dparams, xa, KV_BITS))

    tinit = np.full((1, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[0, :sb] = sot
    tinit = jnp.asarray(tinit)

    def timeit(fn, iters=5):
        out = fn()
        _ = int(np.asarray(out.lengths).sum())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        tot_tokens = sum(
            int(np.asarray(o.lengths)[0]) - sb for o in outs
        ) / iters
        dt = (time.perf_counter() - t0) / iters
        return dt, tot_tokens

    dt_plain, n_plain = timeit(lambda: decode_window(
        cfg, params, xa_kv, tinit, sb, 0, ids, sup,
        jnp.float32(0.0), jax.random.key(1), max_len=max_len))
    ms_per_tok = dt_plain / max(n_plain, 1) * 1e3
    print(json.dumps({"variant": "plain_greedy_B1",
                      "ms_per_token": round(ms_per_tok, 3),
                      "tokens": n_plain}), flush=True)

    dt_spec, n_spec = timeit(lambda: decode_window_spec(
        cfg, params, xa_kv, dcfg, dparams, xa_kv_d, tinit, sb, 0, ids, sup,
        max_len=max_len, gamma=GAMMA))
    # alpha ~= 0 with random weights: every round emits ~1 token, so
    # rounds ~= emitted tokens and ms/round = dt/n.
    ms_per_round = dt_spec / max(n_spec, 1) * 1e3
    out = {"variant": f"spec_g{GAMMA}_{DRAFT}",
           "ms_per_round": round(ms_per_round, 3),
           "tokens": n_spec}
    # Implied speedup at acceptance alpha: E[tokens/round] for the
    # truncated-geometric acceptance model = (1 - a^(g+1)) / (1 - a).
    for a in (0.0, 0.5, 0.7, 0.8, 0.9):
        e_tok = (GAMMA + 1) if a >= 1.0 else (1 - a ** (GAMMA + 1)) / (1 - a)
        out[f"speedup_a{a}"] = round(ms_per_tok / (ms_per_round / e_tok), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
