"""On-DEVICE numerics parity check for the paired-cache decode paths.

Runs on whatever backend is live (the real TPU under axon; CPU elsewhere)
and asserts that the production fast paths agree with their reference
formulations ON THAT BACKEND. The CPU test suite compiles through
XLA:CPU / Pallas interpret mode, which does NOT exercise the TPU
codegen: a real XLA:TPU MISCOMPILE of the paired-head lane-half
extraction (reshape[..., hd:] + stack fused around the attention) shipped
in round 1 with every CPU test green — greedy step logits and the beam
kernel's odd heads were silently wrong on chip. This tool is the guard:
run it after touching whisper.py's paired paths, ops/beam_attention.py,
or bumping jax/libtpu.

Checks (each paired/fused path vs its unpaired/XLA twin, same inputs):
  1. greedy decoder_step chain (paired slab + f8 slab variants)
  2. decoder_apply prefill (paired)
  3. fused beam_attention kernel vs beam_attention_reference
  4. decoder_step_beam (kernel path) vs XLA twin path

Exit code 0 = all within tolerance. Prints one JSON line per check.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sentiric_stt_whisper_service_tpu.models import config_for, init_params
from sentiric_stt_whisper_service_tpu.models.whisper import (
    decoder_apply,
    decoder_step,
    decoder_step_beam,
    encoder_apply,
    init_kv_cache,
    precompute_xa_kv,
    set_flash_attn,
)
from sentiric_stt_whisper_service_tpu.ops.beam_attention import (
    beam_attention,
    beam_attention_reference,
)

FAILS = []


def check(name, got, want, atol):
    d = float(np.max(np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))))
    ok = d <= atol
    print(json.dumps({"check": name, "max_abs_diff": round(d, 6),
                      "atol": atol, "ok": ok}), flush=True)
    if not ok:
        FAILS.append(name)


def main():
    cfg = dataclasses.replace(
        config_for("test"), n_text_head=8, n_audio_head=8,
        n_text_state=512, n_audio_state=512, dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.key(0))
    B = 4
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 200, cfg.n_mels)), jnp.float32)
    xa_kv = precompute_xa_kv(cfg, params, encoder_apply(cfg, params, mel))
    toks = jnp.asarray(rng.integers(0, 1000, (B, 8)).astype(np.int32))
    steps = [jnp.asarray(rng.integers(0, 1000, (B,)).astype(np.int32))
             for _ in range(4)]

    # --- 1 & 2: greedy prefill + step chain, paired (and f8) vs unpaired.
    def greedy(paired, dtype=None):
        kv = init_kv_cache(cfg, B, 64, paired=paired, dtype=dtype)
        pre, kv, _ = decoder_apply(cfg, params, toks, jnp.int32(0), kv, xa_kv)
        fn = jax.jit(decoder_step, static_argnames=("cfg",))
        out = []
        for i, st in enumerate(steps):
            lg, kv = fn(cfg, params, st, jnp.int32(8 + i), kv, xa_kv)
            out.append(np.asarray(lg, np.float32))
        return np.asarray(pre, np.float32), np.stack(out)

    pre_u, chain_u = greedy(False)
    pre_p, chain_p = greedy(True)
    check("greedy_prefill_paired_vs_unpaired", pre_p, pre_u, 0.05)
    check("greedy_step_chain_paired_vs_unpaired", chain_p, chain_u, 0.05)
    _, chain_f8 = greedy(True, dtype=jnp.float8_e4m3fn)
    # f8 storage: ~0.4% rms rounding on K/V — logits move accordingly.
    check("greedy_step_chain_f8_vs_unpaired", chain_f8, chain_u, 2.0)

    # --- 3: fused beam kernel vs XLA twin, paired slabs, bf16.
    K, H, C, hd = 5, 20, 256, 64
    Bb = 2
    BK = Bb * K
    k = jnp.asarray(rng.standard_normal((BK, H // 2, C, 2 * hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BK, H // 2, C, 2 * hd)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((BK, H, hd)), jnp.bfloat16)
    anc = np.zeros((Bb, K, K, C), bool)
    anc[:, :, 0, : C // 2] = True
    for s in range(K):
        anc[:, s, s, C // 2 :] = True
    anc = jnp.asarray(anc)
    got = beam_attention(q, k, v, anc, K, scale=0.125)
    want = beam_attention_reference(q, k, v, anc, K, scale=0.125)
    check("beam_kernel_paired_vs_twin", got, want, 0.02)

    # --- 4: decoder_step_beam, kernel path vs XLA twin path. bf16 model
    # dtype so the two paths are numerically DISTINGUISHABLE (a 0.0 diff
    # would mean one path ran twice, e.g. a stale jit cache).
    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )
    xa_kv = precompute_xa_kv(cfg, params, encoder_apply(cfg, params, mel))
    Kb = 5
    kvb = init_kv_cache(cfg, B, 64, paired=True)
    _, kvb, _ = decoder_apply(cfg, params, toks, jnp.int32(0), kvb, xa_kv)
    kv5 = {
        name: jnp.zeros((val.shape[0], B, Kb) + val.shape[2:], val.dtype)
        .at[:, :, 0].set(val)
        .reshape((val.shape[0], B * Kb) + val.shape[2:])
        for name, val in kvb.items()
    }
    ancb = (jnp.arange(Kb) == 0)[None, None, :, None] & (
        jnp.arange(64) < 8
    )[None, None, None, :]
    ancb = jnp.broadcast_to(ancb, (B, Kb, Kb, 64))
    tokb = jnp.asarray(rng.integers(0, 1000, (B * Kb,)).astype(np.int32))
    def fresh_step():  # fresh FUNCTION OBJECT: jax's trace cache is keyed
        # on the underlying callable, so re-wrapping decoder_step_beam
        # itself after toggling the flash flag is STILL a cache hit — the
        # lambda forces a retrace that re-reads the flag.
        return jax.jit(
            lambda *a: decoder_step_beam(*a), static_argnums=(0, 7)
        )

    lg_kern, _ = fresh_step()(cfg, params, tokb, jnp.int32(8), kv5, xa_kv, ancb, Kb)
    set_flash_attn(False)
    try:
        lg_ref, _ = fresh_step()(cfg, params, tokb, jnp.int32(8), kv5, xa_kv, ancb, Kb)
    finally:
        set_flash_attn(None)
    check("beam_step_kernel_vs_twin", lg_kern, lg_ref, 0.05)

    if FAILS:
        print(json.dumps({"result": "FAIL", "failed": FAILS}))
        sys.exit(1)
    print(json.dumps({"result": "PASS", "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
