"""Per-component latency of one streaming tick at B=1 on the real chip.

Measures, for whisper large-v3 (random init, int8 compute like the bench):
  * fused encode launch (mel -> encoder -> xa_kv precompute), full ctx
  * decode_window with sampled-token caps {16, 32, 64, 128, 224}
  * the DTW alignment pass (compute_token_times) for a short sequence

This decides which levers close the 500 ms tick budget (VERDICT r4 #2):
token caps, skipping alignment on partials, and encode+decode fusion.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sentiric_stt_whisper_service_tpu.models import (
    TokenIds,
    build_suppress_mask,
    config_for,
    decode_window,
    init_params,
)
from sentiric_stt_whisper_service_tpu.models.sampling import prompt_bucket
from sentiric_stt_whisper_service_tpu.ops import N_SAMPLES
from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer


def timed(fn, n=5):
    fn()  # compile + warm
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import os

    model = os.environ.get("BENCH_MODEL", "large-v3")
    cfg = config_for(model)
    params = init_params(cfg, jax.random.key(0))
    from sentiric_stt_whisper_service_tpu.models.whisper import encode_xa_kv_q
    from sentiric_stt_whisper_service_tpu.ops.quant import (
        fuse_decoder_qkv,
        quantize_params,
    )

    params = jax.block_until_ready(fuse_decoder_qkv(quantize_params(params)))
    self_dtype = jnp.float8_e4m3fn
    tok = fallback_tokenizer(cfg.n_vocab)
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, tok.non_speech_tokens))
    sot = tok.sot_sequence("en")
    prefill = prompt_bucket(len(sot))

    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((1, N_SAMPLES)) * 0.05).astype(np.float32))

    from functools import partial

    enc = jax.jit(partial(encode_xa_kv_q, cfg, bits=8))
    from sentiric_stt_whisper_service_tpu.ops import compute_log_mel

    @jax.jit
    def encode_full(audio):
        mel = compute_log_mel(audio, n_mels=cfg.n_mels, dtype=cfg.dtype)
        return encode_xa_kv_q(cfg, params, mel, 8)

    t_enc = timed(lambda: encode_full(audio))
    print(f"encode_full_ctx: {t_enc*1e3:.1f} ms")
    xa_kv = encode_full(audio)

    tinit = np.full((1, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[0, : len(sot)] = sot
    tinit = jnp.asarray(tinit)

    for cap in (16, 32, 64, 128, 224):
        max_len = min(cfg.n_text_ctx, prefill + cap)

        def dec():
            return decode_window(
                cfg, params, xa_kv, tinit, len(sot), 0, ids, sup,
                jnp.float32(0.0), jax.random.key(1), max_len=max_len,
                prefill_len=prefill, self_dtype=self_dtype,
            )

        t = timed(dec)
        print(f"decode_cap{cap}: {t*1e3:.1f} ms")

    # Fused encode+decode in ONE executable (cap 32) vs separate launches.
    def fused(cap):
        max_len = min(cfg.n_text_ctx, prefill + cap)

        @jax.jit
        def run(audio):
            mel = compute_log_mel(audio, n_mels=cfg.n_mels, dtype=cfg.dtype)
            kv = encode_xa_kv_q(cfg, params, mel, 8)
            return decode_window(
                cfg, params, kv, tinit, len(sot), 0, ids, sup,
                jnp.float32(0.0), jax.random.key(1), max_len=max_len,
                prefill_len=prefill, self_dtype=self_dtype,
            )

        return timed(lambda: run(audio))

    print(f"fused_enc_dec_cap32: {fused(32)*1e3:.1f} ms")
    print(f"fused_enc_dec_cap64: {fused(64)*1e3:.1f} ms")

    # Alignment pass for a ~24-token sequence.
    from sentiric_stt_whisper_service_tpu.models.timestamps import (
        compute_token_times,
    )

    seq = np.asarray(list(sot) + [1000 + i for i in range(24)], np.int64)

    def align():
        return compute_token_times(cfg, params, xa_kv, seq, len(sot), 1500)

    t_al = timed(align)
    print(f"align_24tok: {t_al*1e3:.1f} ms")


if __name__ == "__main__":
    main()
