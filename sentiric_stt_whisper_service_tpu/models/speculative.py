"""Speculative decoding: draft-model propose, target-model verify — exact
greedy semantics, built for single-stream latency.

Round-2 probes established that the per-token decode step is pinned to a
platform wall: the cross-attention slab streams once per emitted token at
a fixed element rate (docs/PERF.md "Platform walls"). Speculation is the
structural answer: a cheap draft decodes ``gamma`` tokens, then the
target verifies all of them in ONE decoder pass over gamma+1 positions —
so the big model's weights and cross slab stream once per ~E[accepted]+1
tokens instead of once per token. whisper.cpp has no equivalent; this is
a TPU-native extension beyond the reference surface.

Natural drafts: ``large-v3-turbo`` (4 decoder layers) or distil-whisper
(2) against ``large-v3`` — same encoder architecture and width, so the
mel/encoder pass can be shared and only the draft's (cheap, few-layer)
cross-KV precompute is extra.

Exactness: the emitted token sequence is IDENTICAL to
``decode_window(temperature=0)`` on the target — every position's token
is the argmax of the target's processed logits (suppression + timestamp
rules with the true prefix), regardless of the draft (a bad draft only
costs speed). The KV caches need no rollback machinery: the
position-major layout derives row validity from ``pos`` (rows at or
beyond the current position are overwritten before they are ever
attended), so rejected draft rows die for free.

Restriction: batch 1 (the latency path). Batched windows keep using
``decode_window`` — lockstep batches amortize weights/slab across the
batch already, which is the same economics speculation buys for B=1.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .sampling import (
    DecodeResult,
    TokenIds,
    apply_timestamp_rules,
    prompt_bucket,
)
from .whisper import (
    WhisperConfig,
    decoder_apply,
    init_kv_cache,
    pairing_ok,
)


def decode_window_spec(
    cfg: WhisperConfig,
    params,
    xa_kv: dict,
    draft_cfg: WhisperConfig,
    draft_params,
    draft_xa_kv: dict,
    tokens_init: jnp.ndarray,  # [1, ctx] int32, prompt in [0, sample_begin)
    sample_begin: int,
    sot_index: int,
    ids: TokenIds,
    suppress_mask: jnp.ndarray,  # [V] additive
    max_len: Optional[int] = None,
    gamma: int = 4,
    use_timestamps: bool = True,
    prefill_len: Optional[int] = None,
    self_dtype=None,
) -> DecodeResult:
    """Greedy speculative decode of one window (batch 1).

    Same contract as ``decode_window`` with ``temperature=0``; the token
    sequence matches it exactly (see module docstring). ``gamma`` is the
    static draft length per round."""
    if tokens_init.shape[0] != 1:
        raise ValueError("decode_window_spec is the B=1 latency path")
    if draft_cfg.n_vocab != cfg.n_vocab:
        raise ValueError("draft and target must share a vocabulary")
    if prefill_len is None:
        prefill_len = prompt_bucket(int(sample_begin))
    max_len = max_len or cfg.n_text_ctx
    return _decode_window_spec_impl(
        cfg, params, xa_kv, draft_cfg, draft_params, draft_xa_kv,
        tokens_init, jnp.asarray(sample_begin, jnp.int32),
        jnp.asarray(sot_index, jnp.int32), ids, suppress_mask,
        max_len, gamma, use_timestamps, prefill_len, self_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "draft_cfg", "ids", "max_len", "gamma", "use_timestamps",
        "prefill_len", "self_dtype",
    ),
)
def _decode_window_spec_impl(
    cfg: WhisperConfig,
    params,
    xa_kv: dict,
    draft_cfg: WhisperConfig,
    draft_params,
    draft_xa_kv: dict,
    tokens_init: jnp.ndarray,
    sample_begin: jnp.ndarray,  # traced scalar
    sot_index: jnp.ndarray,  # traced scalar
    ids: TokenIds,
    suppress_mask: jnp.ndarray,
    max_len: int,
    gamma: int,
    use_timestamps: bool,
    prefill_len: int,
    self_dtype=None,
) -> DecodeResult:
    from ..ops.quant import unpack_xa_kv

    xa_kv = unpack_xa_kv(xa_kv)
    draft_xa_kv = unpack_xa_kv(draft_xa_kv)
    G = gamma
    ctx = cfg.n_text_ctx
    NEG_INF = jnp.float32(-1e30)
    # Cache must hold the round's overshoot: up to G positions past max_len
    # are written (then ignored — validity derives from pos).
    cache_len = min(ctx, -(-(max_len + G + 1) // 32) * 32)
    kv_t = init_kv_cache(cfg, 1, cache_len, paired=pairing_ok(cfg),
                         dtype=self_dtype)
    kv_d = init_kv_cache(draft_cfg, 1, cache_len,
                         paired=pairing_ok(draft_cfg), dtype=self_dtype)

    # --- prefill both models on the (bucketed) prompt ---
    prefill_logits, kv_t, _ = decoder_apply(
        cfg, params, tokens_init[:, :prefill_len], jnp.int32(0), kv_t, xa_kv
    )
    _, kv_d, _ = decoder_apply(
        draft_cfg, draft_params, tokens_init[:, :prefill_len], jnp.int32(0),
        kv_d, draft_xa_kv,
    )
    probs_at_sot = jax.nn.softmax(prefill_logits[:, sot_index], axis=-1)
    no_speech_probs = probs_at_sot[:, ids.no_speech]

    vocab_idx = jnp.arange(cfg.n_vocab)
    start_row = jnp.where(
        (vocab_idx == ids.blank) | (vocab_idx == ids.eot), NEG_INF, 0.0
    )

    def process_logits(logits, tokens, pos):
        # identical rule pipeline to decode_window (exactness contract)
        at_start = pos == sample_begin
        logits = logits + (
            suppress_mask + jnp.where(at_start, start_row, 0.0)
        )[None, :]
        if use_timestamps:
            logits = apply_timestamp_rules(logits, tokens, pos, sample_begin, ids)
        return logits

    def round_fn(state):
        tokens, kv_t, kv_d, pos, done, sum_lp, tok_lps = state

        # --- draft phase: G greedy tokens, written into the buffer ---
        def draft_step(i, carry):
            tokens, kv_d = carry
            tok_in = jax.lax.dynamic_slice(tokens, (0, pos - 1 + i), (1, 1))
            d_logits, kv_d, _ = decoder_apply(
                draft_cfg, draft_params, tok_in, pos - 1 + i, kv_d,
                draft_xa_kv,
            )
            d_proc = process_logits(d_logits[:, 0], tokens, pos + i)
            d_tok = jnp.argmax(d_proc, axis=-1).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice(
                tokens, d_tok[:, None], (0, pos + i)
            )
            return tokens, kv_d

        tokens, kv_d = jax.lax.fori_loop(0, G, draft_step, (tokens, kv_d))

        # --- verify phase: ONE target pass over G+1 positions ---
        verify_in = jax.lax.dynamic_slice(tokens, (0, pos - 1), (1, G + 1))
        v_logits, kv_t, _ = decoder_apply(
            cfg, params, verify_in, pos - 1, kv_t, xa_kv
        )  # [1, G+1, V]: v_logits[i] predicts position pos+i

        def verify_pos(i, carry):
            # Sequential because the rules at pos+i read the prefix, which
            # includes this round's earlier corrections/acceptances.
            tokens, accept_len, still, done_r, sum_lp, tok_lps = carry
            proc = process_logits(v_logits[:, i], tokens, pos + i)
            t_pred = jnp.argmax(proc, axis=-1).astype(jnp.int32)
            lse = jax.nn.logsumexp(proc, axis=-1)
            lp = jnp.take_along_axis(proc, t_pred[:, None], axis=-1)[:, 0] - lse
            in_len = (pos + i) < max_len
            emit = still & ~done_r & in_len
            # i < G: position pos+i currently holds the draft token.
            drafted = jax.lax.dynamic_slice(tokens, (0, pos + i), (1, 1))[:, 0]
            matched = t_pred == drafted
            # The target's token always lands (accepted match or correction);
            # a mismatch ends the round after this emission.
            tokens = jnp.where(
                emit[:, None],
                jax.lax.dynamic_update_slice(tokens, t_pred[:, None], (0, pos + i)),
                tokens,
            )
            sum_lp = sum_lp + jnp.where(emit, lp, 0.0)
            tok_lps = jnp.where(
                emit[:, None],
                jax.lax.dynamic_update_slice(tok_lps, lp[:, None], (0, pos + i)),
                tok_lps,
            )
            accept_len = accept_len + jnp.where(emit, 1, 0)
            done_r = done_r | (emit & (t_pred == ids.eot))
            still = still & emit & jnp.where(i < G, matched, False)
            return tokens, accept_len, still, done_r, sum_lp, tok_lps

        carry = (tokens, jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool),
                 done, sum_lp, tok_lps)
        tokens, accept_len, _, done, sum_lp, tok_lps = jax.lax.fori_loop(
            0, G + 1, verify_pos, carry
        )
        # Pad unreached positions of this round with EOT so the buffer
        # matches decode_window's done-fill convention.
        new_pos = pos + accept_len[0]
        return tokens, kv_t, kv_d, new_pos, done, sum_lp, tok_lps

    def cond_fn(state):
        pos, done = state[3], state[4]
        return (pos < max_len) & ~jnp.all(done)

    state = (
        tokens_init,
        kv_t,
        kv_d,
        sample_begin,
        jnp.zeros((1,), bool),
        jnp.zeros((1,), jnp.float32),
        jnp.zeros((1, ctx), jnp.float32),
    )
    tokens, kv_t, kv_d, pos, done, sum_lp, tok_lps = jax.lax.while_loop(
        cond_fn, round_fn, state
    )

    # Stale draft tokens can sit beyond the final pos; blank them to EOT so
    # the buffer matches decode_window's convention.
    positions = jnp.arange(ctx)[None, :]
    tokens = jnp.where(positions >= pos, ids.eot, tokens)

    is_eot = (tokens == ids.eot) & (positions >= sample_begin) & (positions < pos)
    first_eot = jnp.min(jnp.where(is_eot, positions, ctx), axis=1)
    lengths = jnp.minimum(first_eot + 1, pos)
    n_sampled = jnp.maximum(lengths - sample_begin, 1)
    avg_lp = sum_lp / n_sampled.astype(jnp.float32)
    return DecodeResult(
        tokens=tokens,
        lengths=lengths,
        sum_logprobs=sum_lp,
        avg_logprobs=avg_lp,
        no_speech_probs=no_speech_probs,
        token_logprobs=tok_lps,
    )
