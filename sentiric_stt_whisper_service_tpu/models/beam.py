"""On-device beam search for one batch of 30 s windows.

Covers the reference's beam strategy selection (whisper.cpp
WHISPER_SAMPLING_BEAM_SEARCH when beam_size > 1,
/root/reference/src/stt_engine.cpp:210-212,234-238). The whole search —
expansion, candidate scoring, beam reordering — runs in a single jitted
``lax.while_loop``; beams ride the batch dimension ([B*K] flattened) so
every decoder step is one MXU-shaped call.

The KV plumbing is gather-free (``decoder_step_beam``): each beam appends
into its own physical cache slot and parent adoption only rewrites a tiny
ancestry mask, while the cross-attention slab is shared across beams
instead of tiled K× — the two HBM-traffic sinks of the naive formulation
(docs/PERF.md "Beam path").

Semantics follow openai-whisper's BeamSearchDecoder: candidates scored by
cumulative logprob; a beam that emits EOT is frozen (it competes as a
single EOT-continuation candidate with unchanged score, a standard
alive+finished-in-beam formulation); search stops when every beam of every
batch item is finished or max_len is reached; the winner per item
maximizes avg logprob over sampled tokens (MaximumLikelihoodRanker with
length_penalty=None).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .sampling import (
    NEG_INF,
    DecodeResult,
    TokenIds,
    apply_timestamp_rules,
    prompt_bucket,
)
from .whisper import (
    WhisperConfig,
    decoder_apply,
    decoder_step_beam,
    init_kv_cache,
    pairing_ok,
)


def _fold_self(cfg: WhisperConfig) -> bool:
    """Rank-6 FOLDED self cache (decoder_step_beam): beam self-attention
    as one standard masked XLA attention over [B, H/2, K·C, 2hd].

    MEASURED NEGATIVE END-TO-END: the folded layout's 6-D interior-dim
    append DUS costs far more than the attention saves (96.5 vs 248.7
    RTFx at B=16 int4 — the same failure the round-1 [L,B,H,K,C,hd]
    attempt hit), even though the attention itself matches the kernel
    (tools/bench_beam_fold.py). Default OFF; SSTW_BEAM_FOLD=1 re-enables
    for A/B."""
    import os

    if os.environ.get("SSTW_BEAM_FOLD", "0") != "1":
        return False
    return pairing_ok(cfg)


def topk_small(logits: jnp.ndarray, k: int):
    """Exact top-k over the vocab axis as k iterative argmax passes.

    ``lax.top_k`` over [B*K, 51866] costs ~2.2 ms/step at BK=80 on the
    chip (VPU sort); k reduce+mask passes over the same tensor cost
    ~0.3 ms (tools/bench_beam_parts.py). Matches lax.top_k exactly,
    including tie order (argmax picks the lowest index, and masking the
    winner makes the next pass pick the next-lowest — lax.top_k's stable
    order), PROVIDED each row has at least k entries above the NEG_INF
    sentinel (a masked winner ties at NEG_INF and would be re-picked
    otherwise). The beam loop always satisfies this: suppression masks
    ~10² of 5×10⁴ vocab entries, and fully-NEG_INF rows (finished beams)
    have their top_k output overwritten before use (step_fn).
    Returns (values [.., k], indices [.., k] int32)."""
    iota = jnp.arange(logits.shape[-1])
    vals, idxs = [], []
    x = logits
    for _ in range(k):
        idx = jnp.argmax(x, axis=-1)
        vals.append(jnp.take_along_axis(x, idx[..., None], axis=-1)[..., 0])
        idxs.append(idx.astype(jnp.int32))
        x = jnp.where(iota == idx[..., None], NEG_INF, x)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def decode_window_beam(
    cfg: WhisperConfig,
    params,
    xa_kv: dict,  # [L, B, H, 1500, hd]
    tokens_init: jnp.ndarray,  # [B, ctx] int32
    sample_begin: int,
    sot_index: int,
    ids: TokenIds,
    suppress_mask: jnp.ndarray,  # [V]
    beam_size: int = 5,
    max_len: Optional[int] = None,
    use_timestamps: bool = True,
    prefill_len: Optional[int] = None,
    self_dtype=None,
    cache_buckets: bool = True,
) -> DecodeResult:
    """Beam-search decode; returns the best hypothesis per batch item with
    the same DecodeResult contract as greedy ``decode_window``.

    Prompt lengths are bucketed like ``decode_window``: ``sample_begin`` /
    ``sot_index`` trace, ``prefill_len`` is the static shape class.
    ``self_dtype`` overrides the self-KV-slab storage dtype (fp8 policy,
    see init_kv_cache)."""
    if prefill_len is None:
        prefill_len = prompt_bucket(int(sample_begin))
    max_len = max_len or cfg.n_text_ctx
    from .whisper import _use_flash as _flash

    if self_dtype is not None and _flash() and not _fold_self(cfg):
        # A float8 self slab REGRESSES the fused beam kernel ~2× (232.9 →
        # 125.1 RTFx at B=8 int8: the in-kernel f8→bf16 convert runs per
        # source slot) — unlike the greedy path, where f8 storage wins.
        # The unpaired-kernel fallback therefore keeps bf16 self storage;
        # the default FOLDED XLA path (decoder_step_beam rank-6 cache)
        # fuses the convert into the dot and honors the engine's policy.
        self_dtype = None
    return _decode_window_beam_impl(
        cfg, params, xa_kv, tokens_init,
        jnp.asarray(sample_begin, jnp.int32), jnp.asarray(sot_index, jnp.int32),
        ids, suppress_mask, beam_size, max_len, use_timestamps, prefill_len,
        self_dtype, cache_buckets,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "ids", "beam_size", "max_len", "use_timestamps", "prefill_len",
        "self_dtype", "cache_buckets",
    ),
)
def _decode_window_beam_impl(
    cfg: WhisperConfig,
    params,
    xa_kv: dict,
    tokens_init: jnp.ndarray,
    sample_begin: jnp.ndarray,  # traced scalar
    sot_index: jnp.ndarray,  # traced scalar
    ids: TokenIds,
    suppress_mask: jnp.ndarray,
    beam_size: int,
    max_len: int,
    use_timestamps: bool,
    prefill_len: int,
    self_dtype=None,
    cache_buckets: bool = True,
) -> DecodeResult:
    from ..ops.quant import unpack_xa_kv

    xa_kv = unpack_xa_kv(xa_kv)  # int4 carrier → native int4, pre-loop
    B, ctx = tokens_init.shape
    K = beam_size
    BK = B * K
    cache_len = min(ctx, -(-max_len // 32) * 32)  # 32-row granularity: every
    # step streams the whole slab, so a 131-token decode reads a 160-row
    # slab instead of 192 (bf16 sublane tile is 16 rows — 32 stays aligned
    # and bounds the shape-class count)

    # Prefill ONCE at batch B (all beams are identical before sampling), then
    # place the prefilled cache in each item's physical slot 0; the ancestry
    # mask points every beam at slot 0 for prompt positions, so the prefix is
    # never tiled. The cross slab stays untiled forever — decoder_step_beam
    # shares it across beams (docs/PERF.md beam-path redesign).
    fold = _fold_self(cfg)
    kv_b = init_kv_cache(cfg, B, cache_len, paired=pairing_ok(cfg), dtype=self_dtype)
    prefill_logits, kv_b, _ = decoder_apply(
        cfg, params, tokens_init[:, :prefill_len], jnp.int32(0), kv_b, xa_kv
    )
    if fold:
        # FOLDED cache [L, B, H/2, K, C, 2hd] (decoder_step_beam rank-6
        # path): slot segments adjacent to the position axis; prefilled
        # prompt in each item's slot 0.
        kv = {
            name: jnp.zeros(
                v.shape[:3] + (K,) + v.shape[3:], v.dtype
            ).at[:, :, :, 0].set(v)
            for name, v in kv_b.items()
        }
    else:
        # Slot cache [L, B*K, H, C, hd] (decoder_step_beam): the prefilled
        # prompt lives in each item's physical slot 0; other slots fill as
        # beams append.
        kv = {
            name: jnp.zeros((v.shape[0], B, K) + v.shape[2:], v.dtype)
            .at[:, :, 0]
            .set(v)
            .reshape((v.shape[0], BK) + v.shape[2:])
            for name, v in kv_b.items()
        }
    # anc[b, kd, ks, c]: beam kd reads position c from physical slot ks.
    anc = (jnp.arange(K) == 0)[None, None, :, None] & (
        jnp.arange(cache_len) < sample_begin
    )[None, None, None, :]
    anc = jnp.broadcast_to(anc, (B, K, K, cache_len))

    tokens = jnp.repeat(tokens_init, K, axis=0)  # [BK, ctx]
    probs_at_sot = jax.nn.softmax(prefill_logits[:, sot_index], axis=-1)
    no_speech_probs = probs_at_sot[:, ids.no_speech]  # [B]

    V = cfg.n_vocab

    start_row = jnp.zeros((V,)).at[ids.blank].set(NEG_INF).at[ids.eot].set(NEG_INF)

    def process_logits(logits, tokens, pos):
        at_start = pos == sample_begin
        # One fused [BK, V] add: static suppression + start-of-sample row.
        logits = logits + (suppress_mask + jnp.where(at_start, start_row, 0.0))[None, :]
        if use_timestamps:
            logits = apply_timestamp_rules(logits, tokens, pos, sample_begin, ids)
        return logits

    eye_k = jnp.eye(K, dtype=bool)

    def step_fn(state):
        tokens, kv, anc, pos, done, sum_lp, tok_lps, last_logits = state
        # done: [BK] — beam finished (emitted EOT earlier).
        logits = process_logits(last_logits, tokens, pos)  # [BK, V]

        # Top-K continuations per beam. top_k runs on the RAW logits (same
        # order); the shift to logprobs happens on the [BK, K] result —
        # avoids materializing a [BK, V] log_softmax every step.
        top_val, top_tok = topk_small(logits, K)  # [BK, K]
        top_lp = top_val - jax.nn.logsumexp(logits, axis=-1)[:, None]
        # Finished beams: single EOT candidate with score unchanged.
        top_lp = jnp.where(done[:, None], NEG_INF, top_lp)
        top_lp = top_lp.at[:, 0].set(jnp.where(done, 0.0, top_lp[:, 0]))
        top_tok = jnp.where(done[:, None], ids.eot, top_tok)

        cand_scores = (sum_lp[:, None] + top_lp).reshape(B, K * K)
        # At the very first step all beams are identical — keep only beam 0's
        # candidates to avoid K duplicate hypotheses.
        first = pos == sample_begin
        beam_idx = jnp.arange(K * K) // K
        cand_scores = jnp.where(
            first & (beam_idx[None, :] > 0), NEG_INF, cand_scores
        )

        best_scores, best_idx = jax.lax.top_k(cand_scores, K)  # [B, K]
        parent = best_idx // K  # source beam within the batch item
        tok_sel = jnp.take_along_axis(
            top_tok.reshape(B, K * K), best_idx, axis=1
        )  # [B, K]
        lp_sel = jnp.take_along_axis(top_lp.reshape(B, K * K), best_idx, axis=1)

        # Gather beam state by parent index (flattened indices). The KV
        # cache is NEVER gathered: each beam owns a physical slot and only
        # the ancestry mask (~90 KB) adopts the parent's read path.
        gather_idx = (jnp.arange(B)[:, None] * K + parent).reshape(BK)
        tokens = tokens[gather_idx]
        tok_lps = tok_lps[gather_idx]
        done = done[gather_idx]
        sum_lp = best_scores.reshape(BK)
        anc = anc[jnp.arange(B)[:, None], parent]  # [B, K, K, C]
        # Beam kd's next K/V row lands in ITS slot kd at position pos.
        anc = anc | (
            eye_k[None, :, :, None]
            & (jnp.arange(anc.shape[-1]) == pos)[None, None, None, :]
        )

        next_tok = tok_sel.reshape(BK).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, next_tok[:, None], pos, axis=1
        )
        tok_lps = jax.lax.dynamic_update_slice_in_dim(
            tok_lps, jnp.where(done, 0.0, lp_sel.reshape(BK))[:, None], pos, axis=1
        )
        done = done | (next_tok == ids.eot)

        # Every step streams the whole [.., cache_len, ..] self slab; a
        # step at position p only needs rows ≤ p. Switch between 128-row
        # read buckets (static BlockSpec windows in the fused kernel —
        # exact numerics, rows ≥ p are ancestry-masked) so early steps
        # don't pay for the full slab.
        from .whisper import _use_flash

        buckets = list(range(128, cache_len, 128)) + [cache_len]
        if cache_buckets and (fold or _use_flash()) and len(buckets) > 1:
            def mk_branch(cb):
                def branch(tok_, pos_, kv_, anc_):
                    return decoder_step_beam(
                        cfg, params, tok_, pos_, kv_, xa_kv, anc_, K,
                        c_valid=cb,
                    )
                return branch

            idx = jnp.sum(pos >= jnp.asarray(buckets[:-1]))
            step_logits, kv = jax.lax.switch(
                idx, [mk_branch(cb) for cb in buckets], next_tok, pos, kv, anc
            )
        else:
            step_logits, kv = decoder_step_beam(
                cfg, params, next_tok, pos, kv, xa_kv, anc, K
            )
        return tokens, kv, anc, pos + 1, done, sum_lp, tok_lps, step_logits

    def cond_fn(state):
        pos, done = state[3], state[4]
        return (pos < max_len) & ~jnp.all(done)

    state = (
        tokens,
        kv,
        anc,
        sample_begin,
        jnp.zeros((BK,), bool),
        jnp.zeros((BK,), jnp.float32),
        jnp.zeros((BK, ctx), jnp.float32),
        jnp.repeat(
            jax.lax.dynamic_slice_in_dim(
                prefill_logits, sample_begin - 1, 1, axis=1
            )[:, 0],
            K,
            axis=0,
        ),
    )
    tokens, kv, anc, pos, done, sum_lp, tok_lps, _ = jax.lax.while_loop(
        cond_fn, step_fn, state
    )

    # Per-beam lengths and avg logprobs; pick the best beam per batch item.
    positions = jnp.arange(ctx)[None, :]
    is_eot = (tokens == ids.eot) & (positions >= sample_begin) & (positions < pos)
    first_eot = jnp.min(jnp.where(is_eot, positions, ctx), axis=1)
    lengths = jnp.minimum(first_eot + 1, pos)  # [BK]
    n_sampled = jnp.maximum(lengths - sample_begin, 1).astype(jnp.float32)
    avg_lp = sum_lp / n_sampled

    best_beam = jnp.argmax(avg_lp.reshape(B, K), axis=1)  # [B]
    sel = jnp.arange(B) * K + best_beam
    return DecodeResult(
        tokens=tokens[sel],
        lengths=lengths[sel],
        sum_logprobs=sum_lp[sel],
        avg_logprobs=avg_lp[sel],
        no_speech_probs=no_speech_probs,
        token_logprobs=tok_lps[sel],
    )
