"""On-device autoregressive decoding: greedy/sampled, with whisper's
suppression + timestamp rules, all inside one jitted ``lax.while_loop``.

The reference gets decode strategies from whisper.cpp
(strategy/beam/temperature plumbing at
/root/reference/src/stt_engine.cpp:204-243). The TPU rebuild keeps the whole
token loop on device — per-token host round-trips are the #1 RTFx killer
(SURVEY.md §7 "hard parts" #2). Rules implemented as vectorized [B, vocab]
logit masks:

  * static suppression set (non-speech tokens, sot/notimestamps/...),
  * blank suppression at sample start,
  * whisper timestamp pairing rules + monotonicity + max_initial_timestamp,
  * "sum of timestamp probs > max text prob ⇒ force timestamp",
  * temperature 0 = argmax, else categorical sampling (the temperature is a
    traced scalar so the fallback ladder reuses one compiled executable).

Beam search lives in ``beam.py``; the temperature-fallback ladder in
``runtime/engine.py`` (host-side policy, device-side compute).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .whisper import (
    WhisperConfig,
    decoder_apply,
    decoder_step,
    init_kv_cache,
    pairing_ok,
)


def cvalid_buckets(cache_len: int, granularity: int | None = None) -> list:
    """Static read-bucket boundaries for the self-KV slab: a decode step at
    position p only needs rows ≤ p, so loop callers lax.switch between a
    few c_valid slices instead of streaming the whole slab every step.

    Granularity: explicit ``granularity`` arg (the engine passes
    ``Settings.cvalid_rows``, resolved ONCE at load_settings — the value
    is fixed per process; toggling the env on a live server has no
    effect), falling back to SSTW_CVALID_ROWS for direct callers
    (tests/benches). DEFAULT 0 = OFF for the greedy
    loop: measured a clear NEGATIVE on chip (tools/bench_cvalid_greedy.py,
    large-v3 B=56 int8+f8: 16.1 → 20.0 ms/step at 64 rows, 23.6 at 32) —
    the lax.switch boundary forces the carried KV slab through branch
    I/O copies that cost far more than the read savings. The BEAM path
    keeps its own 128-row bucketing inside decoder_step_beam's kernel
    dispatch (models/beam.py), where the slab rides the while_loop carry
    and only the kernel's BlockSpec window changes."""
    import os

    g = granularity if granularity is not None else int(
        os.environ.get("SSTW_CVALID_ROWS", "0")
    )
    if g <= 0 or g >= cache_len:
        return [cache_len]
    return list(range(g, cache_len, g)) + [cache_len]

NEG_INF = jnp.float32(-1e30)


@dataclasses.dataclass(frozen=True)
class TokenIds:
    """Static token ids needed by the on-device rules (hashable, used as a
    jit static argument)."""

    eot: int
    sot: int
    sot_prev: int
    no_speech: int
    no_timestamps: int
    timestamp_begin: int
    n_vocab: int
    max_initial_timestamp_index: int = 50  # 1.0 s
    blank: int = 220  # token for " " in whisper vocabs; set from tokenizer

    @classmethod
    def from_tokenizer(cls, tok, max_initial_timestamp: float = 1.0):
        s = tok.special
        blank_ids = tok.encode(" ")
        return cls(
            eot=s.eot,
            sot=s.sot,
            sot_prev=s.sot_prev,
            no_speech=s.no_speech,
            no_timestamps=s.no_timestamps,
            timestamp_begin=s.timestamp_begin,
            n_vocab=s.n_vocab,
            max_initial_timestamp_index=int(round(max_initial_timestamp / 0.02)),
            blank=blank_ids[0] if blank_ids else 220,
        )


def build_suppress_mask(
    n_vocab: int,
    ids: TokenIds,
    non_speech_tokens: tuple[int, ...] = (),
    suppress_nst: bool = True,
    extra: tuple[int, ...] = (),
) -> np.ndarray:
    """Static additive mask [n_vocab]: -inf at always-suppressed tokens."""
    mask = np.zeros((n_vocab,), np.float32)
    always = [
        ids.sot,
        ids.sot_prev,
        ids.no_timestamps,
        ids.no_speech,
    ]
    # whisper suppresses everything from sot up to timestamp_begin except
    # eot: language/task/special tokens can never be sampled mid-text.
    always += list(range(ids.sot, ids.timestamp_begin))
    if suppress_nst:
        always += list(non_speech_tokens)
    always += list(extra)
    for t in always:
        if 0 <= t < n_vocab:
            mask[t] = -np.inf
    mask[ids.eot] = 0.0
    mask[ids.timestamp_begin :] = 0.0  # timestamps governed by their own rules
    return mask


def apply_timestamp_rules(
    logits: jnp.ndarray,  # [B, V] fp32
    tokens: jnp.ndarray,  # [B, ctx] int32 (full buffer)
    pos: jnp.ndarray,  # scalar or [B]: index where the next token goes
    sample_begin,  # static int or [B] array (continuous batching)
    ids: TokenIds,
) -> jnp.ndarray:
    """Vectorized port of whisper's ApplyTimestampRules.

    ``pos``/``sample_begin`` may be per-row vectors so the continuous
    batcher can run slots at heterogeneous decode positions in one call."""
    V = logits.shape[-1]
    vocab_idx = jnp.arange(V)[None, :]
    is_ts_col = vocab_idx >= ids.timestamp_begin
    B = logits.shape[0]
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    sample_begin = jnp.broadcast_to(jnp.asarray(sample_begin, jnp.int32), (B,))

    def tok_at(idx):  # [B] gather of tokens[b, idx[b]]
        return jnp.take_along_axis(
            tokens, jnp.maximum(idx, 0)[:, None], axis=1
        )[:, 0]

    last = jnp.where(pos > sample_begin, tok_at(pos - 1), -1)
    penult = jnp.where(pos > sample_begin + 1, tok_at(pos - 2), -1)
    last_was_ts = last >= ids.timestamp_begin
    # whisper semantics: with fewer than two sampled tokens the penultimate
    # counts as a timestamp (so the token right after the initial timestamp
    # is forced to be text).
    penult_was_ts = (penult >= ids.timestamp_begin) | (pos < sample_begin + 2)

    # Pairing: after a single timestamp, the next token must be a timestamp
    # (no text); after a pair, no timestamp.
    force_ts = last_was_ts & ~penult_was_ts  # mask text (except EOT)
    forbid_ts = last_was_ts & penult_was_ts  # mask timestamps

    text_mask = (~is_ts_col) & (vocab_idx != ids.eot)
    logits = jnp.where(force_ts[:, None] & text_mask, NEG_INF, logits)
    logits = jnp.where(forbid_ts[:, None] & is_ts_col, NEG_INF, logits)

    # Monotonic timestamps: new ts must be >= max sampled ts so far.
    positions = jnp.arange(tokens.shape[1])[None, :]
    sampled = (positions >= sample_begin[:, None]) & (positions < pos[:, None])
    ts_vals = jnp.where(
        sampled & (tokens >= ids.timestamp_begin), tokens, -1
    )
    max_ts = jnp.max(ts_vals, axis=1)  # [B], -1 if none
    has_ts = max_ts >= 0
    min_allowed = jnp.where(
        # After a lone timestamp the same value may repeat (segment end);
        # after a completed pair the next must be strictly greater.
        last_was_ts & ~penult_was_ts,
        max_ts,
        max_ts + 1,
    )
    too_small = is_ts_col & (vocab_idx < min_allowed[:, None])
    logits = jnp.where(has_ts[:, None] & too_small, NEG_INF, logits)

    # First sampled token must be a timestamp, capped at max_initial.
    at_start = (pos == sample_begin)[:, None]
    init_text_mask = ~is_ts_col
    init_cap = vocab_idx > (ids.timestamp_begin + ids.max_initial_timestamp_index)
    logits = jnp.where(at_start & (init_text_mask | init_cap), NEG_INF, logits)

    # If total timestamp probability beats the best text token, force a
    # timestamp sample. The softmax normalizer cancels on both sides of
    # the comparison (logsumexp(logprobs_ts) > max(logprobs_text) ⟺
    # logsumexp(logits_ts) > max(logits_text)), and the timestamp tokens
    # are a contiguous static suffix — so this costs two slice reductions
    # instead of materializing a [B, V] log_softmax (measured ~0.5 ms/step
    # at B=56, tools/bench_step_parts.py).
    ts_logprob = jax.nn.logsumexp(logits[:, ids.timestamp_begin :], axis=-1)
    max_text = jnp.max(logits[:, : ids.timestamp_begin], axis=-1)
    force2 = ts_logprob > max_text
    logits = jnp.where(force2[:, None] & ~is_ts_col, NEG_INF, logits)
    return logits


# Prompt lengths are bucketed so XLA compiles a handful of prefill shapes
# instead of one per distinct carried-prompt length (prompt carry-over makes
# lengths effectively unique per window; a fresh large-v3 compile costs
# tens of seconds). 232 covers [sot_prev] + 223 carried + sot sequence.
PROMPT_BUCKETS = (4, 8, 16, 32, 64, 128, 232)


def prompt_bucket(n: int) -> int:
    """Smallest bucket ≥ n (prompt prefill shape class)."""
    for b in PROMPT_BUCKETS:
        if n <= b:
            return b
    return PROMPT_BUCKETS[-1]


class DecodeResult(NamedTuple):
    tokens: jnp.ndarray  # [B, ctx] int32, full buffer incl. prompt
    lengths: jnp.ndarray  # [B] int32: total tokens written (incl. prompt+EOT)
    sum_logprobs: jnp.ndarray  # [B] fp32: over sampled tokens (incl. EOT)
    avg_logprobs: jnp.ndarray  # [B]
    no_speech_probs: jnp.ndarray  # [B]
    token_logprobs: jnp.ndarray  # [B, ctx] fp32: logprob of each sampled token


@functools.partial(jax.jit, static_argnames=("cfg", "sot", "lang_begin", "n_langs"))
def detect_language(
    cfg: WhisperConfig,
    params,
    xa_kv: dict,
    sot: int,
    lang_begin: int,
    n_langs: int,
) -> jnp.ndarray:
    """One decoder step from [sot], masked to language tokens.

    Returns [B, n_langs] probabilities (whisper's detect_language;
    SURVEY.md §2.3 'language auto-detect')."""
    from ..ops.quant import unpack_xa_kv
    from .whisper import xa_batch_size

    xa_kv = unpack_xa_kv(xa_kv)
    B = xa_batch_size(xa_kv)
    kv = init_kv_cache(cfg, B, 64, paired=pairing_ok(cfg))
    tokens = jnp.full((B, 1), sot, jnp.int32)
    logits, _, _ = decoder_apply(cfg, params, tokens, jnp.int32(0), kv, xa_kv)
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits[:, 0], lang_begin, n_langs, axis=-1
    )
    return jax.nn.softmax(lang_logits, axis=-1)


def decode_window_best_of(
    cfg, params, xa_kv, tokens_init, sample_begin, sot_index, ids,
    suppress_mask, temperature, rng, best_of: int = 5, max_len=None,
    use_timestamps: bool = True, prefill_len=None, self_dtype=None,
    cvalid_rows=None, should_abort=None,
) -> "DecodeResult":
    """best_of independent samples per item (temperature > 0), winner by avg
    logprob — openai-whisper's n_group sampling, batched as [B*G].
    ``should_abort`` chunks the inner decode with the callback polled
    between chunks (returns None if aborted)."""
    import numpy as _np

    B, ctx = tokens_init.shape
    G = best_of
    tiled = jnp.repeat(tokens_init, G, axis=0)
    xa_kv_g = {k: jnp.repeat(v, G, axis=1) for k, v in xa_kv.items()}
    res = decode_window(
        cfg, params, xa_kv_g, tiled, sample_begin, sot_index, ids,
        suppress_mask, temperature, rng, max_len=max_len,
        use_timestamps=use_timestamps, prefill_len=prefill_len,
        self_dtype=self_dtype, cvalid_rows=cvalid_rows,
        should_abort=should_abort,
    )
    if res is None:  # aborted mid-decode
        return None
    best = jnp.argmax(res.avg_logprobs.reshape(B, G), axis=1)
    sel = jnp.arange(B) * G + best
    return DecodeResult(
        tokens=res.tokens[sel],
        lengths=res.lengths[sel],
        sum_logprobs=res.sum_logprobs[sel],
        avg_logprobs=res.avg_logprobs[sel],
        no_speech_probs=res.no_speech_probs[sel],
        token_logprobs=res.token_logprobs[sel],
    )


def decode_window(
    cfg: WhisperConfig,
    params,
    xa_kv: dict,
    tokens_init: jnp.ndarray,  # [B, ctx] int32, prompt in [0, sample_begin)
    sample_begin: int,
    sot_index: int,
    ids: TokenIds,
    suppress_mask: jnp.ndarray,  # [V] additive
    temperature: jnp.ndarray,  # scalar fp32, traced (0 = greedy)
    rng: jax.Array,
    max_len: Optional[int] = None,
    use_timestamps: bool = True,
    prefill_len: Optional[int] = None,
    self_dtype=None,
    cvalid_rows: Optional[int] = None,
    should_abort=None,
    abort_chunk: int = 32,
    sample_cap: Optional[int] = None,
) -> Optional[DecodeResult]:
    """Decode one batch of 30 s windows to EOT, fully on device.

    ``sample_begin``/``sot_index`` are traced: one compiled executable per
    (batch, prefill bucket, max_len) shape class serves every prompt
    length. ``prefill_len`` is the static bucket (default: the prompt
    bucket of ``sample_begin``); positions in [sample_begin, prefill_len)
    hold EOT padding whose K/V entries are never attended — each decode
    step overwrites its cache slot before reading it.

    ``sample_cap`` bounds the number of SAMPLED tokens relative to
    ``sample_begin`` (traced, so the bound rides the while_loop condition
    without a new shape class). This matters when ``prefill_len`` is
    pinned wider than the prompt bucket (the engine's streaming-tick
    classes): ``max_len`` alone would then allow
    ``max_len - sample_begin > cap`` samples.

    ``self_dtype`` overrides the self-KV-cache storage dtype (e.g.
    ``jnp.float8_e4m3fn`` — engine ``self_cache`` policy; see
    init_kv_cache).

    ``should_abort``: cooperative mid-decode cancellation (reference
    abort callback, stt_engine.cpp:215-219). When given, the loop runs as
    host-side chunks of ``abort_chunk`` steps (state device-resident, the
    callback polled between chunks; output-identical) and returns None if
    aborted. When None the decode stays ONE launch."""
    if prefill_len is None:
        prefill_len = prompt_bucket(int(sample_begin))
    max_len = max_len or cfg.n_text_ctx
    if should_abort is None:
        # ``sample_begin`` may be a traced scalar here (decode_window is
        # called from inside jitted wrappers) — keep the cap arithmetic
        # trace-safe.
        if sample_cap is None:
            hard = jnp.int32(max_len)
        else:
            hard = jnp.minimum(
                jnp.int32(max_len),
                jnp.asarray(sample_begin, jnp.int32) + jnp.int32(sample_cap),
            )
        return _decode_window_impl(
            cfg, params, xa_kv, tokens_init,
            jnp.asarray(sample_begin, jnp.int32),
            jnp.asarray(sot_index, jnp.int32),
            ids, suppress_mask, temperature, rng,
            hard, max_len, use_timestamps,
            prefill_len, self_dtype, cvalid_rows,
        )
    if should_abort():
        return None
    hard_stop = max_len
    if sample_cap is not None:
        hard_stop = min(max_len, int(sample_begin) + int(sample_cap))
    import numpy as _np

    sb = jnp.asarray(sample_begin, jnp.int32)
    state, no_speech, xa_dev = _decode_prefill_impl(
        cfg, params, xa_kv, tokens_init, sb,
        jnp.asarray(sot_index, jnp.int32), ids, rng, max_len, prefill_len,
        self_dtype,
    )
    pos = int(sample_begin)
    while pos < hard_stop:
        if should_abort():
            return None
        until = min(pos + max(1, abort_chunk), hard_stop)
        state = _decode_chunk_impl(
            cfg, params, xa_dev, state, jnp.int32(until), sb, ids,
            suppress_mask, temperature, max_len, use_timestamps, cvalid_rows,
        )
        pos = int(state[2])  # device sync at the chunk boundary
        if bool(_np.asarray(state[3]).all()):  # every row hit EOT
            break
        if pos < until:
            break
    return _decode_finalize_impl(state, no_speech, sb, ids)


def _decode_setup(
    cfg, params, xa_kv, tokens_init, sample_begin, sot_index, ids, rng,
    max_len, prefill_len, self_dtype,
):
    """Prefill + initial loop state (shared by the single-launch impl and
    the host-chunked abortable path). Returns (state, no_speech_probs,
    xa_dev)."""
    from ..ops.quant import unpack_xa_kv

    # int4 carrier → native int4 slab, ONCE per window (outside the token
    # loop): the while_loop below then streams nibble-packed bytes.
    xa_kv = unpack_xa_kv(xa_kv)
    B = tokens_init.shape[0]
    ctx = cfg.n_text_ctx
    # Right-size the self-attention KV slab: every decode step reads the
    # whole slab from HBM, so a 448-slot slab for a 140-token decode would
    # triple that traffic.
    cache_len = min(ctx, -(-max_len // 32) * 32)  # 32-row granularity: every
    # step streams the whole slab, so a 131-token decode reads a 160-row
    # slab instead of 192 (bf16 sublane tile is 16 rows — 32 stays aligned
    # and bounds the shape-class count)
    # Head-paired slab: full 128-lane rows, 2x effective read bandwidth
    # (init_kv_cache; tools/bench_self_layout.py).
    kv = init_kv_cache(cfg, B, cache_len, paired=pairing_ok(cfg), dtype=self_dtype)

    # --- prefill the prompt (bucketed static length; tail is EOT pad) ---
    prefill_logits, kv, _ = decoder_apply(
        cfg, params, tokens_init[:, :prefill_len], jnp.int32(0), kv, xa_kv
    )
    probs_at_sot = jax.nn.softmax(prefill_logits[:, sot_index], axis=-1)
    no_speech_probs = probs_at_sot[:, ids.no_speech]

    state = (
        tokens_init,
        kv,
        sample_begin,
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B, ctx), jnp.float32),
        rng,
        # logits after the last REAL prompt token (dynamic: the bucketed
        # prefill's trailing positions are padding).
        jax.lax.dynamic_slice_in_dim(
            prefill_logits, sample_begin - 1, 1, axis=1
        )[:, 0],
    )
    return state, no_speech_probs, xa_kv


def _decode_loop_fns(
    cfg, params, xa_kv, ids, suppress_mask, temperature, sample_begin,
    use_timestamps, cvalid_rows, until,
):
    """(step_fn, cond_fn) over the 8-tuple greedy/sampled decode state.
    ``until`` is max_len in the single-launch impl, the traced chunk
    boundary in the abortable path — identical step math either way."""
    # Start-of-sample suppression as one precomputed [V] row (building a
    # [B, V] zeros-like + scatter every step costs two full-array passes).
    vocab_idx = jnp.arange(cfg.n_vocab)
    start_row = jnp.where(
        (vocab_idx == ids.blank) | (vocab_idx == ids.eot), NEG_INF, 0.0
    )

    def process_logits(logits, tokens, pos):
        # Suppress blank + EOT as the very first sample.
        at_start = pos == sample_begin
        logits = logits + (suppress_mask + jnp.where(at_start, start_row, 0.0))[None, :]
        if use_timestamps:
            logits = apply_timestamp_rules(logits, tokens, pos, sample_begin, ids)
        return logits

    def sample(logits, key):
        # lax.cond so the greedy rung of the temperature ladder never pays
        # the categorical's gumbel pass over [B, V] (temperature is traced;
        # both branches compile, one executes).
        def _greedy(_):
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        def _sampled(k):
            temp = jnp.maximum(temperature, 1e-6)
            return jax.random.categorical(k, logits / temp, axis=-1).astype(
                jnp.int32
            )

        return jax.lax.cond(temperature <= 0.0, _greedy, _sampled, key)

    # --- first sampled token from the prefill's last logits ---
    def step_fn(state):
        tokens, kv, pos, done, sum_lp, tok_lps, key, last_logits = state
        logits = process_logits(last_logits, tokens, pos)
        key, sub = jax.random.split(key)
        next_tok = sample(logits, sub)
        # logprob of the chosen token = logit - logsumexp: one reduction,
        # no [B, V] log_softmax materialization.
        lse = jax.nn.logsumexp(logits, axis=-1)
        tok_lp = (
            jnp.take_along_axis(logits, next_tok[:, None], axis=-1)[:, 0] - lse
        )
        next_tok = jnp.where(done, ids.eot, next_tok)
        tok_lp = jnp.where(done, 0.0, tok_lp)
        sum_lp = sum_lp + tok_lp
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, next_tok[:, None], pos, axis=1
        )
        tok_lps = jax.lax.dynamic_update_slice_in_dim(
            tok_lps, tok_lp[:, None], pos, axis=1
        )
        new_done = done | (next_tok == ids.eot)
        # Run the decoder for the token just written to get next logits.
        # Bucketed self-slab reads (exact: rows ≥ pos are masked anyway) —
        # early steps stream only a c_valid prefix of the cache rows.
        tok1 = jax.lax.dynamic_slice_in_dim(tokens, pos, 1, axis=1)[:, 0]
        cache_len = kv["k"].shape[3]  # static under trace
        buckets = cvalid_buckets(cache_len, cvalid_rows)
        if len(buckets) > 1:
            def mk_branch(cb):
                def branch(tok_, pos_, kv_):
                    return decoder_step(
                        cfg, params, tok_, pos_, kv_, xa_kv, c_valid=cb
                    )
                return branch

            idx = jnp.sum(pos >= jnp.asarray(buckets[:-1]))
            step_logits, kv = jax.lax.switch(
                idx, [mk_branch(cb) for cb in buckets], tok1, pos, kv
            )
        else:
            step_logits, kv = decoder_step(cfg, params, tok1, pos, kv, xa_kv)
        return tokens, kv, pos + 1, new_done, sum_lp, tok_lps, key, step_logits

    def cond_fn(state):
        pos, done = state[2], state[3]
        return (pos < until) & ~jnp.all(done)

    return step_fn, cond_fn


def _decode_result(state, no_speech_probs, sample_begin, ids) -> DecodeResult:
    """lengths/avg over the final loop state: index of first EOT at/after
    sample_begin, else pos."""
    tokens, _kv, pos, _done, sum_lp, tok_lps, _, _ = state
    ctx = tokens.shape[1]
    positions = jnp.arange(ctx)[None, :]
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "ids", "max_len", "use_timestamps", "prefill_len", "self_dtype",
        "cvalid_rows",
    ),
)
def _decode_window_impl(
    cfg: WhisperConfig,
    params,
    xa_kv: dict,
    tokens_init: jnp.ndarray,
    sample_begin: jnp.ndarray,  # traced scalar int32
    sot_index: jnp.ndarray,  # traced scalar int32
    ids: TokenIds,
    suppress_mask: jnp.ndarray,
    temperature: jnp.ndarray,
    rng: jax.Array,
    until_pos: jnp.ndarray,  # traced scalar int32 ≤ max_len (sample cap)
    max_len: int,
    use_timestamps: bool,
    prefill_len: int,
    self_dtype=None,
    cvalid_rows: Optional[int] = None,
) -> DecodeResult:
    """Single-launch window decode: prefill + while_loop + finalize fused
    in ONE executable (the hot path)."""
    state, no_speech_probs, xa_dev = _decode_setup(
        cfg, params, xa_kv, tokens_init, sample_begin, sot_index, ids, rng,
        max_len, prefill_len, self_dtype,
    )
    step_fn, cond_fn = _decode_loop_fns(
        cfg, params, xa_dev, ids, suppress_mask, temperature, sample_begin,
        use_timestamps, cvalid_rows, until=until_pos,
    )
    state = jax.lax.while_loop(cond_fn, step_fn, state)
    return _decode_result(state, no_speech_probs, sample_begin, ids)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "ids", "max_len", "prefill_len", "self_dtype"),
)
def _decode_prefill_impl(
    cfg, params, xa_kv, tokens_init, sample_begin, sot_index, ids, rng,
    max_len, prefill_len, self_dtype,
):
    """Abortable-path stage 1: prefill; the cross slab comes back
    carrier-unpacked so chunks never re-unpack — widened to a
    boundary-safe dtype (int4 can't cross executables on axon,
    ops/quant.xa_kv_boundary_safe)."""
    from ..ops.quant import xa_kv_boundary_safe

    state, no_speech, xa_dev = _decode_setup(
        cfg, params, xa_kv, tokens_init, sample_begin, sot_index, ids, rng,
        max_len, prefill_len, self_dtype,
    )
    return state, no_speech, xa_kv_boundary_safe(xa_dev)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "ids", "max_len", "use_timestamps", "cvalid_rows"),
)
def _decode_chunk_impl(
    cfg, params, xa_dev, state, chunk_until, sample_begin, ids,
    suppress_mask, temperature, max_len, use_timestamps, cvalid_rows,
):
    """Abortable-path stage 2: advance to ``chunk_until`` (traced — all
    chunk sizes share one executable); state stays on device."""
    step_fn, cond_fn = _decode_loop_fns(
        cfg, params, xa_dev, ids, suppress_mask, temperature, sample_begin,
        use_timestamps, cvalid_rows, until=jnp.minimum(chunk_until, max_len),
    )
    return jax.lax.while_loop(cond_fn, step_fn, state)


@functools.partial(jax.jit, static_argnames=("ids",))
def _decode_finalize_impl(state, no_speech_probs, sample_begin, ids):
    return _decode_result(state, no_speech_probs, sample_begin, ids)
