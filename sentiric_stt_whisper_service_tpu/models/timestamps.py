"""Token/word-level timestamps via DTW over cross-attention.

whisper.cpp provides per-token timestamps (``token_timestamps=true``,
/root/reference/src/stt_engine.cpp:225; consumed as centiseconds at
:285-296 and ÷100 at the API edges). Here they are computed the
openai-whisper way (SURVEY.md §7 hard-part #5): a single teacher-forced
decoder pass collects cross-attention weights, alignment heads are
averaged, the text→audio-frame alignment is found with DTW, and token
boundaries are read off the monotone path.

The attention pass is batched and jitted (one extra decoder prefill per
window); the O(T × F) DTW runs host-side in numpy — microseconds at
whisper shapes and inherently sequential.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .whisper import WhisperConfig, decoder_apply, init_kv_cache

AUDIO_TIME_PER_FRAME = 0.02  # one encoder position = 20 ms


@functools.partial(jax.jit, static_argnames=("cfg",))
def alignment_scores(
    cfg: WhisperConfig,
    params,
    xa_kv: dict,
    tokens: jnp.ndarray,  # [B, T] full sequence incl. prompt
):
    """Teacher-forced pass → averaged alignment-head attention [B, T, F].

    Without a model-specific alignment-head dump, heads from the upper half
    of decoder layers are used (openai-whisper's generic fallback)."""
    from ..ops.quant import unpack_xa_kv

    xa_kv = unpack_xa_kv(xa_kv)  # int4 carrier → native int4 in-jit
    B, T = tokens.shape
    kv = init_kv_cache(cfg, B, max(64, -(-T // 64) * 64))
    # Reduced collection: the layer/head mean is accumulated INSIDE the
    # decoder scan ([B, T, F] carry) instead of materializing the stacked
    # [L, B, H, T, F] weights through HBM (~1 GB / ~2 s per pass at
    # large-v3 — docs/PERF.md "tick anatomy").
    _, _, w = decoder_apply(
        cfg, params, tokens, jnp.int32(0), kv, xa_kv,
        collect_cross_attn=True,
        cross_attn_layer_begin=cfg.n_text_layer // 2,
    )
    # w: [B, T, F], mean over upper-half layers and all heads.
    # Normalize per token position (scale-invariant for DTW).
    mean = w.mean(axis=-1, keepdims=True)
    std = w.std(axis=-1, keepdims=True) + 1e-6
    return (w - mean) / std


def median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last (audio-frame) axis."""
    if width < 3:
        return x
    pad = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw_path(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotone alignment through cost [T, F] (lower = better match).

    Returns (text_idx, time_idx) along the optimal path. The forward pass
    is vectorized per row: with m0[j] = min(diag, up), the left-neighbor
    recurrence D[i,j] = c[j] + min(m0[j], D[i,j-1]) is a min-plus prefix
    scan, solved with cumsum + minimum.accumulate — O(T·F) with numpy
    row ops instead of a Python double loop."""
    T, F = cost.shape
    D = np.full((T + 1, F + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, T + 1):
        c = cost[i - 1].astype(np.float64)
        m0 = np.minimum(D[i - 1, :-1], D[i - 1, 1:])  # [F]: min(diag, up)
        ccum = np.cumsum(c)
        # D[i,j] = ccum[j-1] + min_{k<=j}(m0[k-1] - ccum[k-2])
        base = m0 - np.concatenate(([0.0], ccum[:-1]))
        with np.errstate(invalid="ignore"):
            run = np.minimum.accumulate(base)
        D[i, 1:] = ccum + run
    # Traceback by re-evaluating the three candidates (diag, up, left),
    # tie-broken in that order.
    i, j = T, F
    text_idx, time_idx = [], []
    while i > 0 and j > 0:
        text_idx.append(i - 1)
        time_idx.append(j - 1)
        c0 = D[i - 1, j - 1]
        c1 = D[i - 1, j]
        c2 = D[i, j - 1]
        m = min(c0, c1, c2)
        if m == c0:
            i, j = i - 1, j - 1
        elif m == c1:
            i -= 1
        else:
            j -= 1
    return np.array(text_idx[::-1]), np.array(time_idx[::-1])


def token_boundaries(
    scores: np.ndarray,  # [T, F] alignment scores (higher = aligned)
    n_frames: int,
) -> np.ndarray:
    """Per-token (start, end) times in seconds; shape [T, 2]."""
    T = scores.shape[0]
    cost = -median_filter(scores[:, :n_frames], 7)
    text_idx, time_idx = dtw_path(cost)
    jumps = np.diff(text_idx, prepend=-1) > 0  # first frame of each token
    starts = time_idx[jumps] * AUDIO_TIME_PER_FRAME
    bounds = np.zeros((T, 2), np.float64)
    bounds[:, 0] = starts
    bounds[:-1, 1] = starts[1:]
    bounds[-1, 1] = n_frames * AUDIO_TIME_PER_FRAME
    return bounds


def align_bucket(n: int) -> int:
    """Sequence-length shape class for the alignment pass. COARSE buckets
    (4 classes) so engine.warmup() can pre-compile the whole set and no
    live streaming tick ever pays a serve-time XLA compile for a new
    token count (docs/PERF.md "tick anatomy"). Padding rows are
    causal-masked garbage, sliced off before the DTW; with the reduced
    in-scan collection the extra padded positions cost ~nothing.
    Callers clamp to cfg.n_text_ctx."""
    for b in (64, 128, 256, 448):
        if n <= b:
            return b
    return -(-n // 32) * 32


def compute_token_times(
    cfg: WhisperConfig,
    params,
    xa_kv: dict,
    full_tokens: np.ndarray,  # [T] incl. prompt, up to (not incl.) EOT
    sample_begin: int,
    n_audio_frames: int,
) -> np.ndarray:
    """[n_sampled, 2] start/end seconds for the sampled tokens of one
    window (B=1 path used by the engine)."""
    T = len(full_tokens)
    padded = np.zeros((min(align_bucket(T), cfg.n_text_ctx),), np.int64)
    padded[:T] = full_tokens
    toks = jnp.asarray(padded[None], jnp.int32)
    scores = np.asarray(alignment_scores(cfg, params, xa_kv, toks))[0]
    sampled_scores = scores[sample_begin:T]
    if sampled_scores.shape[0] == 0:
        return np.zeros((0, 2))
    return token_boundaries(sampled_scores, n_audio_frames)
