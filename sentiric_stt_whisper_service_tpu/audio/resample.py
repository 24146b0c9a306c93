"""Sample-rate conversion to 16 kHz as a batched XLA convolution.

Replaces the reference's libsamplerate SRC_SINC_FASTEST call
(/root/reference/src/stt_engine.cpp:87-106) with a polyphase
windowed-sinc resampler expressed as ``lax.conv_general_dilated`` — the
upsample-by-L/downsample-by-M structure maps to a strided, dilated conv
that XLA lowers to MXU-friendly contractions, and batches of clips
resample in one call.

Filter design (host, cached): Kaiser-windowed sinc, beta 5.0,
cutoff at min(fs_in, fs_out)/2 — matching scipy.signal.resample_poly's
defaults, which the tests use as the independent reference.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _design_filter(up: int, down: int) -> np.ndarray:
    """Kaiser-windowed low-pass for a rational up/down conversion."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate  # cutoff in half-cycles/sample at the high rate
    half_len = 10 * max_rate  # scipy resample_poly default
    n = 2 * half_len + 1
    t = np.arange(n) - half_len
    # sinc low-pass * kaiser window, gain up (compensates zero-stuffing).
    h = f_c * np.sinc(f_c * t) * np.kaiser(n, 5.0)
    return (h * up).astype(np.float64)


@functools.lru_cache(maxsize=16)
def _ratio(src_rate: int, dst_rate: int) -> tuple[int, int]:
    g = math.gcd(src_rate, dst_rate)
    return dst_rate // g, src_rate // g


@functools.partial(jax.jit, static_argnames=("up", "down", "n_out"))
def _resample_conv(x: jnp.ndarray, h: jnp.ndarray, up: int, down: int, n_out: int):
    """x [B, N] → [B, n_out] via transposed/strided conv.

    Upsampling by L = lhs_dilation L; downsampling by M = window stride M.
    """
    half = (h.shape[0] - 1) // 2
    out = jax.lax.conv_general_dilated(
        x[:, None, :],  # [B, C=1, N]
        h[None, None, :].astype(x.dtype),  # [O=1, I=1, K]
        window_strides=(down,),
        padding=[(half, half + up * down)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0]
    return out[:, :n_out]


def resample(
    audio: np.ndarray | jnp.ndarray, src_rate: int, dst_rate: int = 16000
) -> jnp.ndarray:
    """Resample [..., N] audio from src_rate to dst_rate (polyphase sinc)."""
    if src_rate == dst_rate:
        return jnp.asarray(audio)
    up, down = _ratio(src_rate, dst_rate)
    x = jnp.asarray(audio, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    n_out = -(-x.shape[-1] * up // down)  # ceil, scipy semantics
    h = jnp.asarray(_design_filter(up, down), jnp.float32)
    y = _resample_conv(x, h, up, down, n_out)
    return y[0] if squeeze else y
