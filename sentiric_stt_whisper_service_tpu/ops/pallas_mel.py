"""Pallas-fused STFT→log-mel kernel (SURVEY.md §2.3 / §7 step 1).

One kernel per block of frames does windowed-DFT (two MXU matmuls),
power, mel projection (third matmul), and log10 — the [F, 201] power
spectrum never leaves VMEM. The global dynamic-range clamp
(``max(log, max-8)``) needs the whole-clip max, so it stays in XLA where
it fuses with the final scale.

Numerics match ``ops.mel.log_mel_spectrogram`` (fp32 everywhere); the
jnp implementation remains the CPU/test path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mel import (
    HOP_LENGTH,
    N_FFT,
    _dft_basis,
    frame_audio,
    mel_filterbank,
)

BLOCK_F = 256  # frames per program
N_FREQ_PAD = 256  # 201 → 256 lanes
N_MEL_PAD = 128  # 80/128 mels → 128 lanes


@functools.lru_cache(maxsize=4)
def _padded_bases(n_mels: int):
    cos, sin = _dft_basis(N_FFT)  # [400, 201]
    cosp = np.zeros((N_FFT, N_FREQ_PAD), np.float32)
    sinp = np.zeros((N_FFT, N_FREQ_PAD), np.float32)
    cosp[:, :201] = cos
    sinp[:, :201] = sin
    melp = np.zeros((N_FREQ_PAD, N_MEL_PAD), np.float32)
    melp[:201, :n_mels] = mel_filterbank(n_mels).T
    return cosp, sinp, melp


def _mel_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref):
    frames = frames_ref[:]  # [BLOCK_F, 400]
    real = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    imag = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = real * real + imag * imag  # [BLOCK_F, 256]
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_mels", "dtype", "interpret"))
def log_mel_spectrogram_fused(
    audio: jnp.ndarray, n_mels: int = 80, dtype=jnp.float32, interpret: bool = False
) -> jnp.ndarray:
    """audio [..., n_samples] → log-mel [..., n_frames, n_mels], with the
    STFT+mel+log pipeline in a single Pallas kernel."""
    cosp, sinp, melp = _padded_bases(n_mels)

    frames = frame_audio(audio)[..., :-1, :]  # [..., F, 400]
    lead = frames.shape[:-2]
    F = frames.shape[-2]
    flat = frames.reshape(-1, N_FFT).astype(jnp.float32)
    total = flat.shape[0]
    f_pad = ((total + BLOCK_F - 1) // BLOCK_F) * BLOCK_F
    if f_pad != total:
        flat = jnp.pad(flat, ((0, f_pad - total), (0, 0)))

    log_mel = pl.pallas_call(
        _mel_kernel,
        grid=(f_pad // BLOCK_F,),
        in_specs=[
            pl.BlockSpec((BLOCK_F, N_FFT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_FREQ_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_FREQ_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FREQ_PAD, N_MEL_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_F, N_MEL_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((f_pad, N_MEL_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * f_pad * N_FFT * N_FREQ_PAD * 2 + 2 * f_pad * N_FREQ_PAD * N_MEL_PAD,
            bytes_accessed=f_pad * (N_FFT + N_MEL_PAD) * 4,
            transcendentals=f_pad * N_MEL_PAD,
        ),
        interpret=interpret,
    )(flat, jnp.asarray(cosp), jnp.asarray(sinp), jnp.asarray(melp))

    log_spec = log_mel[:total, :n_mels].reshape(*lead, F, n_mels)
    max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(dtype)
