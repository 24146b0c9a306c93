"""Whisper log-mel spectrogram frontend, TPU-first.

Re-implements the mel frontend that lives inside whisper.cpp in the
reference (SURVEY.md §2.3: 400-pt FFT, hop 160, 80/128 mels, 16 kHz;
usage evidence at /root/reference/src/stt_engine.cpp:138-145).

Design: instead of an FFT, the STFT is expressed as two dense matmuls with
precomputed cos/sin DFT bases, and the mel projection as a third matmul.
``[n_frames, 400] @ [400, 201]`` lands on the MXU, XLA fuses the
window/power/log elementwise ops around it, and the whole frontend compiles
to a handful of fused HLOs with static shapes. A fused Pallas variant lives
in ``pallas_mel.py``; this module is the reference implementation and the
CPU-testable path.

Numerics follow openai-whisper's ``log_mel_spectrogram``: Hann window
(periodic), reflect-padding of n_fft//2, power spectrum with the last frame
dropped, Slaney-normalized mel filterbank, ``log10(max(., 1e-10))``,
dynamic-range clamp to ``max - 8``, and ``(x + 4) / 4`` scaling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds per window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 mel frames per window


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(
        np.float64
    )


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = freq >= min_log_hz
    mels = np.where(
        above, min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep, mels
    )
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = mels >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=4)
def mel_filterbank(
    n_mels: int = 80, sr: int = SAMPLE_RATE, n_fft: int = N_FFT
) -> np.ndarray:
    """Slaney-scale, Slaney-normalized triangular mel filterbank.

    Equivalent to ``librosa.filters.mel(sr, n_fft, n_mels)`` (the source of
    openai-whisper's ``mel_filters.npz``). Shape: [n_mels, n_fft//2 + 1].
    """
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_min = _hz_to_mel_slaney(0.0)
    mel_max = _hz_to_mel_slaney(sr / 2.0)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: each filter integrates to ~constant energy.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _dft_basis(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases: returns (cos, sin) of shape [n_fft, n_fft//2+1].

    The Hann window is folded into the basis so framing needs no separate
    multiply: ``real = frames @ cos``, ``imag = frames @ sin``.
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    win = hann_window(n_fft)[:, None]
    cos = (np.cos(ang) * win).astype(np.float32)
    sin = (np.sin(ang) * win).astype(np.float32)
    return cos, sin


def frame_audio(audio: jnp.ndarray, n_fft: int = N_FFT, hop: int = HOP_LENGTH):
    """Reflect-pad and frame audio: [..., n_samples] → [..., n_frames, n_fft].

    Matches torch.stft(center=True, pad_mode="reflect"); the final frame is
    dropped by the caller per whisper semantics.

    GATHER-FREE: frame i covers samples [i·hop, i·hop + n_fft); with
    n_fft = ceil(n_fft/hop)·hop overlap, every frame is a concatenation of
    consecutive hop-sized chunks — so framing is a reshape plus
    ceil(n_fft/hop) shifted slices and one concat. The advanced-index
    formulation (``audio[..., idx]``) lowers to an XLA gather that costs
    ~30 ms for 8×30 s windows on TPU; this form is pure layout ops.
    """
    pad = n_fft // 2
    audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (audio.shape[-1] - n_fft) // hop
    n_chunks_per_frame = -(-n_fft // hop)  # ceil: 3 for 400/160
    total_chunks = n_frames + n_chunks_per_frame - 1
    tail_pad = total_chunks * hop - audio.shape[-1]
    if tail_pad > 0:
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, tail_pad)])
    chunks = audio[..., : total_chunks * hop].reshape(
        *audio.shape[:-1], total_chunks, hop
    )
    parts = []
    remaining = n_fft
    for j in range(n_chunks_per_frame):
        width = min(hop, remaining)
        parts.append(chunks[..., j : j + n_frames, :width])
        remaining -= width
    return jnp.concatenate(parts, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_mels", "dtype"))
def log_mel_spectrogram(
    audio: jnp.ndarray, n_mels: int = 80, dtype=jnp.float32
) -> jnp.ndarray:
    """audio [..., n_samples] (float32, 16 kHz) → log-mel [..., n_frames, n_mels].

    For a 480_000-sample window returns exactly 3000 frames. Works on
    arbitrary leading batch dims. All matmuls run in fp32 for numerical
    parity; cast to ``dtype`` at the end (encoder consumes bf16).
    """
    cos, sin = _dft_basis()
    mel_w = mel_filterbank(n_mels)

    frames = frame_audio(audio)  # [..., F+1, n_fft]
    frames = frames[..., :-1, :]  # drop last frame (whisper)
    # HIGHEST precision: full-fp32 MXU passes. The frontend is a rounding
    # error of total FLOPs; numeric parity with the fp32 reference matters
    # more than the ~3x matmul cost here.
    dot = functools.partial(
        jnp.matmul, precision=jax.lax.Precision.HIGHEST
    )
    real = dot(frames, jnp.asarray(cos))
    imag = dot(frames, jnp.asarray(sin))
    power = real * real + imag * imag  # [..., F, n_freqs]
    mel = dot(power, jnp.asarray(mel_w).T)  # [..., F, n_mels]

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # Dynamic-range clamp over the whole example (last two axes).
    max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.astype(dtype)


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Pad with zeros or trim to exactly ``length`` samples (host-side)."""
    if audio.shape[-1] >= length:
        return audio[..., :length]
    pad = length - audio.shape[-1]
    return np.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
