"""Voice-activity detection gate.

The reference runs a Silero VAD model through whisper.cpp
(/root/reference/src/stt_engine.cpp:44-52,108-115) with threshold 0.75 and
a 500 ms minimum speech duration (config.h:30-37). Zero-egress builds have
no Silero weights, so the default implementation is an adaptive
energy/spectral VAD with the same gating semantics: per-10 ms-frame speech
probability in [0,1], speech detected iff some contiguous run of frames
above ``threshold`` spans at least ``min_duration_ms``.

A Silero-architecture JAX model can be plugged in via
``set_vad_model(fn)`` where ``fn(audio) -> [n_frames] probs``.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

_vad_model: Optional[Callable[[np.ndarray], np.ndarray]] = None


def set_vad_model(fn: Optional[Callable[[np.ndarray], np.ndarray]]):
    global _vad_model
    _vad_model = fn


def frame_speech_probs(audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
    """Per-10ms-frame speech probability (energy + spectral-shape based)."""
    if _vad_model is not None:
        return np.asarray(_vad_model(audio))
    shift = sample_rate // 100
    n_frames = len(audio) // shift
    if n_frames == 0:
        return np.zeros(0, np.float32)
    frames = audio[: n_frames * shift].reshape(n_frames, shift)
    rms = np.sqrt(np.mean(frames**2, axis=1))
    # Energy term on an absolute scale (float PCM in [-1,1]): -52 dBFS → 0,
    # -26 dBFS → 1. Absolute (not clip-adaptive) so an all-speech clip
    # doesn't raise its own floor.
    loud = np.clip((np.log10(rms + 1e-9) + 2.6) / 1.3, 0.0, 1.0)
    # Spectral tilt = mean |first difference| / rms. Voiced speech sits in
    # ~[0.02, 0.8]; mains hum is below, broadband noise ≈ 1.13 is above.
    diff = np.abs(np.diff(frames, axis=1)).mean(axis=1)
    tilt = diff / np.maximum(rms, 1e-8)
    tonal_band = np.clip((tilt - 0.01) * 25.0, 0.0, 1.0) * np.clip(
        (0.8 - tilt) * 4.0, 0.0, 1.0
    )
    return (loud * (0.25 + 0.75 * tonal_band)).astype(np.float32)


def is_speech_detected(
    audio: np.ndarray,
    sample_rate: int = 16000,
    threshold: float = 0.75,
    min_duration_ms: int = 500,
) -> bool:
    """True iff a contiguous run of frames above ``threshold`` spans
    ``min_duration_ms`` (with 3 frames of hangover tolerance)."""
    probs = frame_speech_probs(np.asarray(audio, np.float32), sample_rate)
    if probs.size == 0:
        return False
    active = probs > threshold
    # Accumulated speech within a voiced region; dips up to 100 ms are
    # bridged (Silero/whisper.cpp min_silence_duration_ms default), matching
    # how the reference's VAD treats amplitude-modulated speech.
    need = max(1, int(round(min_duration_ms / 10)))
    max_gap = 10  # frames = 100 ms
    run = 0
    gap = 0
    for a in active:
        if a:
            run += 1
            gap = 0
            if run >= need:
                return True
        else:
            gap += 1
            if gap > max_gap:
                run = 0
    return False
