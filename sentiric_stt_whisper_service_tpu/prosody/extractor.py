"""Affective prosody extraction as batched XLA ops.

Re-implements the reference's pure-CPU DSP (SURVEY.md §2.1 "Prosody
extractor"; /root/reference/src/prosody_extractor.cpp) with identical
numeric semantics, but TPU-shaped: the per-frame loops become framed
reductions over a [n_frames, 160] view, and the only truly sequential
piece — the one-pole low-pass IIR — runs as a ``lax.associative_scan``
(log-depth parallel scan) over the whole clip.

Semantics mirrored exactly (all cited from prosody_extractor.cpp):
  * 10 ms frames: ``frame_shift = sr/100`` (:50), trailing partial frame
    dropped (:63);
  * per-frame RMS (:69-77), energy-onset peak counting at the 0.05
    threshold (:80-83), standard ZCR (:93,111-112);
  * LPF ``y += alpha*(x-y)`` carried across frame boundaries (:74-75);
  * hysteresis cycle counting on the filtered signal with clipping
    threshold ``max(0.002, rms*0.15)`` (:85-110), F0 accepted when
    ``rms>0.015`` and within [min_pitch, max_pitch] (:114-119);
  * first-difference spectral-centroid proxy (:121-127);
  * lower-median pitch (nth_element n/2 semantics, :19-24,130);
  * octave-error halving heuristics (:140-148), whisper-aware gender
    rules (:155-163), relative-emotion valence/arousal (:166-186), and
    the 8-D gender-polarized speaker vector (:191-221).

The public API returns an :class:`AffectiveTags` matching the reference's
struct (prosody_extractor.h:6-18).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ProsodyOptions:
    """Tunables (reference prosody_extractor.h:21-27)."""

    lpf_alpha: float = 0.07
    gender_threshold: float = 170.0
    min_pitch: float = 60.0
    max_pitch: float = 500.0


GENDER_CODES = ("?", "M", "F")
EMOTION_CODES = ("neutral", "excited", "angry", "sad")


@dataclasses.dataclass
class AffectiveTags:
    gender_proxy: str = "?"
    emotion_proxy: str = "neutral"
    pitch_mean: float = 0.0
    pitch_std: float = 0.0
    energy_mean: float = 0.0
    energy_std: float = 0.0
    spectral_centroid: float = 0.0
    zero_crossing_rate: float = 0.0
    arousal: float = 0.0
    valence: float = 0.0
    speaker_vec: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(8, np.float32)
    )
    speech_rate: float = 0.0


class ProsodyNumeric(NamedTuple):
    """Device-side numeric result (strings encoded as int codes)."""

    pitch_mean: jnp.ndarray
    pitch_std: jnp.ndarray
    energy_mean: jnp.ndarray
    energy_std: jnp.ndarray
    spectral_centroid: jnp.ndarray
    zero_crossing_rate: jnp.ndarray
    arousal: jnp.ndarray
    valence: jnp.ndarray
    gender_code: jnp.ndarray  # 0 '?', 1 'M', 2 'F'
    emotion_code: jnp.ndarray  # 0 neutral, 1 excited, 2 angry, 3 sad
    speaker_vec: jnp.ndarray  # [8]
    speech_rate: jnp.ndarray


def _one_pole_lpf(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """y[t] = y[t-1] + alpha*(x[t] - y[t-1]), y[-1] = 0, via parallel scan."""
    a = jnp.full_like(x, 1.0 - alpha)
    b = x * alpha

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    _, y = jax.lax.associative_scan(combine, (a, b))
    return y


def _soft_norm(val, lo, hi, xp=jnp):
    return xp.clip((val - lo) / (hi - lo), 0.0, 1.0)


def _heuristics(xp, pitch_mean, pitch_std, energy_mean, sc_mean, zcr_mean,
                speech_rate, opts: ProsodyOptions):
    """THE single source of truth for the reference's affective
    heuristics (prosody_extractor.cpp:140-221): octave-error halving,
    gender rules, relative emotion, and the 8-D gender-polarized speaker
    vector — written branchless over a backend module ``xp`` (``jnp``
    for the batched oracle, ``np`` for the serving twin), so the two
    execution paths cannot drift (VERDICT r4 #8).

    Returns (pitch_mean, gender_code, arousal, valence, emotion_code,
    speaker_vec[8])."""
    # Backend-array inputs: comparisons then yield xp bools with xp's
    # ~/&/| semantics (a Python-bool `~` is integer complement — wrong).
    pitch_mean, pitch_std, energy_mean, sc_mean, zcr_mean, speech_rate = (
        xp.asarray(v) for v in
        (pitch_mean, pitch_std, energy_mean, sc_mean, zcr_mean, speech_rate)
    )
    # --- octave-error heuristics (:140-148) ---
    halve1 = (pitch_mean > opts.gender_threshold) & (zcr_mean < 0.024)
    halve2 = (
        (~halve1)
        & (energy_mean > 0.12)
        & (pitch_mean < 240.0)
        & (sc_mean < 90.0)
    )
    pitch_mean = xp.where(halve1 | halve2, pitch_mean * 0.5, pitch_mean)

    # --- gender (:155-163): 0 '?', 1 'M', 2 'F' ---
    unknown = (pitch_mean == 0.0) | (energy_mean < 0.018)
    male_zcr = zcr_mean < 0.030
    female = pitch_mean > opts.gender_threshold
    gender = xp.where(
        unknown, 0, xp.where(male_zcr, 1, xp.where(female, 2, 1))
    )

    # --- relative emotion (:166-186) ---
    norm_pitch = xp.where(
        gender == 1,
        _soft_norm(pitch_mean, 60.0, 180.0, xp),
        _soft_norm(pitch_mean, 160.0, 350.0, xp),
    )
    norm_bright = _soft_norm(sc_mean, 40.0, 150.0, xp)
    valence = (norm_pitch * 0.4 + norm_bright * 0.6) * 2.0 - 1.0 + 0.35
    norm_energy = _soft_norm(energy_mean, 0.02, 0.20, xp)
    norm_rate = _soft_norm(speech_rate, 2.0, 9.0, xp)
    arousal = norm_energy * 0.7 + norm_rate * 0.3
    emotion = xp.where(
        arousal > 0.65,
        xp.where(valence > 0.1, 1, 2),  # excited / angry
        xp.where((arousal < 0.30) & (valence < -0.4), 3, 0),  # sad / neutral
    )

    # --- 8-D polarized speaker vector (:191-221) ---
    base_pitch = xp.where(
        gender == 1,
        _soft_norm(pitch_mean, 60.0, 200.0, xp) * 0.4,
        xp.where(
            gender == 2,
            0.6 + _soft_norm(pitch_mean, 160.0, 350.0, xp) * 0.4,
            0.5,
        ),
    )
    vec = xp.stack(
        [
            base_pitch,
            _soft_norm(sc_mean, 40.0, 250.0, xp),
            _soft_norm(pitch_std, 5.0, 100.0, xp) * 0.1,
            _soft_norm(energy_mean, 0.0, 0.3, xp) * 0.1,
            _soft_norm(zcr_mean, 0.0, 0.5, xp) * 0.8,
            _soft_norm(speech_rate, 1.0, 12.0, xp) * 0.1,
            arousal * 0.05,
            ((valence + 1.0) / 2.0) * 0.05,
        ]
    )
    return pitch_mean, gender, arousal, valence, emotion, vec


def _masked_lower_median(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """nth_element(n/2) semantics: element at sorted index count//2."""
    count = jnp.sum(valid)
    padded = jnp.where(valid, vals, jnp.inf)
    s = jnp.sort(padded)
    idx = jnp.clip(count // 2, 0, vals.shape[0] - 1)
    return jnp.where(count > 0, s[idx], 0.0)


def _masked_mean_std(vals, valid):
    count = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid, vals, 0.0)) / count
    var = jnp.sum(jnp.where(valid, (vals - mean) ** 2, 0.0)) / count
    has = jnp.sum(valid) > 0
    return jnp.where(has, mean, 0.0), jnp.where(has, jnp.sqrt(var), 0.0)


@functools.partial(jax.jit, static_argnames=("sample_rate", "opts"))
def prosody_numeric(
    audio: jnp.ndarray,  # [N] float32 (padded)
    n_samples: jnp.ndarray,  # scalar int32: valid length
    sample_rate: int = 16000,
    opts: ProsodyOptions = ProsodyOptions(),
) -> ProsodyNumeric:
    """Numeric prosody core. ``audio`` may be zero-padded; only the first
    ``n_samples`` are analyzed (frames fully inside the valid region)."""
    shift = sample_rate // 100
    n_pad = audio.shape[0]
    n_frames = n_pad // shift
    x = audio[: n_frames * shift]

    # frame validity: frame f covers [f*shift, (f+1)*shift) — valid iff
    # fully inside n_samples (C++ loop condition i + frame_shift <= n).
    fidx = jnp.arange(n_frames)
    frame_valid = (fidx + 1) * shift <= n_samples

    frames = x.reshape(n_frames, shift)
    filt = _one_pole_lpf(x, opts.lpf_alpha).reshape(n_frames, shift)

    # --- RMS energy + onset peaks ---
    rms = jnp.sqrt(jnp.mean(frames * frames, axis=1))
    prev_rms = jnp.concatenate([jnp.zeros(1), rms[:-1]])
    peaks = frame_valid & (rms > 0.05) & (prev_rms <= 0.05)
    peak_count = jnp.sum(peaks)

    # --- standard ZCR over the frame (k = 1..shift-1) ---
    nonneg = filt >= 0.0
    zc = jnp.sum(nonneg[:, 1:] != nonneg[:, :-1], axis=1)
    zcr = zc.astype(jnp.float32) / shift

    # --- hysteresis cycle counting on the filtered frame ---
    c = jnp.maximum(0.002, rms * 0.15)[:, None]
    sign = jnp.where(filt > c, 1, jnp.where(filt < -c, -1, 0))
    # forward-fill of the previous nonzero sign (exclusive)
    pos_of_nz = jnp.where(sign != 0, jnp.arange(shift)[None, :], -1)
    last_nz_idx = jax.lax.cummax(pos_of_nz, axis=1)
    prev_nz_idx = jnp.concatenate(
        [jnp.full((n_frames, 1), -1), last_nz_idx[:, :-1]], axis=1
    )
    prev_sign = jnp.where(
        prev_nz_idx >= 0,
        jnp.take_along_axis(sign, jnp.maximum(prev_nz_idx, 0), axis=1),
        0,
    )
    # C++ counts a cycle when state is positive and val < -c; state follows
    # the last ±c crossing. k=0 never counts (loop starts at k=1).
    cycles = jnp.sum((sign[:, 1:] == -1) & (prev_sign[:, 1:] == 1), axis=1)

    dur_frame = shift / sample_rate
    f0 = cycles.astype(jnp.float32) / dur_frame
    f0_valid = (
        frame_valid
        & (rms > 0.015)
        & (cycles > 0)
        & (f0 >= opts.min_pitch)
        & (f0 <= opts.max_pitch)
    )

    # --- spectral centroid proxy (first differences of the RAW frame) ---
    k = jnp.arange(1, shift)[None, :].astype(jnp.float32)
    diff = jnp.abs(frames[:, 1:] - frames[:, :-1])
    power = jnp.sum(diff, axis=1)
    weighted = jnp.sum(diff * k, axis=1)
    sc = jnp.where(power > 0, weighted / jnp.maximum(power, 1e-20), 0.0)

    # --- aggregation (reference :130-135) ---
    pitch_mean = _masked_lower_median(f0, f0_valid)
    f0_mean, pitch_std = _masked_mean_std(f0, f0_valid)
    energy_mean, energy_std = _masked_mean_std(rms, frame_valid)
    any_frame = jnp.sum(frame_valid) > 0
    energy_mean = jnp.where(any_frame, energy_mean, 0.01)
    sc_mean = jnp.where(
        any_frame, _masked_mean_std(sc, frame_valid)[0], 50.0
    )
    zcr_mean = jnp.where(any_frame, _masked_mean_std(zcr, frame_valid)[0], 0.1)

    duration = n_samples.astype(jnp.float32) / sample_rate
    speech_rate = jnp.where(duration > 0, peak_count / jnp.maximum(duration, 1e-9), 0.0)

    # Octave halving / gender / emotion / speaker vector: ONE shared
    # implementation with the numpy serving twin (_heuristics).
    pitch_mean, gender, arousal, valence, emotion, vec = _heuristics(
        jnp, pitch_mean, pitch_std, energy_mean, sc_mean, zcr_mean,
        speech_rate, opts,
    )

    # Empty-input path (reference :35-48): n < 160 → neutral tags.
    empty = n_samples < shift
    def z(v, alt=0.0):
        return jnp.where(empty, alt, v)

    return ProsodyNumeric(
        pitch_mean=z(pitch_mean),
        pitch_std=z(pitch_std),
        energy_mean=z(energy_mean),
        energy_std=z(energy_std),
        spectral_centroid=z(sc_mean),
        zero_crossing_rate=z(zcr_mean),
        arousal=z(arousal),
        valence=z(valence),
        gender_code=jnp.where(empty, 0, gender),
        emotion_code=jnp.where(empty, 0, emotion),
        speaker_vec=jnp.where(empty, jnp.zeros(8), vec),
        speech_rate=z(speech_rate),
    )


def _bucket_len(n: int, sample_rate: int) -> int:
    """Pad lengths to power-of-two frame counts to bound recompiles."""
    shift = sample_rate // 100
    frames = max(1, -(-n // shift))
    size = 1
    while size < frames:
        size *= 2
    return size * shift


def _prosody_numeric_np(audio: np.ndarray, sample_rate: int,
                        opts: ProsodyOptions):
    """Pure-numpy twin of :func:`prosody_numeric` — the SERVING path.

    The engine calls prosody once per segment per request (and per
    streaming tick); on a tunneled TPU the jitted form pays transfer
    round trips that dwarf the ~ms of math, and routing it through the
    host CPU *jax* backend poisons the shared persistent compilation
    cache with XLA:CPU AOT entries whose machine-feature stamps differ
    between the serving and test processes (observed SIGSEGV on
    deserialize). Plain numpy has no launches, no compiles, no cache —
    exactly where the reference runs this DSP (prosody_extractor.cpp).
    Numerics are pinned against the jax oracle by
    tests/test_prosody.py::test_numpy_twin_matches_jax_oracle."""
    shift = sample_rate // 100
    n = audio.shape[0]
    n_frames = n // shift
    x = audio[: n_frames * shift].astype(np.float64)

    from scipy.signal import lfilter

    # y[t] = (1-alpha)·y[t-1] + alpha·x[t]  (reference :74-75)
    filt = lfilter([opts.lpf_alpha], [1.0, -(1.0 - opts.lpf_alpha)], x)
    frames = x.reshape(n_frames, shift)
    filt = filt.reshape(n_frames, shift)

    # --- RMS energy + onset peaks (:69-83) ---
    rms = np.sqrt(np.mean(frames * frames, axis=1))
    prev_rms = np.concatenate([[0.0], rms[:-1]])
    peak_count = int(np.sum((rms > 0.05) & (prev_rms <= 0.05)))

    # --- standard ZCR over the filtered frame (:93,111-112) ---
    nonneg = filt >= 0.0
    zcr = np.sum(nonneg[:, 1:] != nonneg[:, :-1], axis=1) / shift

    # --- hysteresis cycle counting (:85-110) ---
    c = np.maximum(0.002, rms * 0.15)[:, None]
    sign = np.where(filt > c, 1, np.where(filt < -c, -1, 0))
    pos_of_nz = np.where(sign != 0, np.arange(shift)[None, :], -1)
    last_nz = np.maximum.accumulate(pos_of_nz, axis=1)
    prev_nz = np.concatenate(
        [np.full((n_frames, 1), -1), last_nz[:, :-1]], axis=1
    )
    prev_sign = np.where(
        prev_nz >= 0,
        np.take_along_axis(sign, np.maximum(prev_nz, 0), axis=1),
        0,
    )
    cycles = np.sum((sign[:, 1:] == -1) & (prev_sign[:, 1:] == 1), axis=1)

    dur_frame = shift / sample_rate
    f0 = cycles / dur_frame
    f0_valid = (
        (rms > 0.015)
        & (cycles > 0)
        & (f0 >= opts.min_pitch)
        & (f0 <= opts.max_pitch)
    )

    # --- spectral centroid proxy (:121-127) ---
    k = np.arange(1, shift, dtype=np.float64)
    diff = np.abs(frames[:, 1:] - frames[:, :-1])
    power = np.sum(diff, axis=1)
    weighted = np.sum(diff * k, axis=1)
    sc = np.where(power > 0, weighted / np.maximum(power, 1e-20), 0.0)

    # --- aggregation (:130-135) ---
    f0v = np.sort(f0[f0_valid])
    pitch_mean = float(f0v[len(f0v) // 2]) if f0v.size else 0.0
    pitch_std = float(np.std(f0[f0_valid])) if f0v.size else 0.0
    energy_mean = float(np.mean(rms)) if n_frames else 0.01
    energy_std = float(np.std(rms)) if n_frames else 0.0
    sc_mean = float(np.mean(sc)) if n_frames else 50.0
    zcr_mean = float(np.mean(zcr)) if n_frames else 0.1

    duration = n / sample_rate
    speech_rate = peak_count / duration if duration > 0 else 0.0

    # Octave halving / gender / emotion / speaker vector: ONE shared
    # implementation with the jax oracle (_heuristics over xp=np).
    pitch_mean, gender, arousal, valence, emotion, vec = _heuristics(
        np, pitch_mean, pitch_std, energy_mean, sc_mean, zcr_mean,
        speech_rate, opts,
    )
    return (
        float(pitch_mean), pitch_std, energy_mean, energy_std, sc_mean,
        zcr_mean, float(arousal), float(valence), int(gender), int(emotion),
        np.asarray(vec, np.float32), speech_rate,
    )


def extract_prosody(
    audio: np.ndarray,
    sample_rate: int = 16000,
    opts: ProsodyOptions = ProsodyOptions(),
) -> AffectiveTags:
    """Host API matching the reference's ``extract_prosody`` contract."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    n = audio.shape[0]
    if n < 160:
        return AffectiveTags()
    (pitch_mean, pitch_std, energy_mean, energy_std, sc_mean, zcr_mean,
     arousal, valence, gender, emotion, vec, speech_rate) = (
        _prosody_numeric_np(audio, sample_rate, opts)
    )
    return AffectiveTags(
        gender_proxy=GENDER_CODES[gender],
        emotion_proxy=EMOTION_CODES[emotion],
        pitch_mean=pitch_mean,
        pitch_std=pitch_std,
        energy_mean=energy_mean,
        energy_std=energy_std,
        spectral_centroid=sc_mean,
        zero_crossing_rate=zcr_mean,
        arousal=arousal,
        valence=valence,
        speaker_vec=vec,
        speech_rate=speech_rate,
    )
