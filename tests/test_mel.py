"""Mel frontend parity tests vs. independent numpy/scipy references."""

import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.ops import mel as M


def ref_stft_power(audio):
    """Independent reference: numpy rfft STFT, center-reflect padded."""
    pad = M.N_FFT // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    win = M.hann_window(M.N_FFT)
    n_frames = 1 + (len(x) - M.N_FFT) // M.HOP_LENGTH
    frames = np.stack(
        [x[i * M.HOP_LENGTH : i * M.HOP_LENGTH + M.N_FFT] for i in range(n_frames)]
    )
    spec = np.fft.rfft(frames * win, axis=-1)
    return (np.abs(spec) ** 2)[:-1]  # drop last frame


def ref_log_mel(audio, n_mels=80):
    power = ref_stft_power(audio)
    mel = power @ M.mel_filterbank(n_mels).T.astype(np.float64)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


def test_dft_basis_matches_rfft(rng):
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    got = np.asarray(M.log_mel_spectrogram(audio[None]))[0]
    want = ref_log_mel(audio.astype(np.float64))
    assert got.shape == want.shape == (100, 80)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_30s_window_shape(rng):
    audio = rng.standard_normal(M.N_SAMPLES).astype(np.float32) * 0.05
    out = M.log_mel_spectrogram(audio)
    assert out.shape == (3000, 80)
    out128 = M.log_mel_spectrogram(audio, n_mels=128)
    assert out128.shape == (3000, 128)


def test_batched(rng):
    audio = rng.standard_normal((3, 32000)).astype(np.float32) * 0.1
    out = np.asarray(M.log_mel_spectrogram(audio))
    for i in range(3):
        single = np.asarray(M.log_mel_spectrogram(audio[i]))
        np.testing.assert_allclose(out[i], single, atol=1e-5)


def test_mel_filterbank_properties():
    fb = M.mel_filterbank(80)
    assert fb.shape == (80, 201)
    assert (fb >= 0).all()
    # Every filter has some support; triangles overlap neighbours.
    assert (fb.sum(axis=1) > 0).all()
    # Slaney normalization: peak amplitudes decrease with center frequency
    # in the log region.
    peaks = fb.max(axis=1)
    assert peaks[10] > peaks[70]


def test_tone_lands_in_right_mel_bin(tone_220):
    out = np.asarray(M.log_mel_spectrogram(tone_220))
    # 220 Hz → low mel bins should dominate.
    mean_spec = out.mean(axis=0)
    assert mean_spec.argmax() < 15


def test_pad_or_trim():
    x = np.ones(1000, np.float32)
    assert M.pad_or_trim(x).shape == (M.N_SAMPLES,)
    assert M.pad_or_trim(np.ones(M.N_SAMPLES + 5, np.float32)).shape == (M.N_SAMPLES,)
