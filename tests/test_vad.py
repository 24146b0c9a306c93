import numpy as np

from sentiric_stt_whisper_service_tpu.runtime.vad import (
    frame_speech_probs,
    is_speech_detected,
    set_vad_model,
)


def speechlike(dur=2.0, sr=16000, depth=0.35):
    rng = np.random.default_rng(7)
    t = np.arange(int(dur * sr)) / sr
    carrier = np.sin(2 * np.pi * 150 * t) + 0.3 * np.sin(2 * np.pi * 450 * t)
    env = (1 - depth) + depth * np.sin(2 * np.pi * 3 * t)
    return (0.15 * carrier * env + 0.003 * rng.standard_normal(len(t))).astype(
        np.float32
    )


def test_speech_detected():
    assert is_speech_detected(speechlike(), 16000, 0.75, 250)


def test_silence_rejected():
    assert not is_speech_detected(np.zeros(16000, np.float32), 16000, 0.75, 250)
    assert not is_speech_detected(
        (np.random.default_rng(0).standard_normal(16000) * 0.0005).astype(np.float32),
        16000, 0.75, 250,
    )


def test_white_noise_rejected():
    noise = (np.random.default_rng(1).standard_normal(16000) * 0.05).astype(np.float32)
    assert not is_speech_detected(noise, 16000, 0.75, 250)


def test_mains_hum_rejected():
    t = np.arange(16000) / 16000
    hum = (0.05 * np.sin(2 * np.pi * 50 * t)).astype(np.float32)
    assert not is_speech_detected(hum, 16000, 0.75, 250)


def test_short_burst_rejected():
    # 150 ms of speech inside 2 s of silence < 250 ms minimum.
    x = np.zeros(32000, np.float32)
    burst = speechlike(0.15, depth=0.0)
    x[8000 : 8000 + len(burst)] = burst
    assert not is_speech_detected(x, 16000, 0.75, 250)


def test_modulated_speech_with_dips_detected():
    # Deep AM with ~80 ms dips — hangover must bridge them.
    sr = 16000
    t = np.arange(int(1.5 * sr)) / sr
    env = (np.sin(2 * np.pi * 6 * t) > -0.6).astype(np.float32)
    x = (0.15 * np.sin(2 * np.pi * 180 * t) * env).astype(np.float32)
    assert is_speech_detected(x, sr, 0.75, 250)


def test_pluggable_model():
    set_vad_model(lambda a: np.ones(len(a) // 160, np.float32))
    try:
        assert is_speech_detected(np.zeros(16000, np.float32), 16000, 0.75, 250)
    finally:
        set_vad_model(None)
    assert not is_speech_detected(np.zeros(16000, np.float32), 16000, 0.75, 250)


def test_probs_shape_and_range():
    p = frame_speech_probs(speechlike(1.0))
    assert p.shape == (100,)
    assert (p >= 0).all() and (p <= 1).all()
