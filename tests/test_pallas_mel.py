import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.ops.mel import log_mel_spectrogram
from sentiric_stt_whisper_service_tpu.ops.pallas_mel import log_mel_spectrogram_fused


@pytest.mark.parametrize("n_mels", [80, 128])
def test_fused_matches_reference(rng, n_mels):
    audio = (rng.standard_normal((2, 48000)) * 0.1).astype(np.float32)
    want = np.asarray(log_mel_spectrogram(audio, n_mels=n_mels))
    got = np.asarray(log_mel_spectrogram_fused(audio, n_mels=n_mels, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_fused_single_clip(rng):
    audio = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    got = np.asarray(log_mel_spectrogram_fused(audio, interpret=True))
    want = np.asarray(log_mel_spectrogram(audio))
    np.testing.assert_allclose(got, want, atol=3e-4)
