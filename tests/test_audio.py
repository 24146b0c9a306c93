import io
import shutil

import numpy as np
import pytest
import scipy.signal

from sentiric_stt_whisper_service_tpu.audio import (
    parse_wav_robust,
    pcm16_to_f32,
    resample,
    write_wav,
)


def make_wav_bytes(pcm16, sr=16000, channels=1):
    """Build WAV bytes with arbitrary channel count."""
    pcm16 = np.asarray(pcm16, np.int16)
    data = pcm16.tobytes()
    hdr = b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
    hdr += b"fmt " + (16).to_bytes(4, "little")
    hdr += (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
    hdr += sr.to_bytes(4, "little")
    hdr += (sr * 2 * channels).to_bytes(4, "little")
    hdr += (2 * channels).to_bytes(2, "little") + (16).to_bytes(2, "little")
    hdr += b"data" + len(data).to_bytes(4, "little")
    return hdr + data


class TestWavParse:
    def test_mono_roundtrip(self, rng):
        pcm = (rng.standard_normal(1600) * 3000).astype(np.int16)
        out = parse_wav_robust(make_wav_bytes(pcm, 22050))
        assert out.is_valid and out.sample_rate == 22050 and out.channels == 1
        np.testing.assert_array_equal(out.pcm_data, pcm)

    def test_stereo_mix(self):
        left = np.array([100, 200, -300], np.int16)
        right = np.array([300, -100, 100], np.int16)
        inter = np.empty(6, np.int16)
        inter[0::2], inter[1::2] = left, right
        out = parse_wav_robust(make_wav_bytes(inter, channels=2))
        np.testing.assert_array_equal(out.pcm_data, [200, 50, -100])

    def test_multichannel_takes_first(self):
        frames = np.arange(12, dtype=np.int16).reshape(4, 3)
        out = parse_wav_robust(make_wav_bytes(frames.ravel(), channels=3))
        np.testing.assert_array_equal(out.pcm_data, [0, 3, 6, 9])

    def test_extra_chunks_skipped(self, rng):
        pcm = (rng.standard_normal(100) * 100).astype(np.int16)
        wav = make_wav_bytes(pcm)
        # splice a LIST chunk between header and fmt
        extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
        spliced = wav[:12] + extra + wav[12:]
        spliced = b"RIFF" + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
        out = parse_wav_robust(spliced)
        np.testing.assert_array_equal(out.pcm_data, pcm)

    def test_raw_pcm_fallback(self):
        # No WAV header and not decodable → raw PCM16 interpretation.
        pcm = np.array([1, 2, 3, 4], np.int16)
        raw = pcm.tobytes() + b"\x07"  # odd trailing byte truncated
        out = parse_wav_robust(raw)
        assert out.is_valid
        np.testing.assert_array_equal(out.pcm_data, pcm)

    def test_writer_parses_back(self, rng):
        pcm = (rng.standard_normal(500) * 1000).astype(np.int16)
        buf = io.BytesIO()
        write_wav(buf, pcm, 8000)
        out = parse_wav_robust(buf.getvalue())
        assert out.sample_rate == 8000
        np.testing.assert_array_equal(out.pcm_data, pcm)

    @pytest.mark.skipif(shutil.which("ffmpeg") is None, reason="no ffmpeg")
    def test_ffmpeg_fallback_flac(self, rng, tmp_path):
        import subprocess

        pcm = (rng.standard_normal(16000) * 5000).astype(np.int16)
        wav_path = tmp_path / "x.wav"
        write_wav(str(wav_path), pcm, 16000)
        flac = tmp_path / "x.flac"
        subprocess.run(
            ["ffmpeg", "-y", "-loglevel", "error", "-i", str(wav_path), str(flac)],
            check=True,
        )
        out = parse_wav_robust(flac.read_bytes())
        assert out.is_valid and out.sample_rate == 16000
        assert abs(len(out.pcm_data) - 16000) < 100
        # FLAC is lossless → near-exact
        np.testing.assert_allclose(out.pcm_data[:100], pcm[:100], atol=1)


class TestPcmConvert:
    def test_scaling(self):
        out = pcm16_to_f32(np.array([-32768, 0, 16384, 32767], np.int16))
        np.testing.assert_allclose(out, [-1.0, 0.0, 0.5, 32767 / 32768], atol=1e-7)


class TestResample:
    @pytest.mark.parametrize("src", [8000, 22050, 44100, 48000])
    def test_matches_scipy(self, rng, src):
        x = (rng.standard_normal(src) * 0.1).astype(np.float32)  # 1 s
        got = np.asarray(resample(x, src, 16000))
        import math

        g = math.gcd(src, 16000)
        want = scipy.signal.resample_poly(x.astype(np.float64), 16000 // g, src // g)
        assert got.shape == want.shape
        # interior parity (edges differ slightly by padding choice)
        m = 200
        np.testing.assert_allclose(got[m:-m], want[m:-m], atol=5e-4)

    def test_identity(self):
        x = np.ones(100, np.float32)
        np.testing.assert_array_equal(np.asarray(resample(x, 16000, 16000)), x)

    def test_tone_preserved(self):
        t = np.arange(48000) / 48000
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = np.asarray(resample(x, 48000, 16000))
        assert y.shape[0] == 16000
        t16 = np.arange(16000) / 16000
        want = np.sin(2 * np.pi * 440 * t16)
        np.testing.assert_allclose(y[500:-500], want[500:-500], atol=5e-3)

    def test_batched(self, rng):
        x = (rng.standard_normal((3, 8000)) * 0.1).astype(np.float32)
        y = np.asarray(resample(x, 8000, 16000))
        assert y.shape == (3, 16000)
        single = np.asarray(resample(x[1], 8000, 16000))
        np.testing.assert_allclose(y[1], single, atol=1e-6)
