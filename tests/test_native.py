"""Native C++ library tests (built via make; skipped when no toolchain)."""

import io

import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.audio import write_wav
from sentiric_stt_whisper_service_tpu.native import (
    StreamBuffer,
    get_lib,
    parse_wav_native,
)

needs_native = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


@needs_native
class TestNativeWav:
    def test_parse_mono(self, rng):
        pcm = (rng.standard_normal(500) * 1000).astype(np.int16)
        buf = io.BytesIO()
        write_wav(buf, pcm, 22050)
        out = parse_wav_native(buf.getvalue())
        assert out is not None
        got, rate, ch = out
        assert rate == 22050 and ch == 1
        np.testing.assert_array_equal(got, pcm)

    def test_parse_matches_python(self, rng):
        from sentiric_stt_whisper_service_tpu.audio.wav import DecodedAudio

        # stereo wav built by hand
        left = (rng.standard_normal(100) * 500).astype(np.int16)
        right = (rng.standard_normal(100) * 500).astype(np.int16)
        inter = np.empty(200, np.int16)
        inter[0::2], inter[1::2] = left, right
        data = inter.tobytes()
        hdr = b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        hdr += b"fmt " + (16).to_bytes(4, "little")
        hdr += (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        hdr += (16000).to_bytes(4, "little") + (64000).to_bytes(4, "little")
        hdr += (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
        hdr += b"data" + len(data).to_bytes(4, "little")
        out = parse_wav_native(hdr + data)
        assert out is not None
        got, rate, ch = out
        assert ch == 2
        # trunc-toward-zero division (C++ semantics)
        s = left.astype(np.int32) + right.astype(np.int32)
        want = np.trunc(s / 2.0).astype(np.int16)
        np.testing.assert_array_equal(got, want)

    def test_invalid_returns_none(self):
        assert parse_wav_native(b"not a wav at all") is None


class TestStreamBuffer:
    """Runs against native when built, Python fallback otherwise."""

    def test_append_and_read(self):
        b = StreamBuffer()
        pcm = np.arange(100, dtype=np.int16)
        b.append(pcm.tobytes())
        assert b.size == 100
        np.testing.assert_array_equal(b.read(), pcm)

    def test_wav_header_stripped_on_first_chunk(self):
        pcm = np.arange(50, dtype=np.int16)
        buf = io.BytesIO()
        write_wav(buf, pcm, 16000)
        b = StreamBuffer()
        b.append(buf.getvalue())
        np.testing.assert_array_equal(b.read(), pcm)

    def test_odd_byte_stitching(self):
        pcm = np.arange(10, dtype=np.int16)
        raw = pcm.tobytes()
        b = StreamBuffer()
        b.append(raw[:7])  # odd split
        b.append(raw[7:])
        np.testing.assert_array_equal(b.read(), pcm)

    def test_clear_and_reuse(self):
        b = StreamBuffer()
        b.append(np.ones(10, np.int16).tobytes())
        b.clear()
        assert b.size == 0
        b.append(np.full(5, 3, np.int16).tobytes())
        np.testing.assert_array_equal(b.read(), np.full(5, 3, np.int16))

    def test_many_chunks(self):
        b = StreamBuffer()
        total = []
        for i in range(200):
            c = np.full(100, i % 32000, np.int16)
            total.append(c)
            b.append(c.tobytes())
        np.testing.assert_array_equal(b.read(), np.concatenate(total))
