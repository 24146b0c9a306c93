"""Cross-protocol response-shape consistency: gRPC unary vs HTTP.

The reference's unary gRPC response leaves ``language`` /
``language_probability`` / ``duration`` unset (its own CLI reads them
anyway — /root/reference/src/cli/audio_client.cpp:131-132). This repo
fills them; these tests pin that the two protocols agree on the same
input for the two degenerate cases:

  * fully-gated clip (speech-shaped audio whose every segment fails the
    quality gates): both report language "unknown", empty text, and an
    audio-derived duration;
  * VAD-silent clip: both carry the engine's single empty-text
    "unknown"-language result (stt_engine.cpp:169-194 semantics).
"""

import asyncio
import io
from concurrent import futures

import grpc
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.audio import write_wav
from sentiric_stt_whisper_service_tpu.config import Settings
from sentiric_stt_whisper_service_tpu.runtime import SttEngine
from sentiric_stt_whisper_service_tpu.serving.grpc_server import (
    SttServicer,
    add_servicer_to_server,
)
from sentiric_stt_whisper_service_tpu.serving.http_server import HttpServer
from sentiric_stt_whisper_service_tpu.serving.metrics import AppMetrics
from sentiric_stt_whisper_service_tpu.serving.proto import stt_pb2

SERVICE = "sentiric.stt.v1.SttWhisperService"


def _wav(audio: np.ndarray) -> bytes:
    buf = io.BytesIO()
    write_wav(buf, audio.astype(np.float32), 16000)
    return buf.getvalue()


@pytest.fixture(scope="module")
def gated_engine():
    # Default quality gates + random weights: every decoded segment fails
    # the 0.40 avg-prob gate, so transcribe() returns [] for speech audio.
    s = Settings(enable_vad=False, beam_size=1, best_of=1, parallel_requests=2)
    eng = SttEngine(s, model_name="test", random_init=True)
    yield eng
    eng.shutdown()


@pytest.fixture(scope="module")
def vad_engine():
    # Energy-VAD fallback active (no Silero checkpoint in tests).
    s = Settings(enable_vad=True, beam_size=1, best_of=1, parallel_requests=2)
    eng = SttEngine(s, model_name="test", random_init=True)
    yield eng
    eng.shutdown()


@pytest.fixture(scope="module")
def speech_wav():
    rng = np.random.default_rng(5)
    t = np.arange(16000) / 16000
    audio = (
        0.2 * np.sin(2 * np.pi * 180 * t) * (0.7 + 0.3 * np.sin(2 * np.pi * 3 * t))
        + 0.003 * rng.standard_normal(16000)
    )
    return _wav(audio)


@pytest.fixture(scope="module")
def silent_wav():
    rng = np.random.default_rng(6)
    return _wav(1e-4 * rng.standard_normal(16000))


def _call_both(engine, wav_bytes):
    """Run the same clip through gRPC unary AND HTTP; return (resp, json)."""
    metrics = AppMetrics()
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=2))
    add_servicer_to_server(SttServicer(engine, metrics), server)
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    try:
        with grpc.insecure_channel(f"127.0.0.1:{port}") as ch:
            call = ch.unary_unary(
                f"/{SERVICE}/WhisperTranscribe",
                request_serializer=stt_pb2.WhisperTranscribeRequest.SerializeToString,
                response_deserializer=stt_pb2.WhisperTranscribeResponse.FromString,
            )
            grpc_resp = call(
                stt_pb2.WhisperTranscribeRequest(audio_data=wav_bytes, language="en"),
                metadata=(("x-tenant-id", "t1"),),
                timeout=300,
            )
    finally:
        server.stop(grace=None)

    async def run_http():
        import aiohttp
        from aiohttp.test_utils import TestClient, TestServer

        http = HttpServer(engine, AppMetrics(), engine.settings)
        client = TestClient(TestServer(http.app))
        await client.start_server()
        try:
            form = aiohttp.FormData()
            form.add_field("file", wav_bytes, filename="a.wav")
            form.add_field("language", "en")
            resp = await client.post(
                "/v1/transcribe", data=form, headers={"X-Tenant-ID": "t1"}
            )
            assert resp.status == 200
            return await resp.json()
        finally:
            await client.close()

    return grpc_resp, asyncio.run(run_http())


def test_fully_gated_clip_consistent(gated_engine, speech_wav):
    grpc_resp, http_json = _call_both(gated_engine, speech_wav)
    # Every segment gated out: HTTP has no segments and language "unknown".
    assert http_json["segments"] == []
    assert http_json["language"] == "unknown"
    assert http_json["text"] == ""
    # gRPC must agree: same language sentinel, same audio-derived duration.
    assert grpc_resp.language == "unknown"
    assert grpc_resp.transcription == ""
    assert grpc_resp.duration == pytest.approx(http_json["duration"], abs=1e-6)
    assert grpc_resp.duration == pytest.approx(1.0, abs=0.01)


def test_vad_silent_clip_consistent(vad_engine, silent_wav):
    grpc_resp, http_json = _call_both(vad_engine, silent_wav)
    # VAD silence: the engine emits ONE empty-text result with language
    # "unknown" and speaker "unknown" (reference quirk preserved).
    assert len(http_json["segments"]) == 1
    assert http_json["segments"][0]["text"] == ""
    assert http_json["segments"][0]["speaker_id"] == "unknown"
    assert http_json["language"] == "unknown"
    assert grpc_resp.language == "unknown"
    assert grpc_resp.transcription == ""
    assert grpc_resp.speaker_id == "unknown"
    assert grpc_resp.duration == pytest.approx(http_json["duration"], abs=1e-6)
