"""API contract tests: HTTP JSON shape, tenant gates, gRPC unary + stream."""

import asyncio
import io

import grpc
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.audio import write_wav
from sentiric_stt_whisper_service_tpu.config import Settings
from sentiric_stt_whisper_service_tpu.runtime import SttEngine
from sentiric_stt_whisper_service_tpu.serving.http_server import (
    HttpServer,
    MetricsServer,
)
from sentiric_stt_whisper_service_tpu.serving.metrics import AppMetrics
from sentiric_stt_whisper_service_tpu.serving.proto import stt_pb2

SERVICE = "sentiric.stt.v1.SttWhisperService"


@pytest.fixture(scope="module")
def engine():
    s = Settings(enable_vad=False, beam_size=1, best_of=1, parallel_requests=2)
    return SttEngine(s, model_name="test", random_init=True)


@pytest.fixture(scope="module")
def wav_bytes():
    rng = np.random.default_rng(5)
    t = np.arange(16000) / 16000
    audio = (
        0.15 * np.sin(2 * np.pi * 180 * t) * (0.7 + 0.3 * np.sin(2 * np.pi * 3 * t))
        + 0.003 * rng.standard_normal(16000)
    )
    buf = io.BytesIO()
    write_wav(buf, audio.astype(np.float32), 16000)
    return buf.getvalue()


def http_fixture(engine):
    metrics = AppMetrics()
    server = HttpServer(engine, metrics, engine.settings)
    return server, metrics


async def _client(app):
    from aiohttp.test_utils import TestClient, TestServer

    client = TestClient(TestServer(app))
    await client.start_server()
    return client


# ---------------------------------------------------------------- HTTP


def test_health(engine):
    async def run():
        server, _ = http_fixture(engine)
        client = await _client(server.app)
        try:
            resp = await client.get("/health")
            assert resp.status == 200
            data = await resp.json()
            assert data["status"] == "healthy"
            assert data["model_ready"] is True
            assert data["service"] == "sentiric-stt-whisper-service"
            assert data["api_compatibility"] == "openai-whisper"
        finally:
            await client.close()

    asyncio.run(run())


def test_transcribe_requires_tenant(engine, wav_bytes):
    async def run():
        import aiohttp

        server, _ = http_fixture(engine)
        client = await _client(server.app)
        try:
            form = aiohttp.FormData()
            form.add_field("file", wav_bytes, filename="a.wav")
            resp = await client.post("/v1/transcribe", data=form)
            assert resp.status == 400
            assert "tenant_id" in (await resp.json())["error"]
        finally:
            await client.close()

    asyncio.run(run())


@pytest.mark.parametrize("route", ["/v1/transcribe", "/v1/audio/transcriptions"])
def test_transcribe_json_shape(engine, wav_bytes, route):
    async def run():
        import aiohttp

        server, _ = http_fixture(engine)
        client = await _client(server.app)
        try:
            form = aiohttp.FormData()
            form.add_field("file", wav_bytes, filename="a.wav")
            form.add_field("language", "en")
            form.add_field("diarization", "true")
            resp = await client.post(route, data=form, headers={"X-Tenant-ID": "t1"})
            assert resp.status == 200
            data = await resp.json()
            for key in ("text", "language", "duration", "segments", "meta"):
                assert key in data
            meta = data["meta"]
            for key in (
                "processing_time", "rtf", "input_sr", "input_channels", "tokens",
            ):
                assert key in meta
            assert meta["input_sr"] == 16000
            assert data["duration"] == pytest.approx(1.0, abs=0.01)
            for seg in data["segments"]:
                for key in (
                    "text", "start", "end", "probability", "speaker_turn_next",
                    "speaker_id", "gender", "emotion", "arousal", "valence",
                    "pitch_mean", "pitch_std", "energy_mean", "energy_std",
                    "spectral_centroid", "zero_crossing_rate", "speaker_vec",
                    "words",
                ):
                    assert key in seg
                assert len(seg["speaker_vec"]) == 8
        finally:
            await client.close()

    asyncio.run(run())


def test_no_file_400(engine):
    async def run():
        import aiohttp

        server, _ = http_fixture(engine)
        client = await _client(server.app)
        try:
            form = aiohttp.FormData()
            form.add_field("language", "en")
            resp = await client.post(
                "/v1/transcribe", data=form, headers={"X-Tenant-ID": "t"}
            )
            assert resp.status == 400
        finally:
            await client.close()

    asyncio.run(run())


def test_metrics_exposition(engine):
    async def run():
        _, metrics = http_fixture(engine)
        msrv = MetricsServer(metrics)
        client = await _client(msrv.app)
        try:
            resp = await client.get("/metrics")
            assert resp.status == 200
            body = await resp.text()
            for series in (
                "stt_requests_total",
                "stt_request_latency_seconds",
                "stt_audio_seconds_processed_total",
                "stt_tokens_generated_total",
            ):
                assert series in body
            assert resp.headers["Access-Control-Allow-Origin"] == "*"
        finally:
            await client.close()

    asyncio.run(run())


# ---------------------------------------------------------------- gRPC


@pytest.fixture(scope="module")
def grpc_addr(engine):
    from concurrent import futures

    from sentiric_stt_whisper_service_tpu.serving.grpc_server import (
        SttServicer,
        add_servicer_to_server,
    )

    metrics = AppMetrics()
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
    add_servicer_to_server(SttServicer(engine, metrics), server)
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    yield f"127.0.0.1:{port}"
    server.stop(grace=None)


def test_grpc_unary_requires_tenant(grpc_addr, wav_bytes):
    with grpc.insecure_channel(grpc_addr) as ch:
        call = ch.unary_unary(
            f"/{SERVICE}/WhisperTranscribe",
            request_serializer=stt_pb2.WhisperTranscribeRequest.SerializeToString,
            response_deserializer=stt_pb2.WhisperTranscribeResponse.FromString,
        )
        with pytest.raises(grpc.RpcError) as err:
            call(stt_pb2.WhisperTranscribeRequest(audio_data=wav_bytes), timeout=30)
        assert err.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_grpc_unary(grpc_addr, wav_bytes):
    with grpc.insecure_channel(grpc_addr) as ch:
        call = ch.unary_unary(
            f"/{SERVICE}/WhisperTranscribe",
            request_serializer=stt_pb2.WhisperTranscribeRequest.SerializeToString,
            response_deserializer=stt_pb2.WhisperTranscribeResponse.FromString,
        )
        resp = call(
            stt_pb2.WhisperTranscribeRequest(audio_data=wav_bytes, language="en"),
            metadata=(("x-tenant-id", "t1"),),
            timeout=120,
        )
        assert isinstance(resp.transcription, str)
        assert len(resp.speaker_vec) in (0, 8)
        # duration is audio-derived and filled even when every segment is
        # quality-gated out (1 s of audio in wav_bytes).
        assert resp.duration == pytest.approx(1.0, abs=0.01)


def test_grpc_stream_partials_and_eos(grpc_addr, wav_bytes):
    with grpc.insecure_channel(grpc_addr) as ch:
        call = ch.stream_stream(
            f"/{SERVICE}/WhisperTranscribeStream",
            request_serializer=stt_pb2.WhisperTranscribeStreamRequest.SerializeToString,
            response_deserializer=stt_pb2.WhisperTranscribeStreamResponse.FromString,
        )

        def reqs():
            body = wav_bytes[44:]
            step = 16000  # 0.5 s chunks
            for i in range(0, len(body), step):
                yield stt_pb2.WhisperTranscribeStreamRequest(
                    audio_chunk=body[i : i + step]
                )
            yield stt_pb2.WhisperTranscribeStreamRequest(audio_chunk=b"")

        responses = list(
            call(reqs(), metadata=(("x-tenant-id", "t1"),), timeout=300)
        )
        for r in responses:
            assert isinstance(r.is_final, bool)
            assert isinstance(r.transcription, str)


def test_grpc_unary_cancel_aborts_decode(grpc_addr, engine, wav_bytes, monkeypatch):
    """A cancelled RPC must reach the engine's abort machinery: the
    servicer wires ``should_abort`` to ``context.is_active`` (the
    reference plumbs an abort callback but its servers never set it —
    stt_engine.h:33). The spy holds the decode until cancellation
    propagates, then asserts the engine saw the abort and returned
    early (transcribe's pre-check yields [] — engine.py abort path;
    mid-decode stops are covered by tests/test_beam.py and test_gang.py)."""
    import threading
    import time

    seen = {}
    started = threading.Event()
    orig = engine.transcribe_pcm16

    def spy(pcm, sr, options, *a, **kw):
        assert options.should_abort is not None, "servicer left should_abort unset"
        started.set()
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and not options.should_abort():
            time.sleep(0.02)
        seen["abort_fired"] = options.should_abort()
        t0 = time.monotonic()
        seen["results"] = orig(pcm, sr, options, *a, **kw)
        seen["decode_s"] = time.monotonic() - t0
        return seen["results"]

    monkeypatch.setattr(engine, "transcribe_pcm16", spy)
    with grpc.insecure_channel(grpc_addr) as ch:
        call = ch.unary_unary(
            f"/{SERVICE}/WhisperTranscribe",
            request_serializer=stt_pb2.WhisperTranscribeRequest.SerializeToString,
            response_deserializer=stt_pb2.WhisperTranscribeResponse.FromString,
        )
        fut = call.future(
            stt_pb2.WhisperTranscribeRequest(audio_data=wav_bytes, language="en"),
            metadata=(("x-tenant-id", "t1"),),
        )
        assert started.wait(60), "request never reached the engine"
        fut.cancel()
        with pytest.raises((grpc.RpcError, grpc.FutureCancelledError)):
            fut.result(timeout=60)
    # give the handler thread time to run the spied decode to completion
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline and "results" not in seen:
        time.sleep(0.05)
    assert seen.get("abort_fired") is True, "cancellation never reached should_abort"
    assert seen.get("results") == [], "aborted decode still produced results"
    assert seen.get("decode_s", 99) < 5.0, "aborted decode did not return early"


def test_grpc_stream_requires_tenant(grpc_addr):
    with grpc.insecure_channel(grpc_addr) as ch:
        call = ch.stream_stream(
            f"/{SERVICE}/WhisperTranscribeStream",
            request_serializer=stt_pb2.WhisperTranscribeStreamRequest.SerializeToString,
            response_deserializer=stt_pb2.WhisperTranscribeStreamResponse.FromString,
        )
        with pytest.raises(grpc.RpcError) as err:
            list(
                call(
                    iter([stt_pb2.WhisperTranscribeStreamRequest(audio_chunk=b"ab")]),
                    timeout=30,
                )
            )
        assert err.value.code() == grpc.StatusCode.INVALID_ARGUMENT
