"""gRPC health service protocol test (hand-rolled grpc.health.v1)."""

import grpc
import pytest

from sentiric_stt_whisper_service_tpu.serving.health import (
    NOT_SERVING,
    SERVING,
    add_health_to_server,
)


@pytest.fixture()
def health_server():
    from concurrent import futures

    state = {"ready": True}
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=2))
    add_health_to_server(server, lambda: state["ready"])
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    yield f"127.0.0.1:{port}", state
    server.stop(grace=None)


def _check(addr, service=""):
    with grpc.insecure_channel(addr) as ch:
        call = ch.unary_unary(
            "/grpc.health.v1.Health/Check",
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        req = b""
        if service:
            body = service.encode()
            req = bytes([0x0A, len(body)]) + body
        return call(req, timeout=10)


def test_serving(health_server):
    addr, state = health_server
    assert _check(addr) == bytes([0x08, SERVING])
    assert _check(addr, "sentiric.stt.v1.SttWhisperService") == bytes([0x08, SERVING])


def test_not_serving(health_server):
    addr, state = health_server
    state["ready"] = False
    assert _check(addr) == bytes([0x08, NOT_SERVING])
