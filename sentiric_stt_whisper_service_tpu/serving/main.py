"""Service entrypoint: lifecycle parity with /root/reference/src/main.cpp.

Startup order (main.cpp:65-168): logging → settings → model provisioning →
metrics registry → engine → gRPC listener (insecure or mTLS) → HTTP +
metrics servers on their own threads → park until SIGINT/SIGTERM → ordered
graceful shutdown.
"""

from __future__ import annotations

import argparse
import asyncio
import os
import signal
import threading

from aiohttp import web

from ..config import Settings, load_settings
from ..runtime import SttEngine
from .grpc_server import build_server
from .http_server import HttpServer, MetricsServer
from .metrics import AppMetrics
from .suts_logging import setup_logging, suts_error, suts_info


def _run_aiohttp_in_thread(app: web.Application, host: str, port: int, name: str):
    """Run an aiohttp app on a dedicated thread with its own event loop."""
    loop = asyncio.new_event_loop()

    async def _start():
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        suts_info(f"{name}_READY", "", "", "", "%s listening on %s:%d", name, host, port)

    def _thread():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(_start())
        loop.run_forever()

    t = threading.Thread(target=_thread, daemon=True, name=name)
    t.start()
    return loop, t


def serve(settings: Settings | None = None, random_init: bool = False, block=True):
    settings = settings or load_settings()
    setup_logging(settings.log_level)
    suts_info("SERVICE_STARTING", "", "", "", "Starting TPU STT service")

    # Multi-host (DCN) leg, env-gated (SURVEY.md §5.8): must run BEFORE
    # any backend touch so the engine's MESH_SHAPE mesh can span the
    # processes' global device list.
    try:
        from ..parallel.distributed import maybe_initialize_distributed

        if maybe_initialize_distributed():
            suts_info(
                "DISTRIBUTED_READY", "", "", "",
                "jax.distributed multi-host runtime initialized",
            )
    except Exception as e:  # noqa: BLE001 — refuse to serve half a cluster
        suts_error("DISTRIBUTED_INIT_FAILED", "", "", "", "%s", e)
        raise

    if not random_init:
        try:
            from ..checkpoint import ModelManager

            ModelManager.ensure_model(settings)
        except Exception as e:  # pragma: no cover - depends on network
            suts_error("MODEL_PROVISION_FAILED", "", "", "", "%s", e)
            raise
        if settings.enable_vad:
            # Best-effort: the built-in energy VAD covers the gate when the
            # Silero checkpoint can't be provisioned (main.cpp:87-89).
            try:
                from ..checkpoint import ModelManager as _MM

                vad_path = _MM.ensure_vad_model(settings)
                from ..models.silero_vad import SileroVad
                from ..runtime.vad import set_vad_model

                if vad_path:
                    try:
                        model = SileroVad.from_ggml(str(vad_path))
                        set_vad_model(model, frame_ms=model.frame_ms)
                        suts_info(
                            "VAD_MODEL_READY", "", "", "",
                            "Silero VAD loaded from %s", vad_path,
                        )
                    except Exception as parse_err:  # noqa: BLE001
                        # LOUD fallback: gating behavior changes when the
                        # energy VAD substitutes for Silero (different
                        # probability model); operators must see why.
                        suts_error(
                            "VAD_FALLBACK_ENERGY", "", "", "",
                            "Silero checkpoint %s failed to parse (%s); "
                            "serving with the energy VAD — gating behavior "
                            "differs from the reference",
                            vad_path, parse_err,
                        )
                else:
                    suts_error(
                        "VAD_FALLBACK_ENERGY", "", "", "",
                        "No Silero checkpoint available; serving with the "
                        "energy VAD",
                    )
            except Exception as e:
                suts_error(
                    "VAD_MODEL_PROVISION_FAILED", "", "", "",
                    "%s (continuing with energy VAD)", e,
                )

    metrics = AppMetrics()
    engine = SttEngine(settings, random_init=random_init)
    if os.environ.get("STT_WHISPER_SERVICE_WARMUP", "true").lower() in ("true", "1"):
        suts_info("WARMUP_START", "", "", "", "Compile-warming the decode path")
        dt = engine.warmup()
        suts_info("WARMUP_DONE", "", "", "", "Warmup finished in %.1fs", dt)

    grpc_server = build_server(engine, metrics, settings)
    grpc_server.start()
    suts_info(
        "GRPC_SERVER_READY", "", "", "",
        "gRPC server listening on %s:%d", settings.host, settings.grpc_port,
    )

    http = HttpServer(engine, metrics, settings)
    http_loop, _ = _run_aiohttp_in_thread(
        http.app, settings.host, settings.http_port, "HTTP_SERVER"
    )
    msrv = MetricsServer(metrics)
    metrics_loop, _ = _run_aiohttp_in_thread(
        msrv.app, settings.host, settings.metrics_port, "METRICS_SERVER"
    )

    stop_event = threading.Event()

    def _signal_handler(signum, frame):
        suts_info("SHUTDOWN_SIGNAL", "", "", "", "Signal %d received", signum)
        stop_event.set()

    if block:
        signal.signal(signal.SIGINT, _signal_handler)
        signal.signal(signal.SIGTERM, _signal_handler)
        suts_info("SERVICE_READY", "", "", "", "Service fully up")
        stop_event.wait()
        suts_info("SHUTDOWN_BEGIN", "", "", "", "Ordered shutdown starting")
        grpc_server.stop(grace=5).wait(10)
        for loop in (http_loop, metrics_loop):
            loop.call_soon_threadsafe(loop.stop)
        engine.shutdown()
        suts_info("SHUTDOWN_COMPLETE", "", "", "", "Goodbye")
        return None
    return engine, grpc_server, (http_loop, metrics_loop), stop_event


def main():
    ap = argparse.ArgumentParser(description="TPU-native Sentiric STT service")
    ap.add_argument(
        "--random-init", action="store_true",
        help="skip checkpoint loading; random weights (dev/testing)",
    )
    args = ap.parse_args()
    serve(random_init=args.random_init)


if __name__ == "__main__":
    main()
