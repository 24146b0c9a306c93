"""HTTP API + Studio host + metrics server (aiohttp).

Route and JSON parity with /root/reference/src/http_server.cpp:
  * ``GET /health`` → {status, model_ready, service, version,
    api_compatibility} with 200/503 (:64-74)
  * ``POST /v1/transcribe`` ≡ ``POST /v1/audio/transcriptions``
    (OpenAI-compatible): multipart fields file/language/prompt/temperature/
    beam_size/translate/diarization/prosody_lpf_alpha/prosody_pitch_gate
    (:105-153); tenant-id gate via headers (:81-97); response JSON with
    text/language/duration/segments[...affective block...]/meta{rtf,...}
    (:170-225)
  * Studio static files mounted at ``/`` (:59)
  * ``GET /metrics`` on its own port with CORS (:23-41)

Blocking engine work runs in a thread pool so streams/requests overlap —
the engine's admission semaphore is the concurrency gate, like the
reference's state pool behind its httplib worker threads.
"""

from __future__ import annotations

import asyncio
import time
from pathlib import Path
from typing import Optional

from aiohttp import web

from ..audio import parse_wav_robust
from ..config import Settings
from ..prosody.extractor import ProsodyOptions
from ..runtime import EngineBusyException, RequestOptions, SttEngine
from .metrics import AppMetrics
from .suts_logging import APP_VERSION, suts_error, suts_info

CORS = {"Access-Control-Allow-Origin": "*"}


def _json(data, status=200):
    return web.json_response(data, status=status, headers=CORS)


class HttpServer:
    def __init__(
        self,
        engine: SttEngine,
        metrics: AppMetrics,
        settings: Settings,
        studio_dir: Optional[str] = None,
    ):
        self.engine = engine
        self.metrics = metrics
        self.settings = settings
        self.app = web.Application(client_max_size=512 * 1024 * 1024)
        self.app.router.add_get("/health", self.health)
        self.app.router.add_post("/v1/transcribe", self.transcribe)
        self.app.router.add_post("/v1/audio/transcriptions", self.transcribe)
        self.app.router.add_post("/debug/profile", self.profile)
        studio = Path(studio_dir or Path(__file__).resolve().parents[2] / "studio")
        if studio.is_dir():
            self.app.router.add_get("/", self._index(studio))
            self.app.router.add_static("/", str(studio), show_index=False)

    @staticmethod
    def _index(studio: Path):
        async def handler(request):
            return web.FileResponse(studio / "index.html")

        return handler

    async def health(self, request: web.Request):
        ready = self.engine.is_ready()
        return _json(
            {
                "status": "healthy" if ready else "unhealthy",
                "model_ready": ready,
                "service": "sentiric-stt-whisper-service",
                "version": APP_VERSION,
                "api_compatibility": "openai-whisper",
            },
            status=200 if ready else 503,
        )

    async def profile(self, request: web.Request):
        """Capture a JAX device trace (SURVEY.md §5.1 TPU equivalent of the
        reference's request-level profiling): POST /debug/profile?seconds=2
        writes a TensorBoard-compatible trace and returns its path."""
        import tempfile

        import jax as _jax

        try:
            seconds = min(30.0, float(request.query.get("seconds", "2")))
        except ValueError:
            return _json({"error": "bad seconds"}, 400)
        out_dir = tempfile.mkdtemp(prefix="sstw_trace_")
        _jax.profiler.start_trace(out_dir)
        try:
            await asyncio.sleep(seconds)
        finally:
            _jax.profiler.stop_trace()
        return _json({"trace_dir": out_dir, "seconds": seconds})

    async def transcribe(self, request: web.Request):
        self.metrics.requests_total.inc()
        trace_id = request.headers.get("x-trace-id", "unknown")
        span_id = request.headers.get("x-span-id", "unknown")
        tenant_id = request.headers.get("x-tenant-id", "unknown")

        if tenant_id == "unknown":
            suts_error(
                "MISSING_TENANT_ID", trace_id, span_id, tenant_id,
                "Tenant ID is missing in HTTP headers. Request rejected.",
            )
            return _json({"error": "tenant_id header is strictly required"}, 400)
        if not self.engine.is_ready():
            return _json({"error": "Model not ready"}, 503)

        fields: dict[str, bytes] = {}
        try:
            reader = await request.multipart()
            async for part in reader:
                if part.name:
                    fields[part.name] = await part.read(decode=False)
        except (AssertionError, ValueError):
            return _json({"error": "No file uploaded."}, 400)
        if "file" not in fields:
            return _json({"error": "No file uploaded."}, 400)

        opts = RequestOptions()
        if "language" in fields:
            opts.language = fields["language"].decode(errors="replace")
        if "prompt" in fields:
            opts.prompt = fields["prompt"].decode(errors="replace")
        for name, cast, attr in (
            ("temperature", float, "temperature"),
            ("beam_size", int, "beam_size"),
            ("audio_ctx", int, "audio_ctx"),
        ):
            if name in fields:
                try:
                    setattr(opts, attr, cast(fields[name].decode()))
                except ValueError:
                    pass
        for name, attr in (("translate", "translate"), ("diarization", "enable_diarization")):
            if name in fields:
                val = fields[name].decode(errors="replace")
                setattr(opts, attr, val in ("true", "1"))
        p_opts = ProsodyOptions()
        try:
            if "prosody_lpf_alpha" in fields:
                p_opts = ProsodyOptions(
                    lpf_alpha=float(fields["prosody_lpf_alpha"].decode()),
                    gender_threshold=p_opts.gender_threshold,
                )
        except ValueError:
            pass
        try:
            if "prosody_pitch_gate" in fields:
                p_opts = ProsodyOptions(
                    lpf_alpha=p_opts.lpf_alpha,
                    gender_threshold=float(fields["prosody_pitch_gate"].decode()),
                )
        except ValueError:
            pass
        opts.prosody_opts = p_opts
        # Abort the decode when the HTTP client disconnects: aiohttp
        # cancels the handler task, but the transcription runs in an
        # executor thread that would otherwise finish the full decode.
        opts.should_abort = (
            lambda: request.transport is None or request.transport.is_closing()
        )

        suts_info(
            "HTTP_TRANSCRIBE_REQUEST", trace_id, span_id, tenant_id,
            "Processing: %db | Lang: %s | LPF: %.3f",
            len(fields["file"]), opts.language, opts.prosody_opts.lpf_alpha,
        )

        try:
            start = time.perf_counter()
            audio = await asyncio.get_running_loop().run_in_executor(
                None, parse_wav_robust, bytes(fields["file"])
            )
            if audio.pcm_data.size == 0:
                raise ValueError("Parsed WAV data is empty.")
            results = await asyncio.get_running_loop().run_in_executor(
                None,
                lambda: self.engine.transcribe_pcm16(
                    audio.pcm_data, audio.sample_rate, opts
                ),
            )
            processing_time = time.perf_counter() - start

            full_text = ""
            detected_lang = "unknown"
            segments = []
            total_tokens = 0
            for r in results:
                full_text += r.text
                detected_lang = r.language
                total_tokens += r.token_count
                aff = r.affective
                segments.append(
                    {
                        "text": r.text,
                        "start": r.t0 / 100.0,
                        "end": r.t1 / 100.0,
                        "probability": r.prob,
                        "speaker_turn_next": r.speaker_turn_next,
                        "speaker_id": r.speaker_id,
                        "gender": aff.gender_proxy,
                        "emotion": aff.emotion_proxy,
                        "arousal": aff.arousal,
                        "valence": aff.valence,
                        "pitch_mean": aff.pitch_mean,
                        "pitch_std": aff.pitch_std,
                        "energy_mean": aff.energy_mean,
                        "energy_std": aff.energy_std,
                        "spectral_centroid": aff.spectral_centroid,
                        "zero_crossing_rate": aff.zero_crossing_rate,
                        "speaker_vec": [float(x) for x in aff.speaker_vec],
                        "words": [
                            {
                                "word": t.text,
                                "start": t.t0 / 100.0,
                                "end": t.t1 / 100.0,
                                "probability": t.p,
                            }
                            for t in r.tokens
                        ],
                    }
                )
            duration = audio.pcm_data.size / float(audio.sample_rate)
            self.metrics.audio_seconds_processed_total.inc(duration)
            self.metrics.request_latency.observe(processing_time)
            self.metrics.tokens_generated_total.inc(total_tokens)
            return _json(
                {
                    "text": full_text,
                    "language": detected_lang,
                    "duration": duration,
                    "segments": segments,
                    "meta": {
                        "processing_time": processing_time,
                        "rtf": processing_time / (duration if duration > 0 else 1.0),
                        "input_sr": audio.sample_rate,
                        "input_channels": audio.channels,
                        "tokens": total_tokens,
                    },
                }
            )
        except EngineBusyException as e:
            suts_error("ENGINE_BUSY", trace_id, span_id, tenant_id, str(e))
            return _json({"error": str(e)}, 503)
        except Exception as e:  # noqa: BLE001 — reference returns 500 w/ message
            suts_error(
                "TRANSCRIPTION_ERROR", trace_id, span_id, tenant_id,
                "Transcription error: %s", e,
            )
            return _json({"error": str(e)}, 500)


class MetricsServer:
    """Prometheus exposition on its own port with CORS (reference :20-50)."""

    def __init__(self, metrics: AppMetrics):
        self.metrics = metrics
        self.app = web.Application()
        self.app.router.add_get("/metrics", self.expose)
        self.app.router.add_options("/metrics", self.options)

    async def expose(self, request):
        return web.Response(
            body=self.metrics.expose(),
            content_type="text/plain",
            charset="utf-8",
            headers={
                **CORS,
                "Access-Control-Allow-Methods": "GET, OPTIONS",
                "Access-Control-Allow-Headers": "Content-Type",
            },
        )

    async def options(self, request):
        return web.Response(
            status=204,
            headers={
                **CORS,
                "Access-Control-Allow-Methods": "GET, OPTIONS",
                "Access-Control-Allow-Headers": "Content-Type",
            },
        )
