"""Streaming latency benchmark (real TPU): p50/p95 per-tick partial latency
and first-partial latency for a StreamingSession fed 500 ms chunks in
simulated real time — the reference's streaming cadence
(/root/reference/src/grpc_server.cpp:222; SURVEY.md §6 names p50
first-token latency as the streaming metric).

Prints one JSON line per metric. BENCH_MODEL=test for a quick run.

Caveat: with random weights decodes rarely hit EOT, so every tick pays a
full 224-token decode — the numbers are an upper bound; real checkpoints
terminate after a handful of tokens per 500 ms buffer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sentiric_stt_whisper_service_tpu.config import Settings
from sentiric_stt_whisper_service_tpu.runtime.engine import (
    RequestOptions,
    SttEngine,
)
from sentiric_stt_whisper_service_tpu.runtime.streaming import StreamingSession

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
SECONDS = float(os.environ.get("BENCH_SECONDS", "12"))
INCREMENTAL = os.environ.get("BENCH_INCREMENTAL", "0") == "1"


def main():
    s = Settings(enable_vad=False, beam_size=1, best_of=1,
                 parallel_requests=1, compute_type="int8",
                 audio_ctx=int(os.environ.get(
                     "STT_WHISPER_SERVICE_AUDIO_CTX", "0")))
    eng = SttEngine(s, model_name=MODEL, random_init=True)
    eng.warmup()

    rng = np.random.default_rng(0)
    sr = 16000
    audio = (rng.standard_normal(int(SECONDS * sr)) * 3276).astype(np.int16)
    chunk_samples = s.stream_buffer_samples  # 500 ms

    sess = StreamingSession(eng, RequestOptions(language="en"),
                            incremental=INCREMENTAL)
    tick_lat = []
    first_partial = None
    t_start = time.perf_counter()
    for i in range(0, len(audio), chunk_samples):
        chunk = audio[i : i + chunk_samples].tobytes()
        t0 = time.perf_counter()
        events = sess.feed(chunk)
        dt = time.perf_counter() - t0
        if dt > 1e-4:  # a decode tick actually ran
            tick_lat.append(dt)
        if first_partial is None and events:
            first_partial = time.perf_counter() - t_start
    t0 = time.perf_counter()
    sess.feed(b"")
    final_lat = time.perf_counter() - t0

    lat = np.asarray(sorted(tick_lat))
    out = {
        "first_partial_s": first_partial,
        "tick_p50_ms": float(np.percentile(lat, 50) * 1e3) if lat.size else None,
        "tick_p95_ms": float(np.percentile(lat, 95) * 1e3) if lat.size else None,
        "finalize_ms": final_lat * 1e3,
        "ticks": int(lat.size),
    }
    for k, v in out.items():
        print(json.dumps({
            "metric": f"stream_{MODEL}_{'inc' if INCREMENTAL else 'ref'}_{k}",
            "value": round(v, 3) if isinstance(v, float) else v,
        }), flush=True)


if __name__ == "__main__":
    main()
