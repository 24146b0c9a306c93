"""Per-tick latency trace for the streaming path (debug tool).

Builds the same engine configuration as ``BENCH_MODE=streaming`` and
prints every tick's wall time plus any XLA compile events (set
JAX_LOG_COMPILES=1) so serve-time compiles that escaped warmup are
attributable to a specific tick/shape class (VERDICT r4: first-token
budget).
"""

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


def main():
    model = os.environ.get("BENCH_MODEL", "large-v3")
    seconds = float(os.environ.get("BENCH_SECONDS", "10"))
    s = Settings(
        enable_vad=False, beam_size=1, best_of=1, parallel_requests=1,
        compute_type=os.environ.get("BENCH_COMPUTE", "int4"),
        audio_ctx=int(os.environ.get("STT_WHISPER_SERVICE_AUDIO_CTX", "0")),
        stream_incremental=True,
        quality_gate="off", logprob_threshold=-1e9,
        no_speech_threshold=2.0, min_segment_avg_prob=0.0,
    )
    eng = SttEngine(s, model_name=model, random_init=True)
    t0 = time.perf_counter()
    wt = eng.warmup()
    print(f"warmup: {wt:.1f}s (wall {time.perf_counter()-t0:.1f}s)", flush=True)

    rng = np.random.default_rng(0)
    chunk = s.stream_buffer_samples
    for sess_i in range(2):
        audio = (rng.standard_normal(int(seconds * 16000)) * 3276).astype(
            np.int16
        )
        sess = StreamingSession(eng, RequestOptions(language="en"),
                                incremental=True)
        for i in range(0, len(audio), chunk):
            t0 = time.perf_counter()
            events = sess.feed(audio[i : i + chunk].tobytes())
            dt = time.perf_counter() - t0
            if dt > 1e-4:
                kinds = "".join("F" if e.is_final else "p" for e in events)
                print(
                    f"s{sess_i} tick@{i/16000:.1f}s: {dt*1e3:8.1f} ms "
                    f"events={kinds or '-'}",
                    flush=True,
                )
        t0 = time.perf_counter()
        sess.feed(b"")
        print(f"s{sess_i} EOS: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
