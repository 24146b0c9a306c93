"""Streaming transcription sessions.

The reference's streaming design re-decodes the ENTIRE accumulated buffer
every 500 ms and only finalizes on EOS or the 30 s cap
(/root/reference/src/grpc_server.cpp:222-298; SURVEY.md §3.3 "the TPU
design can beat this"). :class:`StreamingSession` keeps that wire protocol
(partials, finals, EOS-on-empty-chunk, 30 s force-final) and adds an
opt-in **incremental mode**: segments that decode identically in two
consecutive partial passes and end safely before the buffer head are
committed as finals immediately, the audio buffer is trimmed to the
commit point, and the committed text is carried as the decoder prompt —
so per-tick work stays bounded by the uncommitted tail instead of growing
with the whole utterance (LocalAgreement-style policy).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

import numpy as np

from ..config import Settings
from ..native import StreamBuffer
from .engine import RequestOptions, SttEngine, TranscriptionResult

MAX_BUFFER_SAMPLES = 16000 * 30  # hard cap (grpc_server.cpp:132)
COMMIT_GUARD_CS = 100  # don't commit segments ending within 1 s of the head
# Partial-tick decode budget: sampled tokens per second of buffered audio
# (~3× real speech density, so genuine content never truncates) plus a
# timestamp/segment margin; bucketed by the engine (TOKEN_CAP_BUCKETS).
# The cap keeps per-tick decode work proportional to the UNCOMMITTED tail
# instead of the full 224-token window budget — the difference between a
# ~1.1 s and a sub-0.5 s tick at large-v3 (docs/PERF.md).
TICK_TOKENS_PER_SECOND = 14
TICK_CAP_MIN = 32
TICK_CAP_MAX = 128
# Parity-mode (non-incremental) partial ticks re-decode the WHOLE buffer,
# so their cap only saturates at the full window budget: early short-buffer
# ticks stay cheap, a near-30 s buffer decodes uncapped.
PARITY_CAP_MAX = 224  # == models SAMPLE_LEN
# Auto-language pin policy (ADVICE r4): the first ~1 s of audio is the
# least reliable detection window, and a wrong early pin would stick for
# the rest of the utterance. Re-detect every tick (reference parity,
# grpc_server.cpp:222-228 re-decodes with auto language) until the buffer
# is LANG_PIN_MIN_S long or detection is confident, then pin and save the
# per-tick detect encoder pass.
LANG_PIN_MIN_S = 3.0
LANG_PIN_PROB = 0.8


@dataclasses.dataclass
class StreamEvent:
    result: TranscriptionResult
    is_final: bool


class StreamingSession:
    def __init__(
        self,
        engine: SttEngine,
        options: Optional[RequestOptions] = None,
        incremental: bool = False,
    ):
        self.engine = engine
        self.settings: Settings = engine.get_settings()
        self.options = options or RequestOptions()
        self.incremental = incremental
        self.buffer = StreamBuffer()
        self.last_processed = 0
        # incremental state
        self.committed_cs = 0  # absolute centiseconds already finalized
        self.trimmed_samples = 0  # samples dropped from the buffer front
        self.carried_text = ""
        self._prev_partial: list[tuple[str, int, int]] = []
        # Auto-language streams detect ONCE: the first tick's detected
        # language is pinned for the rest of the stream, so later ticks
        # skip the per-buffer detect pass (one extra encoder launch +
        # softmax pull each — the reference re-detects every 500 ms
        # re-decode, which is wasted work on a single-speaker stream).
        self._detected_lang = ""

    # ------------------------------------------------------------------
    def feed(self, chunk: bytes) -> list[StreamEvent]:
        """Feed one wire chunk; empty chunk = EOS (reference protocol)."""
        if len(chunk) == 0:
            return self.finalize()
        self.buffer.append(chunk)
        if self.buffer.size - self.last_processed < self.settings.stream_buffer_samples:
            return []
        return self._tick()

    def finalize(self) -> list[StreamEvent]:
        """EOS: decode what's left and emit it as finals; reset."""
        events: list[StreamEvent] = []
        pcm = self.buffer.read()
        if pcm.size:
            for res in self._transcribe(pcm):
                if res.text:
                    events.append(StreamEvent(self._offset(res), True))
        self.buffer.clear()
        self.last_processed = 0
        self._prev_partial = []
        if self.incremental:
            self.trimmed_samples = 0
            self.committed_cs = 0
            self.carried_text = ""
        self._detected_lang = ""  # next utterance re-detects (ref parity)
        return events

    # ------------------------------------------------------------------
    def _transcribe(
        self, pcm: np.ndarray, partial: bool = False
    ) -> list[TranscriptionResult]:
        opts = dataclasses.replace(
            self.options,
            prompt=self.carried_text if self.incremental else self.options.prompt,
        )
        if (self.options.language or "").strip().lower() in ("", "auto"):
            if self._detected_lang:
                opts.language = self._detected_lang  # pinned after 1st tick
        if partial:
            dur = pcm.size / 16000.0
            # Partial ticks decode greedy even under a beam default
            # (Settings.stream_greedy_partials): a stock beam-5 re-decode
            # of the whole buffer every 500 ms cannot hold the real-time
            # tick budget at large-v3, and the wire protocol already
            # marks these results as non-final. Finals (EOS finalize,
            # 30 s-cap flush) keep the configured beam quality.
            if self.settings.stream_greedy_partials:
                eff_beam = (
                    opts.beam_size
                    if opts.beam_size > 0
                    else self.settings.beam_size
                )
                if eff_beam > 1:
                    opts.beam_size = 1
                    opts.best_of = 1
            # Bound the decode by the buffer's plausible token count
            # (~3× real speech density, so genuine content never
            # truncates). Incremental mode caps at TICK_CAP_MAX — its
            # buffer is trimmed to the uncommitted tail; parity mode
            # saturates at the full window budget instead.
            opts.max_decode_tokens = min(
                TICK_CAP_MAX if self.incremental else PARITY_CAP_MAX,
                max(TICK_CAP_MIN, int(dur * TICK_TOKENS_PER_SECOND) + 8),
            )
        if partial and self.incremental:
            # Skip the DTW alignment pass unless a segment could COMMIT
            # this tick (partials carry no word times on the wire;
            # committed finals do, and the commit precondition — the
            # previous tick's first stable segment ends ≥1 s before the
            # head — is computable before decoding). EOS finalize()
            # stays full-quality.
            buffer_cs = int(round(pcm.size / 16000.0 * 100))
            commit_candidate = bool(self._prev_partial) and (
                self._prev_partial[0][2] < buffer_cs - COMMIT_GUARD_CS
            )
            if not commit_candidate:
                opts.no_timestamps = True
        elif partial:
            # Parity-mode partials never carry word times; the 30 s-cap
            # flush below re-decodes at full quality for its finals.
            opts.no_timestamps = True
        return self.engine.transcribe_pcm16(pcm, 16000, opts)

    def _offset(self, res: TranscriptionResult) -> TranscriptionResult:
        if not self.incremental or self.trimmed_samples == 0:
            return res
        off = int(round(self.trimmed_samples / 16000 * 100))
        res = dataclasses.replace(res)
        res.t0 += off
        res.t1 += off
        for t in res.tokens:
            t.t0 += off
            t.t1 += off
        return res

    def _tick(self) -> list[StreamEvent]:
        events: list[StreamEvent] = []
        pcm = self.buffer.read()
        results = [r for r in self._transcribe(pcm, partial=True) if r.text]
        self.last_processed = self.buffer.size
        if not self._detected_lang:
            # Pin the language only once detection is trustworthy: enough
            # buffered audio or a confident softmax. Until then every
            # tick re-detects (reference parity) and can recover from an
            # early misdetection.
            dur = pcm.size / 16000.0
            for r in results:
                if r.language and r.language not in ("unknown", "auto"):
                    if (
                        dur >= LANG_PIN_MIN_S
                        or r.language_probability >= LANG_PIN_PROB
                    ):
                        self._detected_lang = r.language
                    break

        if self.incremental and results:
            buffer_cs = int(round(pcm.size / 16000 * 100))
            cur = [(r.text, r.t0, r.t1) for r in results]
            commit_n = 0
            for i, sig in enumerate(cur):
                if (
                    i < len(self._prev_partial)
                    and self._prev_partial[i] == sig
                    and sig[2] < buffer_cs - COMMIT_GUARD_CS
                ):
                    commit_n = i + 1
                else:
                    break
            if commit_n:
                commit_end_cs = cur[commit_n - 1][2]
                for r in results[:commit_n]:
                    events.append(StreamEvent(self._offset(r), True))
                    self.carried_text = (
                        self.carried_text + " " + r.text
                    ).strip()[-400:]
                # Trim the buffer to the commit point.
                cut = min(int(commit_end_cs / 100 * 16000), pcm.size)
                remainder = pcm[cut:]
                self.buffer.clear()
                if remainder.size:
                    self.buffer.append(remainder.tobytes())
                self.trimmed_samples += cut
                self.last_processed = self.buffer.size
                results = results[commit_n:]
                cur = cur[commit_n:]
                # Times of the remaining partials are still relative to the
                # pre-trim buffer; shift them.
                shift = int(round(cut / 16000 * 100))
                rebased = []
                for r in results:
                    r = dataclasses.replace(r)
                    r.t0 = max(0, r.t0 - shift)
                    r.t1 = max(0, r.t1 - shift)
                    rebased.append(r)
                results = rebased
                cur = [(r.text, r.t0, r.t1) for r in results]
            self._prev_partial = cur

        # Combined partial (reference semantics: one message, joined text,
        # last segment's affective block).
        if results:
            combined = dataclasses.replace(results[-1])
            combined.text = " ".join(r.text for r in results) + " "
            events.append(StreamEvent(self._offset(combined), False))

        # 30 s cap → force-final everything (grpc_server.cpp:274-298).
        if self.buffer.size > MAX_BUFFER_SAMPLES:
            flushed = results
            if self._partials_downgraded():
                # The tick decode was greedy/capped/unaligned; finals
                # keep the configured quality — one full decode of the
                # buffer (≈ the offline cost of this 30 s of audio, paid
                # once per cap).
                buf = self.buffer.read()
                flushed = [r for r in self._transcribe(buf) if r.text]
            for r in flushed:
                events.append(StreamEvent(self._offset(r), True))
            if self.incremental:
                self.trimmed_samples += self.buffer.size
            self.buffer.clear()
            self.last_processed = 0
            self._prev_partial = []
        return events

    def _partials_downgraded(self) -> bool:
        """True when partial ticks decode below the configured quality
        (greedy downgrade or skipped word alignment), so cap-flush
        finals need their own full-quality pass."""
        if self.settings.stream_greedy_partials:
            eff_beam = (
                self.options.beam_size
                if self.options.beam_size > 0
                else self.settings.beam_size
            )
            if eff_beam > 1:
                return True
        return not self.incremental and not self.settings.no_timestamps
