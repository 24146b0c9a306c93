#!/usr/bin/env python
"""WER / transcript parity harness.

Usage:
  python tools/parity_check.py --model-dir /models --model-size tiny \
      audio1.wav audio2.wav --refs refs.txt [--beam 5] [--json out.json]

Transcribes each WAV with the engine and, when reference transcripts are
given (one line per file, or a JSON {path: text} map), reports per-file
and corpus WER. This is the measurement half of the BASELINE.md target
"WER delta vs reference greedy and beam decode ≈ 0"; run it wherever real
checkpoints are available (zero-egress CI uses random weights, where WER
is meaningless — the harness is the deliverable).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def normalize(text: str) -> list[str]:
    text = text.lower()
    text = re.sub(r"[^\w\s']", " ", text, flags=re.UNICODE)
    return text.split()


def wer(ref: list[str], hyp: list[str]) -> float:
    """Word error rate via edit distance."""
    if not ref:
        return 0.0 if not hyp else 1.0
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        cur = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, 1):
            cur[j] = min(
                prev[j] + 1,  # deletion
                cur[j - 1] + 1,  # insertion
                prev[j - 1] + (r != h),  # substitution
            )
        prev = cur
    return prev[-1] / len(ref)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("wavs", nargs="+")
    ap.add_argument("--model-dir", default="/models")
    ap.add_argument("--model-size", default="tiny")
    ap.add_argument("--refs", help="reference transcripts (txt lines or json map)")
    ap.add_argument("--beam", type=int, default=1)
    ap.add_argument("--language", default="en")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--json", dest="json_out")
    ap.add_argument(
        "--ensure-model",
        action="store_true",
        help="download the GGML checkpoint first (checkpoint.manager; "
        "fails with a clear error on zero-egress machines)",
    )
    args = ap.parse_args(argv)

    from sentiric_stt_whisper_service_tpu.audio import parse_wav_robust
    from sentiric_stt_whisper_service_tpu.config import Settings
    from sentiric_stt_whisper_service_tpu.runtime import (
        PerformanceMetrics,
        RequestOptions,
        SttEngine,
    )

    settings = Settings(
        model_dir=args.model_dir,
        model_size=args.model_size,
        model_filename=f"ggml-{args.model_size}.bin",
        beam_size=args.beam,
        enable_vad=False,
    )
    if args.ensure_model and not args.random_init:
        from sentiric_stt_whisper_service_tpu.checkpoint.manager import (
            ModelManager,
        )

        try:
            ModelManager.ensure_model(settings)
        except Exception as e:  # noqa: BLE001 — actionable message
            print(
                f"error: could not provision ggml-{args.model_size}.bin "
                f"into {args.model_dir}: {e}\n"
                "On zero-egress machines, place the checkpoint there "
                "manually (huggingface.co/ggerganov/whisper.cpp) and rerun "
                "without --ensure-model.",
                file=sys.stderr,
            )
            return 2
    engine = SttEngine(settings, random_init=args.random_init)

    refs: dict[str, str] = {}
    if args.refs:
        with open(args.refs, encoding="utf-8") as f:
            if args.refs.endswith(".json"):
                refs = json.load(f)
            else:
                for path, line in zip(args.wavs, f):
                    refs[path] = line.strip()

    rows = []
    total_ref_words = 0
    total_errors = 0.0
    for path in args.wavs:
        with open(path, "rb") as f:
            audio = parse_wav_robust(f.read())
        m = PerformanceMetrics()
        res = engine.transcribe_pcm16(
            audio.pcm_data, audio.sample_rate,
            RequestOptions(language=args.language, beam_size=args.beam), m,
        )
        hyp = " ".join(r.text for r in res).strip()
        dur = audio.pcm_data.size / audio.sample_rate
        row = {
            "file": path,
            "hypothesis": hyp,
            "duration_s": round(dur, 2),
            "rtf": round(m.processing_time_ms / 1000.0 / max(dur, 1e-9), 4),
            "tokens": m.token_count,
        }
        # refs key: full path, or basename (the fixtures refs.json form).
        ref_text = refs.get(path, refs.get(os.path.basename(path)))
        if ref_text is not None:
            r_words = normalize(ref_text)
            h_words = normalize(hyp)
            row["wer"] = round(wer(r_words, h_words), 4)
            total_ref_words += len(r_words)
            total_errors += row["wer"] * len(r_words)
        rows.append(row)
        print(f"{path}: rtf={row['rtf']}" + (f" wer={row.get('wer')}" if "wer" in row else ""))
        print(f"  {hyp[:160]!r}")

    summary = {"files": rows}
    if total_ref_words:
        summary["corpus_wer"] = round(total_errors / total_ref_words, 4)
        print(f"\ncorpus WER: {summary['corpus_wer']}")
    if args.json_out:
        with open(args.json_out, "w", encoding="utf-8") as f:
            json.dump(summary, f, indent=2, ensure_ascii=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
