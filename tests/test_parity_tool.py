"""CI smoke for the parity runbook (tools/parity_check.py + `make parity`).

Zero-egress CI has no real checkpoints, so this drives the harness with
--random-init on a synthetic WAV: argument plumbing, WAV ingest, engine
wiring, WER math, and JSON output must all work so the first
weights-capable machine verifies real-transcript parity in minutes
(tests/fixtures/parity/README.md)."""

import io
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from sentiric_stt_whisper_service_tpu.audio import write_wav

import parity_check


def test_wer_math():
    assert parity_check.wer(["a", "b", "c"], ["a", "b", "c"]) == 0.0
    assert parity_check.wer(["a", "b"], ["a", "x"]) == 0.5
    assert parity_check.wer([], []) == 0.0
    assert parity_check.wer([], ["x"]) == 1.0
    n = parity_check.normalize("And so, My Fellow Americans!")
    assert n == ["and", "so", "my", "fellow", "americans"]


def test_parity_tool_random_init(tmp_path):
    rng = np.random.default_rng(3)
    t = np.arange(16000) / 16000.0
    audio = (0.2 * np.sin(2 * np.pi * 170 * t)).astype(np.float32)
    audio += 0.004 * rng.standard_normal(16000).astype(np.float32)
    wav = tmp_path / "tone.wav"
    buf = io.BytesIO()
    write_wav(buf, audio, 16000)
    wav.write_bytes(buf.getvalue())

    refs = tmp_path / "refs.json"
    refs.write_text(json.dumps({"tone.wav": "hello world"}))
    out = tmp_path / "out.json"

    rc = parity_check.main(
        [
            str(wav),
            "--random-init",
            "--model-size", "test",
            "--refs", str(refs),
            "--json", str(out),
        ]
    )
    assert rc == 0
    data = json.loads(out.read_text())
    assert len(data["files"]) == 1
    row = data["files"][0]
    # Random weights transcribe garbage (or nothing): the harness must
    # still report duration/rtf and a WER against the basename-keyed ref.
    assert row["duration_s"] == 1.0
    assert row["rtf"] > 0
    assert "wer" in row and 0.0 <= row["wer"]
    assert "corpus_wer" in data
