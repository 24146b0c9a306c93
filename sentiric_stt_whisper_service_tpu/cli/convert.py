"""Checkpoint conversion tool.

``python -m sentiric_stt_whisper_service_tpu.cli.convert <in> <out>``

Converts between the formats the framework loads (SURVEY.md §5.4):
  * HF safetensors → whisper.cpp GGML .bin (f32 or f16), so existing
    whisper.cpp deployments can consume fine-tuned HF checkpoints;
  * GGML .bin → safetensors (dequantizing quantized variants to f32).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Whisper checkpoint converter")
    ap.add_argument("input", help="input checkpoint (.safetensors or .bin)")
    ap.add_argument("output", help="output checkpoint (.bin or .safetensors)")
    ap.add_argument(
        "--ftype", choices=["f32", "f16"], default="f16",
        help="GGML tensor type when writing .bin",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..checkpoint.ggml import load_ggml, write_ggml
    from ..checkpoint.safetensors_io import load_safetensors
    from ..tokenizer import fallback_tokenizer

    if args.input.endswith(".safetensors") and args.output.endswith(".bin"):
        cfg, params = load_safetensors(args.input, dtype=jnp.float32)
        # GGML carries its vocab; without sibling files, emit byte-level
        # ranks (exact ids, lossy only for display of merged pieces).
        tok = fallback_tokenizer(cfg.n_vocab)
        vocab = [
            bytes(tokb)
            for tokb, _ in sorted(tok.ranks.items(), key=lambda kv: kv[1])
        ]
        with open(args.output, "wb") as f:
            write_ggml(
                f, cfg, params, vocab, ftype=1 if args.ftype == "f16" else 0
            )
        print(f"wrote GGML {args.ftype}: {args.output}")
        return 0

    if args.input.endswith(".bin") and args.output.endswith(".safetensors"):
        from safetensors.numpy import save_file

        cfg, params, _, _ = load_ggml(args.input, dtype=jnp.float32)
        flat = {}

        def walk(prefix, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(f"{prefix}.{k}" if prefix else k, v)
            else:
                flat[prefix] = np.asarray(node)

        walk("", params)
        save_file(flat, args.output)
        print(f"wrote safetensors ({len(flat)} tensors): {args.output}")
        return 0

    print("unsupported conversion (need .safetensors->.bin or .bin->.safetensors)",
          file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
