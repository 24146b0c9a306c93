"""Checkpoint loading: GGML .bin (whisper.cpp) and safetensors (HF)."""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp

from ..config import Settings
from ..models.whisper import WhisperConfig
from ..tokenizer import WhisperTokenizer, fallback_tokenizer
from .ggml import load_ggml, write_ggml  # noqa: F401
from .manager import ModelManager  # noqa: F401
from .safetensors_io import load_safetensors  # noqa: F401


def load_checkpoint(settings: Settings, cfg: WhisperConfig | None = None):
    """Resolve + load the configured checkpoint → (params, tokenizer).

    GGML files carry their vocab (→ exact tokenizer); safetensors fall back
    to a sibling vocab.json or the byte-fallback tokenizer.
    """
    path = Path(settings.model_dir) / settings.model_filename
    if not path.exists():
        ModelManager.ensure_model(settings)
    dtype = jnp.bfloat16 if settings.dtype == "bfloat16" else jnp.float32
    if path.suffix == ".safetensors":
        file_cfg, params = load_safetensors(str(path), dtype)
        tok = _sibling_tokenizer(path, file_cfg)
        return params, tok
    file_cfg, params, vocab_tokens, n_vocab = load_ggml(str(path), dtype)
    if vocab_tokens:
        try:
            tok = WhisperTokenizer.from_ggml_vocab(vocab_tokens, n_vocab)
        except Exception:
            tok = fallback_tokenizer(n_vocab)
    else:
        tok = fallback_tokenizer(n_vocab)
    return params, tok


def _sibling_tokenizer(path: Path, cfg: WhisperConfig):
    vocab_json = path.parent / "vocab.json"
    if vocab_json.exists():
        return WhisperTokenizer.from_hf_files(str(vocab_json), cfg.num_languages)
    return fallback_tokenizer(cfg.n_vocab)


# ---------------------------------------------------------------------------
# Orbax save/restore (fine-tuning state; SURVEY.md §5.4 — the reference is
# inference-only, training checkpoints are a framework addition)
# ---------------------------------------------------------------------------


def save_params(path: str, params) -> None:
    """Save a param pytree with orbax (async-safe, atomic)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).resolve(), params, force=True)


def restore_params(path: str, like=None):
    """Restore a param pytree saved by :func:`save_params`. ``like`` (an
    abstract or concrete pytree) restores with matching shardings/dtypes."""
    import jax
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like
            )
            return ckptr.restore(Path(path).resolve(), abstract)
        return ckptr.restore(Path(path).resolve())
