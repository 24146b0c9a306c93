"""Safetensors / HF-transformers Whisper checkpoint loader.

Complements the GGML path (SURVEY.md §5.4: "GGML-bin and/or safetensors →
jax pytree"). Accepts HF ``model.safetensors`` with
``model.encoder.layers.N.*`` naming (WhisperForConditionalGeneration) or
the bare ``encoder.layers.N.*`` variant (WhisperModel).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper import WhisperConfig


def _strip_prefix(name: str) -> str:
    for p in ("model.", "whisper."):
        if name.startswith(p):
            name = name[len(p) :]
    return name


def params_from_hf_state(
    state: dict[str, np.ndarray], dtype=jnp.bfloat16
) -> tuple[WhisperConfig, Any]:
    """Map an HF whisper state dict → (config, params)."""
    t = {_strip_prefix(k): v for k, v in state.items()}

    def dims():
        n_mels = t["encoder.conv1.weight"].shape[1]
        d_a = t["encoder.conv1.weight"].shape[0]
        n_vocab, d_t = t["decoder.embed_tokens.weight"].shape
        n_audio_layer = 1 + max(
            int(k.split(".")[2]) for k in t if k.startswith("encoder.layers.")
        )
        n_text_layer = 1 + max(
            int(k.split(".")[2]) for k in t if k.startswith("decoder.layers.")
        )
        n_audio_ctx = t["encoder.embed_positions.weight"].shape[0]
        n_text_ctx = t["decoder.embed_positions.weight"].shape[0]
        # Heads follow the official family ratios (d/64).
        return WhisperConfig(
            n_mels=n_mels, n_vocab=n_vocab,
            n_audio_ctx=n_audio_ctx, n_audio_state=d_a,
            n_audio_head=d_a // 64, n_audio_layer=n_audio_layer,
            n_text_ctx=n_text_ctx, n_text_state=d_t,
            n_text_head=d_t // 64, n_text_layer=n_text_layer,
            dtype=dtype,
        )

    cfg = dims()

    def lin(prefix, bias=True):
        p = {"w": jnp.asarray(np.asarray(t[prefix + ".weight"]).T, dtype)}
        if bias:
            p["b"] = jnp.asarray(t[prefix + ".bias"], dtype)
        return p

    def ln(prefix):
        return {
            "g": jnp.asarray(t[prefix + ".weight"], dtype),
            "b": jnp.asarray(t[prefix + ".bias"], dtype),
        }

    def attn(prefix):
        return {
            "q": lin(prefix + ".q_proj"),
            "k": lin(prefix + ".k_proj", bias=False),
            "v": lin(prefix + ".v_proj"),
            "o": lin(prefix + ".out_proj"),
        }

    def block(side, i, cross):
        p = f"{side}.layers.{i}"
        d = {
            "attn_ln": ln(p + ".self_attn_layer_norm"),
            "attn": attn(p + ".self_attn"),
            "mlp_ln": ln(p + ".final_layer_norm"),
            "mlp_1": lin(p + ".fc1"),
            "mlp_2": lin(p + ".fc2"),
        }
        if cross:
            d["cross_attn_ln"] = ln(p + ".encoder_attn_layer_norm")
            d["cross_attn"] = attn(p + ".encoder_attn")
        return d

    stack = lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    def conv(prefix):
        return {
            "w": jnp.asarray(
                np.asarray(t[prefix + ".weight"]).transpose(2, 1, 0), dtype
            ),
            "b": jnp.asarray(t[prefix + ".bias"], dtype),
        }

    params = {
        "encoder": {
            "conv1": conv("encoder.conv1"),
            "conv2": conv("encoder.conv2"),
            "pos": jnp.asarray(t["encoder.embed_positions.weight"], dtype),
            "blocks": stack(
                [block("encoder", i, False) for i in range(cfg.n_audio_layer)]
            ),
            "ln_post": ln("encoder.layer_norm"),
        },
        "decoder": {
            "tok_emb": jnp.asarray(t["decoder.embed_tokens.weight"], dtype),
            "pos_emb": jnp.asarray(t["decoder.embed_positions.weight"], dtype),
            "blocks": stack(
                [block("decoder", i, True) for i in range(cfg.n_text_layer)]
            ),
            "ln": ln("decoder.layer_norm"),
        },
    }
    return cfg, params


def load_safetensors(path: str, dtype=jnp.bfloat16):
    from safetensors.numpy import load_file

    return params_from_hf_state(load_file(path), dtype)
