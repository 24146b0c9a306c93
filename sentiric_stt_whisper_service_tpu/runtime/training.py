"""Fine-tuning support: teacher-forced training step over the device mesh.

The reference is inference-only (SURVEY.md §1: "no training ... of any
kind"), but a framework at this scale should support adapting Whisper
checkpoints. This module provides the canonical seq2seq training step —
encoder + teacher-forced decoder cross-entropy — jittable over a
(dp, tp) mesh; it is also what the driver's multi-chip dry-run exercises.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.whisper import (
    WhisperConfig,
    decoder_apply,
    encoder_apply,
    init_kv_cache,
    precompute_xa_kv,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def loss_fn(cfg: WhisperConfig, params, mel, tokens, loss_mask):
    """Teacher-forced CE. tokens [B, T] (inputs = tokens[:, :-1], targets =
    tokens[:, 1:]); loss_mask [B, T-1] masks prompt/pad positions."""
    xa = encoder_apply(cfg, params, mel)
    xa_kv = precompute_xa_kv(cfg, params, xa)
    B, T = tokens.shape
    kv = init_kv_cache(cfg, B)
    logits, _, _ = decoder_apply(
        cfg, params, tokens[:, :-1], jnp.int32(0), kv, xa_kv
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(loss_mask), 1.0)
    return -jnp.sum(tgt * loss_mask) / denom


@functools.partial(jax.jit, static_argnames=("cfg", "optimizer"), donate_argnums=(2,))
def train_step(
    cfg: WhisperConfig,
    optimizer,
    state: TrainState,
    mel: jnp.ndarray,
    tokens: jnp.ndarray,
    loss_mask: jnp.ndarray,
):
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(cfg, p, mel, tokens, loss_mask)
    )(state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss
