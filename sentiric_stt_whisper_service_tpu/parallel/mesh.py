"""Device mesh + GSPMD shardings for Whisper weights and state.

The reference's only parallelism is a per-request state pool on one device
(SURVEY.md §2.5, /root/reference/src/stt_engine.cpp:36-85). The TPU-native
counterpart is config-not-code scale-out (SURVEY.md §5.8): weights sharded
over an ICI mesh with ``NamedSharding`` and XLA GSPMD inserting the
collectives.

Axes:
  * ``dp`` — data parallel: batch of concurrent requests / 30 s windows.
  * ``tp`` — tensor parallel: attention heads and FFN hidden dim. Within a
    block, qkv projections are column-sharded and the output projections
    row-sharded, so each block needs exactly one all-reduce (psum) per
    attention and per MLP — the standard Megatron layout, expressed purely
    through sharding annotations.

KV caches shard [L, B, ctx, H, hd] as (None, dp, None, tp, None): each chip
holds its heads for its requests; the decode loop needs no cross-chip
traffic beyond the two psums per layer.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: str = "1", devices=None) -> Mesh:
    """Create a (dp, tp) or (dp, tp, sp) mesh. ``shape``: "1", "4",
    "2x4" (dp x tp), "2x2x2" (dp x tp x sp — sp is the encoder
    sequence-parallel axis, SURVEY.md §5.7), or "auto" (all devices
    on dp)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sp = None
    if shape in ("1", "", None):
        dp, tp = 1, 1
        devices = devices[:1]
    elif shape == "auto":
        dp, tp = n, 1
    elif "x" in shape:
        dims = [int(x) for x in shape.split("x")]
        if len(dims) == 3:
            dp, tp, sp = dims
        else:
            dp, tp = dims
    else:
        dp, tp = 1, int(shape)
    total = dp * tp * (sp or 1)
    if total > n:
        raise ValueError(f"mesh {shape} needs {total} devices, have {n}")
    if sp:
        arr = np.asarray(devices[:total]).reshape(dp, tp, sp)
        return Mesh(arr, ("dp", "tp", "sp"))
    arr = np.asarray(devices[:total]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def seq_constraint(x):
    """Constrain [B, T, ...] activations to (dp, sp, ...) when the ambient
    mesh carries a sequence-parallel axis; identity otherwise.

    The encoder residual stream calls this between blocks
    (models/whisper.encoder_apply): LN / MLP / projections then compute on
    a T/sp shard per device and GSPMD inserts the attention all-gather —
    the honest TPU analog of long-context sharding for this workload
    (SURVEY.md §5.7: batched 30 s windows need no ring attention)."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:  # noqa: BLE001 — no ambient mesh machinery
        return x
    names = getattr(mesh, "axis_names", ()) or ()
    if "sp" not in names:
        return x
    return jax.lax.with_sharding_constraint(
        x, P("dp" if "dp" in names else None, "sp")
    )


def _spec_for_path(path: str, ndim: int) -> P:
    """Partition spec from a param's tree path. Stacked block params carry a
    leading layer axis (never sharded)."""
    # Column-parallel: qkv projections + first MLP matmul → shard outputs.
    # (w_q / per-output-channel scale are the int8 forms, ops/quant.py.)
    if re.search(r"(attn|cross_attn)/(q|k|v)/w(_q)?$", path) or re.search(
        r"mlp_1/w(_q)?$", path
    ):
        return P(*([None] * (ndim - 1) + ["tp"]))
    if re.search(r"(attn|cross_attn)/(q|k|v)/scale$", path) or path.endswith(
        "mlp_1/scale"
    ):
        return P(*([None] * (ndim - 1) + ["tp"]))
    if re.search(r"(attn|cross_attn)/(q|v)/b$", path) or path.endswith("mlp_1/b"):
        return P(*([None] * (ndim - 1) + ["tp"]))
    # Row-parallel: output projections + second MLP matmul → shard inputs
    # (their int8 scales are per-output-channel → replicated).
    if re.search(r"(attn|cross_attn)/o/w(_q)?$", path) or re.search(
        r"mlp_2/w(_q)?$", path
    ):
        return P(*([None] * (ndim - 2) + ["tp", None]))
    # Everything else (ln, conv, embeddings, biases of row-parallel mats,
    # row-parallel scales) is replicated.
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params: Any):
    """NamedSharding pytree matching ``params`` (Megatron-style TP)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _spec_for_path(_path_str(p), x.ndim)),
        params,
    )


def shard_params(mesh: Mesh, params: Any):
    """Place params on the mesh according to ``param_shardings``."""
    return jax.device_put(params, param_shardings(mesh, params))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-major arrays: shard dim 0 over dp."""
    return NamedSharding(mesh, P(*(["dp"] + [None] * (ndim - 1))))


def kv_cache_shardings(mesh: Mesh, cache: Any):
    """KV slabs [L, B, H, ctx, hd] → (None, dp, tp, None, None); int8
    per-position scales [L, B, H, ctx] → (None, dp, tp, None)."""
    return jax.tree.map(
        lambda x: NamedSharding(
            mesh, P(*((None, "dp", "tp") + (None,) * (x.ndim - 3)))
        ),
        cache,
    )


def xa_kv_shardings(mesh: Mesh, xa_kv: Any):
    return kv_cache_shardings(mesh, xa_kv)
