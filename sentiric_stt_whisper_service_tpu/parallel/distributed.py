"""Multi-host (DCN) distribution: the ``jax.distributed`` leg of §5.8.

The reference is a single-process service (SURVEY.md §2.5); the TPU-native
counterpart scales across hosts by *configuration*: each host runs the same
service binary, ``jax.distributed.initialize`` connects the processes, and
``MESH_SHAPE`` then builds one global mesh whose dp axis spans hosts over
DCN while tp stays inside each host's ICI domain (``parallel/mesh.py``
reshapes ``jax.devices()`` — the GLOBAL device list after initialization —
so the leading mesh axes naturally land on the process boundary).

Env surface (same ``STT_WHISPER_SERVICE_`` prefix as every other knob):

  * ``COORDINATOR_ADDRESS`` — ``host:port`` of process 0. Setting this is
    the opt-in; unset ⇒ single-process (the default, reference parity).
  * ``NUM_PROCESSES`` / ``PROCESS_ID`` — cluster size and this host's
    rank. On TPU pods these may be omitted: ``jax.distributed`` then
    auto-detects them from the TPU metadata service.

``serving/main.py`` calls :func:`maybe_initialize_distributed` before any
backend touch (mesh construction, engine build) — the same ordering
contract as ``xla_force_host_platform_device_count``.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

_PREFIX = "STT_WHISPER_SERVICE_"
log = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: str,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` wrapper (idempotent-unfriendly like
    the underlying API: call once, before any backend initialization)."""
    import jax

    kwargs = {"coordinator_address": coordinator_address}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def maybe_initialize_distributed() -> bool:
    """Env-gated multi-host init (VERDICT r4 #5). Returns True when a
    multi-process runtime was started, False for the single-process
    default. Must run before mesh construction / first device access."""
    addr = os.environ.get(_PREFIX + "COORDINATOR_ADDRESS", "").strip()
    if not addr:
        return False
    nproc = os.environ.get(_PREFIX + "NUM_PROCESSES")
    pid = os.environ.get(_PREFIX + "PROCESS_ID")
    initialize_distributed(
        addr,
        int(nproc) if nproc is not None else None,
        int(pid) if pid is not None else None,
    )
    import jax

    log.info(
        "jax.distributed initialized: process %d/%d, %d global / %d local devices",
        jax.process_index(), jax.process_count(),
        jax.device_count(), jax.local_device_count(),
    )
    return True


def make_global_array(value, sharding):
    """Host-identical numpy ``value`` → global jax.Array with ``sharding``
    (which may span processes). Every process must pass the same value —
    each contributes only its addressable shards."""
    import jax
    import numpy as np

    value = np.asarray(value)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx]
    )


def shard_params_global(mesh, params):
    """Multi-process-safe variant of ``parallel.shard_params``: place a
    host-identical param pytree onto a mesh that may span processes."""
    from .mesh import param_shardings

    import jax

    shardings = param_shardings(mesh, params)
    return jax.tree.map(make_global_array, params, shardings)
