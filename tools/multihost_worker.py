"""Worker for the 2-process CPU multi-host dryrun (SURVEY.md §5.8).

Each process forces a 4-device CPU backend, joins a ``jax.distributed``
cluster, builds ONE global (nproc × 4) mesh whose dp axis spans the
process boundary (the DCN analog) with tp inside each process (the ICI
analog), and runs a greedy ``decode_window`` over globally-sharded params
and batch. The gathered result must match the single-process reference
token-for-token.

Modes:
  python tools/multihost_worker.py ref <out.npz>
      single-process reference (no distributed runtime)
  python tools/multihost_worker.py worker <port> <pid> <nproc> <ref.npz>
      one cluster process; exits 0 iff its view of the global decode
      matches the reference.

Spawned by ``__graft_entry__.dryrun_multihost`` and tests/test_multihost.py.
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_cpu(n_local: int):
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local} "
        + " ".join(
            f for f in flags.split()
            if "xla_force_host_platform_device_count" not in f
        )
    ).strip()
    os.environ.setdefault("SSTW_NO_COMPILE_CACHE", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _problem():
    """Deterministic (cfg, params, mel, decode inputs) shared by both
    modes — host-identical in every process."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sentiric_stt_whisper_service_tpu.models import (
        TokenIds,
        build_suppress_mask,
        config_for,
        init_params,
    )
    from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

    cfg = dataclasses.replace(
        config_for("test"),
        n_audio_state=128, n_audio_head=8,
        n_text_state=128, n_text_head=8,
        dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.key(0))
    B, T_mel = 4, 96
    mel = (
        np.random.default_rng(0)
        .standard_normal((B, T_mel, cfg.n_mels))
        .astype(np.float32)
    )
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = np.asarray(build_suppress_mask(cfg.n_vocab, ids, ()))
    sot = tok.sot_sequence("en")
    tinit = np.full((B, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    return cfg, params, mel, ids, sup, sot, tinit


def _decode(cfg, params, mel, ids, sup, sot, tinit):
    import jax
    import jax.numpy as jnp

    from sentiric_stt_whisper_service_tpu.models import (
        decode_window,
        encode_xa_kv,
    )

    xa_kv = encode_xa_kv(cfg, params, mel)
    return decode_window(
        cfg, params, xa_kv, tinit, len(sot), 0, ids,
        jnp.asarray(sup), jnp.float32(0.0), jax.random.key(2),
        max_len=len(sot) + 8,
    )


def main_ref(out_path: str):
    import numpy as np

    _force_cpu(1)
    cfg, params, mel, ids, sup, sot, tinit = _problem()
    res = _decode(cfg, params, mel, ids, sup, sot, tinit)
    np.savez(
        out_path,
        tokens=np.asarray(res.tokens),
        lengths=np.asarray(res.lengths),
        avg_logprobs=np.asarray(res.avg_logprobs),
    )
    print(f"[multihost ref] wrote {out_path}")


def main_worker(port: str, pid: int, nproc: int, ref_path: str):
    import numpy as np

    jax = _force_cpu(4)
    from sentiric_stt_whisper_service_tpu.parallel import (
        data_sharding,
        initialize_distributed,
        make_global_array,
        make_mesh,
        shard_params_global,
    )

    initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    # dp spans the process boundary (process p owns mesh row p — the
    # global device list orders process 0's devices first), tp stays
    # inside each process: MESH_SHAPE "2x4" over processes, config not
    # code (SURVEY.md §5.8).
    mesh = make_mesh(f"{nproc}x4")
    for row in range(nproc):
        owners = {d.process_index for d in mesh.devices[row].ravel()}
        assert owners == {row}, (
            f"mesh dp row {row} not process-aligned: {owners}"
        )

    cfg, params, mel, ids, sup, sot, tinit = _problem()
    with jax.set_mesh(mesh):
        g_params = shard_params_global(mesh, params)
        g_mel = make_global_array(mel, data_sharding(mesh, 3))
        g_tinit = make_global_array(tinit, data_sharding(mesh, 2))
        res = _decode(cfg, g_params, g_mel, ids, sup, sot, g_tinit)

    from jax.experimental import multihost_utils

    tokens = np.asarray(multihost_utils.process_allgather(res.tokens, tiled=True))
    lengths = np.asarray(
        multihost_utils.process_allgather(res.lengths, tiled=True)
    )
    avg_lp = np.asarray(
        multihost_utils.process_allgather(res.avg_logprobs, tiled=True)
    )

    ref = np.load(ref_path)
    assert (lengths == ref["lengths"]).all(), (lengths, ref["lengths"])
    for b, n in enumerate(ref["lengths"]):
        assert (tokens[b, :n] == ref["tokens"][b, :n]).all(), (
            f"row {b} tokens diverge from single-process reference"
        )
    np.testing.assert_allclose(avg_lp, ref["avg_logprobs"], atol=1e-4, rtol=1e-4)
    print(
        f"[multihost {pid}/{nproc}] PASS: decode equality over dp×tp mesh "
        f"spanning {nproc} processes (lengths={lengths.tolist()})"
    )


if __name__ == "__main__":
    if sys.argv[1] == "ref":
        main_ref(sys.argv[2])
    else:
        main_worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
