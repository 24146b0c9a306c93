"""Multi-host (DCN) dryrun: §5.8's jax.distributed leg (VERDICT r4 #5).

Two real OS processes, each a 4-device CPU backend, joined via
``jax.distributed.initialize`` into one 8-device cluster; a (2 × 4)
dp×tp mesh spans the process boundary on dp (the DCN analog) and the
greedy decode over globally-sharded params/batch must match the
single-process reference token-for-token. The heavy lifting lives in
tools/multihost_worker.py (shared with ``__graft_entry__.dryrun_multihost``).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_two_process_mesh_decode_equality(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers force their own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["SSTW_NO_COMPILE_CACHE"] = "1"
    worker = str(ROOT / "tools" / "multihost_worker.py")
    ref = str(tmp_path / "ref.npz")

    proc = subprocess.run(
        [sys.executable, worker, "ref", ref],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    workers = [
        subprocess.Popen(
            [sys.executable, worker, "worker", str(port), str(pid), "2", ref],
            env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in workers:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    assert all(p.returncode == 0 for p in workers), "\n---\n".join(
        o[-3000:] for o in outs
    )
    assert any("PASS" in o for o in outs)
