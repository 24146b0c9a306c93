"""Isolated beam-cross-attention kernel vs XLA twin at production shape
(one layer, chained over STEPS iterations). Also a block-diagonal single-dot
variant probe. One JSON line with ms/call for each variant."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sentiric_stt_whisper_service_tpu.ops.beam_attention import (
    beam_cross_attention,
    beam_cross_attention_reference,
)

B = int(os.environ.get("BENCH_BATCH", "24"))
H = 20
K = 5
HD = 64
F = 1500
STEPS = int(os.environ.get("BENCH_STEPS", "64"))
BITS = int(os.environ.get("BENCH_BITS", "8"))


def timed(make_fn, *args):
    fn = jax.jit(make_fn)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    dt1 = time.perf_counter() - t0
    return dt1 / STEPS * 1e3


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(
        rng.standard_normal((B, H, K, HD)).astype(np.float32), jnp.bfloat16
    )
    k = jnp.asarray(
        (rng.standard_normal((B, H, HD, F)) * 20).astype(np.int8)
    )
    v = jnp.asarray(
        (rng.standard_normal((B, H, HD, F)) * 20).astype(np.int8)
    )
    if BITS == 4:
        k = jnp.clip(k, -7, 7).astype(jnp.int4)
        v = jnp.clip(v, -7, 7).astype(jnp.int4)
    ks = jnp.abs(jnp.asarray(rng.standard_normal((B, H, F)), jnp.float32))
    vs = jnp.abs(jnp.asarray(rng.standard_normal((B, H, F)), jnp.float32))
    s = HD**-0.5

    def chain(fn):
        def run(q0):
            def body(c, _):
                o = fn(c)
                return c + o.astype(c.dtype) * 1e-6, o[0, 0, 0, 0]

            c, _ = jax.lax.scan(body, q0, None, length=STEPS)
            return c

        return run

    res = {}
    res["kernel_ms"] = timed(
        chain(lambda qq: beam_cross_attention(qq, k, v, ks, vs, scale=s)), q
    )
    res["xla_ms"] = timed(
        chain(
            lambda qq: beam_cross_attention_reference(qq, k, v, ks, vs, scale=s)
        ),
        q,
    )

    # Block-diagonal single-dot variant in plain XLA: one [K*H, H*hd] x
    # [H*hd, F] dot per item (M=100, contraction 1280) for the scores —
    # slab read at full MXU rate; softmax chain unchanged.
    eye = jnp.eye(H, dtype=q.dtype)

    def blockdiag(qq):
        q_bd = (
            (qq.transpose(0, 2, 1, 3)[:, :, :, None, :] * eye[None, None, :, :, None])
            .transpose(0, 2, 1, 3, 4)
            .reshape(B, H * K, H * HD)
        )
        k_flat = k.reshape(B, H * HD, F).astype(q.dtype)
        scores = jax.lax.dot_general(
            q_bd * jnp.bfloat16(s), k_flat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(B, H, K, F)
        scores = scores * ks[:, :, None, :]
        w = jax.nn.softmax(scores, axis=-1) * vs[:, :, None, :]
        out = jax.lax.dot_general(
            w.astype(q.dtype), v.astype(q.dtype),
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )
        return out.astype(q.dtype)

    res["blockdiag_scores_ms"] = timed(chain(blockdiag), q)

    slab_gb = 2 * B * H * HD * F * (0.5 if BITS == 4 else 1) / 1e9
    for name, ms in list(res.items()):
        res[name.replace("_ms", "_gbps")] = round(slab_gb / (ms / 1e3), 1)
    print(json.dumps({k_: round(v_, 3) for k_, v_ in res.items()}))


if __name__ == "__main__":
    main()
