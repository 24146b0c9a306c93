"""Self-cache layout probe: is [.., C, hd=64] streaming 2x its bytes?

TPU arrays are lane-tiled: a minor dim of 64 pads to 128 lanes, so the
position-major self cache [L,B,H,C,64] may physically stream twice its
nominal bytes every decode step. Candidate fix with EXACT numerics: pair
heads on the lane axis — slab [L,B,H/2,C,128] with rows [k_h0 | k_h1] —
and read both heads' scores in ONE contraction using M=2 zero-padded
queries ([q_h0|0], [0|q_h1]); the value contraction slices the small
[.., 2, 128] output instead of the slab.

Times a 32-layer x N-step chain of the self-attention core in both
layouts (bf16), plus an int8 paired variant, and checks numerics.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BENCH_BATCH", "24"))
L, H, C, HD = 32, 20, 192, 64
STEPS = 24


def attend_cur(q, k, v, mask):
    """Current layout: q [B,H,1,hd]; k,v [B,H,C,hd]."""
    scores = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B,H,1,C]
    scores = jnp.where(mask, scores, jnp.float32(-1e30))
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        w, v, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B,H,1,hd]
    return out.astype(v.dtype)


def attend_paired(q2, k2, v2, mask):
    """Paired layout: q2 [B,H/2,2,128] (rows [q_h0|0],[0|q_h1]);
    k2,v2 [B,H/2,C,128] (rows [x_h0|x_h1])."""
    scores = jax.lax.dot_general(
        q2, k2, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B,H/2,2,C]
    scores = jnp.where(mask, scores, jnp.float32(-1e30))
    w = jax.nn.softmax(scores, axis=-1).astype(v2.dtype)
    out = jax.lax.dot_general(
        w, v2, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B,H/2,2,128]
    # head 0 wants lanes :64 of row 0, head 1 lanes 64: of row 1
    return out.astype(v2.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "n"))
def chain(q0, kv, mask, mode, n):
    def layer(qq, xs):
        if mode == "cur":
            out = attend_cur(qq, xs[0], xs[1], mask)
            return out, None
        out = attend_paired(qq, xs[0], xs[1], mask)
        # fold [B,H/2,2,128] back to a next query of the same shape:
        return out, None

    def step(qq, _):
        qq, _ = jax.lax.scan(layer, qq, kv)
        return qq, None

    q, _ = jax.lax.scan(step, q0, None, length=n)
    return q


def timeit(fn, iters=3):
    out = fn()
    _ = np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = np.asarray(out).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((L, B, H, C, HD)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((L, B, H, C, HD)) * 0.3, jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, H, 1, HD)) * 0.3, jnp.bfloat16)
    mask = jnp.ones((B, H, 1, C), bool).at[..., C // 2 :].set(False)

    # paired forms
    k2 = k.reshape(L, B, H // 2, 2, C, HD).transpose(0, 1, 2, 4, 3, 5).reshape(
        L, B, H // 2, C, 2 * HD
    )
    v2 = v.reshape(L, B, H // 2, 2, C, HD).transpose(0, 1, 2, 4, 3, 5).reshape(
        L, B, H // 2, C, 2 * HD
    )
    qr = q.reshape(B, H // 2, 2, HD)
    zeros = jnp.zeros_like(qr)
    q2 = jnp.concatenate(
        [
            jnp.concatenate([qr[:, :, :1], zeros[:, :, :1]], axis=-1),
            jnp.concatenate([zeros[:, :, 1:], qr[:, :, 1:]], axis=-1),
        ],
        axis=2,
    )  # [B,H/2,2,128]
    mask2 = mask.reshape(B, H // 2, 2, C)
    jax.block_until_ready((k2, v2, q2))

    # numerics: one layer
    a = np.asarray(attend_cur(q, k[0], v[0], mask).astype(jnp.float32))
    b = np.asarray(attend_paired(q2, k2[0], v2[0], mask2).astype(jnp.float32))
    b0 = b[:, :, 0, :HD]
    b1 = b[:, :, 1, HD:]
    bb = np.stack([b0, b1], axis=2).reshape(B, H, 1, HD)[:, :, 0]
    aa = a[:, :, 0]
    err = np.max(np.abs(aa - bb))
    print(json.dumps({"metric": "self_paired_max_err", "value": float(err)}),
          flush=True)

    gb = {"cur": 2 * L * B * H * C * HD * 2 / 1e9,
          "paired": 2 * L * B * H * C * HD * 2 / 1e9}
    for mode, kv, qq, mm in (("cur", (k, v), q, mask),
                             ("paired", (k2, v2), q2, mask2)):
        t_small = timeit(lambda: chain(qq, kv, mm, mode, 2))
        t_big = timeit(lambda: chain(qq, kv, mm, mode, 2 + STEPS))
        t = (t_big - t_small) / STEPS
        print(json.dumps({
            "metric": f"self_chain_{mode}_step_ms",
            "value": round(t * 1e5) / 1e2,
            "nominal_gbps": round(gb[mode] / t, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
