"""On-chip microbench: fused Pallas decode attention vs the XLA op chain,
at large-v3 decode shapes (32 layers per step, B=8, H=20, hd=64)."""

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

from sentiric_stt_whisper_service_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_reference,
)

S = int(os.environ.get("BENCH_BATCH", "8"))
H, HD = 20, 64
F_CROSS = 1500
F_SELF = 256
L = 32
STEPS = 32


def timeit(fn, iters=3):
    out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]  # sync incl. compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


@functools.partial(jax.jit, static_argnames=("mode", "n_steps"))
def loop(mode, n_steps, q0, k, v, ks, vs, pos):
    """n_steps sequential 'decode steps', each scanning L layers of one
    attention flavor; q feeds back so steps serialize."""

    def layer(q, inputs):
        kl, vl, ksl, vsl = inputs
        if mode == "pallas_cross":
            o = decode_attention(q, kl, vl, ksl, vsl, scale=HD**-0.5)
        elif mode == "xla_cross":
            o = decode_attention_reference(q, kl, vl, ksl, vsl, scale=HD**-0.5)
        elif mode == "pallas_self":
            o = decode_attention(q, kl, vl, pos=pos, scale=HD**-0.5)
        else:
            o = decode_attention_reference(q, kl, vl, pos=pos, scale=HD**-0.5)
        return (q + 0.001 * o.astype(q.dtype)).astype(q.dtype), None

    def step(state):
        i, q = state
        q, _ = jax.lax.scan(layer, q, (k, v, ks, vs))
        return i + 1, q

    _, q = jax.lax.while_loop(
        lambda s: s[0] < n_steps, step, (jnp.int32(0), q0)
    )
    return q


def main():
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((S, H, HD)) * 0.1, jnp.bfloat16)
    pos = jnp.full((S,), 100, jnp.int32)

    for name, F, quant in (
        ("cross_int8", F_CROSS, True),
        ("self_bf16", F_SELF, False),
    ):
        if quant:
            k = jnp.asarray(
                rng.integers(-127, 128, (L, S, H, HD, F)), jnp.int8
            )
            v = jnp.asarray(
                rng.integers(-127, 128, (L, S, H, HD, F)), jnp.int8
            )
            ks = jnp.asarray(rng.random((L, S, H, F)) * 0.02, jnp.float32)
            vs = jnp.asarray(rng.random((L, S, H, F)) * 0.02, jnp.float32)
        else:
            k = jnp.asarray(rng.standard_normal((L, S, H, HD, F)) * 0.2, jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((L, S, H, HD, F)) * 0.2, jnp.bfloat16)
            ks = jnp.zeros((L, S, H, 1), jnp.float32)
            vs = jnp.zeros((L, S, H, 1), jnp.float32)
        k, v, ks, vs = jax.block_until_ready((k, v, ks, vs))
        for mode_prefix in ("pallas", "xla"):
            mode = f"{mode_prefix}_{'cross' if quant else 'self'}"
            t = timeit(lambda m=mode: loop(m, STEPS, q0, k, v, ks if quant else None, vs if quant else None, pos))
            print(json.dumps({
                "metric": f"attn32L_ms_per_step_{mode_prefix}_{name}",
                "value": round(t / STEPS * 1e6) / 1e3,
            }), flush=True)


if __name__ == "__main__":
    main()
