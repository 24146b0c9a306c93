"""Probe: raw HBM streaming rate for decode-slab shapes vs flat arrays.

Decides whether the greedy cross chain (~475 GB/s effective at B=56 int8,
tools/bench_cross_fd.py) is DMA-bound (platform streaming ceiling) or
convert/VPU-bound (fixable by changing arithmetic). Reduces each array to
a scalar with jnp.sum in a 32-step chain: if flat int8 streams much
faster than the [S,H,hd,F] slab shape, layout is the problem; if both
sit near 475, that IS the wall and only byte reduction helps.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S, H, HD = 56, 20, 64
F = 1536
L = int(os.environ.get("BENCH_LAYERS", "32"))


def timed(fn, args, iters=10):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    bytes_per = L * S * H * HD * F  # one int8 slab
    one = jnp.ones((), jnp.float32)

    shapes = {
        "slab_i8": ((L, S, H, HD, F), jnp.int8),
        "flat_i8": ((L * S * H * HD * F,), jnp.int8),
        "slab_bf16": ((L, S, H, HD, F), jnp.bfloat16),
        "kf_lane_i8": ((L, S, H, F, HD), jnp.int8),
    }
    for name, (shape, dt) in shapes.items():
        x = jax.block_until_ready(
            jax.jit(lambda: jnp.ones(shape, dt), static_argnums=())())

        @jax.jit
        def red(x, s):
            # chained partial sums force a full read; scalar result
            return jnp.sum(x, dtype=jnp.float32) + s

        t = timed(red, (x, one))
        nbytes = int(np.prod(shape)) * x.dtype.itemsize
        print(json.dumps({"variant": name,
                          "ms": round(t * 1e3, 3),
                          "GBps": round(nbytes / t / 1e9, 1)}), flush=True)
        del x

    # convert-to-bf16 + sum (the dequant pattern XLA fuses into dots)
    x = jax.block_until_ready(jnp.ones((L, S, H, HD, F), jnp.int8))

    @jax.jit
    def conv_red(x, s):
        return jnp.sum(x.astype(jnp.bfloat16), dtype=jnp.float32) + s

    t = timed(conv_red, (x, one))
    print(json.dumps({"variant": "slab_i8_convert_bf16_sum",
                      "ms": round(t * 1e3, 3),
                      "GBps": round(bytes_per / t / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
