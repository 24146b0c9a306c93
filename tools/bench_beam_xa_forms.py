"""Production-form beam cross-attention cost by slab storage form.

Times the EXACT `_attend_xa` contraction used by decoder_step_beam
(whisper.py:1155-1166) at beam serving shape (q [B,H,K,hd] against the
shared KF slab) over a chained scan, for: int8, int4-values-in-int8,
native int4, and the head-paired block-diagonal form. BENCH_BEAM=1
measures the GREEDY decode shape (M=1 queries) instead. Answers whether the pre-loop `unpack_xa_kv` should target
int8 instead of native int4 on this chip. One JSON line: ms per
32-layer-equivalent step + effective GB/s (L layers measured, scaled).
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

from sentiric_stt_whisper_service_tpu.models.whisper import _attend_xa

B = int(os.environ.get("BENCH_BATCH", "16"))
H = 20
K = int(os.environ.get("BENCH_BEAM", "5"))
HD = 64
F = 1500
L = int(os.environ.get("BENCH_LAYERS", "8"))
STEPS = int(os.environ.get("BENCH_STEPS", "64"))
SCALE = HD**-0.25


@jax.jit
def make_slabs(key):
    ks = jax.random.split(key, 3)
    i8 = jax.random.randint(ks[0], (2, L, B, H, HD, F), -127, 128, jnp.int8)
    scl = jax.random.uniform(ks[1], (2, L, B, H, F), jnp.float32, 0.01, 0.2)
    q = jax.random.normal(ks[2], (B, H, K, HD), jnp.bfloat16)
    return i8, scl, q


def timed(fn, *args):
    """One scalar host fetch per timing (block_until_ready does NOT wait
    under the axon tunnel; a fetch costs ~28 ms RTT — amortized by STEPS)."""
    jfn = jax.jit(fn)
    _ = float(jnp.sum(jfn(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    _ = float(jnp.sum(jfn(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / STEPS * 1e3


def chain(q0, xa):
    """xa is a jit ARGUMENT (closure constants would be embedded in the
    compile payload — the axon remote-compile tunnel rejects >~100MB)."""

    def body(c, _):
        acc = c
        for li in range(L):
            o, _ = _attend_xa(c, jax.tree.map(lambda a: a[li], xa), SCALE)
            acc = acc + o.astype(acc.dtype) * jnp.bfloat16(1e-6)
        return acc, ()

    c, _ = jax.lax.scan(body, q0, None, length=STEPS)
    return c


def main():
    i8, scl, q = jax.block_until_ready(make_slabs(jax.random.key(0)))
    res = {}

    def record(name, xa, bytes_per_el):
        ms = timed(chain, q, xa) * (32 / L)
        gb = 2 * B * H * HD * F * bytes_per_el * 32 / 1e9
        res[f"{name}_ms_step32"] = round(ms, 3)
        res[f"{name}_gbps"] = round(gb / (ms / 1e3), 1)

    xa8 = {"k_q": i8[0], "v_q": i8[1], "k_scale": scl[0], "v_scale": scl[1]}
    record("int8", xa8, 1)
    i4v = jnp.clip(i8, -7, 7)
    record(
        "int4_in_i8",
        {"k_q": i4v[0], "v_q": i4v[1], "k_scale": scl[0], "v_scale": scl[1]},
        1,
    )
    del xa8
    # Native int4 CANNOT cross a jit boundary on axon (device_put of S4
    # args recurses) — production unpacks the packed carrier INSIDE the
    # decode jit (models/beam.py), so time that exact structure: carrier
    # arg -> _unpack_nibbles -> chained steps, all one executable.
    from sentiric_stt_whisper_service_tpu.ops.quant import _unpack_nibbles

    half = F // 2
    packed = jnp.bitwise_or(
        jnp.bitwise_and(i4v[..., :half], 0x0F),
        jnp.left_shift(i4v[..., half:], 4),
    ).astype(jnp.int8)
    del i4v

    def chain_packed(q0, pk, ksc, vsc):
        xa = {
            "k_q": _unpack_nibbles(pk[0]),
            "v_q": _unpack_nibbles(pk[1]),
            "k_scale": ksc,
            "v_scale": vsc,
        }
        return chain(q0, xa)

    ms = timed(chain_packed, q, packed, scl[0], scl[1]) * (32 / L)
    gb = 2 * B * H * HD * F * 0.5 * 32 / 1e9
    res["int4_native_ms_step32"] = round(ms, 3)
    res["int4_native_gbps"] = round(gb / (ms / 1e3), 1)

    # --- head-PAIRED formulation (the greedy/self-path lane trick): slabs
    # [B, Hp, 2hd, F] with block-diagonal zero-padded queries [B, Hp, 2K,
    # 2hd] -> 128-lane contraction for the scores dot; v-dot reads the
    # paired [B, Hp, F, 2hd] slab at 128 output lanes and the per-head
    # halves are extracted with the miscompile-safe reshape+index form.
    Hp = H // 2

    def chain_paired(q0, pk, ksc, vsc):
        k4 = _unpack_nibbles(pk[0]).reshape(L, B, Hp, 2 * HD, F)
        v4 = _unpack_nibbles(pk[1]).reshape(L, B, Hp, 2 * HD, F)
        ks2 = ksc.reshape(L, B, Hp, 2, F)
        vs2 = vsc.reshape(L, B, Hp, 2, F)

        def att(c, k_sl, v_sl, ks_sl, vs_sl):
            # c [B, H, K, hd] -> block-diag paired queries [B, Hp, 2K, 2hd]
            qr = c.reshape(B, Hp, 2, K, HD)
            z = jnp.zeros_like(qr[:, :, 0])
            q_bh = jnp.concatenate(
                [
                    jnp.concatenate([qr[:, :, 0], z], axis=-1),
                    jnp.concatenate([z, qr[:, :, 1]], axis=-1),
                ],
                axis=2,
            )  # [B, Hp, 2K, 2hd]
            scores = jax.lax.dot_general(
                q_bh, k_sl.astype(q_bh.dtype),
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            )  # [B, Hp, 2K, F]
            kss = jnp.repeat(ks_sl, K, axis=2)  # [B, Hp, 2K, F]
            scores = scores * kss
            w = jax.nn.softmax(scores, axis=-1)
            wv = (w * jnp.repeat(vs_sl, K, axis=2)).astype(q_bh.dtype)
            o = jax.lax.dot_general(
                wv, v_sl.astype(q_bh.dtype),
                dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            )  # [B, Hp, 2K, 2hd]
            o6 = o.reshape(B, Hp, 2, K, 2, HD)
            return jnp.stack(
                [o6[:, :, 0, :, 0], o6[:, :, 1, :, 1]], axis=2
            ).reshape(B, H, K, HD).astype(c.dtype)

        def body(c, _):
            acc = c
            for li in range(L):
                o = att(c, k4[li], v4[li], ks2[li], vs2[li])
                acc = acc + o * jnp.bfloat16(1e-6)
            return acc, ()

        c, _ = jax.lax.scan(body, q0, None, length=STEPS)
        return c

    ms = timed(chain_paired, q, packed, scl[0], scl[1]) * (32 / L)
    res["int4_paired_ms_step32"] = round(ms, 3)
    res["int4_paired_gbps"] = round(gb / (ms / 1e3), 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
