"""Pallas beam attention kernel vs its XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from sentiric_stt_whisper_service_tpu.ops.beam_attention import (
    beam_attention,
    beam_attention_reference,
)


def make_case(B=2, K=3, H=4, C=64, hd=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B * K, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B * K, H, C, hd)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((B * K, H, C, hd)), jnp.float32) * 0.3
    # Valid ancestry: one source slot per (b, kd, c) for c < pos, none after.
    pos = C - 5
    src = rng.integers(0, K, size=(B, K, C))
    anc = np.zeros((B, K, K, C), np.float32)
    b, kd, c = np.meshgrid(np.arange(B), np.arange(K), np.arange(C), indexing="ij")
    anc[b, kd, src, c] = 1.0
    anc[:, :, :, pos:] = 0.0
    return q, k, v, jnp.asarray(anc)


def test_kernel_matches_reference():
    q, k, v, anc = make_case()
    scale = 64**-0.5
    got = beam_attention(q, k, v, anc, beam_size=3, scale=scale, interpret=True)
    want = beam_attention_reference(q, k, v, anc, beam_size=3, scale=scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_kernel_bf16_inputs():
    q, k, v, anc = make_case(seed=3)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    scale = 64**-0.5
    got = beam_attention(q, k, v, anc, beam_size=3, scale=scale, interpret=True)
    want = beam_attention_reference(q, k, v, anc, beam_size=3, scale=scale)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_ancestry_selects_the_right_slot():
    """With distinct constant K/V per slot, the output must equal the
    softmax-weighted mix of exactly the ancestor slots' values."""
    B, K, H, C, hd = 1, 2, 1, 8, 64
    q = jnp.ones((B * K, H, hd), jnp.float32)
    k = jnp.zeros((B * K, H, C, hd), jnp.float32)
    v = jnp.stack(
        [jnp.full((H, C, hd), float(s + 1)) for s in range(K)]
    ).astype(jnp.float32)  # slot s holds value s+1
    # beam 0 reads slot 0 everywhere; beam 1 reads slot 1 everywhere.
    anc = np.zeros((B, K, K, C), np.float32)
    anc[0, 0, 0, :4] = 1.0
    anc[0, 1, 1, :4] = 1.0
    out = beam_attention(
        q, k, v, jnp.asarray(anc),
        beam_size=K, scale=1.0, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), 2.0, atol=1e-6)


def pair_slab(x, hd):
    """[BK, H, C, hd] → head-paired [BK, H/2, C, 2·hd] (rows [x_h0|x_h1])."""
    BK, H, C, _ = x.shape
    return (
        x.reshape(BK, H // 2, 2, C, hd)
        .transpose(0, 1, 3, 2, 4)
        .reshape(BK, H // 2, C, 2 * hd)
    )


def test_kernel_paired_matches_unpaired_reference():
    q, k, v, anc = make_case(seed=5)
    scale = 64**-0.5
    k2, v2 = pair_slab(k, 64), pair_slab(v, 64)
    got = beam_attention(q, k2, v2, anc, beam_size=3, scale=scale, interpret=True)
    want = beam_attention_reference(q, k, v, anc, beam_size=3, scale=scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_reference_accepts_paired():
    q, k, v, anc = make_case(seed=6)
    scale = 64**-0.5
    k2, v2 = pair_slab(k, 64), pair_slab(v, 64)
    got = beam_attention_reference(q, k2, v2, anc, beam_size=3, scale=scale)
    want = beam_attention_reference(q, k, v, anc, beam_size=3, scale=scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6
    )
