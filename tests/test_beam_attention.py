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


def test_c_valid_bounded_reads_are_exact():
    """c_valid=128 must match the full-slab read whenever the ancestry
    mask is zero beyond row 128 (the models/beam.py bucketing contract)."""
    B, K, H, C, hd = 2, 3, 4, 256, 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B * K, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B * K, H, C, hd)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((B * K, H, C, hd)), jnp.float32) * 0.3
    pos = 100  # decode position inside the first 128-row bucket
    src = rng.integers(0, K, size=(B, K, C))
    anc = np.zeros((B, K, K, C), np.float32)
    b, kd, c = np.meshgrid(np.arange(B), np.arange(K), np.arange(C), indexing="ij")
    anc[b, kd, src, c] = 1.0
    anc[:, :, :, pos:] = 0.0
    anc = jnp.asarray(anc)
    scale = 64**-0.5
    full = beam_attention(q, k, v, anc, beam_size=K, scale=scale, interpret=True)
    cut = beam_attention(
        q, k, v, anc, beam_size=K, scale=scale, c_valid=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(cut), np.asarray(full), atol=1e-6, rtol=1e-6
    )
    with np.testing.assert_raises(ValueError):
        beam_attention(
            q, k, v, anc, beam_size=K, scale=scale, c_valid=100, interpret=True
        )


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


# ---------------------------------------------------------------------------
# beam CROSS attention kernel (shared KF slab, K queries per head)
# ---------------------------------------------------------------------------

from sentiric_stt_whisper_service_tpu.ops.beam_attention import (  # noqa: E402
    beam_cross_attention,
    beam_cross_attention_reference,
)


def make_cross_case(B=2, H=4, K=5, hd=64, F=256, seed=0, quant=False):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, K, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, hd, F)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((B, H, hd, F)), jnp.float32) * 0.3
    if not quant:
        return q, k, v, None, None
    from sentiric_stt_whisper_service_tpu.ops.quant import quantize_weight

    k_q, k_s = quantize_weight(k, axis=-2)
    v_q, v_s = quantize_weight(v, axis=-2)
    return q, k_q, v_q, k_s, v_s


def test_cross_kernel_matches_reference_bf16():
    q, k, v, _, _ = make_cross_case()
    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    s = 64**-0.5
    got = beam_cross_attention(q, k, v, scale=s, interpret=True)
    want = beam_cross_attention_reference(q, k, v, scale=s)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_cross_kernel_matches_reference_int8():
    q, k_q, v_q, k_s, v_s = make_cross_case(quant=True, seed=1)
    q = q.astype(jnp.bfloat16)
    s = 64**-0.5
    got = beam_cross_attention(q, k_q, v_q, k_s, v_s, scale=s, interpret=True)
    want = beam_cross_attention_reference(q, k_q, v_q, k_s, v_s, scale=s)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_cross_kernel_matches_attend_xa_semantics():
    """The kernel must equal models/whisper._attend_xa on the same slab
    (the production formulation it replaces in decoder_step_beam)."""
    from sentiric_stt_whisper_service_tpu.models.whisper import _attend_xa

    q, k_q, v_q, k_s, v_s = make_cross_case(quant=True, seed=2)
    q = q.astype(jnp.bfloat16)
    scale = 64**-0.25  # _attend_xa squares this internally
    xa = {"k_q": k_q, "v_q": v_q, "k_scale": k_s, "v_scale": v_s}
    want, _ = _attend_xa(q, xa, scale)
    got = beam_cross_attention(
        q, k_q, v_q, k_s, v_s, scale=scale * scale, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )
