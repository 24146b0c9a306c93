"""Fused decode attention kernel (ops/decode_attention.py): interpret-mode
Pallas vs the XLA reference, plain/int8/causal variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_reference,
)

S, H, HD, F = 3, 4, 64, 256


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, H, HD)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, H, HD, F)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((S, H, HD, F)), jnp.float32)
    return q, k, v


def test_plain_matches_reference(data):
    q, k, v = data
    want = decode_attention_reference(q, k, v, scale=HD**-0.5)
    got = decode_attention(q, k, v, scale=HD**-0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_causal_matches_reference(data):
    q, k, v = data
    pos = jnp.asarray([0, 17, 255], jnp.int32)
    want = decode_attention_reference(q, k, v, pos=pos, scale=HD**-0.5)
    got = decode_attention(q, k, v, pos=pos, scale=HD**-0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # pos=0 attends only column 0 → output equals v[..., 0]
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(v[0, :, :, 0]), atol=2e-5
    )


def test_quantized_matches_reference(data):
    from sentiric_stt_whisper_service_tpu.ops.quant import quantize_weight

    q, k, v = data
    k_q, k_scale = quantize_weight(k, axis=-2)  # per-position over hd
    v_q, v_scale = quantize_weight(v, axis=-2)
    want = decode_attention_reference(
        q, k_q, v_q, k_scale, v_scale, scale=HD**-0.5
    )
    got = decode_attention(
        q, k_q, v_q, k_scale, v_scale, scale=HD**-0.5, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # and int8 attention ≈ full-precision attention
    full = decode_attention_reference(q, k, v, scale=HD**-0.5)
    err = np.abs(np.asarray(got) - np.asarray(full)).max()
    assert err / (np.abs(np.asarray(full)).max() + 1e-9) < 0.05


def test_unpadded_f(data):
    """F not a multiple of 128: lane padding must be masked out."""
    q, k, v = data
    k2, v2 = k[..., :200], v[..., :200]
    want = decode_attention_reference(q, k2, v2, scale=HD**-0.5)
    got = decode_attention(q, k2, v2, scale=HD**-0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
