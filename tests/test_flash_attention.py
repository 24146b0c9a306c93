import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention,
)


@pytest.mark.parametrize("L", [256, 300, 1500])
def test_flash_matches_reference(L):
    rng = np.random.default_rng(0)
    B, H, d = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    got = flash_attention(q, k, v, interpret=True)
    want = attention_reference(q, k, v)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_encoder_uses_flash_flag():
    from sentiric_stt_whisper_service_tpu.models.whisper import (
        _use_flash,
        set_flash_attn,
    )

    set_flash_attn(True)
    assert _use_flash()
    set_flash_attn(False)
    assert not _use_flash()
    set_flash_attn(None)  # auto (CPU in tests → False)
    assert _use_flash() in (True, False)
