import jax
import jax.numpy as jnp
import numpy as np

from sentiric_stt_whisper_service_tpu.checkpoint import restore_params, save_params
from sentiric_stt_whisper_service_tpu.models import config_for, init_params


def test_orbax_roundtrip(tmp_path):
    cfg = config_for("test", dtype=jnp.float32)
    params = init_params(cfg, jax.random.key(7))
    path = tmp_path / "ckpt"
    save_params(str(path), params)
    restored = restore_params(str(path), like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
