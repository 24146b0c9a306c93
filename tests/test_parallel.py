"""Multi-chip sharding tests on the virtual 8-device CPU mesh: sharded
inference must match single-device numerics exactly (SURVEY.md §4
"multi-chip tests runnable on CPU")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.models import (
    config_for,
    encoder_apply,
    init_params,
)
from sentiric_stt_whisper_service_tpu.parallel import (
    data_sharding,
    make_mesh,
    param_shardings,
    shard_params,
)

import dataclasses


@pytest.fixture(scope="module")
def setup():
    # 8 heads so tp=4 divides cleanly.
    cfg = dataclasses.replace(
        config_for("test"),
        n_audio_state=128, n_audio_head=8,
        n_text_state=128, n_text_head=8,
        dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.key(0))
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 200, cfg.n_mels)),
        jnp.float32,
    )
    return cfg, params, mel


def test_mesh_shapes():
    assert make_mesh("1").shape == {"dp": 1, "tp": 1}
    assert make_mesh("2x4").shape == {"dp": 2, "tp": 4}
    assert make_mesh("auto").shape == {"dp": 8, "tp": 1}
    assert make_mesh("2x2x2").shape == {"dp": 2, "tp": 2, "sp": 2}
    with pytest.raises(ValueError):
        make_mesh("4x4")


def test_param_sharding_specs(setup):
    cfg, params, _ = setup
    mesh = make_mesh("2x4")
    shardings = param_shardings(mesh, params)
    blocks = shardings["encoder"]["blocks"]
    # qkv column-parallel, output row-parallel
    assert blocks["attn"]["q"]["w"].spec == jax.sharding.PartitionSpec(None, None, "tp")
    assert blocks["attn"]["o"]["w"].spec == jax.sharding.PartitionSpec(None, "tp", None)
    assert blocks["mlp_1"]["w"].spec == jax.sharding.PartitionSpec(None, None, "tp")
    assert blocks["mlp_2"]["w"].spec == jax.sharding.PartitionSpec(None, "tp", None)
    # layernorm replicated
    assert blocks["attn_ln"]["g"].spec == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("mesh_shape", ["2x4", "4x2", "1x8", "2x2x2", "1x1x8"])
def test_sharded_encoder_matches_single(setup, mesh_shape):
    """dp/tp meshes plus dp×tp×sp: the sp axis shards the encoder's
    residual-stream time dimension (parallel.seq_constraint; SURVEY.md
    §5.7) — numerics must be identical to single-device."""
    cfg, params, mel = setup
    want = np.asarray(encoder_apply(cfg, params, mel))

    mesh = make_mesh(mesh_shape)
    with jax.set_mesh(mesh):
        sharded = shard_params(mesh, params)
        mel_s = jax.device_put(mel, data_sharding(mesh, 3))
        got = np.asarray(jax.jit(encoder_apply, static_argnums=0)(cfg, sharded, mel_s))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_quantized_param_sharding_specs(setup):
    from sentiric_stt_whisper_service_tpu.ops.quant import quantize_params

    cfg, params, _ = setup
    mesh = make_mesh("2x4")
    shardings = param_shardings(mesh, quantize_params(params))
    P = jax.sharding.PartitionSpec
    blocks = shardings["encoder"]["blocks"]
    assert blocks["attn"]["q"]["w_q"].spec == P(None, None, "tp")
    assert blocks["attn"]["q"]["scale"].spec == P(None, "tp")
    assert blocks["attn"]["o"]["w_q"].spec == P(None, "tp", None)
    assert blocks["attn"]["o"]["scale"].spec == P()  # per-output, replicated
    assert blocks["mlp_1"]["w_q"].spec == P(None, None, "tp")
    dec = shardings["decoder"]
    assert dec["tok_emb_q"].spec == P()


def test_sharded_quantized_decode_matches_single(setup):
    """int8 weights + int8 cross-KV under (dp, tp): same tokens as the
    single-device quantized decode."""
    from sentiric_stt_whisper_service_tpu.models import (
        TokenIds,
        build_suppress_mask,
        decode_window,
        precompute_xa_kv,
    )
    from sentiric_stt_whisper_service_tpu.ops.quant import (
        quantize_params,
        quantize_xa_kv,
    )
    from sentiric_stt_whisper_service_tpu.parallel import xa_kv_shardings
    from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

    cfg, params, mel = setup
    qparams = quantize_params(params)
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, ()))
    sot = tok.sot_sequence("en")
    tinit = np.full((4, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)

    def run(p, m):
        xa_q = quantize_xa_kv(precompute_xa_kv(cfg, p, encoder_apply(cfg, p, m)))
        return decode_window(
            cfg, p, xa_q, tinit, len(sot), 0, ids, sup,
            jnp.float32(0.0), jax.random.key(1), max_len=len(sot) + 12,
        )

    want = run(qparams, mel)

    mesh = make_mesh("2x4")
    with jax.set_mesh(mesh):
        got = run(
            shard_params(mesh, qparams), jax.device_put(mel, data_sharding(mesh, 3))
        )
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(want.tokens))


def test_sharded_decode_matches_single(setup):
    from sentiric_stt_whisper_service_tpu.models import (
        TokenIds,
        build_suppress_mask,
        decode_window,
        precompute_xa_kv,
    )
    from sentiric_stt_whisper_service_tpu.tokenizer import fallback_tokenizer

    cfg, params, mel = setup
    tok = fallback_tokenizer()
    ids = TokenIds.from_tokenizer(tok)
    sup = jnp.asarray(build_suppress_mask(cfg.n_vocab, ids, ()))
    sot = tok.sot_sequence("en")
    tinit = np.full((4, cfg.n_text_ctx), ids.eot, np.int32)
    tinit[:, : len(sot)] = sot
    tinit = jnp.asarray(tinit)

    def run():
        xa_kv = precompute_xa_kv(cfg, params_in[0], encoder_apply(cfg, params_in[0], mel_in[0]))
        return decode_window(
            cfg, params_in[0], xa_kv, tinit, len(sot), 0, ids, sup,
            jnp.float32(0.0), jax.random.key(1), max_len=len(sot) + 12,
        )

    params_in = [params]
    mel_in = [mel]
    want = run()

    mesh = make_mesh("2x4")
    with jax.set_mesh(mesh):
        params_in = [shard_params(mesh, params)]
        mel_in = [jax.device_put(mel, data_sharding(mesh, 3))]
        got = run()
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(want.tokens))
    np.testing.assert_allclose(
        np.asarray(got.avg_logprobs), np.asarray(want.avg_logprobs), atol=1e-4
    )
