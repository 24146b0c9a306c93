"""Checkpoint loader tests: GGML round-trip, quantized dequant, safetensors."""

import io
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sentiric_stt_whisper_service_tpu.checkpoint.ggml import (
    GGML_MAGIC,
    _dequantize,
    load_ggml,
    params_from_ggml,
    read_ggml,
    write_ggml,
)
from sentiric_stt_whisper_service_tpu.checkpoint.manager import ModelManager
from sentiric_stt_whisper_service_tpu.checkpoint.safetensors_io import (
    params_from_hf_state,
)
from sentiric_stt_whisper_service_tpu.models import config_for, init_params


@pytest.fixture(scope="module")
def mini():
    cfg = config_for("test", dtype=jnp.float32)
    params = init_params(cfg, jax.random.key(3))
    return cfg, params


def test_ggml_roundtrip(mini, tmp_path):
    cfg, params = mini
    vocab = [f"tok{i}".encode() for i in range(256)]
    path = tmp_path / "ggml-test.bin"
    with open(path, "wb") as f:
        write_ggml(f, cfg, params, vocab)
    cfg2, params2, vocab2, n_vocab = load_ggml(str(path), dtype=jnp.float32)
    assert n_vocab == cfg.n_vocab
    assert cfg2.n_audio_state == cfg.n_audio_state
    assert cfg2.n_text_layer == cfg.n_text_layer
    assert vocab2[:256] == vocab
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ggml_f16_roundtrip(mini, tmp_path):
    cfg, params = mini
    path = tmp_path / "ggml-f16.bin"
    with open(path, "wb") as f:
        write_ggml(f, cfg, params, [b"x"], ftype=1)
    _, params2, _, _ = load_ggml(str(path), dtype=jnp.float32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        read_ggml(io.BytesIO(struct.pack("<i", 0x1234)))


class TestDequant:
    def test_q8_0(self):
        # one block: d=0.5, q = -3..28
        d = np.float16(0.5).tobytes()
        q = np.arange(-3, 29, dtype=np.int8).tobytes()
        out = _dequantize(d + q, 8, 32)
        np.testing.assert_allclose(out, np.arange(-3, 29) * 0.5, atol=1e-3)

    def test_q4_0(self):
        d = np.float16(2.0).tobytes()
        nibs = bytes(
            [(1 | (9 << 4))] * 16
        )  # lo nibble 1 → (1-8)*2=-14; hi 9 → (9-8)*2=2
        out = _dequantize(d + nibs, 2, 32)
        np.testing.assert_allclose(out[:16], -14.0)
        np.testing.assert_allclose(out[16:], 2.0)

    def test_q4_1(self):
        d = np.float16(1.0).tobytes()
        m = np.float16(10.0).tobytes()
        nibs = bytes([(3 | (7 << 4))] * 16)
        out = _dequantize(d + m + nibs, 3, 32)
        np.testing.assert_allclose(out[:16], 13.0)
        np.testing.assert_allclose(out[16:], 17.0)

    def test_q5_0(self):
        d = np.float16(1.0).tobytes()
        qh = np.uint32(0xFFFFFFFF).tobytes()  # all 5th bits set
        nibs = bytes([0] * 16)
        out = _dequantize(d + qh + nibs, 6, 32)
        # x = (0 | 16) - 16 = 0 everywhere
        np.testing.assert_allclose(out, 0.0)

    def test_q5_1(self):
        d = np.float16(2.0).tobytes()
        m = np.float16(1.0).tobytes()
        qh = np.uint32(0).tobytes()
        nibs = bytes([(2 | (4 << 4))] * 16)
        out = _dequantize(d + m + qh + nibs, 7, 32)
        np.testing.assert_allclose(out[:16], 5.0)  # 2*2+1
        np.testing.assert_allclose(out[16:], 9.0)  # 4*2+1


def test_hf_safetensors_mapping(mini):
    cfg, params = mini
    # Build an HF-style state dict from our params (inverse mapping).
    state = {}
    enc, dec = params["encoder"], params["decoder"]

    def put_lin(name, p, bias=True):
        state[name + ".weight"] = np.asarray(p["w"]).T
        if bias:
            state[name + ".bias"] = np.asarray(p["b"])

    def put_ln(name, p):
        state[name + ".weight"] = np.asarray(p["g"])
        state[name + ".bias"] = np.asarray(p["b"])

    state["model.encoder.conv1.weight"] = np.asarray(enc["conv1"]["w"]).transpose(2, 1, 0)
    state["model.encoder.conv1.bias"] = np.asarray(enc["conv1"]["b"])
    state["model.encoder.conv2.weight"] = np.asarray(enc["conv2"]["w"]).transpose(2, 1, 0)
    state["model.encoder.conv2.bias"] = np.asarray(enc["conv2"]["b"])
    state["model.encoder.embed_positions.weight"] = np.asarray(enc["pos"])
    state["model.decoder.embed_tokens.weight"] = np.asarray(dec["tok_emb"])
    state["model.decoder.embed_positions.weight"] = np.asarray(dec["pos_emb"])
    put_ln("model.encoder.layer_norm", enc["ln_post"])
    put_ln("model.decoder.layer_norm", dec["ln"])
    for i in range(cfg.n_audio_layer):
        blk = jax.tree.map(lambda x, i=i: x[i], enc["blocks"])
        p = f"model.encoder.layers.{i}"
        put_ln(p + ".self_attn_layer_norm", blk["attn_ln"])
        put_lin(p + ".self_attn.q_proj", blk["attn"]["q"])
        put_lin(p + ".self_attn.k_proj", blk["attn"]["k"], bias=False)
        put_lin(p + ".self_attn.v_proj", blk["attn"]["v"])
        put_lin(p + ".self_attn.out_proj", blk["attn"]["o"])
        put_ln(p + ".final_layer_norm", blk["mlp_ln"])
        put_lin(p + ".fc1", blk["mlp_1"])
        put_lin(p + ".fc2", blk["mlp_2"])
    for i in range(cfg.n_text_layer):
        blk = jax.tree.map(lambda x, i=i: x[i], dec["blocks"])
        p = f"model.decoder.layers.{i}"
        put_ln(p + ".self_attn_layer_norm", blk["attn_ln"])
        put_lin(p + ".self_attn.q_proj", blk["attn"]["q"])
        put_lin(p + ".self_attn.k_proj", blk["attn"]["k"], bias=False)
        put_lin(p + ".self_attn.v_proj", blk["attn"]["v"])
        put_lin(p + ".self_attn.out_proj", blk["attn"]["o"])
        put_ln(p + ".encoder_attn_layer_norm", blk["cross_attn_ln"])
        put_lin(p + ".encoder_attn.q_proj", blk["cross_attn"]["q"])
        put_lin(p + ".encoder_attn.k_proj", blk["cross_attn"]["k"], bias=False)
        put_lin(p + ".encoder_attn.v_proj", blk["cross_attn"]["v"])
        put_lin(p + ".encoder_attn.out_proj", blk["cross_attn"]["o"])
        put_ln(p + ".final_layer_norm", blk["mlp_ln"])
        put_lin(p + ".fc1", blk["mlp_1"])
        put_lin(p + ".fc2", blk["mlp_2"])

    cfg2, params2 = params_from_hf_state(state, dtype=jnp.float32)
    assert cfg2.n_audio_state == cfg.n_audio_state
    assert cfg2.n_vocab == cfg.n_vocab
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_model_name_normalization():
    assert ModelManager.model_name_from_filename("ggml-medium.bin") == "medium"
    assert ModelManager.model_name_from_filename("ggml-large-v3.bin") == "large-v3"
    assert ModelManager.model_name_from_filename("custom.bin") == "custom"


# ---------------------------------------------------------------------------
# k-quant dequantization (q4_K / q5_K / q6_K) vs scalar ggml-port oracles
# ---------------------------------------------------------------------------


def _oracle_scale_min_k4(j, q):
    if j < 4:
        return q[j] & 63, q[j + 4] & 63
    d = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4)
    m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4)
    return d, m


def _oracle_q4k(block):
    import numpy as np
    d = np.frombuffer(block[0:2], "<f2")[0].astype(np.float32)
    dmin = np.frombuffer(block[2:4], "<f2")[0].astype(np.float32)
    scales = block[4:16]
    qs = block[16:144]
    y = []
    is_ = 0
    q = 0
    for _j in range(0, 256, 64):
        sc1, m1 = _oracle_scale_min_k4(is_, scales)
        sc2, m2 = _oracle_scale_min_k4(is_ + 1, scales)
        for l in range(32):
            y.append(float(d) * sc1 * (qs[q + l] & 0xF) - float(dmin) * m1)
        for l in range(32):
            y.append(float(d) * sc2 * (qs[q + l] >> 4) - float(dmin) * m2)
        q += 32
        is_ += 2
    return np.asarray(y, np.float32)


def _oracle_q5k(block):
    import numpy as np
    d = np.frombuffer(block[0:2], "<f2")[0].astype(np.float32)
    dmin = np.frombuffer(block[2:4], "<f2")[0].astype(np.float32)
    scales = block[4:16]
    qh = block[16:48]
    qs = block[48:176]
    y = []
    is_ = 0
    q = 0
    u1, u2 = 1, 2
    for _j in range(0, 256, 64):
        sc1, m1 = _oracle_scale_min_k4(is_, scales)
        sc2, m2 = _oracle_scale_min_k4(is_ + 1, scales)
        for l in range(32):
            v = (qs[q + l] & 0xF) + (16 if qh[l] & u1 else 0)
            y.append(float(d) * sc1 * v - float(dmin) * m1)
        for l in range(32):
            v = (qs[q + l] >> 4) + (16 if qh[l] & u2 else 0)
            y.append(float(d) * sc2 * v - float(dmin) * m2)
        q += 32
        is_ += 2
        u1 <<= 2
        u2 <<= 2
    return np.asarray(y, np.float32)


def _oracle_q6k(block):
    import numpy as np
    ql = block[0:128]
    qh = block[128:192]
    sc = np.frombuffer(block[192:208], np.int8)
    d = np.frombuffer(block[208:210], "<f2")[0].astype(np.float32)
    y = np.zeros(256, np.float32)
    for half in range(2):
        base = half * 128
        qlh = ql[half * 64 :]
        qhh = qh[half * 32 :]
        sch = sc[half * 8 :]
        for l in range(32):
            is_ = l // 16
            q1 = ((qlh[l] & 0xF) | (((qhh[l] >> 0) & 3) << 4)) - 32
            q2 = ((qlh[l + 32] & 0xF) | (((qhh[l] >> 2) & 3) << 4)) - 32
            q3 = ((qlh[l] >> 4) | (((qhh[l] >> 4) & 3) << 4)) - 32
            q4 = ((qlh[l + 32] >> 4) | (((qhh[l] >> 6) & 3) << 4)) - 32
            y[base + l] = float(d) * sch[is_] * q1
            y[base + l + 32] = float(d) * sch[is_ + 2] * q2
            y[base + l + 64] = float(d) * sch[is_ + 4] * q3
            y[base + l + 96] = float(d) * sch[is_ + 6] * q4
    return y


def test_kquant_dequant_matches_scalar_oracle():
    from sentiric_stt_whisper_service_tpu.checkpoint.ggml import (
        _QUANT_BLOCKS,
        _dequantize,
    )

    rng = np.random.default_rng(11)
    oracles = {12: _oracle_q4k, 13: _oracle_q5k, 14: _oracle_q6k}
    for ttype, oracle in oracles.items():
        _, blk_bytes = _QUANT_BLOCKS[ttype]
        n_blocks = 5
        raw = rng.integers(0, 256, n_blocks * blk_bytes, dtype=np.uint8)
        # keep fp16 d/dmin finite/sane
        for i in range(n_blocks):
            off = i * blk_bytes + (208 if ttype == 14 else 0)
            raw[off : off + 2] = np.frombuffer(
                np.float16(rng.uniform(0.01, 0.2)).tobytes(), np.uint8
            )
            if ttype in (12, 13):
                raw[i * blk_bytes + 2 : i * blk_bytes + 4] = np.frombuffer(
                    np.float16(rng.uniform(0.01, 0.2)).tobytes(), np.uint8
                )
        got = _dequantize(raw.tobytes(), ttype, n_blocks * 256)
        want = np.concatenate(
            [oracle(raw[i * blk_bytes : (i + 1) * blk_bytes].tobytes())
             for i in range(n_blocks)]
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"ttype {ttype}")
