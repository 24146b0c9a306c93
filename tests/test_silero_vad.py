"""Silero VAD v5 JAX implementation (models/silero_vad.py).

Numerics are validated against a torch (CPU) re-execution of the same
graph — F.conv1d + nn.LSTMCell are the external oracle for the batched
convs and the lax.scan recurrence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sentiric_stt_whisper_service_tpu.models.silero_vad import (
    CHUNK,
    CONTEXT,
    HOP,
    N_FREQ,
    TENSOR_SHAPES,
    SileroVad,
    init_silero_params,
    load_silero_ggml,
    silero_frame_probs,
    write_silero_ggml,
)


@pytest.fixture(scope="module")
def params():
    return init_silero_params(jax.random.key(7))


def test_output_shape(params):
    audio = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    probs = np.asarray(silero_frame_probs(params, jnp.asarray(audio)))
    assert probs.shape == (16000 // CHUNK,)
    assert ((probs >= 0) & (probs <= 1)).all()


def test_ggml_roundtrip(tmp_path, params):
    path = tmp_path / "ggml-silero-test.bin"
    write_silero_ggml(str(path), params)
    loaded = load_silero_ggml(str(path))
    assert set(loaded) == set(TENSOR_SHAPES)
    for k in TENSOR_SHAPES:
        np.testing.assert_allclose(
            np.asarray(loaded[k]), np.asarray(params[k]), rtol=1e-6
        )
    audio = np.random.default_rng(1).standard_normal(8192).astype(np.float32)
    a = np.asarray(silero_frame_probs(params, jnp.asarray(audio)))
    b = np.asarray(silero_frame_probs(loaded, jnp.asarray(audio)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_torch_oracle(params):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    audio = rng.standard_normal(CHUNK * 6).astype(np.float32)

    p = {k: torch.tensor(np.asarray(v)) for k, v in params.items()}
    x = torch.tensor(audio).reshape(-1, CHUNK)
    ctx = torch.cat([torch.zeros(1, CONTEXT), x[:-1, -CONTEXT:]], dim=0)
    frames = torch.cat([ctx, x], dim=1)
    padded = F.pad(frames[:, None, :], (CONTEXT, CONTEXT), mode="reflect")
    spec = F.conv1d(padded, p["stft.forward_basis_buffer"], stride=HOP)
    real, imag = spec[:, :N_FREQ], spec[:, N_FREQ : 2 * N_FREQ]
    h = torch.sqrt(real**2 + imag**2 + 1e-12)
    for i, stride in enumerate((1, 2, 2, 1)):
        h = F.conv1d(
            h,
            p[f"encoder.{i}.reparam_conv.weight"],
            p[f"encoder.{i}.reparam_conv.bias"],
            stride=stride,
            padding=1,
        ).relu()
    feats = h[:, :, 0]

    cell = torch.nn.LSTMCell(128, 128)
    with torch.no_grad():
        cell.weight_ih.copy_(p["decoder.rnn.weight_ih"])
        cell.weight_hh.copy_(p["decoder.rnn.weight_hh"])
        cell.bias_ih.copy_(p["decoder.rnn.bias_ih"])
        cell.bias_hh.copy_(p["decoder.rnn.bias_hh"])
        hx = torch.zeros(1, 128)
        cx = torch.zeros(1, 128)
        outs = []
        for t in range(feats.shape[0]):
            hx, cx = cell(feats[t : t + 1], (hx, cx))
            outs.append(hx)
        hs = torch.cat(outs, dim=0)
        logits = F.conv1d(
            hs.relu()[:, :, None],
            p["decoder.decoder.2.weight"],
            p["decoder.decoder.2.bias"],
        )
        want = torch.sigmoid(logits)[:, 0, 0].numpy()

    got = np.asarray(silero_frame_probs(params, jnp.asarray(audio)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_gate_integration(tmp_path, params):
    from sentiric_stt_whisper_service_tpu.runtime.vad import (
        is_speech_detected,
        load_silero,
        set_vad_model,
    )

    path = tmp_path / "ggml-silero-test.bin"
    write_silero_ggml(str(path), params)
    assert load_silero(str(path))
    try:
        # Random weights give arbitrary probs; just exercise the gate.
        audio = np.zeros(16000, np.float32)
        assert is_speech_detected(audio, 16000, threshold=-1.0,
                                  min_duration_ms=64) in (True, False)
        # min_duration accounting must use the model's 32 ms frames: with
        # all frames active, 500 ms needs ≥ 16 chunks.
        set_vad_model(lambda a: np.ones(len(a) // CHUNK, np.float32),
                      frame_ms=32.0)
        assert is_speech_detected(np.zeros(CHUNK * 16, np.float32), 16000,
                                  0.75, 500)
        assert not is_speech_detected(np.zeros(CHUNK * 8, np.float32), 16000,
                                      0.75, 500)
    finally:
        set_vad_model(None)


def test_missing_tensor_raises(tmp_path, params):
    import struct

    path = tmp_path / "bad.bin"
    with open(path, "wb") as f:
        f.write(struct.pack("<i", 0x67676D6C))
        f.write(b"\x00" * 64)
    with pytest.raises(ValueError, match="missing tensors"):
        load_silero_ggml(str(path))


def _write_v620_style(path, params, shapes, f16=True, extra_tensor=True):
    """Byte-exact synthetic ggml-silero-v6.2.0 container: whisper.cpp
    record layout ({n_dims, name_len, ttype, ne[], name, data}) behind an
    hparams blob that differs from v5 (the scan must not depend on it),
    with f16 data and an extra unknown tensor interleaved (simulating
    container evolution across whisper.cpp releases)."""
    import struct

    with open(path, "wb") as f:
        f.write(struct.pack("<i", 0x67676D6C))  # magic "ggml"
        # v6-style hparams blob: different length/content than v5.
        f.write(struct.pack("<6i", 6, 2, 0, 129, 128, 512))
        f.write(struct.pack("<f", 0.75))
        items = list(shapes.items())
        for idx, (suffix, shape) in enumerate(items):
            if extra_tensor and idx == 2:
                # Unknown tensor the v5 table doesn't list.
                name = b"_model.some_new_v6_tensor"
                arr = np.zeros((4, 4), np.float32)
                f.write(struct.pack("<3i", 2, len(name), 0))
                f.write(struct.pack("<2i", 4, 4))
                f.write(name)
                f.write(arr.tobytes())
            name = f"_model.{suffix}".encode()
            arr = np.asarray(params[suffix], np.float32)
            ne = tuple(reversed(arr.shape))
            ttype = 1 if f16 else 0
            f.write(struct.pack("<3i", arr.ndim, len(name), ttype))
            f.write(struct.pack(f"<{arr.ndim}i", *ne))
            f.write(name)
            f.write(arr.astype("<f2" if f16 else "<f4").tobytes())


def test_v620_container_layout(tmp_path, params):
    """The provisioned checkpoint is ggml-silero-v6.2.0.bin
    (/root/reference/src/config.h:25-28). Zero-egress build: verify the
    parser against a byte-exact synthetic v6.2.0-style container — drifted
    hparams header, f16 data, _model. prefix, unknown extra tensors."""
    path = tmp_path / "ggml-silero-v6.2.0.bin"
    _write_v620_style(str(path), params, TENSOR_SHAPES)
    loaded = load_silero_ggml(str(path))
    assert set(loaded) == set(TENSOR_SHAPES)
    for k in TENSOR_SHAPES:
        np.testing.assert_allclose(
            np.asarray(loaded[k]), np.asarray(params[k]), atol=2e-3
        )  # f16 rounding
    audio = np.random.default_rng(2).standard_normal(8192).astype(np.float32)
    a = np.asarray(silero_frame_probs(params, jnp.asarray(audio)))
    b = np.asarray(silero_frame_probs(loaded, jnp.asarray(audio)))
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_v620_shape_drift_fails_loudly(tmp_path, params):
    """If a future Silero release changes a tensor shape, the loader must
    raise (→ serving logs VAD_FALLBACK_ENERGY), never half-parse."""
    drifted = dict(TENSOR_SHAPES)
    bad_params = dict(params)
    # Pretend v6 widened the LSTM: weight_ih becomes [768, 128].
    drifted["decoder.rnn.weight_ih"] = (768, 128)
    bad_params["decoder.rnn.weight_ih"] = np.zeros((768, 128), np.float32)
    path = tmp_path / "ggml-silero-v6.9.9.bin"
    _write_v620_style(str(path), bad_params, drifted, f16=False)
    with pytest.raises(ValueError, match="missing tensors"):
        load_silero_ggml(str(path))


def test_adapter(params):
    vad = SileroVad(params)
    assert vad.frame_ms == 32.0
    probs = vad(np.zeros(CHUNK * 4, np.float32))
    assert probs.shape == (4,)
    assert vad(np.zeros(10, np.float32)).shape == (0,)
