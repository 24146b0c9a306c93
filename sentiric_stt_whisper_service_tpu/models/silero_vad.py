"""Silero VAD v5 in JAX — the reference's speech gate, TPU-native.

The reference runs Silero through whisper.cpp's VAD support
(/root/reference/src/stt_engine.cpp:44-52,108-115, model
``ggml-silero-v6.2.0.bin`` per config.h:25-28). whisper.cpp evaluates the
model chunk-by-chunk on CPU; here the heavy parts (STFT conv + encoder
convs) run batched over ALL chunks in one XLA call and only the tiny
LSTM-cell recurrence is sequential, as a ``lax.scan`` — one jit, no
per-chunk host round-trips.

Architecture (Silero v5 JIT graph, shapes match whisper.cpp's
convert-silero-vad-to-ggml tensor dump):

  input: 16 kHz mono, consumed in 512-sample chunks with the previous
  chunk's last 64 samples as context (576 samples per step)
  stft:    reflect-pad 64, conv1d with the fixed 258×1×256 forward-basis
           (hop 128) → 129 real + 129 imag → magnitude [129, 4]
  encoder: 4 × (conv1d k=3 pad=1 + ReLU), channels 129→128→64→64→128,
           strides 1,2,2,1 → [128, 1] per chunk
  decoder: LSTMCell(128→128) carried across chunks, then
           ReLU → conv1d k=1 (128→1) → sigmoid → one speech prob per
           chunk (32 ms)

Gating semantics on top of the probs live in ``runtime/vad.py`` (same
threshold/min-duration rules as the reference's settings).
"""

from __future__ import annotations

import dataclasses
import functools
import struct
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
CHUNK = 512  # samples per VAD step (32 ms @ 16 kHz)
CONTEXT = 64  # samples of lookback context prepended to each chunk
N_FFT = 256
HOP = 128
N_FREQ = 129  # kept magnitude bins
STATE_DIM = 128

# (name suffix, shape) of every tensor in the ggml-silero container
# (whisper.cpp models/convert-silero-vad-to-ggml.py dump of the v5 JIT).
TENSOR_SHAPES = {
    "stft.forward_basis_buffer": (258, 1, 256),
    "encoder.0.reparam_conv.weight": (128, 129, 3),
    "encoder.0.reparam_conv.bias": (128,),
    "encoder.1.reparam_conv.weight": (64, 128, 3),
    "encoder.1.reparam_conv.bias": (64,),
    "encoder.2.reparam_conv.weight": (64, 64, 3),
    "encoder.2.reparam_conv.bias": (64,),
    "encoder.3.reparam_conv.weight": (128, 64, 3),
    "encoder.3.reparam_conv.bias": (128,),
    "decoder.rnn.weight_ih": (512, 128),
    "decoder.rnn.weight_hh": (512, 128),
    "decoder.rnn.bias_ih": (512,),
    "decoder.rnn.bias_hh": (512,),
    "decoder.decoder.2.weight": (1, 128, 1),
    "decoder.decoder.2.bias": (1,),
}

_ENC_STRIDES = (1, 2, 2, 1)


def _stft_basis() -> np.ndarray:
    """The fixed forward-basis: rows are hann-windowed DFT kernels
    (reconstruction of silero's ``stft.forward_basis_buffer``; real file
    overrides this when loaded)."""
    n = N_FFT
    window = np.hanning(n + 1)[:-1].astype(np.float64)  # periodic hann
    k = np.arange(n // 2 + 1)[:, None]  # 129 bins
    t = np.arange(n)[None, :]
    angle = -2.0 * np.pi * k * t / n
    real = np.cos(angle) * window
    imag = np.sin(angle) * window
    return np.concatenate([real, imag], axis=0)[:, None, :].astype(np.float32)


def init_silero_params(key: Optional[jax.Array] = None) -> dict:
    """Silero-v5-shaped params; random (for tests) except the STFT basis."""
    key = key if key is not None else jax.random.key(0)
    ks = iter(jax.random.split(key, len(TENSOR_SHAPES)))
    params: dict[str, Any] = {}
    for name, shape in TENSOR_SHAPES.items():
        if name == "stft.forward_basis_buffer":
            params[name] = jnp.asarray(_stft_basis())
        elif name.endswith("bias"):
            params[name] = jnp.zeros(shape, jnp.float32)
        else:
            fan_in = int(np.prod(shape[1:])) or 1
            params[name] = (
                jax.random.normal(next(ks), shape, jnp.float32)
                / np.sqrt(fan_in)
            )
    return params


def _conv1d_ncw(x, w, b, stride: int, pad: int):
    """x [B, C, T], torch-layout w [O, I, K] → [B, O, T']."""
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(pad, pad)],
        dimension_numbers=("NCT", "OIT", "NCT"),
    )
    return y + b[None, :, None]


@jax.jit
def silero_frame_probs(params: dict, audio: jnp.ndarray) -> jnp.ndarray:
    """audio [N] float32 @16 kHz → [N // 512] speech probabilities.

    Chunk framing and convs are batched over all chunks at once; only the
    128-wide LSTM cell scans sequentially (microseconds of work)."""
    n = audio.shape[0]
    n_chunks = n // CHUNK
    x = audio[: n_chunks * CHUNK].reshape(n_chunks, CHUNK)
    # context: last 64 samples of the previous chunk (zeros for the first)
    ctx = jnp.concatenate(
        [jnp.zeros((1, CONTEXT), audio.dtype), x[:-1, -CONTEXT:]], axis=0
    )
    frames = jnp.concatenate([ctx, x], axis=1)  # [n_chunks, 576]

    # STFT: reflect-pad 64 each side, conv with the forward basis, hop 128.
    padded = jnp.pad(frames, ((0, 0), (CONTEXT, CONTEXT)), mode="reflect")
    spec = _conv1d_ncw(
        padded[:, None, :], params["stft.forward_basis_buffer"],
        jnp.zeros((258,), jnp.float32), stride=HOP, pad=0,
    )  # [n_chunks, 258, 4]
    real, imag = spec[:, :N_FREQ], spec[:, N_FREQ : 2 * N_FREQ]
    mag = jnp.sqrt(real * real + imag * imag + 1e-12)  # [n_chunks, 129, 4]

    h = mag
    for i, stride in enumerate(_ENC_STRIDES):
        h = _conv1d_ncw(
            h,
            params[f"encoder.{i}.reparam_conv.weight"],
            params[f"encoder.{i}.reparam_conv.bias"],
            stride=stride,
            pad=1,
        )
        h = jax.nn.relu(h)
    feats = h[:, :, 0]  # [n_chunks, 128]

    # LSTM cell across chunks (torch LSTMCell gate order i, f, g, o).
    w_ih = params["decoder.rnn.weight_ih"].T  # [128, 512]
    w_hh = params["decoder.rnn.weight_hh"].T
    bias = params["decoder.rnn.bias_ih"] + params["decoder.rnn.bias_hh"]

    def cell(carry, xt):
        h_t, c_t = carry
        gates = xt @ w_ih + h_t @ w_hh + bias
        i_g, f_g, g_g, o_g = jnp.split(gates, 4)
        c_t = jax.nn.sigmoid(f_g) * c_t + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
        h_t = jax.nn.sigmoid(o_g) * jnp.tanh(c_t)
        return (h_t, c_t), h_t

    init = (jnp.zeros((STATE_DIM,)), jnp.zeros((STATE_DIM,)))
    _, hs = jax.lax.scan(cell, init, feats)  # [n_chunks, 128]

    out_w = params["decoder.decoder.2.weight"][:, :, 0]  # [1, 128]
    out_b = params["decoder.decoder.2.bias"]
    logits = jax.nn.relu(hs) @ out_w.T + out_b  # [n_chunks, 1]
    return jax.nn.sigmoid(logits)[:, 0]


# ---------------------------------------------------------------------------
# GGML container IO (ggml-silero-*.bin from ggml-org/whisper-vad)
# ---------------------------------------------------------------------------


def _scan_tensor_records(buf: bytes) -> dict[str, np.ndarray]:
    """Locate whisper.cpp-style tensor records by name.

    Each record is ``{i32 n_dims, i32 name_len, i32 ttype, i32 ne[n_dims],
    name bytes, f32/f16 data}``. Anchoring on the known tensor names makes
    the parse independent of the hparams blob that precedes the records
    (which has changed across whisper.cpp releases)."""
    out: dict[str, np.ndarray] = {}
    for suffix, shape in TENSOR_SHAPES.items():
        for name in (f"_model.{suffix}", suffix):
            pos = buf.find(name.encode())
            if pos < 0:
                continue
            nd = len(shape)
            head_at = pos - (12 + 4 * nd)
            if head_at < 0:
                continue
            n_dims, name_len, ttype = struct.unpack_from("<3i", buf, head_at)
            if n_dims != nd or name_len != len(name) or ttype not in (0, 1):
                continue
            ne = struct.unpack_from(f"<{nd}i", buf, head_at + 12)
            if tuple(reversed(ne)) != shape:
                continue
            n_elems = int(np.prod(shape))
            data_at = pos + name_len
            dt = "<f4" if ttype == 0 else "<f2"
            arr = np.frombuffer(buf, dt, count=n_elems, offset=data_at)
            out[suffix] = arr.astype(np.float32).reshape(shape)
            break
    return out


def load_silero_ggml(path: str) -> dict:
    """Parse a ggml-silero .bin → param dict for :func:`silero_frame_probs`.

    Raises ValueError if any expected tensor is missing."""
    with open(path, "rb") as f:
        buf = f.read()
    tensors = _scan_tensor_records(buf)
    missing = set(TENSOR_SHAPES) - set(tensors)
    if missing:
        raise ValueError(f"silero ggml missing tensors: {sorted(missing)}")
    return {k: jnp.asarray(v) for k, v in tensors.items()}


def write_silero_ggml(path: str, params: dict):
    """Write params in the whisper.cpp VAD container layout (test oracle +
    conversion tooling). Uses the ``_model.``-prefixed names of the
    upstream convert script."""
    with open(path, "wb") as f:
        f.write(struct.pack("<i", 0x67676D6C))  # magic "ggml"
        f.write(struct.pack("<i", 1))  # version tag
        for suffix, shape in TENSOR_SHAPES.items():
            name = f"_model.{suffix}".encode()
            arr = np.asarray(params[suffix], np.float32)
            assert arr.shape == shape, (suffix, arr.shape, shape)
            ne = tuple(reversed(shape))
            f.write(struct.pack("<3i", arr.ndim, len(name), 0))
            f.write(struct.pack(f"<{arr.ndim}i", *ne))
            f.write(name)
            f.write(arr.astype("<f4").tobytes())


@dataclasses.dataclass
class SileroVad:
    """Callable adapter for ``runtime.vad.set_vad_model``: returns per-chunk
    (32 ms) speech probabilities for a whole clip in one jitted call."""

    params: dict

    frame_ms: float = CHUNK * 1000.0 / SAMPLE_RATE  # 32 ms

    @classmethod
    def from_ggml(cls, path: str) -> "SileroVad":
        return cls(load_silero_ggml(path))

    @classmethod
    def random_init(cls, seed: int = 0) -> "SileroVad":
        return cls(init_silero_params(jax.random.key(seed)))

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        a = jnp.asarray(np.asarray(audio, np.float32))
        if a.shape[0] < CHUNK:
            return np.zeros((0,), np.float32)
        return np.asarray(silero_frame_probs(self.params, a))
