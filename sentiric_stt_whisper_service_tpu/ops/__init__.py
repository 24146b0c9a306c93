from .mel import (  # noqa: F401
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    mel_filterbank,
    pad_or_trim,
)
from .quant import (  # noqa: F401
    fuse_decoder_qkv,
    is_quantized,
    quantize_params,
    quantize_weight,
    quantize_xa_kv,
)


def compute_log_mel(audio, n_mels: int = 80, dtype=None):
    """Log-mel frontend: Pallas-fused kernel on TPU, jnp path elsewhere."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if jax.default_backend() == "tpu":
        from .pallas_mel import log_mel_spectrogram_fused

        return log_mel_spectrogram_fused(audio, n_mels=n_mels, dtype=dtype)
    return log_mel_spectrogram(audio, n_mels=n_mels, dtype=dtype)
