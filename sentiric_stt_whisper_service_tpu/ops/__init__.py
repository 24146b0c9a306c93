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
