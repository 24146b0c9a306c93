from .whisper import (  # noqa: F401
    WhisperConfig,
    config_for,
    decoder_apply,
    encode,
    encode_xa_kv,
    encoder_apply,
    init_kv_cache,
    init_params,
    param_count,
    precompute_xa_kv,
    sinusoids,
)
from .sampling import (  # noqa: F401
    DecodeResult,
    TokenIds,
    apply_timestamp_rules,
    build_suppress_mask,
    decode_window,
)
from .speculative import decode_window_spec  # noqa: F401
