from .bpe import WhisperTokenizer, fallback_tokenizer  # noqa: F401
from .whisper_tokens import (  # noqa: F401
    LANGUAGES,
    N_TIMESTAMP_TOKENS,
    TIME_PRECISION,
    SpecialTokens,
    layout_for_vocab,
)
