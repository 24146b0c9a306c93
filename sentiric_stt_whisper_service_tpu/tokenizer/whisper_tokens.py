"""Whisper vocabulary layout: languages, special tokens, timestamp tokens.

The reference delegates all tokenization to whisper.cpp (SURVEY.md §2.3:
"BPE tokenizer + special tokens (EOT gate at whisper_token_eot)"). Here the
layout is derived programmatically from two numbers — the base BPE vocab
size and the number of language tokens — which covers every Whisper family
member:

  english (gpt2):    base 50256, 99 langs  → n_vocab 51864, eot 50256
  multilingual:      base 50257, 99 langs  → n_vocab 51865, eot 50257
  large-v3 family:   base 50257, 100 langs → n_vocab 51866, eot 50257
"""

from __future__ import annotations

# Whisper language order (training-data-descending). The first 99 are the
# classic multilingual set; "yue" (#100) exists only in large-v3 vocabs.
LANGUAGES = (
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el ms "
    "cs ro da hu ta no th ur hr bg lt la mi ml cy sk te fa lv bn sr az sl kn "
    "et mk br eu is hy ne mn bs kk sq sw gl mr pa si km sn yo so af oc ka be "
    "tg sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as tt haw ln "
    "ha ba jw su yue"
).split()

LANGUAGE_NAMES = {
    "en": "english", "zh": "chinese", "de": "german", "es": "spanish",
    "ru": "russian", "ko": "korean", "fr": "french", "ja": "japanese",
    "pt": "portuguese", "tr": "turkish", "pl": "polish", "nl": "dutch",
    "ar": "arabic", "it": "italian", "hi": "hindi", "uk": "ukrainian",
    "el": "greek", "cs": "czech", "ro": "romanian", "da": "danish",
    "hu": "hungarian", "no": "norwegian", "th": "thai", "ur": "urdu",
    "hr": "croatian", "bg": "bulgarian", "fi": "finnish", "sv": "swedish",
    "he": "hebrew", "id": "indonesian", "vi": "vietnamese", "ja": "japanese",
}

N_TIMESTAMP_TOKENS = 1501  # <|0.00|> .. <|30.00|> in 0.02 s steps
TIME_PRECISION = 0.02  # seconds per timestamp token step


class SpecialTokens:
    """Special-token ids for a given (base_vocab, num_languages) layout."""

    def __init__(self, base_vocab: int, num_languages: int = 99):
        self.base_vocab = base_vocab
        self.num_languages = num_languages
        self.eot = base_vocab  # <|endoftext|>
        self.sot = base_vocab + 1  # <|startoftranscript|>
        self.language_begin = base_vocab + 2  # <|en|> ...
        self.translate = self.language_begin + num_languages
        self.transcribe = self.translate + 1
        self.sot_lm = self.transcribe + 1  # <|startoflm|>
        self.sot_prev = self.sot_lm + 1  # <|startofprev|>
        self.no_speech = self.sot_prev + 1  # <|nospeech|>
        self.no_timestamps = self.no_speech + 1  # <|notimestamps|>
        self.timestamp_begin = self.no_timestamps + 1  # <|0.00|>
        self.n_vocab = self.timestamp_begin + N_TIMESTAMP_TOKENS

    def language_token(self, lang: str) -> int:
        lang = lang.lower()
        if lang not in LANGUAGES[: self.num_languages]:
            raise KeyError(f"unknown language: {lang!r}")
        return self.language_begin + LANGUAGES.index(lang)

    def token_language(self, token_id: int) -> str:
        idx = token_id - self.language_begin
        if not 0 <= idx < self.num_languages:
            raise KeyError(f"token {token_id} is not a language token")
        return LANGUAGES[idx]

    def is_timestamp(self, token_id: int) -> bool:
        return token_id >= self.timestamp_begin

    def timestamp_to_seconds(self, token_id: int) -> float:
        return (token_id - self.timestamp_begin) * TIME_PRECISION

    def special_token_string(self, token_id: int) -> str:
        """Render a special token id to its <|...|> string form."""
        if token_id == self.eot:
            return "<|endoftext|>"
        if token_id == self.sot:
            return "<|startoftranscript|>"
        if self.language_begin <= token_id < self.language_begin + self.num_languages:
            return f"<|{self.token_language(token_id)}|>"
        if token_id == self.translate:
            return "<|translate|>"
        if token_id == self.transcribe:
            return "<|transcribe|>"
        if token_id == self.sot_lm:
            return "<|startoflm|>"
        if token_id == self.sot_prev:
            return "<|startofprev|>"
        if token_id == self.no_speech:
            return "<|nospeech|>"
        if token_id == self.no_timestamps:
            return "<|notimestamps|>"
        if self.is_timestamp(token_id) and token_id < self.n_vocab:
            return f"<|{self.timestamp_to_seconds(token_id):.2f}|>"
        raise KeyError(f"token {token_id} is not special")


def layout_for_vocab(n_vocab: int) -> SpecialTokens:
    """Infer the special-token layout from a checkpoint's n_vocab."""
    if n_vocab == 51864:
        return SpecialTokens(50256, 99)  # english gpt2 models
    if n_vocab == 51865:
        return SpecialTokens(50257, 99)  # multilingual v1/v2
    if n_vocab == 51866:
        return SpecialTokens(50257, 100)  # large-v3 / turbo
    # Non-standard (e.g. test minis): assume multilingual layout with 99
    # langs and whatever base vocab makes the math work.
    base = n_vocab - (2 + 99 + 2 + 2 + 2 + N_TIMESTAMP_TOKENS)
    if base <= 0:
        raise ValueError(f"vocab too small for whisper layout: {n_vocab}")
    return SpecialTokens(base, 99)
