"""Byte-level BPE tokenizer for Whisper, built on tiktoken's rank engine.

Vocab sources, in order of preference:
  * a GGML checkpoint's embedded vocab (rank-ordered byte strings),
  * HF-style ``vocab.json`` + ``merges.txt`` on disk,
  * a ``*.tiktoken`` ranks file,
  * an offline byte-fallback vocab (256 single-byte tokens) for tests.

The reference service never touches tokenization directly — whisper.cpp owns
it (SURVEY.md §2.3). This module owns it here, including the dynamic
non-speech-token suppression set used by the quality gates
(``suppress_nst``, /root/reference/src/config.h:66).
"""

from __future__ import annotations

import base64
import functools
import json
import os
from typing import Iterable, Optional, Sequence

import tiktoken

from .whisper_tokens import (
    LANGUAGES,
    SpecialTokens,
    layout_for_vocab,
)

_GPT2_SPLIT_PATTERN = (
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


def _gpt2_byte_encoder() -> dict[int, str]:
    """GPT-2's reversible byte↔unicode mapping (for vocab.json decoding)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class WhisperTokenizer:
    """Whisper text tokenizer: byte-level BPE + special-token layout."""

    def __init__(
        self,
        mergeable_ranks: dict[bytes, int],
        num_languages: int = 99,
        name: str = "whisper",
    ):
        self.ranks = mergeable_ranks
        self.special = SpecialTokens(len(mergeable_ranks), num_languages)
        specials = {
            self.special.special_token_string(i): i
            for i in range(self.special.eot, self.special.n_vocab)
        }
        self._enc = tiktoken.Encoding(
            name=name,
            explicit_n_vocab=self.special.n_vocab,
            pat_str=_GPT2_SPLIT_PATTERN,
            mergeable_ranks=mergeable_ranks,
            special_tokens=specials,
        )

    # -- core ---------------------------------------------------------------
    @property
    def n_vocab(self) -> int:
        return self.special.n_vocab

    @property
    def eot(self) -> int:
        return self.special.eot

    def encode(self, text: str) -> list[int]:
        return self._enc.encode(text, disallowed_special=())

    def decode(self, ids: Iterable[int]) -> str:
        ids = [int(i) for i in ids if int(i) < self.special.eot]
        return self._enc.decode(ids)

    def decode_bytes(self, ids: Iterable[int]) -> bytes:
        ids = [int(i) for i in ids if int(i) < self.special.eot]
        return self._enc.decode_bytes(ids)

    def decode_with_timestamps(self, ids: Iterable[int]) -> str:
        out: list[str] = []
        chunk: list[int] = []
        for i in map(int, ids):
            if i >= self.special.eot:
                if chunk:
                    out.append(self._enc.decode(chunk))
                    chunk = []
                if i != self.special.eot:
                    out.append(self.special.special_token_string(i))
            else:
                chunk.append(i)
        if chunk:
            out.append(self._enc.decode(chunk))
        return "".join(out)

    def token_piece(self, token_id: int) -> str:
        """Single-token text (special tokens render as <|...|>)."""
        token_id = int(token_id)
        if token_id >= self.special.eot:
            return self.special.special_token_string(token_id)
        return self._enc.decode([token_id])

    # -- prompt assembly ----------------------------------------------------
    def sot_sequence(
        self,
        language: Optional[str] = None,
        task: str = "transcribe",
        with_timestamps: bool = True,
    ) -> list[int]:
        """[sot, lang, task(, notimestamps)] decoder preamble."""
        s = self.special
        seq = [s.sot]
        if language is not None:
            seq.append(s.language_token(language))
            seq.append(s.translate if task == "translate" else s.transcribe)
        if not with_timestamps:
            seq.append(s.no_timestamps)
        return seq

    # -- suppression sets ---------------------------------------------------
    @functools.cached_property
    def non_speech_tokens(self) -> tuple[int, ...]:
        """Tokens for music/annotation symbols, suppressed when suppress_nst
        is on (reference config.h:66). Mirrors openai-whisper's dynamic
        computation against the active vocab."""
        symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』') + (
            "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] {{ }} ♪♪ ♪♪♪".split()
        )
        miscellaneous = set("♩♪♫♬♭♮♯")
        result = set()
        for symbol in symbols + list(miscellaneous):
            for tok in [symbol, " " + symbol]:
                ids = self.encode(tok)
                if len(ids) == 1:
                    result.add(ids[0])
                elif symbol in miscellaneous and ids:
                    result.add(ids[0])
        # whisper also suppresses " -" and " '" first tokens
        for tok in [" -", " '"]:
            ids = self.encode(tok)
            if len(ids) == 1:
                result.add(ids[0])
        return tuple(sorted(result))

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_ggml_vocab(
        cls, tokens: Sequence[bytes], n_vocab: int
    ) -> "WhisperTokenizer":
        """Build from a GGML checkpoint's embedded vocab (rank order).

        ``tokens`` are the raw byte strings stored in the .bin file;
        ``n_vocab`` is the model's full vocab size (incl. specials).
        """
        layout = layout_for_vocab(n_vocab)
        base = tokens[: layout.base_vocab]
        ranks = {bytes(t): i for i, t in enumerate(base)}
        if len(ranks) != layout.base_vocab:
            raise ValueError("duplicate tokens in GGML vocab")
        return cls(ranks, layout.num_languages, name="whisper-ggml")

    @classmethod
    def from_hf_files(cls, vocab_json: str, num_languages: int = 99):
        """Build from HF-style vocab.json (gpt2 byte-encoder strings)."""
        with open(vocab_json, encoding="utf-8") as f:
            vocab = json.load(f)
        byte_dec = {v: k for k, v in _gpt2_byte_encoder().items()}
        ranks: dict[bytes, int] = {}
        for tok_str, rank in vocab.items():
            if tok_str.startswith("<|"):
                continue  # specials are derived from the layout
            ranks[bytes(byte_dec[c] for c in tok_str)] = rank
        return cls(ranks, num_languages, name="whisper-hf")

    @classmethod
    def from_tiktoken_file(cls, path: str, num_languages: int = 99):
        ranks = {}
        with open(path, "rb") as f:
            for line in f:
                if not line.strip():
                    continue
                tok, rank = line.split()
                ranks[base64.b64decode(tok)] = int(rank)
        return cls(ranks, num_languages, name=os.path.basename(path))

    @classmethod
    def byte_fallback(cls, base_vocab: int = 256, num_languages: int = 99):
        """Offline test tokenizer: 256 single-byte tokens (+ padding ranks).

        Exact round-trip for any text, no merges. Used when no real vocab is
        available (zero-egress environments, unit tests).
        """
        ranks = {bytes([i]): i for i in range(256)}
        # Pad with unreachable multi-byte ranks if a larger base is requested
        # (e.g. to mimic a real model's vocab size).
        i = 256
        while len(ranks) < base_vocab:
            # Deterministic filler tokens that can also merge from bytes.
            ranks[b"\x00" + i.to_bytes(3, "big")] = i
            i += 1
        return cls(ranks, num_languages, name="whisper-byte-fallback")


@functools.lru_cache(maxsize=2)
def fallback_tokenizer(n_vocab: int = 51865) -> WhisperTokenizer:
    """Offline tokenizer whose special-token layout matches a real model's
    ``n_vocab`` (default: multilingual 51865). Text round-trips exactly via
    byte tokens; filler ranks pad the base vocab so ids line up with the
    model's logits."""
    from .whisper_tokens import layout_for_vocab

    layout = layout_for_vocab(n_vocab)
    return WhisperTokenizer.byte_fallback(
        base_vocab=layout.base_vocab, num_languages=layout.num_languages
    )
