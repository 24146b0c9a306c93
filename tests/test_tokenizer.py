import pytest

from sentiric_stt_whisper_service_tpu.tokenizer import (
    LANGUAGES,
    SpecialTokens,
    WhisperTokenizer,
    fallback_tokenizer,
    layout_for_vocab,
)


def test_multilingual_layout_ids():
    # Known whisper multilingual (v1/v2) token ids.
    s = SpecialTokens(50257, 99)
    assert s.eot == 50257
    assert s.sot == 50258
    assert s.language_token("en") == 50259
    assert s.language_token("tr") == 50259 + LANGUAGES.index("tr")
    assert s.translate == 50358
    assert s.transcribe == 50359
    assert s.no_speech == 50362
    assert s.no_timestamps == 50363
    assert s.timestamp_begin == 50364
    assert s.n_vocab == 51865


def test_large_v3_layout():
    s = layout_for_vocab(51866)
    assert s.num_languages == 100
    assert s.language_token("yue") == 50258 + 1 + 99
    assert s.timestamp_begin == 50365


def test_english_layout():
    s = layout_for_vocab(51864)
    assert s.eot == 50256 and s.sot == 50257 and s.timestamp_begin == 50363


def test_timestamp_tokens():
    s = SpecialTokens(50257, 99)
    assert s.special_token_string(s.timestamp_begin) == "<|0.00|>"
    assert s.special_token_string(s.timestamp_begin + 1500) == "<|30.00|>"
    assert s.timestamp_to_seconds(s.timestamp_begin + 25) == pytest.approx(0.5)


def test_fallback_roundtrip():
    tok = fallback_tokenizer()
    for text in ["hello world", "merhaba dünya", "日本語テスト", "  spaces  "]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text
        assert all(i < tok.eot for i in ids)


def test_sot_sequence():
    tok = fallback_tokenizer()
    s = tok.special
    assert tok.sot_sequence("en", "transcribe") == [s.sot, s.language_begin, s.transcribe]
    assert tok.sot_sequence("tr", "translate") == [
        s.sot,
        s.language_begin + LANGUAGES.index("tr"),
        s.translate,
    ]
    assert tok.sot_sequence(None)[-1] == s.sot
    assert tok.sot_sequence("en", with_timestamps=False)[-1] == s.no_timestamps


def test_decode_with_timestamps():
    tok = fallback_tokenizer()
    s = tok.special
    ids = [s.sot] + tok.encode("hi") + [s.timestamp_begin + 50]
    text = tok.decode_with_timestamps(ids)
    assert "<|startoftranscript|>" in text and "hi" in text and "<|1.00|>" in text


def test_special_decode_skips_specials():
    tok = fallback_tokenizer()
    ids = tok.encode("abc") + [tok.eot, tok.special.no_speech]
    assert tok.decode(ids) == "abc"


def test_non_speech_tokens_nonempty():
    tok = fallback_tokenizer()
    nst = tok.non_speech_tokens
    assert len(nst) > 0
    assert all(t < tok.eot for t in nst)
