"""Special-token layout must reproduce the public Whisper vocab IDs."""

import pytest

from whisperlive_tpu.engine.tokenizer import (
    TokenSpec,
    WhisperTokenizer,
    get_suppressed_tokens,
)


def test_multilingual_v2_layout():
    s = TokenSpec(n_vocab=51865, multilingual=True)
    assert s.num_languages == 99
    assert s.eot == 50257
    assert s.sot == 50258
    assert s.language_token("en") == 50259
    assert s.translate == 50358
    assert s.transcribe == 50359
    assert s.sot_prev == 50361
    assert s.no_speech == 50362
    assert s.no_timestamps == 50363
    assert s.timestamp_begin == 50364
    assert s.timestamp_token(30.0) == 51864  # last valid token


def test_multilingual_v3_layout():
    s = TokenSpec(n_vocab=51866, multilingual=True)
    assert s.num_languages == 100
    assert s.sot == 50258
    assert s.language_token("yue") == 50258 + 100
    assert s.transcribe == 50360
    assert s.no_timestamps == 50364
    assert s.timestamp_begin == 50365
    assert s.timestamp_token(30.0) == 51865


def test_english_only_layout():
    s = TokenSpec(n_vocab=51864, multilingual=False)
    assert s.eot == 50256
    assert s.sot == 50257
    assert s.no_timestamps == 50362
    assert s.timestamp_begin == 50363


def test_timestamp_round_trip():
    s = TokenSpec(51865, True)
    assert s.timestamp_of(s.timestamp_token(3.14)) == pytest.approx(3.14, abs=0.011)
    assert s.timestamp_of(s.timestamp_begin) == 0.0


def test_sot_sequence():
    tok = WhisperTokenizer(TokenSpec(51865, True), language="de", task="translate")
    assert tok.sot_sequence() == [50258, tok.spec.language_token("de"), 50358]
    assert tok.sot_sequence(include_timestamps=False)[-1] == 50363
    en = WhisperTokenizer(TokenSpec(51864, False))
    assert en.sot_sequence() == [50257]


def test_language_errors():
    s = TokenSpec(51865, True)
    with pytest.raises(ValueError):
        s.language_token("xx")
    with pytest.raises(ValueError):
        s.language_token("yue")  # v3-only language
    assert s.language_of(s.language_token("ja")) == "ja"


def test_byte_fallback_roundtrip():
    tok = WhisperTokenizer(TokenSpec(51865, True))
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    # specials are stripped on decode
    assert tok.decode(ids + [tok.eot, tok.timestamp_begin]) == "hello world"


def test_decode_with_timestamps():
    tok = WhisperTokenizer(TokenSpec(51865, True))
    ids = [tok.timestamp_begin] + tok.encode("hi") + [tok.spec.timestamp_token(1.0)]
    assert tok.decode_with_timestamps(ids) == "<|0.00|>hi<|1.00|>"


def test_split_to_word_tokens_byte_backend():
    tok = WhisperTokenizer(TokenSpec(51865, True), language="en")
    words, word_tokens = tok.split_to_word_tokens(tok.encode(" alpha beta"))
    assert words == [" alpha", " beta"]  # leading spaces preserved
    assert [len(w) for w in word_tokens] == [6, 5]


def test_suppressed_tokens_include_specials():
    tok = WhisperTokenizer(TokenSpec(51865, True))
    sup = get_suppressed_tokens(tok, [-1])
    for t in (tok.spec.transcribe, tok.spec.translate, tok.sot, tok.sot_prev):
        assert t in sup
    assert get_suppressed_tokens(tok, [5]) != get_suppressed_tokens(tok, [-1])
    assert 5 in get_suppressed_tokens(tok, [5])
