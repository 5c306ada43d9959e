"""Tokenizer special-token layout + BPE round trip.

Reference test model: UnitTests.swift tokenizer loading/variant tests
(:880-1296) and word-token splitting (:1326-1375).
"""

import pytest

from whisperkit_tpu.text.languages import LANGUAGES, resolve_language_code
from whisperkit_tpu.text.tokenizer import (
    BPETokenizer,
    FakeTokenizer,
    WhisperTokenizer,
    bytes_to_unicode,
    special_tokens_for_vocab,
)


def test_language_inventory():
    assert len(LANGUAGES) == 100
    assert LANGUAGES[0] == ("en", "english")
    assert LANGUAGES[-1] == ("yue", "cantonese")
    assert resolve_language_code("English") == "en"
    assert resolve_language_code("burmese") == "my"
    with pytest.raises(ValueError):
        resolve_language_code("klingon")


def test_special_layout_en():
    sp = special_tokens_for_vocab(51864)
    assert (sp.eot, sp.sot) == (50256, 50257)
    assert sp.n_languages == 99
    assert sp.transcribe == 50358
    assert sp.timestamp_begin == 50363
    assert sp.timestamp_begin + 1501 == 51864


def test_special_layout_v2():
    sp = special_tokens_for_vocab(51865)
    assert (sp.eot, sp.sot) == (50257, 50258)
    assert sp.transcribe == 50359
    assert sp.nospeech == 50362
    assert sp.notimestamps == 50363
    assert sp.timestamp_begin == 50364
    assert sp.language_token("en") == 50259
    assert sp.language_code(50259 + 6) == "fr"


def test_special_layout_v3():
    sp = special_tokens_for_vocab(51866)
    assert sp.n_languages == 100
    assert sp.transcribe == 50360
    assert sp.timestamp_begin == 50365
    assert sp.language_token("yue") == 50258 + 1 + 99
    assert sp.timestamp_seconds(sp.timestamp_token(12.34)) == pytest.approx(12.34)


def _tiny_bpe():
    # byte-level vocab: single-byte tokens for ascii letters + space, plus
    # merges forming 'he' and 'hel'
    b2u = bytes_to_unicode()
    vocab = {}
    for ch in "abcdefghijklmnopqrstuvwxyz .!":
        vocab[b2u[ord(ch)]] = len(vocab)
    vocab["he"] = len(vocab)
    vocab["hel"] = len(vocab)
    vocab["lo"] = len(vocab)
    merges = [("h", "e"), ("he", "l"), ("l", "o")]
    return BPETokenizer(vocab, merges)


def test_bpe_round_trip():
    bpe = _tiny_bpe()
    ids = bpe.encode("hello")
    assert bpe.decode(ids) == "hello"
    # merges applied: hel + lo
    assert len(ids) == 2


def test_bpe_space_handling():
    bpe = _tiny_bpe()
    text = "hello o"
    assert bpe.decode(bpe.encode(text)) == text


def test_fake_tokenizer_round_trip():
    tok = FakeTokenizer(207)
    ids = [1, 2, 3]
    assert tok.encode(tok.decode(ids)) == ids
    sp = tok.special
    assert sp.timestamp_begin < 207
    s = tok.decode_with_timestamps([sp.timestamp_begin, 1])
    assert s.startswith("<|0.00|>")


def _unicode_bpe():
    """Byte-level vocab covering all bytes (so any UTF-8 text round-trips)."""
    b2u = bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u.values())}
    return BPETokenizer(vocab, [])


def test_bpe_unicode_round_trip():
    bpe = _unicode_bpe()
    for text in ("héllo wörld", "こんにちは世界", "¿dónde está?"):
        assert bpe.decode(bpe.encode(text)) == text


def test_split_to_word_tokens_spaces():
    """Latin-script splitting groups subwords by leading spaces
    (reference: UnitTests word-token splitting EN/ES, :1326-1375)."""
    bpe = _unicode_bpe()
    tok = WhisperTokenizer(bpe, 51865)
    ids = bpe.encode(" hola mundo feliz")
    words, word_tokens = tok.split_to_word_tokens(ids, language="es")
    assert words == [" hola", " mundo", " feliz"]
    assert sum(len(t) for t in word_tokens) == len(ids)


def test_split_to_word_tokens_unicode_ja():
    """Space-less scripts split at unicode boundaries (reference: JA case)."""
    bpe = _unicode_bpe()
    tok = WhisperTokenizer(bpe, 51865)
    ids = bpe.encode("日本語です")
    words, word_tokens = tok.split_to_word_tokens(ids, language="ja")
    assert "".join(words) == "日本語です"
    assert len(words) >= 2  # split into per-character-ish units
    assert sum(len(t) for t in word_tokens) == len(ids)


def test_decode_with_timestamps_renders_specials():
    bpe = _unicode_bpe()
    tok = WhisperTokenizer(bpe, 51865)
    sp = tok.special
    ids = [sp.sot, sp.language_token("en"), sp.transcribe, sp.timestamp_begin]
    ids += bpe.encode(" hi")
    ids += [sp.timestamp_begin + 50, sp.eot]
    s = tok.decode_with_timestamps(ids)
    assert s == "<|startoftranscript|><|en|><|transcribe|><|0.00|> hi<|1.00|><|endoftext|>"
    assert tok.decode(ids) == " hi"
