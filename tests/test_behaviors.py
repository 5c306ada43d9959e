"""Additional behavioral coverage mirroring the reference's unit-test map
(SURVEY.md §4): suppress-list expansion, VAD frame math, normalizer
currency/percent, option validation.
"""

import numpy as np
import pytest

from whisperkit_tpu.audio.vad import EnergyVAD
from whisperkit_tpu.core.configurations import DecodingOptions
from whisperkit_tpu.decoding.filters import non_speech_token_ids
from whisperkit_tpu.eval.normalize import EnglishTextNormalizer
from whisperkit_tpu.text.tokenizer import (
    BPETokenizer,
    WhisperTokenizer,
    bytes_to_unicode,
    special_tokens_for_vocab,
)


def _tok():
    b2u = bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u.values())}
    return WhisperTokenizer(BPETokenizer(vocab, []), 51865)


def test_non_speech_suppress_list_contains_specials_and_symbols():
    tok = _tok()
    ids = non_speech_token_ids(tok.special, tok)
    sp = tok.special
    # control tokens always suppressed
    for t in (sp.translate, sp.transcribe, sp.sot, sp.startofprev, sp.startoflm):
        assert t in ids
    # single-byte music/bracket symbols picked up via the tokenizer
    for sym in ("#", "(", ")", "[", "]"):
        enc = tok.encode(sym)
        if len(enc) == 1:
            assert enc[0] in ids
    assert all(0 <= t < sp.n_vocab for t in ids)


def test_vad_active_chunks_and_longest_silence():
    vad = EnergyVAD(frame_length_seconds=0.1, energy_threshold=0.05)
    # 1 s voice, 2 s silence, 1 s voice (16 kHz, 0.1 s frames)
    rng = np.random.default_rng(0)
    loud = (rng.standard_normal(16000) * 0.5).astype(np.float32)
    quiet = np.zeros(32000, np.float32)
    wave = np.concatenate([loud, quiet, loud])
    chunks = vad.calculate_active_chunks(wave)
    assert len(chunks) == 2
    activity = vad.voice_activity(wave)
    silence = vad.find_longest_silence(activity)
    assert silence is not None
    s, e = silence
    assert (e - s) == 20  # 2 s of 0.1 s frames
    # index conversions
    assert vad.voice_activity_index_to_seconds(10) == pytest.approx(1.0)
    assert vad.voice_activity_index_to_sample(10) == 16000


def test_vad_clip_timestamps_and_seek_clips():
    vad = EnergyVAD(frame_length_seconds=0.1, energy_threshold=0.05)
    rng = np.random.default_rng(1)
    loud = (rng.standard_normal(16000) * 0.5).astype(np.float32)
    wave = np.concatenate([np.zeros(16000, np.float32), loud, np.zeros(16000, np.float32)])
    ts = vad.voice_activity_clip_timestamps(wave)
    assert len(ts) % 2 == 0 and ts  # start/end pairs
    assert ts[0] == pytest.approx(1.0, abs=0.2)
    clips = vad.calculate_non_silent_seek_clips(wave)
    assert clips and clips[0][0] >= 0


def test_normalizer_currency_percent_numbers():
    n = EnglishTextNormalizer()
    # full normalizer applies the "%" suffixer (matches openai/transformers)
    assert n("fifty percent") == "50%"
    assert n("12,345 people") == "12345 people"
    assert n("A 20% rise") == "a 20% rise"


def test_decoding_options_validation():
    with pytest.raises(ValueError):
        DecodingOptions(temperature_fallback_count=-1)
    with pytest.raises(ValueError):
        DecodingOptions(sample_length=0)
    with pytest.raises(ValueError):
        DecodingOptions(task="summarize")


def test_timestamp_token_round_trip_full_range():
    sp = special_tokens_for_vocab(51866)
    for seconds in (0.0, 0.02, 1.0, 15.5, 29.98, 30.0):
        tok = sp.timestamp_token(seconds)
        assert sp.is_timestamp(tok)
        assert sp.timestamp_seconds(tok) == pytest.approx(seconds)
    assert sp.timestamp_token(30.0) == sp.timestamp_begin + 1500
    assert sp.timestamp_token(30.0) < 51866


def test_language_token_out_of_vocab_raises():
    sp = special_tokens_for_vocab(51865)  # 99 languages, no yue
    with pytest.raises(ValueError):
        sp.language_token("yue")
    with pytest.raises(ValueError):
        sp.language_code(sp.sot)
