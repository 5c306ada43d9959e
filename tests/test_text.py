"""Segment seeker, DTW, word-timing helpers, compression ratio.

Reference test model: UnitTests.swift windowing/seek tests (:1299-1324) and
DTW/word-timestamp tests (:2335-2937).
"""

import numpy as np
import pytest

from whisperkit_tpu.core.results import TranscriptionSegment, WordTiming
from whisperkit_tpu.text.segment_seeker import find_seek_point_and_segments
from whisperkit_tpu.text.tokenizer import FakeTokenizer, special_tokens_for_vocab
from whisperkit_tpu.text.utils import compression_ratio_text
from whisperkit_tpu.text.word_timestamps import (
    calculate_word_duration_constraints,
    dtw,
    median_filter,
    merge_punctuations,
)

SP = special_tokens_for_vocab(207)
TOK = FakeTokenizer(207)
TS = SP.timestamp_begin


def _seek(tokens, window_frames=3000, time_offset=0.0):
    return find_seek_point_and_segments(
        tokens=tokens,
        token_logprobs=[-0.1] * len(tokens),
        special=SP,
        time_offset=time_offset,
        window_frames=window_frames,
        seek=0,
        decode_fn=TOK.decode,
    )


def test_seek_consecutive_timestamps_slices_segments():
    # <|0.00|> text <|0.04|><|0.04|> text <|0.06|><|0.06|> EOT — ends with a
    # completed pair, so the window is only consumed up to 0.06 s
    tokens = [TS, 5, TS + 2, TS + 2, 6, TS + 3, TS + 3, SP.eot]
    res = _seek(tokens)
    assert len(res.segments) == 2
    s0, s1 = res.segments
    assert s0.start == pytest.approx(0.0)
    assert s0.end == pytest.approx(0.04)
    assert s1.start == pytest.approx(0.04)
    assert s1.end == pytest.approx(0.06)
    # advance to last paired timestamp (0.06 s → 6 frames), not the window end
    assert res.seek_advance_frames == 6


def test_seek_single_timestamp_ending_consumes_window():
    tokens = [TS, 5, 6, TS + 4, SP.eot]
    res = _seek(tokens)
    assert len(res.segments) == 1
    assert res.seek_advance_frames == 3000
    assert res.segments[0].end == pytest.approx(0.08)


def test_seek_no_timestamps():
    tokens = [5, 6, 7, SP.eot]
    res = _seek(tokens, window_frames=1200)
    assert len(res.segments) == 1
    assert res.segments[0].end == pytest.approx(12.0)
    assert res.seek_advance_frames == 1200


def test_seek_time_offset_applied():
    tokens = [TS, 5, TS + 2, TS + 2, 6, TS + 3, SP.eot]
    res = _seek(tokens, time_offset=30.0)
    assert res.segments[0].start == pytest.approx(30.0)


def test_dtw_diagonal():
    n = 5
    cost = np.ones((n, n)) - np.eye(n)  # cheapest path = diagonal
    ti, fi = dtw(-(-cost))  # pass cost directly: dtw expects cost matrix
    # path visits every (i, i)
    pairs = set(zip(ti.tolist(), fi.tolist()))
    for i in range(n):
        assert (i, i) in pairs


def test_dtw_monotonic_indices():
    rng = np.random.default_rng(0)
    mat = rng.random((8, 20))
    ti, fi = dtw(mat)
    assert (np.diff(ti) >= 0).all()
    assert (np.diff(fi) >= 0).all()
    assert ti[-1] == 7 and fi[-1] == 19


def test_median_filter_shape():
    x = np.random.default_rng(1).random((2, 3, 50))
    y = median_filter(x, 7)
    assert y.shape == x.shape
    const = median_filter(np.ones((1, 10)), 7)
    assert const == pytest.approx(np.ones((1, 10)))


def _wt(word, start, end, tokens=None):
    return WordTiming(word=word, tokens=tokens or [1], start=start, end=end, probability=1.0)


def test_merge_punctuations():
    words = [_wt(' "', 0.0, 0.1), _wt("hello", 0.1, 0.5), _wt(",", 0.5, 0.5), _wt(" world", 0.6, 1.0)]
    merged = merge_punctuations(words, prepended='"', appended=",")
    assert [w.word for w in merged] == [' "hello,', " world"]
    # tokens merged too
    assert len(merged[0].tokens) == 3


def test_word_duration_constraints():
    words = [_wt("a", 0.0, 0.2), _wt("b", 0.2, 0.6), _wt("c", 0.6, 2.0)]
    med, mx = calculate_word_duration_constraints(words)
    assert med == pytest.approx(0.4)
    assert mx == pytest.approx(0.8)


def test_compression_ratio_detects_repetition():
    assert compression_ratio_text("the " * 200) > compression_ratio_text(
        "a quick brown fox jumps over the lazy dog"
    )
    assert compression_ratio_text("") == 0.0
