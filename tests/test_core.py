"""Core config/state/result type tests (reference coverage: UnitTests.swift:478-673)."""

import pytest

from whisperkit_tpu.core.configurations import (
    ChunkingStrategy,
    DecodingOptions,
    DecodingTask,
    WhisperConfig,
)
from whisperkit_tpu.core.modelstate import ModelState
from whisperkit_tpu.core.results import (
    DecodingFallback,
    FallbackReason,
    TranscriptionResult,
    TranscriptionSegment,
    WordTiming,
)
from whisperkit_tpu.core.registry import detect_variant, is_model_multilingual
from whisperkit_tpu.core.timings import TranscriptionTimings


def test_umbrella_exports():
    """Package-root re-exports (reference ArgmaxOSS.swift:4-7)."""
    import whisperkit_tpu as wk

    assert wk.DecodingOptions is DecodingOptions
    assert wk.WhisperConfig is WhisperConfig
    for name in wk.__all__:
        assert getattr(wk, name) is not None
    with pytest.raises(AttributeError):
        wk.not_a_real_export


def test_decoding_options_defaults():
    opts = DecodingOptions()
    assert opts.task == DecodingTask.TRANSCRIBE
    assert opts.temperature == 0.0
    assert opts.temperature_fallback_count == 5
    assert opts.sample_length == 224
    assert opts.compression_ratio_threshold == 2.4
    assert opts.logprob_threshold == -1.0
    assert opts.first_token_log_prob_threshold == -1.5
    assert opts.chunking_strategy == ChunkingStrategy.NONE


def test_temperature_ladder():
    opts = DecodingOptions(temperature=0.2, temperature_increment_on_fallback=0.3,
                           temperature_fallback_count=2)
    assert opts.temperatures == pytest.approx([0.2, 0.5, 0.8])


def test_options_string_coercion():
    opts = DecodingOptions(task="translate", chunking_strategy="vad")
    assert opts.task == DecodingTask.TRANSLATE
    assert opts.chunking_strategy == ChunkingStrategy.VAD


def test_model_state_busy():
    assert ModelState.LOADING.is_busy
    assert ModelState.DOWNLOADING.is_busy
    assert not ModelState.LOADED.is_busy
    assert not ModelState.PREWARMED.is_busy


def test_variant_detection():
    # reference: ModelUtilities.swift:128-173 — dims → variant
    assert detect_variant(51865, 384) == "tiny"
    assert detect_variant(51864, 384) == "tiny.en"
    assert detect_variant(51865, 512) == "base"
    assert detect_variant(51864, 768) == "small.en"
    assert detect_variant(51865, 1024) == "medium"
    assert detect_variant(51866, 1280) == "large-v3"
    assert detect_variant(51865, 1280) == "large-v2"
    # "large" (v1) shares v2's dims exactly — detection prefers v2, but the
    # variant is loadable by name (Models.swift:39-88 lists both)
    from whisperkit_tpu.models.whisper import VARIANT_DIMS

    assert VARIANT_DIMS["large"] == VARIANT_DIMS["large-v2"]
    assert is_model_multilingual(51865)
    assert not is_model_multilingual(51864)


def test_fallback_rules():
    # reference: Models.swift:357-381 — compression ratio triggers fallback
    fb = DecodingFallback.evaluate(
        logprob_threshold=-1.0, first_token_logprob_threshold=-1.5,
        no_speech_threshold=0.6, compression_ratio_threshold=2.4,
        compression_ratio=3.0, avg_logprob=-0.5, first_token_logprob=-0.1,
        no_speech_prob=0.1,
    )
    assert fb is not None and fb.need_fallback
    assert fb.fallback_reason == FallbackReason.COMPRESSION_RATIO

    # logprob failure but silence → accepted, no fallback
    fb = DecodingFallback.evaluate(
        logprob_threshold=-1.0, first_token_logprob_threshold=None,
        no_speech_threshold=0.6, compression_ratio_threshold=2.4,
        compression_ratio=1.0, avg_logprob=-2.0, first_token_logprob=None,
        no_speech_prob=0.9,
    )
    assert fb is not None and not fb.need_fallback
    assert fb.fallback_reason == FallbackReason.SILENCE

    # everything fine → None
    fb = DecodingFallback.evaluate(
        logprob_threshold=-1.0, first_token_logprob_threshold=-1.5,
        no_speech_threshold=0.6, compression_ratio_threshold=2.4,
        compression_ratio=1.0, avg_logprob=-0.2, first_token_logprob=-0.2,
        no_speech_prob=0.1,
    )
    assert fb is None


def test_timings_derived_metrics():
    t = TranscriptionTimings(full_pipeline=2.0, input_audio_seconds=20.0,
                             total_decoding_loops=100)
    assert t.tokens_per_second == pytest.approx(50.0)
    assert t.real_time_factor == pytest.approx(0.1)
    assert t.speed_factor == pytest.approx(10.0)


def test_transcription_result_all_words():
    seg = TranscriptionSegment(words=[WordTiming("hi", [1], 0.0, 0.5, 0.9)])
    res = TranscriptionResult(segments=[seg, TranscriptionSegment()])
    assert len(res.all_words) == 1
    assert res.all_words[0].duration == pytest.approx(0.5)


def test_timings_log_report(capsys=None):
    from whisperkit_tpu.core.timings import TranscriptionTimings

    t = TranscriptionTimings(
        full_pipeline=2.0, decoding_loop=1.5, encoding=0.3,
        total_decoding_loops=50, input_audio_seconds=30.0,
        pipeline_start=100.0, first_token_time=100.4,
    )
    assert t.tokens_per_second == pytest.approx(25.0)
    assert t.real_time_factor == pytest.approx(2.0 / 30.0)
    assert t.speed_factor == pytest.approx(15.0)
    assert t.time_to_first_token == pytest.approx(0.4)
    t.log()  # formatted report must not raise
