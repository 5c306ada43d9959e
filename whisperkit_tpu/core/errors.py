"""Typed error hierarchy (reference: Sources/WhisperKit/Utilities/WhisperError.swift:7-37)."""

from __future__ import annotations


class WhisperKitError(Exception):
    """Base error for the framework."""


class TokenizerUnavailable(WhisperKitError):
    pass


class ModelsUnavailable(WhisperKitError):
    pass


class PrefillFailed(WhisperKitError):
    pass


class AudioProcessingFailed(WhisperKitError):
    pass


class DecodingLogitsFailed(WhisperKitError):
    pass


class SegmentingFailed(WhisperKitError):
    pass


class LoadAudioFailed(WhisperKitError):
    pass


class PrepareDecoderInputsFailed(WhisperKitError):
    pass


class TranscriptionFailed(WhisperKitError):
    pass


class DecodingFailed(WhisperKitError):
    pass


class MicrophoneUnavailable(WhisperKitError):
    pass
