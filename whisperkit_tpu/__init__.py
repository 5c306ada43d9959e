"""whisperkit_tpu — a TPU-native speech framework (speech-to-text, diarization, TTS).

A ground-up JAX/XLA/Pallas rebuild of the capabilities of argmaxinc/WhisperKit
(reference: Swift/CoreML, see /root/reference). The compute path is pure JAX
(jit/pjit/shard_map + Pallas kernels); host-side audio decode is native C++
(FFmpeg) loaded via ctypes.

Top-level API mirrors the reference's pipeline façades:
  - WhisperPipeline  (reference: Sources/WhisperKit/Core/WhisperKit.swift)
  - transcribe(), detect_language()
"""

__version__ = "0.2.0"

from whisperkit_tpu.core.configurations import (  # noqa: F401
    WhisperConfig,
    DecodingOptions,
    ChunkingStrategy,
    DecodingTask,
)
from whisperkit_tpu.core.modelstate import ModelState  # noqa: F401


def load_pipeline(*args, **kwargs):
    """Lazy import to keep `import whisperkit_tpu` light."""
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    return WhisperPipeline(*args, **kwargs)


def __getattr__(name):  # lazy public surface (PEP 562)
    lazy = {
        "WhisperPipeline": ("whisperkit_tpu.pipelines.whisper", "WhisperPipeline"),
        "DiarizePipeline": ("whisperkit_tpu.pipelines.diarize", "DiarizePipeline"),
        "DiarizationOptions": ("whisperkit_tpu.pipelines.diarize", "DiarizationOptions"),
        "TTSPipeline": ("whisperkit_tpu.pipelines.tts", "TTSPipeline"),
        "GenerationOptions": ("whisperkit_tpu.pipelines.tts", "GenerationOptions"),
        "AudioStreamTranscriber": ("whisperkit_tpu.pipelines.streaming", "AudioStreamTranscriber"),
        "BatchScheduler": ("whisperkit_tpu.pipelines.scheduler", "BatchScheduler"),
        "TranscriptionResult": ("whisperkit_tpu.core.results", "TranscriptionResult"),
        "DiarizationResult": ("whisperkit_tpu.speaker.results", "DiarizationResult"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'whisperkit_tpu' has no attribute {name!r}")
