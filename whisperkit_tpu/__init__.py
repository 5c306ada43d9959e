"""whisperkit_tpu — a TPU-native speech framework (speech-to-text, diarization, TTS).

A ground-up JAX/XLA/Pallas rebuild of the capabilities of argmaxinc/WhisperKit
(reference: Swift/CoreML, see /root/reference). The compute path is pure JAX
(jit/pjit/shard_map + Pallas kernels); host-side audio decode is native C++
(FFmpeg) loaded via ctypes.

Umbrella exports mirror the reference's re-export shim
(Sources/ArgmaxOSS/ArgmaxOSS.swift:4-7): the pipeline façades, their
option/result types, and the serving scheduler resolve from the package
root — lazily (PEP 562), so `import whisperkit_tpu` stays cheap.
"""

__version__ = "0.2.0"

from whisperkit_tpu.core.configurations import (  # noqa: F401
    WhisperConfig,
    ComputeOptions,
    DecodingOptions,
    ChunkingStrategy,
    DecodingTask,
)
from whisperkit_tpu.core.modelstate import ModelState  # noqa: F401

_LAZY = {
    "WhisperPipeline": ("whisperkit_tpu.pipelines.whisper", "WhisperPipeline"),
    "DiarizePipeline": ("whisperkit_tpu.pipelines.diarize", "DiarizePipeline"),
    "DiarizationOptions": ("whisperkit_tpu.pipelines.diarize", "DiarizationOptions"),
    "TTSPipeline": ("whisperkit_tpu.pipelines.tts", "TTSPipeline"),
    "GenerationOptions": ("whisperkit_tpu.pipelines.tts", "GenerationOptions"),
    "AudioStreamTranscriber": ("whisperkit_tpu.pipelines.streaming", "AudioStreamTranscriber"),
    "BatchScheduler": ("whisperkit_tpu.pipelines.scheduler", "BatchScheduler"),
    "TranscriptionResult": ("whisperkit_tpu.core.results", "TranscriptionResult"),
    "DiarizationResult": ("whisperkit_tpu.speaker.results", "DiarizationResult"),
    # weight compression (the reference's quantized/4-bit variant family)
    "quantize_whisper_params": ("whisperkit_tpu.ops.quant", "quantize_whisper_params"),
    "quantize_tts_params": ("whisperkit_tpu.ops.quant", "quantize_tts_params"),
    # accelerator reachability (fail-fast serving startup)
    "probe_backend": ("whisperkit_tpu.core.device_probe", "probe_backend"),
    # audio front end (AudioProcessor.swift analog; stream_audio = the
    # bounded-memory chunked loader, :307-350)
    "load_audio": ("whisperkit_tpu.audio.io", "load_audio"),
    "stream_audio": ("whisperkit_tpu.audio.io", "stream_audio"),
}

__all__ = sorted(
    [
        "WhisperConfig",
        "ComputeOptions",
        "DecodingOptions",
        "ChunkingStrategy",
        "DecodingTask",
        "ModelState",
        *_LAZY,
    ]
)


def load_pipeline(*args, **kwargs):
    """Lazy import to keep `import whisperkit_tpu` light."""
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    return WhisperPipeline(*args, **kwargs)


def __getattr__(name):  # lazy public surface (PEP 562)
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'whisperkit_tpu' has no attribute {name!r}")
