"""whisperkit_tpu — a TPU-native speech framework (speech-to-text, diarization, TTS).

A ground-up JAX/XLA/Pallas rebuild of the capabilities of argmaxinc/WhisperKit
(reference: Swift/CoreML, see /root/reference). The compute path is pure JAX
(jit/pjit/shard_map + Pallas kernels); host-side audio decode is native C++
(FFmpeg) loaded via ctypes.

Top-level API mirrors the reference's pipeline façades:
  - WhisperPipeline  (reference: Sources/WhisperKit/Core/WhisperKit.swift)
  - transcribe(), detect_language()
"""

__version__ = "0.1.0"

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
