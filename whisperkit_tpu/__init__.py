"""whisperkit_tpu — TPU-native speech SDK (STT + diarization + TTS).

Umbrella exports mirroring the reference's re-export shim
(/root/reference/Sources/ArgmaxOSS/ArgmaxOSS.swift:4-7): the three
pipeline façades plus their primary config types resolve from the package
root. Lazy (PEP 562) so `import whisperkit_tpu` stays cheap for tools
that only need a submodule.
"""

_EXPORTS = {
    "WhisperPipeline": "whisperkit_tpu.pipelines.whisper",
    "DiarizePipeline": "whisperkit_tpu.pipelines.diarize",
    "TTSPipeline": "whisperkit_tpu.pipelines.tts",
    "GenerationOptions": "whisperkit_tpu.pipelines.tts",
    "DecodingOptions": "whisperkit_tpu.core.configurations",
    "WhisperConfig": "whisperkit_tpu.core.configurations",
    "ComputeOptions": "whisperkit_tpu.core.configurations",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module 'whisperkit_tpu' has no attribute {name!r}")
