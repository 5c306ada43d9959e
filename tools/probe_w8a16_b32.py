"""One-shot probe: does W8A16 + fused int8 cross-KV fit/win at b=32?

r3 recorded "w8a16 at b=32 always OOMs (XLA hoists per-layer dequants,
re-materializing ~3 GB bf16)" — but that was measured when the cross-KV
still peaked at 7.9 GB bf16. With the r4 fused per-layer quantize the
steady-state budget is ~params(int8 1.6 GB) + hoisted dequants(3.2 GB) +
int8 KV(2 GB) + self-KV(1.2 GB) ≈ 8 GB, which should fit 16 GB. If it
runs, compare against the 0.0064 serving headline.

Run: python tools/probe_w8a16_b32.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import synth_speechlike_audio
    from whisperkit_tpu.core.configurations import (
        ComputeOptions,
        DecodingOptions,
        WhisperConfig,
    )
    from whisperkit_tpu.models.whisper import VARIANT_DIMS, init_params
    from whisperkit_tpu.ops.quant import quantize_whisper_params
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    variant = "large-v3"
    audio = synth_speechlike_audio(12 * 60.0)
    dims = VARIANT_DIMS[variant]
    params = quantize_whisper_params(init_params(jax.random.PRNGKey(0), dims))
    pipe = WhisperPipeline(
        WhisperConfig(compute_options=ComputeOptions.serving()),
        dims=dims, params=params,
    )
    options = DecodingOptions(
        language="en", chunking_strategy="vad", sample_length=224,
        temperature_fallback_count=0, logprob_threshold=None,
        compression_ratio_threshold=None, no_speech_threshold=None,
        first_token_log_prob_threshold=None, concurrent_worker_count=32,
    )
    pipe.transcribe(audio[: 16_000 * 60], options)  # compile
    rtfs = []
    for _ in range(2):
        t0 = time.perf_counter()
        pipe.transcribe(audio, options)
        rtfs.append((time.perf_counter() - t0) / (12 * 60.0))
    print(json.dumps({
        "metric": "probe_w8a16_int8kv_b32_rtf",
        "rtfs": [round(r, 5) for r in rtfs],
    }))


if __name__ == "__main__":
    main()
