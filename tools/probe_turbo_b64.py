"""One-shot probe: large-v3-turbo at 64-window groups in the serving preset.

Turbo's 4-layer decoder makes its cross-KV tiny (int8 ≈ 1 GB at b=64), and
the r2 batch-scaling sweep showed per-row decode cost still improving at
B=64 (docs/BENCHMARKS.md). If this beats the current turbo secondary
(b=32 bf16: 0.0027), promote the config in bench.py.

Run: python tools/probe_turbo_b64.py
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
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    # 24 min: the chunk-bucket group clamp caps groups at the chunk count's
    # bucket, so 12-min audio (~24-32 chunks) can never form b=64 groups —
    # the probe needs >=64 real chunks to measure what it claims (r5
    # review finding; the earlier "b=64 rejected" entry measured pad-row
    # drag from forcing group 64 onto 12-min audio, a config the clamp now
    # prevents outright)
    minutes = 24.0
    audio = synth_speechlike_audio(minutes * 60.0)
    dims = VARIANT_DIMS["large-v3-turbo"]
    results = {}
    for label, int8_kv, group in (("serving_b64", True, 64), ("bf16_b64", False, 64)):
        co = ComputeOptions.serving() if int8_kv else ComputeOptions()
        pipe = WhisperPipeline(
            WhisperConfig(compute_options=co),
            dims=dims, params=init_params(jax.random.PRNGKey(0), dims),
        )
        options = DecodingOptions(
            language="en", chunking_strategy="vad", sample_length=224,
            temperature_fallback_count=0, logprob_threshold=None,
            compression_ratio_threshold=None, no_speech_threshold=None,
            first_token_log_prob_threshold=None, concurrent_worker_count=group,
        )
        pipe.transcribe(audio, options)  # compile at the REAL group shapes
        rtfs = []
        for _ in range(2):
            t0 = time.perf_counter()
            pipe.transcribe(audio, options)
            rtfs.append(round((time.perf_counter() - t0) / (minutes * 60.0), 5))
        results[label] = rtfs
        pipe.params = None
        del pipe
    print(json.dumps({"metric": "probe_turbo_b64_rtf", **results}))


if __name__ == "__main__":
    main()
