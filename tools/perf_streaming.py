"""Streaming-pass latency at batch 1: plain vs speculative (turbo draft).

The AudioStreamTranscriber re-transcribes its rolling buffer about once a
second — each pass is a batch-1 greedy decode, exactly the case
speculative decoding targets. This measures the per-pass wall time of
`pipeline.transcribe` on a 25 s buffer (single window) for large-v3 with
and without a turbo draft attached.

Acceptance honesty (random weights): with an independent random draft the
acceptance is ~0, so the "speculative" number here is the WORST case; at
real-speech acceptance (~0.8) the projected pass time is
plain_time * round_ms-based factor from tools/perf_speculative.py.

Run: python tools/perf_streaming.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import synth_speechlike_audio
    from whisperkit_tpu.core.configurations import DecodingOptions
    from whisperkit_tpu.models.whisper import VARIANT_DIMS, init_params
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    on_tpu = jax.devices()[0].platform != "cpu"
    tname, dname = ("large-v3", "large-v3-turbo") if on_tpu else ("tiny", "tiny")
    dims, ddims = VARIANT_DIMS[tname], VARIANT_DIMS[dname]
    target = init_params(jax.random.PRNGKey(0), dims)
    draft = init_params(jax.random.PRNGKey(7), ddims)
    audio = synth_speechlike_audio(25.0, seed=4)
    # realistic pass budget: real speech decodes ~50-80 tokens/window
    options = DecodingOptions(
        language="en", sample_length=64, temperature_fallback_count=0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, first_token_log_prob_threshold=None,
    )

    def passes(pipe, n=4):
        pipe.transcribe(audio, options)  # compile/warm
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            pipe.transcribe(audio, options)
            best = min(best, time.perf_counter() - t0)
        return best

    t_plain = passes(WhisperPipeline(dims=dims, params=target))
    t_spec = passes(
        WhisperPipeline(
            dims=dims, params=target, draft_dims=ddims, draft_params=draft
        )
    )
    print(json.dumps({
        "metric": "streaming_pass_latency_b1_25s_64tok",
        "plain_s": round(t_plain, 3),
        "speculative_alpha0_s": round(t_spec, 3),
        "note": "independent random draft = zero acceptance = WORST case; "
        "projected pass at alpha 0.8-0.9: see tools/perf_speculative.py",
    }))


if __name__ == "__main__":
    main()
