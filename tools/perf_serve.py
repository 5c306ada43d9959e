"""Serving-level benchmark: BatchScheduler under concurrent request load.

VERDICT r2 next-round #2: the OpenAI server + BatchScheduler were
functionally tested but had no TPU throughput/latency datapoint. This tool
measures the serving engine the server sits on (server/openai_api.py routes
every request into BatchScheduler.submit — HTTP adds only host-side
multipart parsing on the one-core box, so the scheduler number is the
deployment-relevant one; reference concurrency model:
WhisperKit.swift:741-805, OpenAIHandler.swift:121).

Scenarios (all on the blessed serving config — ComputeOptions.serving(),
large-v3 on TPU):
  * burst16 — 16 simultaneous 30 s requests
  * burst64 — 64 simultaneous 30 s requests
  * mixed   — 48× 30 s + 8× 90 s (long jobs run via the pipeline's own
    batched VAD path on the same collector thread)

Reports per scenario: p50/p90/p99 request latency (submit → result),
aggregate decode tokens/s, mean batch fill, wall time. Full 224-token
budget with random weights (never samples EOT) — a PESSIMISTIC bound at
~3x the decode work of real speech, same policy as bench.py.

Run (serialize with other TPU work): python tools/perf_serve.py
"""

from __future__ import annotations

import argparse
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
    from whisperkit_tpu.core.configurations import (
        ComputeOptions,
        DecodingOptions,
        WhisperConfig,
    )
    from whisperkit_tpu.core.timings import TranscriptionTimings
    from whisperkit_tpu.models.whisper import VARIANT_DIMS, init_params
    from whisperkit_tpu.pipelines.scheduler import BatchScheduler
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    ap = argparse.ArgumentParser()
    on_tpu = jax.devices()[0].platform != "cpu"
    ap.add_argument("--variant", default="large-v3" if on_tpu else "tiny")
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--sample-length", type=int, default=224 if on_tpu else 8)
    ap.add_argument("--scenarios", default="burst16,burst64,mixed")
    args = ap.parse_args()

    dims = VARIANT_DIMS[args.variant]
    params = init_params(jax.random.PRNGKey(0), dims)
    pipe = WhisperPipeline(
        WhisperConfig(compute_options=ComputeOptions.serving()),
        dims=dims, params=params,
    )
    options = DecodingOptions(
        language="en",
        sample_length=args.sample_length,
        temperature_fallback_count=0,
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
        first_token_log_prob_threshold=None,
        chunking_strategy="vad",  # long jobs chunk+batch internally
    )
    sched = BatchScheduler(pipe, max_batch=args.max_batch, max_wait_ms=30.0)

    clip30 = synth_speechlike_audio(30.0, seed=1)
    clip90 = synth_speechlike_audio(90.0, seed=2)

    # Warm every power-of-two bucket the scenarios can hit (persistent
    # compile cache makes this fast on reruns).
    bucket = 1
    while bucket <= args.max_batch:
        futs = [sched.submit(clip30, options) for _ in range(bucket)]
        for f in futs:
            f.result(timeout=3600)
        bucket *= 2
    pipe.transcribe(clip90, options)  # VAD-path shapes for long jobs

    def run_scenario(name: str, clips: list[np.ndarray]):
        pipe.timings = TranscriptionTimings()
        sched.batches_run = 0
        sched.jobs_run = 0
        t_start = time.perf_counter()
        submitted = [(time.perf_counter(), sched.submit(c, options)) for c in clips]
        lat = []
        for t0, f in submitted:
            f.result(timeout=3600)
            lat.append(time.perf_counter() - t0)
        wall = time.perf_counter() - t_start
        lat_arr = np.asarray(sorted(lat))
        tokens = int(pipe.timings.total_decoding_loops)
        audio_s = sum(len(c) for c in clips) / 16_000
        out = {
            "scenario": name,
            "requests": len(clips),
            "audio_seconds": round(audio_s, 1),
            "wall_s": round(wall, 2),
            "p50_s": round(float(np.percentile(lat_arr, 50)), 2),
            "p90_s": round(float(np.percentile(lat_arr, 90)), 2),
            "p99_s": round(float(np.percentile(lat_arr, 99)), 2),
            "agg_tokens_per_s": round(tokens / wall, 1),
            "serving_rtf": round(wall / audio_s, 5),
            "batches": sched.batches_run,
            "mean_batch_fill": round(sched.jobs_run / max(sched.batches_run, 1), 1),
        }
        print(json.dumps(out), flush=True)

    scenarios = {
        "burst16": [clip30] * 16,
        "burst64": [clip30] * 64,
        "mixed": [clip30] * 48 + [clip90] * 8,
    }
    for name in args.scenarios.split(","):
        run_scenario(name, scenarios[name])

    sched.shutdown()


if __name__ == "__main__":
    main()
