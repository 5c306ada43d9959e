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
  * poisson05 / poisson1 / poisson2 — staggered Poisson arrivals at 0.5×/
    1×/2× the measured burst capacity, mixed 30/60/90 s durations
    (VERDICT r3 #4: queueing behavior, latency under partial load,
    fairness — burst-only scenarios complete together and hide all of it).
    Queue depth is sampled at 4 Hz and reported over time.
  * latency4 — 4 concurrent 30 s requests in b=1 latency mode
    (DecodingOptions(priority="latency")) vs the same 4 batched: the
    number a deployment uses to choose a class per request; with
    --draft-variant the latency class runs the speculative loop.

Reports per scenario: p50/p90/p95/p99 request latency (submit → result),
aggregate decode tokens/s, mean batch fill, wall time, max queue depth.
Full 224-token budget with random weights (never samples EOT) — a
PESSIMISTIC bound at ~3x the decode work of real speech, same policy as
bench.py.

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
    ap.add_argument(
        "--scenarios",
        default="burst16,burst64,mixed,poisson05,poisson1,poisson2,latency4",
    )
    ap.add_argument(
        "--draft-variant", default=None,
        help="arm the pipeline with this draft model (e.g. large-v3-turbo) "
        "so latency-class scenarios run the speculative draft-verify loop",
    )
    ap.add_argument(
        "--segmented", action="store_true",
        help="run with segmented_decode=True (resumable ~32-token decode "
        "segments + batch compaction between them): A/B its overhead under "
        "load — NOTE under the random-weight policy rows never sample EOT, "
        "so compaction never fires and this measures pure segmentation "
        "overhead (the compaction UPSIDE needs real weights)",
    )
    args = ap.parse_args()

    dims = VARIANT_DIMS[args.variant]
    params = init_params(jax.random.PRNGKey(0), dims)
    draft_kw = {}
    if args.draft_variant:
        draft_dims = VARIANT_DIMS[args.draft_variant]
        draft_kw = dict(
            draft_dims=draft_dims,
            draft_params=init_params(jax.random.PRNGKey(1), draft_dims),
        )
    pipe = WhisperPipeline(
        WhisperConfig(
            compute_options=ComputeOptions.serving(
                segmented_decode=args.segmented
            )
        ),
        dims=dims, params=params, **draft_kw,
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

    import threading

    def run_scenario(
        name: str,
        clips: list[np.ndarray],
        *,
        arrival_gaps: list[float] | None = None,
        scenario_options: DecodingOptions | None = None,
        extra: dict | None = None,
    ):
        """arrival_gaps[i] = seconds after t_start to submit clips[i]
        (None = simultaneous burst). Queue depth (submitted windows not yet
        decoded) sampled at 4 Hz for staggered scenarios."""
        opts = scenario_options or options
        pipe.timings = TranscriptionTimings()
        sched.batches_run = 0
        sched.jobs_run = 0
        sched.windows_run = 0
        depth_samples: list[tuple[float, int]] = []
        stop_sampler = threading.Event()
        t_start = time.perf_counter()

        def sampler():
            while not stop_sampler.wait(0.25):
                depth = sched._queue.qsize() + len(sched._pending)
                depth_samples.append(
                    (round(time.perf_counter() - t_start, 2), depth)
                )

        sampler_thread = None
        if arrival_gaps is not None:
            sampler_thread = threading.Thread(target=sampler, daemon=True)
            sampler_thread.start()

        submitted = []
        for i, c in enumerate(clips):
            if arrival_gaps is not None:
                wait = t_start + arrival_gaps[i] - time.perf_counter()
                if wait > 0:
                    time.sleep(wait)
            submitted.append((time.perf_counter(), sched.submit(c, opts)))
        lat = []
        for t0, f in submitted:
            f.result(timeout=3600)
            lat.append(time.perf_counter() - t0)
        wall = time.perf_counter() - t_start
        if sampler_thread is not None:
            stop_sampler.set()
            sampler_thread.join(timeout=2)
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
            "p95_s": round(float(np.percentile(lat_arr, 95)), 2),
            "p99_s": round(float(np.percentile(lat_arr, 99)), 2),
            "agg_tokens_per_s": round(tokens / wall, 1),
            "serving_rtf": round(wall / audio_s, 5),
            "batches": sched.batches_run,
            "mean_batch_fill": round(
                sched.windows_run / max(sched.batches_run, 1), 1
            ),
        }
        if depth_samples:
            depths = [d for _, d in depth_samples]
            out["queue_depth_max"] = max(depths)
            out["queue_depth_mean"] = round(float(np.mean(depths)), 1)
            # decimated trace (≤24 points) so the JSON stays readable
            step = max(1, len(depth_samples) // 24)
            out["queue_depth_trace"] = depth_samples[::step]
        if extra:
            out.update(extra)
        print(json.dumps(out), flush=True)
        return out

    # ---- burst + mixed (r4 continuity) -------------------------------------
    burst_caps = []
    scenarios = {
        "burst16": [clip30] * 16,
        "burst64": [clip30] * 64,
        "mixed": [clip30] * 48 + [clip90] * 8,
    }
    names = args.scenarios.split(",")
    for name in names:
        if name in scenarios:
            out = run_scenario(name, scenarios[name])
            burst_caps.append(out["requests"] * 30.0 / out["wall_s"])

    # ---- Poisson arrivals at 0.5x/1x/2x measured capacity ------------------
    poisson = {n for n in names if n.startswith("poisson")}
    if poisson:
        if burst_caps:
            cap_audio_s = max(burst_caps)  # audio-seconds/s the engine clears
        else:  # measure capacity if bursts were skipped
            out = run_scenario("burst32_cap", [clip30] * 32)
            cap_audio_s = 32 * 30.0 / out["wall_s"]
        # mixed durations, mean 50 s of audio per request
        dur_clips = {30: clip30, 60: synth_speechlike_audio(60.0, seed=4),
                     90: clip90}
        durations = [30, 60, 90, 30, 60, 30, 90, 30]  # mean 50 s
        for name, load in (("poisson05", 0.5), ("poisson1", 1.0),
                           ("poisson2", 2.0)):
            if name not in poisson:
                continue
            rate_rps = load * cap_audio_s / 50.0  # requests/s at mean 50 s
            rng = np.random.default_rng(int(load * 10))
            n_req = 24
            gaps = np.cumsum(rng.exponential(1.0 / rate_rps, n_req)).tolist()
            clips = [dur_clips[durations[i % len(durations)]]
                     for i in range(n_req)]
            run_scenario(
                name, clips, arrival_gaps=gaps,
                extra={"offered_load_x": load,
                       "arrival_rps": round(rate_rps, 3),
                       "capacity_audio_s_per_s": round(cap_audio_s, 1)},
            )

    # ---- latency class: 4 concurrent 30 s, b=1 vs batched ------------------
    if "latency4" in names:
        import dataclasses

        lat_options = dataclasses.replace(options, priority="latency")
        run_scenario(
            "latency4_b1", [clip30] * 4, scenario_options=lat_options,
            extra={"speculative": pipe.draft_params is not None},
        )
        run_scenario("latency4_batched", [clip30] * 4)

    sched.shutdown()


if __name__ == "__main__":
    main()
