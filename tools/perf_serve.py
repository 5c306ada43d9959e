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

    from whisperkit_tpu.eval.loadgen import poisson_gaps, run_load

    def run_scenario(
        name: str,
        clips: list[np.ndarray],
        *,
        arrival_gaps: list[float] | None = None,
        scenario_options: DecodingOptions | None = None,
        extra: dict | None = None,
    ):
        """One scenario through the shared harness (eval/loadgen.py);
        queue depth sampled at 4 Hz for staggered scenarios."""
        out = run_load(
            sched, pipe, clips, scenario_options or options,
            arrival_gaps=arrival_gaps,
            sample_queue_depth=arrival_gaps is not None,
        )
        out = {"scenario": name, **out}
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
    known = set(scenarios) | {
        "poisson05", "poisson1", "poisson2", "latency4", "latency1",
    }
    unknown = [n for n in names if n not in known]
    if unknown:
        # fail FAST: a typo'd scenario silently skipping would burn a long
        # TPU session measuring nothing
        sys.exit(f"unknown scenario(s) {unknown}; known: {sorted(known)}")
    for name in names:
        if name in scenarios:
            out = run_scenario(name, scenarios[name])
            # capacity in audio-seconds/s from the scenario's ACTUAL audio
            # (mixed includes 90 s clips — requests*30 undercounts it)
            burst_caps.append(out["audio_seconds"] / out["wall_s"])

    # ---- Poisson arrivals at 0.5x/1x/2x measured capacity ------------------
    poisson = {n for n in names if n.startswith("poisson")}
    if poisson:
        if burst_caps:
            cap_audio_s = max(burst_caps)  # audio-seconds/s the engine clears
        else:  # measure capacity if bursts were skipped
            out = run_scenario("burst32_cap", [clip30] * 32)
            cap_audio_s = out["audio_seconds"] / out["wall_s"]
        # mixed durations
        dur_clips = {30: clip30, 60: synth_speechlike_audio(60.0, seed=4),
                     90: clip90}
        durations = [30, 60, 90, 30, 60, 30, 90, 30]
        mean_dur = sum(durations) / len(durations)  # 52.5 s
        for name, load in (("poisson05", 0.5), ("poisson1", 1.0),
                           ("poisson2", 2.0)):
            if name not in poisson:
                continue
            rate_rps = load * cap_audio_s / mean_dur
            rng = np.random.default_rng(int(load * 10))
            n_req = 24
            gaps = poisson_gaps(rng, rate_rps, n_req)
            clips = [dur_clips[durations[i % len(durations)]]
                     for i in range(n_req)]
            run_scenario(
                name, clips, arrival_gaps=gaps,
                extra={"offered_load_x": load,
                       "arrival_rps": round(rate_rps, 3),
                       "capacity_audio_s_per_s": round(cap_audio_s, 1)},
            )

    # ---- latency class: 4 concurrent 30 s, b=1 vs batched ------------------
    if "latency4" in names or "latency1" in names:
        import dataclasses

        lat_options = dataclasses.replace(options, priority="latency")
    if "latency4" in names:
        run_scenario(
            "latency4_b1", [clip30] * 4, scenario_options=lat_options,
            extra={"speculative": pipe.draft_params is not None},
        )
        run_scenario("latency4_batched", [clip30] * 4)
    if "latency1" in names:
        # the class's actual use case: ONE isolated request (median of 3
        # single-request turns per mode; no batch to join either way —
        # the delta is pure decode-path choice: draft-verify vs plain b=1).
        # The plain arm DISARMS the draft: any b=1 decode on a draft-armed
        # pipeline takes the speculative branch regardless of priority, so
        # without this the A/B compares speculative against itself.
        saved_draft = pipe.draft_params, pipe.draft_dims
        for name, opts_1, armed in (
            ("latency1_spec", lat_options, True),
            ("latency1_plain", lat_options, False),
        ):
            pipe.draft_params, pipe.draft_dims = (
                saved_draft if armed else (None, None)
            )
            try:
                walls = []
                for _ in range(3):
                    out = run_scenario(f"{name}_run", [clip30],
                                       scenario_options=opts_1)
                    walls.append(out["wall_s"])
                print(json.dumps({
                    "scenario": name,
                    "speculative": armed and saved_draft[0] is not None,
                    "wall_s_median": sorted(walls)[1],
                    "wall_s_runs": walls,
                }), flush=True)
            finally:
                pipe.draft_params, pipe.draft_dims = saved_draft

    sched.shutdown()


if __name__ == "__main__":
    main()
