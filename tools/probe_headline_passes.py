"""Diagnose the r4 pass-1 headline outlier (VERDICT r4 #1).

BENCH_r04 recorded headline_runs [0.01043, 0.00739, 0.00717]: the FIRST
timed pass (after a full-audio warmup pass) paid +41% that passes 2-3
didn't, sinking the worst-of-3 headline. Candidate causes:
  (a) transport stall on one of pass 1's uploads/pulls (the tunnel has
      multi-second stalls; r4 once saw a 29 MB upload take 310 s);
  (b) host contention decaying after the driver's earlier round phases
      (ONE core: anything still running eats the dispatch loop);
  (c) a genuinely cold component the full-audio warmup doesn't cover.

This probe runs the EXACT bench headline recipe (bench.pipeline_options,
serving preset, b=32, 12 min) with N timed passes and records, PER PASS:
wall RTF, tunnel RTT immediately before/after, and 1-min loadavg — so a
slow pass is attributable. If pass 1 is systematically high across
sessions while RTT/load are flat, (c) is real and warmup must grow; if
slow passes correlate with RTT spikes/load, the bench needs per-pass
condition markers, not more warmup.

Reference metric: Models.swift:770-772 (RTF).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=6)
    ap.add_argument("--minutes", type=float, default=12.0)
    ap.add_argument("--group", type=int, default=32)
    ap.add_argument("--warmups", type=int, default=1)
    args = ap.parse_args()

    import jax

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import (
        measure_tunnel_dispatch_ms,
        pipeline_options,
        synth_speechlike_audio,
    )
    from whisperkit_tpu.core.configurations import ComputeOptions, WhisperConfig
    from whisperkit_tpu.models.whisper import VARIANT_DIMS, init_params
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    import numpy as np
    import jax.numpy as jnp

    # transport warmup like bench.py
    np.asarray(jnp.asarray(np.zeros(8_000_000, np.float32))[:4])

    audio = synth_speechlike_audio(args.minutes * 60.0)
    dims = VARIANT_DIMS["large-v3"]
    params = init_params(jax.random.PRNGKey(0), dims)
    pipe = WhisperPipeline(
        WhisperConfig(compute_options=ComputeOptions.serving()),
        dims=dims, params=params,
    )
    options = pipeline_options(args.group)
    audio_s = args.minutes * 60.0

    warm = []
    for _ in range(args.warmups):
        t0 = time.perf_counter()
        pipe.transcribe(audio, options)
        warm.append(round((time.perf_counter() - t0) / audio_s, 5))

    passes = []
    for i in range(args.passes):
        rtt_before = measure_tunnel_dispatch_ms()
        load_before = os.getloadavg()[0]
        t0 = time.perf_counter()
        pipe.transcribe(audio, options)
        wall = time.perf_counter() - t0
        passes.append({
            "pass": i + 1,
            "rtf": round(wall / audio_s, 5),
            "rtt_ms_before": rtt_before,
            "rtt_ms_after": measure_tunnel_dispatch_ms(),
            "load1m": round(load_before, 2),
        })
        print(json.dumps(passes[-1]), file=sys.stderr)

    print(json.dumps({
        "metric": "probe_headline_passes",
        "warmup_rtfs": warm,
        "passes": passes,
        "spread": round(
            max(p["rtf"] for p in passes) / min(p["rtf"] for p in passes), 3
        ),
    }))


if __name__ == "__main__":
    main()
