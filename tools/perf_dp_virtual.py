"""Quantify multi-chip dp overhead on the virtual CPU mesh (VERDICT r2 #6).

The 8-chip dryrun proves the dp sharding COMPILES+RUNS; this tool measures
what the sharding machinery COSTS, so the "×8 chips ⇒ ÷8 RTF" implication
carries an efficiency factor. On the virtual mesh all 8 "devices" share the
same host cores, so total compute is constant — any wall-clock delta
between dp=1 and dp=8 at EQUAL total batch is pure parallelism overhead:
sharded dispatch, the per-group host gathers (`np.asarray` result pulls),
and XLA's partitioned-program bookkeeping.

    dp_efficiency = t(dp=1, batch=G) / t(dp=8, batch=G)

A value near 1.0 means the per-group sync machinery is free at group
granularity and real chips would scale at compute-bound efficiency; the
shortfall is the overhead budget per group.

Run: JAX_PLATFORMS=cpu python tools/perf_dp_virtual.py
(env is forced CPU+8 devices internally; safe on any host.)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    from bench import synth_speechlike_audio
    from whisperkit_tpu.core.configurations import (
        ComputeOptions,
        DecodingOptions,
        WhisperConfig,
    )
    from whisperkit_tpu.models.whisper import WhisperDims, init_params

    assert len(jax.devices()) >= 8, "needs the 8-device virtual mesh"
    dims = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)
    params = init_params(jax.random.PRNGKey(0), dims)
    audio = synth_speechlike_audio(6 * 60.0)  # ~12 chunks -> full groups
    group = 16
    options = DecodingOptions(
        language="en", chunking_strategy="vad", sample_length=48,
        temperature_fallback_count=0, logprob_threshold=None,
        compression_ratio_threshold=None, no_speech_threshold=None,
        first_token_log_prob_threshold=None, concurrent_worker_count=group,
    )

    def run(dp: int) -> tuple[float, int]:
        from whisperkit_tpu.pipelines.whisper import WhisperPipeline

        pipe = WhisperPipeline(
            WhisperConfig(compute_options=ComputeOptions(dp_size=dp)),
            dims=dims, params=params,
        )
        pipe.transcribe(audio[: 16_000 * 65], options)  # warmup/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = pipe.transcribe(audio, options)
            best = min(best, time.perf_counter() - t0)
        return best, len(res.segments)

    t1, n1 = run(dp=1)
    t8, n8 = run(dp=8)
    out = {
        "metric": "virtual_dp8_efficiency_equal_batch",
        "t_dp1_s": round(t1, 3),
        "t_dp8_s": round(t8, 3),
        "dp_efficiency": round(t1 / t8, 3),
        "overhead_pct": round((t8 - t1) / t1 * 100.0, 1),
        "segments": [n1, n8],
        "note": "equal total batch on shared host cores; delta = sharding/dispatch/gather overhead only",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
