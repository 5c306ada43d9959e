"""Generic one-shot pipeline-config probe: RTF of the REAL pipeline under
EXACTLY the bench headline recipe (bench.pipeline_options — VAD-chunked,
rules on, 224-token budget, 12 min audio) for an arbitrary combination of
the quantization/serving knobs, so candidate configs can be A/B'd on the
chip without editing bench.py.

Examples:
  python tools/probe_pipeline_config.py --self-kv              # serving + int8 self-KV
  python tools/probe_pipeline_config.py --quant w4a16          # 4-bit weights candidate
  python tools/probe_pipeline_config.py --no-cross-kv --group 16  # plain bf16 b=16

Every run records tunnel_dispatch_ms at both ends (CLAUDE.md: the tunnel
RTT drifts 5-35 ms across sessions and can fake a 2× pipeline-RTF
regression — never accept/reject a config without it).

Reference hot path: TextDecoder.swift:573-757 (decode loop) — this probe
measures the whole `WhisperPipeline.transcribe` wrapping it.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="large-v3")
    ap.add_argument("--group", type=int, default=32)
    ap.add_argument("--minutes", type=float, default=12.0)
    ap.add_argument("--quant", choices=["w8a16", "w8a8", "w4a16"], default=None,
                    help="weight-quantize the model before measuring "
                    "(w8a8 = w8a16 weights + int8-activation encoder)")
    ap.add_argument("--self-kv", dest="self_kv", action="store_true")
    ap.add_argument(
        "--no-cross-kv", dest="cross_kv", action="store_false",
        help="drop the serving preset's fused int8 cross-KV (bf16 cross-KV; "
        "large-v3 then needs --group 16 to fit)",
    )
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--beam-size", dest="beam_size", type=int, default=1,
        help="beam search width (beam tiles the bf16 cross-KV ×beam, so "
        "shrink --group to fit: large-v3 wants group×beam ≤ 16)",
    )
    ap.add_argument(
        "--timings", action="store_true",
        help="print the pipeline's per-stage timing report after the last "
        "timed pass (where does the headline wall actually go?)",
    )
    ap.add_argument(
        "--sync-timings", dest="sync_timings", action="store_true",
        help="block at stage boundaries so the --timings rows show TRUE "
        "per-stage execution time (ComputeOptions.sync_timings; costs one "
        "tunnel RTT per stage, so the pass RTFs run slightly pessimistic)",
    )
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

    rtt_start = measure_tunnel_dispatch_ms()
    audio = synth_speechlike_audio(args.minutes * 60.0)
    dims = VARIANT_DIMS[args.variant]
    params = init_params(jax.random.PRNGKey(0), dims)
    if args.quant:
        from whisperkit_tpu.ops.quant import quantize_whisper_params

        params = quantize_whisper_params(
            params, bits=4 if args.quant == "w4a16" else 8
        )
    compute = ComputeOptions(
        quantize_cross_kv=args.cross_kv, quantize_self_kv=args.self_kv,
        quantization=args.quant, sync_timings=args.sync_timings,
    )
    pipe = WhisperPipeline(
        WhisperConfig(compute_options=compute), dims=dims, params=params
    )
    options = pipeline_options(args.group)  # the bench headline recipe
    if args.beam_size > 1:
        import dataclasses

        options = dataclasses.replace(options, beam_size=args.beam_size)
    pipe.transcribe(audio, options)  # compile on the full audio (CLAUDE.md)
    rtfs = []
    for _ in range(args.passes):
        t0 = time.perf_counter()
        result = pipe.transcribe(audio, options)
        rtfs.append((time.perf_counter() - t0) / (args.minutes * 60.0))
    if args.timings:
        result.timings.log()  # package logger defaults to INFO → stderr
    print(json.dumps({
        "metric": "probe_pipeline_rtf",
        "variant": args.variant, "group": args.group,
        "quant": args.quant, "cross_kv_int8": args.cross_kv,
        "self_kv_int8": args.self_kv, "beam_size": args.beam_size,
        "rtfs": [round(r, 5) for r in rtfs],
        "best": round(min(rtfs), 5),
        "tunnel_dispatch_ms": rtt_start,
        "tunnel_dispatch_ms_end": measure_tunnel_dispatch_ms(),
    }))


if __name__ == "__main__":
    main()
