"""Quantization WER-delta table: each scheme vs bf16 on real audio
fixtures with the SAME weight tree (VERDICT r4 #3).

Prints one JSON object per scheme: WER of the quantized transcript
against the bf16 transcript, token edit-distance rate, and identity
flags. With random-init weights (zero-egress env) the transcripts are
arbitrary token sequences — which makes this a SENSITIVE probe: any
drift in decode decisions shows up, unsmoothed by language priors.

Usage:
  python tools/eval_quant_wer.py                 # large-v3 on TPU, all schemes
  python tools/eval_quant_wer.py --variant tiny  # quick CPU-able run

Reference metric: RegressionTests.swift:293-296 (WER vs reference
transcripts); the offline analog is delta-vs-bf16 (docs/BENCHMARKS.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FIXTURES = Path("/root/reference/Tests/WhisperKitTests/Resources")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="large-v3")
    ap.add_argument("--group", type=int, default=16)
    ap.add_argument("--sample-length", type=int, default=224)
    ap.add_argument(
        "--schemes", nargs="*", default=None,
        help="subset of scheme names (default: all in DEFAULT_SCHEMES)",
    )
    ap.add_argument(
        "--teacher-forced", action="store_true",
        help="per-step flip rate vs bf16 on the SAME prefix (no trajectory "
        "compounding) — the interpretable companion to the free-run table",
    )
    args = ap.parse_args()

    import os

    import jax

    # The axon sitecustomize forces JAX_PLATFORMS=axon; honoring the env
    # var here makes the documented "quick CPU-able run" actually run on
    # CPU (and not hang in backend-connect retries when the tunnel is down).
    if "cpu" in (
        os.environ.get("WKTPU_EVAL_PLATFORM", ""),
        os.environ.get("JAX_PLATFORMS", ""),
    ):
        jax.config.update("jax_platforms", "cpu")

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import pipeline_options
    from whisperkit_tpu.audio.io import load_audio
    from whisperkit_tpu.eval.quant_delta import DEFAULT_SCHEMES, quant_divergence
    from whisperkit_tpu.models.whisper import VARIANT_DIMS, init_params

    audio_list = [
        load_audio(FIXTURES / "jfk.wav"),
        load_audio(FIXTURES / "ted_60.m4a"),
        load_audio(FIXTURES / "es_test_clip.wav"),
    ]
    dims = VARIANT_DIMS[args.variant]
    params = init_params(jax.random.PRNGKey(0), dims)
    options = dataclasses.replace(
        pipeline_options(args.group), sample_length=args.sample_length
    )
    schemes = (
        {k: DEFAULT_SCHEMES[k] for k in args.schemes}
        if args.schemes else None
    )
    if args.teacher_forced:
        from whisperkit_tpu.eval.quant_delta import teacher_forced_divergence

        reports = teacher_forced_divergence(
            dims, params, audio_list[0], language="en", schemes=schemes,
            max_tokens=args.sample_length,
        )
    else:
        reports = quant_divergence(dims, params, audio_list, options, schemes)
    for r in reports:
        print(json.dumps({"variant": args.variant, **dataclasses.asdict(r)}))


if __name__ == "__main__":
    main()
