"""Qwen3-TTS throughput on the rebuilt (faithful) stack.

Per-frame cost now includes the real 5-layer code-predictor transformer
(17 sequential micro-steps per frame, Qwen3MultiCodeDecoder semantics) and
the real Code2Wav vocoder — the numbers in docs/BENCHMARKS.md from the
invented r2 architectures do not carry over.

Measures at 0.6b dims (d1024/28L backbone, 5L code predictor, 8L+conv
Code2Wav):
  * AR generation ms/frame (batch of sentence chunks)
  * whole-utterance vocode ms/frame (one batched Code2Wav call)
  * end-to-end generate() real-time ratio + TTFB via stream_blocks

Run on the chip: python tools/perf_tts.py [--batch 4] [--frames 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--quantize", nargs="?", const="w8a16", default=None,
        choices=["w8a16", "w4a16"],
        help="weight quantization (bare flag = w8a16; w4a16 = group-64 "
        "int4, the 4-bit palettized-variant analog)",
    )
    ap.add_argument(
        "--variant", default="0.6b",
        help="0.6b | 1.7b (the instruction-tuned config's dims: d2048/28L, "
        "16 q-heads/8 kv-heads, ff 6144 — Qwen3Config.swift:25-83) | tiny-test",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from whisperkit_tpu.decoding.tts_loop import TTSScalars, tts_generate_loop
    from whisperkit_tpu.models.qwen3_tts import (
        SAMPLES_PER_FRAME,
        Qwen3TTSDims,
        init_tts_params,
        speech_decoder_forward,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    from whisperkit_tpu.pipelines.tts import TTS_VARIANTS

    dims = TTS_VARIANTS[args.variant] if on_tpu else __import__(
        "whisperkit_tpu.models.qwen3_tts", fromlist=["TINY_TTS_DIMS"]
    ).TINY_TTS_DIMS
    b = args.batch if on_tpu else 2
    frames = args.frames if on_tpu else 6
    params = init_tts_params(jax.random.PRNGKey(0), dims)
    if args.quantize:
        from whisperkit_tpu.ops.quant import quantize_tts_params

        params = quantize_tts_params(
            params, bits=4 if args.quantize == "w4a16" else 8
        )

    embeds = (
        jax.random.normal(jax.random.PRNGKey(1), (b, 24, dims.d_model)) * 0.02
    ).astype(jnp.bfloat16)
    scalars = TTSScalars(
        temperature=jnp.float32(0.9),
        repetition_penalty=jnp.float32(1.05),
        rng_key=jax.random.PRNGKey(0),
    )

    def gen(seed):
        out = tts_generate_loop(
            params, embeds,
            scalars._replace(rng_key=jax.random.PRNGKey(seed)),
            dims=dims, max_new_tokens=frames, top_k=50,
        )
        return np.asarray(out.codes)

    codes = gen(0)  # compile
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        gen(i + 1)
        times.append(time.perf_counter() - t0)
    ar_s = float(np.min(times))
    ms_per_frame = ar_s * 1000 / frames  # batched: all rows advance together

    codes_dev = jnp.asarray(np.clip(codes, 0, 2047))

    def voc(x):
        wave = speech_decoder_forward(params, x, dims)
        return np.asarray(jnp.sum(wave))  # scalar settle (tunnel transfers)

    voc(codes_dev)  # compile
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        voc(codes_dev)
        times.append(time.perf_counter() - t0)
    voc_s = float(np.min(times))

    audio_s = frames * SAMPLES_PER_FRAME / 24_000
    total_s = ar_s + voc_s
    print(
        json.dumps(
            {
                "metric": f"tts_{args.variant}_real_stack"
                + (f"_{args.quantize}" if args.quantize else ""),
                "batch": b,
                "frames": frames,
                "ar_ms_per_frame": round(ms_per_frame, 3),
                "vocode_ms_per_frame": round(voc_s * 1000 / frames, 3),
                "audio_seconds_per_row": round(audio_s, 2),
                "realtime_x_per_row": round(audio_s / total_s, 1),
                "realtime_x_batch": round(b * audio_s / total_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
