"""Does W8A16 actually save bandwidth INSIDE the code-predictor scan?

The 14 AR micro-steps of `multicode_forward` run as a `lax.scan` whose
weights are loop-invariant. If XLA hoists the `w_q.astype * scale`
dequant out of the loop, every micro-step re-reads a MATERIALIZED bf16
copy — the int8 weights halve storage but not in-loop bandwidth, and a
Pallas dequant-in-VMEM matmul would be a real ~2× lever on the
weight-bound predictor (docs/ROADMAP.md "TTS code predictor").

Evidence gathered here (run on the chip):
  * ms per multicode_forward call, bf16 vs W8A16 (if ≈equal → hoisted)
  * the compiled HLO: do s8→bf16 converts of weight-sized arrays appear
    inside the while-loop body, or only outside (fusion vs hoisting)?

Run: python tools/probe_tts_dequant.py [--batch 4] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from whisperkit_tpu.models.qwen3_tts import (
        TINY_TTS_DIMS,
        Qwen3TTSDims,
        init_tts_params,
        multicode_forward,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    dims = Qwen3TTSDims() if on_tpu else TINY_TTS_DIMS
    b = args.batch if on_tpu else 2

    params = init_tts_params(jax.random.PRNGKey(0), dims)

    CHAIN = 32  # frames chained on-device per dispatch: one multicode call
    # is ~100 µs-scale but the tunnel RTT is 5-35 ms, so per-call timing
    # measures the network; chain the calls with a data dependency and
    # settle ONCE (CLAUDE.md dispatch discipline)

    def step(p, hidden, code0, key):
        def body(carry, _):
            h, c0, k = carry
            k, sub = jax.random.split(k)
            codes, csum = multicode_forward(
                p, h, c0, sub, jnp.float32(0.9), top_k=5, dims=dims
            )
            # feed the codec sum back as the next frame hidden (real AR
            # dependency shape: backbone omitted on purpose — this probe
            # isolates the code predictor)
            return (csum.astype(h.dtype), codes[:, 0], k), codes

        (_, _, _), codes = jax.lax.scan(
            body, (hidden, code0, key), None, length=CHAIN
        )
        return codes

    jstep = jax.jit(step)
    hidden = (
        jax.random.normal(jax.random.PRNGKey(1), (b, dims.d_model)) * 0.02
    ).astype(jnp.bfloat16)
    code0 = jnp.zeros((b,), jnp.int32)
    key = jax.random.PRNGKey(2)

    def rtt():
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(()))
        return (time.perf_counter() - t0) * 1000

    def bench(p):
        codes = jstep(p, hidden, code0, key)
        np.asarray(codes[-1, :, 0])  # settle (tiny transfer)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            codes = jstep(p, hidden, code0, key)
            np.asarray(codes[-1, :, 0])
            times.append(time.perf_counter() - t0)
        return float(np.min(times)) * 1000 / CHAIN

    tunnel_ms = min(rtt() for _ in range(5))
    ms_bf16 = bench(params)

    from whisperkit_tpu.ops.quant import quantize_tts_params, quantized_size_bytes

    qparams = quantize_tts_params(params)
    ms_w8 = bench(qparams)

    # HLO evidence: weight-sized s8 converts inside the while body?
    hlo = jax.jit(step).lower(qparams, hidden, code0, key).compile().as_text()
    # s8→bf16 converts of large arrays (>=1M elements ~ weight matrices)
    converts = re.findall(r"convert\(.*s8", hlo)
    big_s8 = re.findall(r"s8\[(\d+),(\d+)(?:,(\d+))?\]", hlo)
    big = [t for t in big_s8 if np.prod([int(x) for x in t if x]) >= 1 << 20]
    while_bodies = re.findall(r"while.*condition", hlo)
    print(
        json.dumps(
            {
                "metric": "tts_multicode_dequant_probe",
                "batch": b,
                "tunnel_dispatch_ms": round(tunnel_ms, 2),
                "chain": 32,
                "ms_bf16": round(ms_bf16, 3),
                "ms_w8a16": round(ms_w8, 3),
                "w8_speedup": round(ms_bf16 / ms_w8, 3),
                "hlo_s8_converts": len(converts),
                "hlo_big_s8_arrays": len(big),
                "hlo_while_ops": len(while_bodies),
                "hlo_chars": len(hlo),
            }
        )
    )
    # dump for manual inspection
    out = Path("/tmp/multicode_w8.hlo.txt")
    out.write_text(hlo)
    print(f"# HLO dumped to {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
