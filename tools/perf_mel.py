"""Mel front-end: XLA matmul-STFT vs fused Pallas kernel (VERDICT r2 #7).

Times the full log-mel stage (pad + frame + DFT + mel + log + norm) for a
batch of 30 s windows. Run on the chip:
    python tools/perf_mel.py [--batch 16] [--n-mels 128]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-mels", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from whisperkit_tpu.ops.mel import log_mel_spectrogram, log_mel_spectrogram_pallas

    audio = jax.random.normal(jax.random.PRNGKey(0), (args.batch, 480_000)) * 0.1

    import jax.numpy as jnp

    def bench(fn):
        # settle with a SCALAR host pull: transferring the [B,128,3000] mel
        # over the remote tunnel (~25 MB) would swamp the compute being
        # measured. The sum forces full execution.
        out = fn(audio, n_mels=args.n_mels)
        np.asarray(jnp.sum(out))  # compile + settle
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(fn(audio, n_mels=args.n_mels)))
            times.append(time.perf_counter() - t0)
        return float(np.min(times) * 1000), out

    xla_ms, xla_out = bench(log_mel_spectrogram)
    pal_ms, pal_out = bench(log_mel_spectrogram_pallas)
    err = float(jnp.abs(xla_out - pal_out).max())
    print(
        json.dumps(
            {
                "batch": args.batch,
                "n_mels": args.n_mels,
                "xla_ms": round(xla_ms, 2),
                "pallas_fused_ms": round(pal_ms, 2),
                "speedup": round(xla_ms / pal_ms, 2),
                "max_abs_err": err,
            }
        )
    )


if __name__ == "__main__":
    main()
