"""Probe host->TPU upload cost vs payload dtype/size (the long-form audio
upload: 12 min f32 = 46 MB). Times jnp.asarray + a 1-scalar pull so the
transfer definitely completed. Also times the host-side int16 grid
check/convert passes (pipelines/whisper._upload_audio) on one core."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 16_000 * 720 + 480_000  # 12 min + one window of padding
f32 = (np.random.default_rng(0).standard_normal(N) * 0.1).astype(np.float32)
i16 = (f32 * 32768).astype(np.int16)
grid = i16.astype(np.float32) / 32768.0


def timeit(fn, label, n=3):
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:42s} {best * 1e3:8.1f} ms")
    return best


print("devices:", jax.devices())
timeit(lambda: np.asarray(jnp.asarray(f32)[:1]), "upload f32 46MB")
timeit(lambda: np.asarray(jnp.asarray(i16)[:1]), "upload int16 23MB")
timeit(
    lambda: np.asarray((jnp.asarray(i16).astype(jnp.float32) / 32768.0)[:1]),
    "upload int16 + on-device f32 convert",
)
timeit(lambda: np.asarray(jnp.asarray(f32[: N // 2])[:1]), "upload f32 23MB")


def host_check():
    scaled = grid.ravel() * np.float32(32768.0)
    i_all = np.rint(scaled)
    ok = bool((np.abs(i_all) <= 32767.0).all() and (scaled == i_all).all())
    out = np.clip(i_all, -32768, 32767).astype(np.int16)
    return ok, out


timeit(host_check, "host grid-check+convert passes (46MB)")
timeit(lambda: np.zeros(N, np.float32), "host np.zeros 46MB")
