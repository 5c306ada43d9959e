"""Probe which int4 (S4) operations survive the axon remote backend.

r7: `perf_decode --quant w4a16` died with `RecursionError: Recursively
calling jit` inside `_array_shard_arg` → `device_put(x, Format(layout,...))`
on an S4[20,64,1280] eager array (the reshape after `astype(jnp.int4)` in
`quantize_weight_w4` forces a tiled-layout relayout, and device_put of a
sub-byte dtype with an explicit layout recurses on this backend). This
probe isolates which S4 patterns work so the W4A16 path can be routed
around the broken ones:

  1. eager astype→reshape (the crashing pattern)
  2. reshape fused inside one jit (S4 never relaid out eagerly)
  3. jit-produced S4 array fed as an arg into a second jit (matmul consume)
  4. eager jnp.stack of jit-produced S4 arrays
  5. manual uint8 nibble-packing (no S4 anywhere) for comparison

Run: timeout 600 python tools/probe_int4_device.py
"""

import jax
import jax.numpy as jnp


def main() -> None:
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (1280, 1280), jnp.float32)

    def q4(x):
        return jnp.clip(jnp.round(x.reshape(20, 64, 1280)), -7, 7)

    def check(name, fn):
        try:
            out = jax.block_until_ready(fn())
            shp = jax.tree.map(lambda a: (a.dtype, a.shape), out)
            print(f"OK   {name}: {shp}")
            return out
        except Exception as e:  # noqa: BLE001 — probe reports, never raises
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            return None

    # 1. the crashing pattern: eager astype then eager reshape
    check("eager astype->reshape", lambda: q4(w).astype(jnp.int4).reshape(1280, 1280))

    # 2. same chain under one jit
    jitted = jax.jit(lambda x: q4(x).astype(jnp.int4).reshape(1280, 1280))
    a = check("jit(astype+reshape)", lambda: jitted(w))

    # 3. S4 jit output consumed as an arg by a second jit
    if a is not None:
        mm = jax.jit(lambda q, x: x @ q.astype(jnp.bfloat16))
        check("jit consume S4 arg", lambda: mm(a, jnp.ones((8, 1280), jnp.bfloat16)))

        # 4. eager stack of jit-produced S4 arrays (stacked-layer quantize)
        check("eager stack of S4", lambda: jnp.stack([a, a]))

        # 4b. stack inside jit instead
        st = jax.jit(lambda x, y: jnp.stack([x, y]))
        check("jit stack of S4", lambda: st(a, a))

    # 5. manual nibble-pack (uint8) — the S4-free fallback representation
    def pack(x):
        q = jnp.clip(jnp.round(x), -7, 7).astype(jnp.int8) + 8
        return (q[0::2] | (q[1::2] << 4)).astype(jnp.uint8)

    def unpack_mm(p, x):
        lo = (p & 0xF).astype(jnp.int8) - 8
        hi = (p >> 4).astype(jnp.int8) - 8
        wq = jnp.stack([lo, hi], axis=1).reshape(-1, p.shape[-1])
        return x @ wq.astype(jnp.bfloat16)

    p = check("jit nibble-pack", lambda: jax.jit(pack)(w))
    if p is not None:
        check(
            "jit nibble-unpack matmul",
            lambda: jax.jit(unpack_mm)(p, jnp.ones((8, 1280), jnp.bfloat16)),
        )


if __name__ == "__main__":
    main()
