"""Probe v5e MXU int8 throughput vs bf16 at encoder shapes (W8A8 candidate).

The spec sheet says v5e's MXU does ~394 TOPS int8 vs ~197 TFLOPS bf16 —
if that 2x survives XLA lowering (int8 x int8 -> int32 dot_general), a
W8A8 encoder path could roughly halve the encoder's 358 ms (b=16), which
is worth ~5-8% of the pipeline headline. The decoder is HBM-bound, so A8
has nothing to offer there.

All timing is ON-GRAPH: each case runs `iters` chained matmuls inside one
jitted lax.scan (data-dependent across iterations so XLA cannot hoist or
dedupe), then the per-iteration time is total/iters. One host dispatch per
measurement -> tunnel RTT and host load are amortized to noise.

Cases (M = 16*1500 encoder tokens, K=N=1280 d_model, MLP 1280<->5120):
  1. bf16 square matmul            — the production baseline
  2. int8 square matmul (i32 acc)  — raw MXU ceiling for int8
  3. W8A8 square: bf16 in -> per-row absmax quantize -> int8 dot ->
     rescale to bf16                — the realistic fused path
  4. bf16 MLP pair (1280->5120->1280)
  5. W8A8 MLP pair

Run: timeout 900 python tools/probe_int8_matmul.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

M, K = 16 * 1500, 1280
F = 5120  # MLP hidden
ITERS = 30


def _time_scan(step, x0, flops_per_iter, name):
    """Run `step` ITERS times inside one jitted scan; report per-iter time."""

    def body(c, _):
        return step(c), None

    fn = jax.jit(lambda x: jax.tree.map(
        lambda a: a[:1, :1] if hasattr(a, "shape") and a.ndim >= 2 else a,
        lax.scan(body, x, None, length=ITERS)[0],
    ))
    out = fn(x0)  # compile + warm
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(x0))[0])  # force host transfer
        best = min(best, time.perf_counter() - t0)
    per_iter = best / ITERS
    tops = flops_per_iter / per_iter / 1e12
    print(f"{name:34s} {per_iter * 1e3:8.3f} ms/iter  {tops:7.1f} T(FL)OP/s")
    return per_iter


def main() -> None:
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    w_bf = jax.random.normal(key, (K, K), jnp.bfloat16) * 0.03
    w_i8 = jnp.round(jax.random.normal(key, (K, K)) * 30).astype(jnp.int8)
    w_scale = jnp.float32(1 / 30)
    x_bf = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    x_i8 = jnp.round(x_bf.astype(jnp.float32) * 30).astype(jnp.int8)

    sq_flops = 2 * M * K * K

    # 1. bf16 baseline — chain with a cheap renorm to keep values finite
    def bf16_step(x):
        y = jnp.dot(x, w_bf)
        return y * jnp.float32(0.18).astype(jnp.bfloat16)

    t_bf = _time_scan(bf16_step, x_bf, sq_flops, "bf16 square")

    # 2. raw int8 dot, int32 accum; requantize via shift to chain
    def int8_step(x):
        acc = lax.dot_general(
            x, w_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return jnp.clip(acc >> 9, -127, 127).astype(jnp.int8)

    t_i8 = _time_scan(int8_step, x_i8, sq_flops, "int8 square (raw)")

    # 3. realistic W8A8: dynamic per-row activation quantize in the loop
    def w8a8_step(x):
        ax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True)
        s = jnp.maximum(ax, 1e-6) / 127.0
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)
        acc = lax.dot_general(
            q, w_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (s * w_scale)
        return (y * 0.18).astype(jnp.bfloat16)

    t_w8a8 = _time_scan(w8a8_step, x_bf, sq_flops, "w8a8 square (quant in loop)")

    # 4/5. MLP pair at the real encoder shape
    w1_bf = jax.random.normal(key, (K, F), jnp.bfloat16) * 0.03
    w2_bf = jax.random.normal(key, (F, K), jnp.bfloat16) * 0.03
    w1_i8 = jnp.round(jax.random.normal(key, (K, F)) * 30).astype(jnp.int8)
    w2_i8 = jnp.round(jax.random.normal(key, (F, K)) * 30).astype(jnp.int8)
    mlp_flops = 2 * M * K * F * 2

    def mlp_bf_step(x):
        h = jax.nn.gelu(jnp.dot(x, w1_bf))
        return (jnp.dot(h, w2_bf) * 0.05).astype(jnp.bfloat16)

    t_mlp_bf = _time_scan(mlp_bf_step, x_bf, mlp_flops, "bf16 MLP 1280<->5120")

    def _q(x):
        ax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True)
        s = jnp.maximum(ax, 1e-6) / 127.0
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)
        return q, s

    def mlp_w8a8_step(x):
        q, s = _q(x)
        h = lax.dot_general(
            q, w1_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (s * w_scale)
        h = jax.nn.gelu(h).astype(jnp.bfloat16)
        q2, s2 = _q(h)
        y = lax.dot_general(
            q2, w2_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (s2 * w_scale)
        return (y * 0.05).astype(jnp.bfloat16)

    t_mlp_q = _time_scan(mlp_w8a8_step, x_bf, mlp_flops, "w8a8 MLP 1280<->5120")

    print(
        f"\nspeedups vs bf16: raw int8 {t_bf / t_i8:.2f}x, "
        f"w8a8 {t_bf / t_w8a8:.2f}x, mlp w8a8 {t_mlp_bf / t_mlp_q:.2f}x"
    )


if __name__ == "__main__":
    main()
