"""Cross-attention KV bandwidth experiment (ROADMAP: quantize cross-KV).

Isolates the decode loop's per-step cross-attention over the cached
[L, B, H, 1500, Dh] K/V and measures bf16 vs int8 variants on the TPU.
int8 path: K quantized per (l,b,h,d)-channel with the scale folded into q
(contraction is over d, so scores = (q*scale_k) . k_q), probs quantized
per-row for an int8 x int8 probs@V dot with f32 rescale.

Run: python tools/perf_crosskv.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from whisperkit_tpu.core.compile_cache import enable_compilation_cache

L, H, DH, S = 4, 20, 64, 1500
B = 32
STEPS = 64


def make_inputs(key):
    kk, kv, kq = jax.random.split(key, 3)
    ck = jax.random.normal(kk, (L, B, H, S, DH), jnp.bfloat16)
    cv = jax.random.normal(kv, (L, B, H, S, DH), jnp.bfloat16)
    q = jax.random.normal(kq, (L, B, H, 1, DH), jnp.bfloat16)
    return ck, cv, q


def quant_last(x):
    """int8-quantize over the channel axis (last), scale per channel."""
    x32 = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.abs(x32).max(axis=-2, keepdims=True) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return xq, scale.astype(jnp.float32)


def attn_bf16(ck, cv, q, steps):
    def body(carry, _):
        acc, qq = carry
        scores = jnp.einsum(
            "lbhtd,lbhsd->lbhts", qq, ck, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("lbhts,lbhsd->lbhtd", probs.astype(cv.dtype), cv)
        return (acc + out.astype(jnp.float32), qq + out.astype(qq.dtype) * 0.01), None

    (acc, _), _ = jax.lax.scan(body, (jnp.zeros_like(q, jnp.float32), q), None, length=steps)
    return acc


def attn_int8(ckq, k_scale, cvq, v_scale, q, steps):
    def body(carry, _):
        acc, qq = carry
        # fold K's per-channel scale into q, then quantize q rows to int8
        qs = qq.astype(jnp.float32) * k_scale  # [L,B,H,1,DH]
        q_scale = jnp.maximum(jnp.abs(qs).max(axis=-1, keepdims=True) / 127.0, 1e-8)
        qi = jnp.clip(jnp.round(qs / q_scale), -127, 127).astype(jnp.int8)
        scores_i = jnp.einsum(
            "lbhtd,lbhsd->lbhts", qi, ckq, preferred_element_type=jnp.int32
        )
        scores = scores_i.astype(jnp.float32) * q_scale
        probs = jax.nn.softmax(scores, axis=-1)
        # quantize probs rows to int8 for the int8 V dot
        p_scale = jnp.maximum(probs.max(axis=-1, keepdims=True) / 127.0, 1e-8)
        pi = jnp.clip(jnp.round(probs / p_scale), 0, 127).astype(jnp.int8)
        out_i = jnp.einsum(
            "lbhts,lbhsd->lbhtd", pi, cvq, preferred_element_type=jnp.int32
        )
        # v_scale is per d-channel [L,B,H,1,DH]; p_scale per row [L,B,H,1,1]
        out = out_i.astype(jnp.float32) * p_scale * v_scale
        return (acc + out, qq + out.astype(qq.dtype) * 0.01), None

    (acc, _), _ = jax.lax.scan(body, (jnp.zeros(q.shape, jnp.float32), q), None, length=steps)
    return acc


def attn_int8_k_only(ckq, k_scale, cv, q, steps):
    def body(carry, _):
        acc, qq = carry
        qs = qq.astype(jnp.float32) * k_scale
        q_scale = jnp.maximum(jnp.abs(qs).max(axis=-1, keepdims=True) / 127.0, 1e-8)
        qi = jnp.clip(jnp.round(qs / q_scale), -127, 127).astype(jnp.int8)
        scores_i = jnp.einsum(
            "lbhtd,lbhsd->lbhts", qi, ckq, preferred_element_type=jnp.int32
        )
        scores = scores_i.astype(jnp.float32) * q_scale
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("lbhts,lbhsd->lbhtd", probs.astype(cv.dtype), cv)
        out = out.astype(jnp.float32)
        return (acc + out, qq + out.astype(qq.dtype) * 0.01), None

    (acc, _), _ = jax.lax.scan(body, (jnp.zeros(q.shape, jnp.float32), q), None, length=steps)
    return acc


def measure(fn, args, label):
    jitted = jax.jit(fn, static_argnames=("steps",))
    out = jitted(*args, steps=STEPS)
    _ = np.asarray(out.mean())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jitted(*args, steps=STEPS)
        _ = np.asarray(jnp.mean(out))
        ts.append(time.perf_counter() - t0)
    ms = np.median(ts) * 1e3 / STEPS
    print(f"{label}: {ms:.3f} ms/step (B={B})", flush=True)
    return out


def main():
    enable_compilation_cache()
    ck, cv, q = make_inputs(jax.random.PRNGKey(0))
    ref = measure(attn_bf16, (ck, cv, q), "bf16 cross-attn")

    ckq, k_scale = quant_last(ck)
    cvq, v_scale = quant_last(cv)  # scale per d-channel (max over S)
    got = measure(
        attn_int8, (ckq, k_scale, cvq, v_scale, q), "int8 cross-attn"
    )
    r, g = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    denom = np.abs(r).mean()
    print(f"int8 vs bf16: mean rel {np.abs(g - r).mean() / denom:.4f}")

    got_k = measure(
        attn_int8_k_only, (ckq, k_scale, cv, q), "int8-K/bf16-V cross-attn"
    )
    gk = np.asarray(got_k, np.float32)
    print(f"int8-K vs bf16: mean rel {np.abs(gk - r).mean() / denom:.4f}")


if __name__ == "__main__":
    main()
