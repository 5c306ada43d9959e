"""One-pass Pallas MHA for the Whisper encoder's fixed shapes.

Re-implements the compute of `models/whisper._attend` (reference behavior:
AudioEncoder.swift:42-63 / MultiHeadAttention) as a TPU Pallas kernel
specialized to non-causal, fixed-length self-attention at Whisper encoder
shapes (S=1500, Dh=64).

Why a THIRD attention variant exists (after XLA materialized attention and
the library flash/splash kernels, tools/perf_encoder.py v9/v10/v13): the
encoder's [B,H,1500,1500] score/prob tensors are pure HBM traffic under
XLA (~112 ms of the 358 ms b=16 encoder), while the generic flash kernels
pay multi-pass online-softmax rescaling machinery that measured SLOWER
than XLA at these shapes (399/1181 ms). At S_pad=1536 a full-K query
block fits VMEM outright — one q-block holds the ENTIRE key/value range,
so the softmax needs no running max/renormalization passes at all:

  grid (B, H, S/BQ); per program:
    scores[BQ,1536] = (q*s) @ (k*s)^T      in f32, VMEM-resident
    probs = softmax(scores + pad-mask)      f32, VMEM-resident
    out[BQ,64] = probs.bf16 @ v

K/V blocks are indexed (b, h) only, so Pallas keeps them resident across
the q-block sweep (the innermost grid axis) — HBM traffic is exactly
Q+K+V+O, the speed-of-light for attention without probs materialization.

VMEM at BQ=768: q 96 KB + k/v 2×192 KB + f32 scores 4.5 MB + out 96 KB
(+ pipeline double-buffering) ≈ 6 MB of the 16 MB budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, valid: int, scale: float):
    # refs: q [1,1,BQ,Dh], k/v [1,1,S_pad,Dh], o [1,1,BQ,Dh]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s_pad = k.shape[0]
    # whisper applies dh^-0.25 to BOTH q and k; fold k's factor into q so
    # the kernel does one scalar multiply (bf16 rounding differs from the
    # two-sided product by <1 ulp — within the prod path's own bf16 noise)
    scores = jax.lax.dot_general(
        (q * scale).astype(q.dtype),
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, S_pad] f32
    if valid < s_pad:  # static: mask the zero-padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < valid, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[0, 0] = jax.lax.dot_general(
        probs.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def mha_encoder_pallas(q, k, v, block_q: int = 768):
    """Non-causal MHA, q/k/v [B,H,S,Dh] → [B,H,S,Dh].

    Matches `_attend(q, k, v)` semantics (dh^-0.25 two-sided scaling, f32
    softmax) for fixed-S encoder self-attention; S is padded to a multiple
    of block_q with in-kernel key masking.
    """
    b, h, s, dh = q.shape
    s_pad = -(-s // block_q) * block_q
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    grid = (b, h, s_pad // block_q)
    kernel = functools.partial(
        _mha_kernel, valid=s, scale=float(dh) ** -0.5
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, dh), lambda i, j, n: (i, j, n, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s_pad, dh), lambda i, j, n: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s_pad, dh), lambda i, j, n: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, dh), lambda i, j, n: (i, j, n, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, dh), q.dtype),
        interpret=jax.devices()[0].platform == "cpu",  # CPU tests
    )(q, k, v)
    return out[:, :, :s]
