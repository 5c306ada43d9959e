"""One-pass Pallas T==1 cross-attention over the int8 KV cache.

Targets the serving decode step's dominant term (reference hot loop:
TextDecoder.swift:573-757). The r5 attribution (docs/BENCHMARKS.md) puts
int8 cross-attention at 6.96-7.28 ms of the 13.1 ms b=32 large-v3 serving
step against a 4.8 ms pure-bandwidth floor (3.9 GB of int8 K/V read per
step) — a ~45% excess that survived the fused-QKV test, leaving XLA's
scheduling of 640 skinny [1,64]x[64,1500] matvec fusions as the suspect.

This kernel makes the traffic explicit: grid (B, H); each program DMAs one
head's ENTIRE K and V (1500x64 int8 = 96 KB each — trivially VMEM-resident,
double-buffered across grid steps) and computes

    scores[1,S]  = qs_f32 @ K_int8         (K converts in VMEM)
    probs        = softmax(scores)          f32, VMEM-resident
    out[1,Dh]    = (probs @ V_int8) * v_scale

so HBM traffic is exactly K+V+q+out. Two accuracy wins over the XLA int8
einsum path (`models/whisper._cross_attend`): the query is NOT re-quantized
(its scale-folded f32 form feeds the dot directly) and the probs are NOT
quantized for the V dot — only the K/V int8 rounding remains.

Relay constraints honored (CLAUDE.md): plain BlockSpecs only, no manual
ANY-space DMA, no in-kernel concat.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cross_decode_kernel(q_ref, k_ref, v_ref, vs_ref, o_ref):
    # refs: q [1,1,1,Dh] f32 (scale-folded), k/v [1,1,S,Dh] int8,
    # vs [1,1,1,Dh] f32, o [1,1,1,Dh] f32
    q = q_ref[0, 0]  # [1, Dh] f32
    k = k_ref[0, 0].astype(jnp.float32)  # [S, Dh]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, S]
    probs = jax.nn.softmax(scores, axis=-1)
    v = v_ref[0, 0].astype(jnp.float32)  # [S, Dh]
    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, Dh]
    o_ref[0, 0] = out * vs_ref[0, 0]


@jax.jit
def cross_attend_q8_pallas(qs, k_q8, v_q8, v_scale):
    """T==1 cross-attention over int8 K/V.

    qs:      [B,H,1,Dh] f32 — query with dh^-0.5 and K's per-channel scale
             already folded in (models/whisper._cross_attend does the fold)
    k_q8:    [B,H,S,Dh] int8
    v_q8:    [B,H,S,Dh] int8
    v_scale: [B,H,1,Dh] f32 (per-channel V scale)
    → [B,H,1,Dh] f32
    """
    b, h, s, dh = k_q8.shape
    grid = (b, h)
    return pl.pallas_call(
        _cross_decode_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, dh), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, dh), jnp.float32),
        interpret=jax.devices()[0].platform == "cpu",  # CPU tests
    )(qs, k_q8, v_q8, v_scale)


def cross_attend_q8_reference(qs, k_q8, v_q8, v_scale):
    """jnp reference of the kernel math (tests pin kernel == reference)."""
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", qs, k_q8.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhts,bhsd->bhtd", probs, v_q8.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out * v_scale
