"""One-pass Pallas T==1 cross-attention over the int8 KV cache.

Targets the serving decode step's dominant term (reference hot loop:
TextDecoder.swift:573-757). The r5 attribution (docs/BENCHMARKS.md) puts
int8 cross-attention at 6.96-7.28 ms of the 13.1 ms b=32 large-v3 serving
step against a 4.8 ms pure-bandwidth floor (3.9 GB of int8 K/V read per
step) — a ~45% excess that survived the fused-QKV test, leaving XLA's
scheduling of 640 skinny [1,64]x[64,1500] matvec fusions as the suspect.

Kernel shape: grid (H, B/block_b); each program holds block_b batch rows'
ENTIRE K and V for one head in VMEM (block_b=16: 2x1.5 MB int8,
double-buffered ≈ 6 MB of the 16 MB budget) and runs the same int8 recipe
as `models/whisper._cross_attend`'s einsum path — int8xint8 MXU score dot
with the pre-folded/quantized query, f32 softmax, per-row probs
requantization, int8xint8 V dot — so HBM traffic is exactly K+V once and
nothing f32-sized ever materializes. Batching B inside the program matters:
a (B, H) grid of single-row programs would bottleneck on per-iteration
fixed cost (~1 us against a 0.2 us DMA), not bandwidth.

Relay constraints honored (CLAUDE.md): plain BlockSpecs only, no manual
ANY-space DMA, no in-kernel concat.

Gated behind WKTPU_PALLAS_CROSS_DECODE=1 (read at trace time in
models/whisper._cross_attend) until measured on-chip; A/B via
`tools/perf_decode.py --serving --pallas-cross --only base`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cross_decode_kernel(qi_ref, qs_ref, k_ref, v_ref, vs_ref, o_ref):
    # refs: qi [bb,1,1,Dh] int8, qs [bb,1,1,1] f32 (query scale),
    # k/v [bb,1,S,Dh] int8, vs [bb,1,1,Dh] f32, o [bb,1,1,Dh] f32
    qi = qi_ref[:, 0]  # [bb, 1, Dh] int8
    k = k_ref[:, 0]  # [bb, S, Dh] int8
    scores_i = jax.lax.dot_general(
        qi, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [bb, 1, S] int32
    scores = scores_i.astype(jnp.float32) * qs_ref[:, 0]  # [bb,1,S] * [bb,1,1]
    probs = jax.nn.softmax(scores, axis=-1)
    p_scale = jnp.maximum(probs.max(axis=-1, keepdims=True) / 127.0, 1e-8)
    pi = jnp.clip(jnp.round(probs / p_scale), 0, 127).astype(jnp.int8)
    v = v_ref[:, 0]  # [bb, S, Dh] int8
    out_i = jax.lax.dot_general(
        pi, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [bb, 1, Dh] int32
    o_ref[:, 0] = out_i.astype(jnp.float32) * p_scale * vs_ref[:, 0]


@functools.partial(jax.jit, static_argnames=("block_b",))
def cross_attend_q8_pallas(qi, q_scale, k_q8, v_q8, v_scale, block_b: int = 16):
    """T==1 int8 cross-attention (same math as the XLA einsum path).

    qi:      [B,H,1,Dh] int8 — query, scale-folded then row-quantized
             (models/whisper._cross_attend does the fold+quantize)
    q_scale: [B,H,1,1] f32 — per-row query dequant scale
    k_q8:    [B,H,S,Dh] int8
    v_q8:    [B,H,S,Dh] int8
    v_scale: [B,H,1,Dh] f32 (per-channel V scale)
    → [B,H,1,Dh] f32
    """
    b, h, s, dh = k_q8.shape
    bb = min(block_b, b)
    while b % bb:  # block must divide B (b is a handful of static sizes)
        bb -= 1
    grid = (h, b // bb)
    spec = lambda blk: pl.BlockSpec(  # noqa: E731
        blk, lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _cross_decode_kernel,
        grid=grid,
        in_specs=[
            spec((bb, 1, 1, dh)),
            spec((bb, 1, 1, 1)),
            spec((bb, 1, s, dh)),
            spec((bb, 1, s, dh)),
            spec((bb, 1, 1, dh)),
        ],
        out_specs=spec((bb, 1, 1, dh)),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, dh), jnp.float32),
        interpret=jax.devices()[0].platform == "cpu",  # CPU tests
    )(qi, q_scale, k_q8, v_q8, v_scale)


def cross_attend_q8_reference(qi, q_scale, k_q8, v_q8, v_scale):
    """jnp reference of the kernel math (tests pin kernel == reference)."""
    scores_i = jnp.einsum(
        "bhtd,bhsd->bhts", qi, k_q8, preferred_element_type=jnp.int32
    )
    probs = jax.nn.softmax(scores_i.astype(jnp.float32) * q_scale, axis=-1)
    p_scale = jnp.maximum(probs.max(axis=-1, keepdims=True) / 127.0, 1e-8)
    pi = jnp.clip(jnp.round(probs / p_scale), 0, 127).astype(jnp.int8)
    out_i = jnp.einsum(
        "bhts,bhsd->bhtd", pi, v_q8, preferred_element_type=jnp.int32
    )
    return out_i.astype(jnp.float32) * p_scale * v_scale
