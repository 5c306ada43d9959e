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


# ---------------------------------------------------------------------------
# T==1 SELF-attention over the decode KV cache (bf16 and int8 forms).
# The r5 attribution puts self-attention at 4.45-4.84 ms of the b=32 serving
# step (~2 ms floor: 1.2 GB KV read + projection weights); the attend part
# is the same skinny-matvec shape as the cross term. The causal mask comes
# in as a precomputed additive [1,S] f32 row (built by the XLA caller from
# the step position) — no SMEM scalars, keeping the kernel in the
# plain-BlockSpec relay-safe family.
# ---------------------------------------------------------------------------


def _self_decode_kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
    # refs: q [bb,1,1,Dh] f32 (dh^-0.5 folded), k/v [bb,1,S,Dh] bf16/f32,
    # m [1,S] f32 additive mask, o [bb,1,1,Dh] f32
    q = q_ref[:, 0]  # [bb, 1, Dh]
    k = k_ref[:, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [bb, 1, S]
    probs = jax.nn.softmax(scores + m_ref[0][None, None, :], axis=-1)
    v = v_ref[:, 0].astype(jnp.float32)
    o_ref[:, 0] = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _self_decode_q8_kernel(
    qi_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref, m_ref, o_ref
):
    # refs: qi [bb,1,1,Dh] int8, qs [bb,1,1,1] f32, k/v [bb,1,S,Dh] int8,
    # ks/vs [bb,1,S,1] f32 per-token scales, m [1,S] f32, o [bb,1,1,Dh] f32
    qi = qi_ref[:, 0]  # [bb, 1, Dh]
    k = k_ref[:, 0]  # [bb, S, Dh] int8
    scores_i = jax.lax.dot_general(
        qi, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [bb, 1, S]
    k_scale = ks_ref[:, 0, :, 0][:, None, :]  # [bb, 1, S]
    scores = scores_i.astype(jnp.float32) * qs_ref[:, 0] * k_scale
    probs = jax.nn.softmax(scores + m_ref[0][None, None, :], axis=-1)
    pw = probs * vs_ref[:, 0, :, 0][:, None, :]  # fold per-token V scales
    p_scale = jnp.maximum(pw.max(axis=-1, keepdims=True) / 127.0, 1e-8)
    pi = jnp.clip(jnp.round(pw / p_scale), 0, 127).astype(jnp.int8)
    v = v_ref[:, 0]  # [bb, S, Dh] int8
    out_i = jax.lax.dot_general(
        pi, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    o_ref[:, 0] = out_i.astype(jnp.float32) * p_scale


def _self_grid_specs(b, h, s, block_b):
    bb = min(block_b, b)
    while b % bb:
        bb -= 1
    spec = lambda blk: pl.BlockSpec(  # noqa: E731
        blk, lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec(
        (1, s), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    return (h, b // bb), bb, spec, mask_spec


@functools.partial(jax.jit, static_argnames=("block_b",))
def self_attend_pallas(q, k, v, mask_row, block_b: int = 16):
    """T==1 self-attention over the raw (bf16/f32) KV cache.

    q: [B,H,1,Dh] with dh^-0.5 PRE-FOLDED (caller does q * dh**-0.5);
    k/v: [B,H,S,Dh]; mask_row: [1,S] f32 additive (0 for visible keys,
    -inf/-1e30 beyond the current position). → [B,H,1,Dh] f32.
    """
    b, h, s, dh = k.shape
    grid, bb, spec, mask_spec = _self_grid_specs(b, h, s, block_b)
    return pl.pallas_call(
        _self_decode_kernel,
        grid=grid,
        in_specs=[
            spec((bb, 1, 1, dh)),
            spec((bb, 1, s, dh)),
            spec((bb, 1, s, dh)),
            mask_spec,
        ],
        out_specs=spec((bb, 1, 1, dh)),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, dh), jnp.float32),
        interpret=jax.devices()[0].platform == "cpu",  # CPU tests
    )(q.astype(jnp.float32), k, v, mask_row)


@functools.partial(jax.jit, static_argnames=("block_b",))
def self_attend_q8_pallas(
    qi, q_scale, k_q8, k_scale, v_q8, v_scale, mask_row, block_b: int = 16
):
    """T==1 self-attention over the int8 per-token-scale KV cache
    (models/whisper._attend_self_q8 math). qi/q_scale as produced by the
    caller's row quantization; k/v scales are [B,H,S,1] f32 per-token.
    → [B,H,1,Dh] f32."""
    b, h, s, dh = k_q8.shape
    grid, bb, spec, mask_spec = _self_grid_specs(b, h, s, block_b)
    return pl.pallas_call(
        _self_decode_q8_kernel,
        grid=grid,
        in_specs=[
            spec((bb, 1, 1, dh)),
            spec((bb, 1, 1, 1)),
            spec((bb, 1, s, dh)),
            spec((bb, 1, s, 1)),
            spec((bb, 1, s, dh)),
            spec((bb, 1, s, 1)),
            mask_spec,
        ],
        out_specs=spec((bb, 1, 1, dh)),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, dh), jnp.float32),
        interpret=jax.devices()[0].platform == "cpu",  # CPU tests
    )(qi, q_scale, k_q8, k_scale, v_q8, v_scale, mask_row)
