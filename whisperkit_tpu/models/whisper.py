"""Whisper encoder/decoder, TPU-native (pure JAX, functional).

Reference: Sources/WhisperKit/Core/AudioEncoder.swift (CoreML
AudioEncoder.mlmodelc, :42-63) and TextDecoder.swift (CoreML KV-cached
single-token decoder, :299-900). Here both are from-scratch JAX modules:

  * parameters are plain pytrees (dicts of jnp arrays), bf16 by default
  * transformer layers are STACKED along a leading layer axis and driven by
    `lax.scan` — one traced layer body regardless of depth (compile time and
    code size independent of n_layers; standard TPU practice)
  * the decoder exposes prefill (T tokens at once) and incremental step
    (T=1, KV-cache via `dynamic_update_slice`) entry points that the jitted
    decode loop composes
  * cross-attention K/V are precomputed once per window
  * cross-attention probabilities for selected alignment heads can be
    captured for word-timestamp DTW

Weight layout: linear weights stored as [in, out] (y = x @ w + b); conv
weights in torch OIH layout consumed directly by lax.conv dimension numbers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any


@dataclasses.dataclass(frozen=True)
class WhisperDims:
    """Model dimensions (mirrors openai/whisper ModelDimensions)."""

    n_mels: int = 80
    n_vocab: int = 51865
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4

    @property
    def head_dim(self) -> int:
        return self.n_text_state // self.n_text_head


# Known variants (reference: Models.swift:39-88 ModelVariant; dims from the
# Whisper paper / openai checkpoints).
VARIANT_DIMS: dict[str, WhisperDims] = {
    "tiny": WhisperDims(80, 51865, 1500, 384, 6, 4, 448, 384, 6, 4),
    "tiny.en": WhisperDims(80, 51864, 1500, 384, 6, 4, 448, 384, 6, 4),
    "base": WhisperDims(80, 51865, 1500, 512, 8, 6, 448, 512, 8, 6),
    "base.en": WhisperDims(80, 51864, 1500, 512, 8, 6, 448, 512, 8, 6),
    "small": WhisperDims(80, 51865, 1500, 768, 12, 12, 448, 768, 12, 12),
    "small.en": WhisperDims(80, 51864, 1500, 768, 12, 12, 448, 768, 12, 12),
    "medium": WhisperDims(80, 51865, 1500, 1024, 16, 24, 448, 1024, 16, 24),
    "medium.en": WhisperDims(80, 51864, 1500, 1024, 16, 24, 448, 1024, 16, 24),
    # "large" (v1) shares v2's dims exactly (Models.swift:39-88 lists both)
    "large": WhisperDims(80, 51865, 1500, 1280, 20, 32, 448, 1280, 20, 32),
    "large-v2": WhisperDims(80, 51865, 1500, 1280, 20, 32, 448, 1280, 20, 32),
    "large-v3": WhisperDims(128, 51866, 1500, 1280, 20, 32, 448, 1280, 20, 32),
    "large-v3-turbo": WhisperDims(128, 51866, 1500, 1280, 20, 32, 448, 1280, 20, 4),
    "distil-large-v3": WhisperDims(128, 51866, 1500, 1280, 20, 32, 448, 1280, 20, 2),
}


def sinusoidal_positions(length: int, channels: int) -> np.ndarray:
    """Whisper encoder positional embedding (fixed sinusoids)."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _linear(key, d_in, d_out, dtype, bias=True):
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * (d_in**-0.5)
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _ln(d, dtype):
    return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def _attn_params(key, d, dtype, cross=False):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": _linear(kq, d, d, dtype),
        "k": _linear(kk, d, d, dtype, bias=False),  # whisper: no k bias
        "v": _linear(kv, d, d, dtype),
        "out": _linear(ko, d, d, dtype),
    }


def _block_params(key, d, dtype, cross: bool):
    keys = jax.random.split(key, 6)
    p = {
        "attn_ln": _ln(d, dtype),
        "attn": _attn_params(keys[0], d, dtype),
        "mlp_ln": _ln(d, dtype),
        "fc1": _linear(keys[1], d, 4 * d, dtype),
        "fc2": _linear(keys[2], 4 * d, d, dtype),
    }
    if cross:
        p["cross_attn_ln"] = _ln(d, dtype)
        p["cross_attn"] = _attn_params(keys[3], d, dtype, cross=True)
    return p


def _stack_blocks(blocks: list[PyTree]) -> PyTree:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_params(key, dims: WhisperDims, dtype=jnp.bfloat16) -> PyTree:
    """Random init with the exact parameter structure of a loaded checkpoint."""
    k = jax.random.split(key, 8)
    d_a, d_t = dims.n_audio_state, dims.n_text_state
    enc_blocks = [
        _block_params(kk, d_a, dtype, cross=False)
        for kk in jax.random.split(k[0], dims.n_audio_layer)
    ]
    dec_blocks = [
        _block_params(kk, d_t, dtype, cross=True)
        for kk in jax.random.split(k[1], dims.n_text_layer)
    ]
    conv_scale = (3 * dims.n_mels) ** -0.5
    encoder = {
        # torch conv1d layout [out, in, kernel]
        "conv1": {
            "w": (jax.random.normal(k[2], (d_a, dims.n_mels, 3)) * conv_scale).astype(dtype),
            "b": jnp.zeros((d_a,), dtype),
        },
        "conv2": {
            "w": (jax.random.normal(k[3], (d_a, d_a, 3)) * (3 * d_a) ** -0.5).astype(dtype),
            "b": jnp.zeros((d_a,), dtype),
        },
        "pos_embed": jnp.asarray(sinusoidal_positions(dims.n_audio_ctx, d_a), dtype),
        "blocks": _stack_blocks(enc_blocks),
        "ln_post": _ln(d_a, dtype),
    }
    decoder = {
        "token_embed": (jax.random.normal(k[4], (dims.n_vocab, d_t)) * d_t**-0.5).astype(dtype),
        "pos_embed": (jax.random.normal(k[5], (dims.n_text_ctx, d_t)) * 0.01).astype(dtype),
        "blocks": _stack_blocks(dec_blocks),
        "ln": _ln(d_t, dtype),
    }
    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# Forward primitives
# ---------------------------------------------------------------------------


# f32 matmuls use true-f32 MXU passes (JAX's default precision is bf16-ish on
# both TPU and CPU, which breaks parity tests). bf16 inputs must NOT use
# HIGHEST: on TPU it forces multi-pass (≈6×-cost) accumulation, capping the
# encoder at ~20% MXU. Precision is therefore chosen from the traced dtype.
_HI = jax.lax.Precision.HIGHEST


def _prec(*xs):
    """HIGHEST only when an operand is float32 (parity paths); DEFAULT for
    the bf16 production path (single-pass MXU)."""
    for x in xs:
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return _HI
    return jax.lax.Precision.DEFAULT


def layer_norm(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def dense(x, p, a8=False):
    """a8=True runs int8-quantized linears as int8×int8 MXU dots (W8A8 —
    the activation row-quantizes in-graph, ops/quant.quantized_matmul_w8a8).
    Only the COMPUTE-bound encoder passes it (measured r11: encoder 354 →
    322 ms b=16 large shapes, while the W8A16 dequant path is 373 ms there;
    the bandwidth-bound decoder gains nothing from A8 and keeps W8A16).
    No-op for unquantized or int4 params."""
    if "w_q4" in p:  # W4A16 (ops/quant.py): packed int4 + group scales
        from whisperkit_tpu.ops.quant import quantized_matmul_w4

        y = quantized_matmul_w4(x, p)
    elif "w_q" in p:  # W8A16 (ops/quant.py): dequant fuses into the matmul
        from whisperkit_tpu.ops.quant import quantized_matmul, quantized_matmul_w8a8

        y = quantized_matmul_w8a8(x, p) if a8 else quantized_matmul(x, p)
    else:
        y = jnp.dot(x, p["w"], precision=_prec(x, p["w"]))
    if "b" in p:
        y = y + p["b"]
    return y


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)  # [B,H,T,Dh]


def _merge_heads(x):
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _q8_row_quantize(x32):
    """Symmetric per-row int8 over the last axis of an f32 array →
    (int8, scale f32 [..., 1]). THE row-quantization recipe — the einsum
    paths, the Pallas-gate branch, and the tests must all share it so a
    change (clip range, scale floor) cannot silently diverge."""
    scale = jnp.maximum(jnp.abs(x32).max(axis=-1, keepdims=True) / 127.0, 1e-8)
    return jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8), scale


def _q8_rows(x):
    """Per-token symmetric int8 over the last (Dh) axis.

    Returns (q8 int8 same shape, scale f32 [..., 1]) with x ≈ q8 * scale.
    Used by the int8 self-KV cache: each written K/V row carries its own
    scale, so quantization happens incrementally at write time (the cross-KV
    path quantizes per-CHANNEL over the full 1500-frame axis instead — see
    compute_cross_kv_quantized — which is impossible for an autoregressive
    cache that grows one row per step)."""
    x32 = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.abs(x32).max(axis=-1, keepdims=True) / 127.0, 1e-8)
    return jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8), scale


def _self_kv_write(cache, new, idx):
    """Write new K/V rows into the self-attention cache at `idx`,
    quantizing on write when the cache is the int8 {"q8","scale"} form."""
    if isinstance(cache, dict):
        q8, sc = _q8_rows(new)
        return {
            "q8": jax.lax.dynamic_update_slice(cache["q8"], q8, idx),
            "scale": jax.lax.dynamic_update_slice(cache["scale"], sc, idx),
        }
    return jax.lax.dynamic_update_slice(cache, new.astype(cache.dtype), idx)


def _attend_self_q8(q, k, v, mask=None, capture_probs=False):
    """Self-attention over the int8 per-token-scale KV cache.

    k/v: {"q8": int8 [B,H,S,Dh], "scale": f32 [B,H,S,1]} (rows written by
    `_self_kv_write`). Same int8×int8 MXU recipe as `_cross_attend`'s int8
    path, but with PER-TOKEN scales folded after the score dot (kscale
    varies along the key axis, so it cannot fold into q the way the
    cross path's per-channel scale does) and into the probs before the V
    dot. Unwritten cache rows are all-zero with zero scale; the causal
    mask −inf's them regardless. Bandwidth: the decode loop is KV-read
    bound (docs/BENCHMARKS.md r5 attribution: self-attention 35% of the
    b=32 serving step) and this halves the bytes of every self-KV read."""
    dh = q.shape[-1]
    qs = q.astype(jnp.float32) * (dh**-0.5)
    qi, q_scale = _q8_row_quantize(qs)
    scores_i = jnp.einsum(
        "bhtd,bhsd->bhts", qi, k["q8"], preferred_element_type=jnp.int32
    )
    scores = scores_i.astype(jnp.float32) * q_scale * jnp.swapaxes(k["scale"], -1, -2)
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    pw = probs * jnp.swapaxes(v["scale"], -1, -2)
    p_scale = jnp.maximum(pw.max(axis=-1, keepdims=True) / 127.0, 1e-8)
    pi = jnp.clip(jnp.round(pw / p_scale), 0, 127).astype(jnp.int8)
    out_i = jnp.einsum(
        "bhts,bhsd->bhtd", pi, v["q8"], preferred_element_type=jnp.int32
    )
    out = (out_i.astype(jnp.float32) * p_scale).astype(q.dtype)
    if capture_probs:
        return out, probs
    return out


def _attend(q, k, v, mask=None, capture_probs=False, force_f32_scores=False):
    """q:[B,H,Tq,Dh] k,v:[B,H,Tk,Dh]; whisper scales q and k by dh^-0.25.

    Scores dtype: f32 on parity paths (f32 operands) and whenever the probs
    are captured (word-timestamp alignment quality); bf16 otherwise. The
    encoder's [B,H,1500,1500] score/prob tensors dominate its HBM traffic —
    bf16 scores measured 494→358 ms (37→52% MFU) at b=16 large-v3-turbo on
    v5e (tools/perf_encoder.py v0 vs v9). force_f32_scores pins f32 where a
    caller depends on it regardless of capture (the raw decode cross path —
    its [B,H,T,1500] scores are tiny, so f32 costs nothing there).
    """
    if isinstance(k, dict):
        return _attend_self_q8(q, k, v, mask, capture_probs)
    scale = q.shape[-1] ** -0.25
    keep_f32 = (
        force_f32_scores
        or capture_probs
        or q.dtype == jnp.float32
        or k.dtype == jnp.float32
    )
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k * scale,
        precision=_prec(q, k),
        preferred_element_type=jnp.float32 if keep_f32 else None,
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, precision=_prec(v)
    )
    if capture_probs:
        return out, probs.astype(jnp.float32)
    return out


def self_attention(x, p, n_head, mask=None, a8=False):
    q = _split_heads(dense(x, p["q"], a8), n_head)
    k = _split_heads(dense(x, p["k"], a8), n_head)
    v = _split_heads(dense(x, p["v"], a8), n_head)
    out = _attend(q, k, v, mask)
    return dense(_merge_heads(out), p["out"], a8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _conv1d(x, w, b, stride):
    """x: [B, C_in, T] torch-layout conv, w: [C_out, C_in, K], 'same' padding."""
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=_prec(w),
    )
    return y + b[None, :, None]


def encoder_forward(
    params: PyTree,
    mel: jnp.ndarray,
    dims: WhisperDims,
    seq_sharding=None,
    act8: bool = False,
) -> jnp.ndarray:
    """mel [B, n_mels, 3000] → encoder output [B, 1500, d_audio].

    Reference behavior: AudioEncoder.swift:42-63 (conv×2 + transformer + LN).

    seq_sharding: optional NamedSharding for the [B, T, D] activations —
    sequence parallelism for small-batch latency (`parallel/sharding.py::
    encoder_seq_sharding`): the 1500-token axis shards over the mesh, LN/
    MLP compute locally, and GSPMD inserts the per-layer K/V all-gathers
    the attention einsums need (the "annotate and let XLA insert
    collectives" recipe — no hand-written collectives). Params replicated.

    act8: W8A8 — run int8-quantized block linears as int8×int8 MXU dots
    (the "w8a8" ComputeOptions scheme). The encoder is the model's one
    compute-bound stage, so int8's ~1.3× XLA-measured MXU rate pays here
    (354 → 322 ms b=16, vs 373 ms for the W8A16 dequant path; attention
    and convs stay bf16 — tools/perf_encoder.py v16). No-op on
    unquantized params.
    """
    enc = params["encoder"]
    x = jax.nn.gelu(_conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], 1))
    x = jax.nn.gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2))
    x = x.transpose(0, 2, 1)  # [B, T=1500, D]
    x = x + enc["pos_embed"].astype(x.dtype)
    if seq_sharding is not None:
        x = jax.lax.with_sharding_constraint(x, seq_sharding)

    n_head = dims.n_audio_head

    def block(x, bp):
        h = layer_norm(x, bp["attn_ln"])
        x = x + self_attention(h, bp["attn"], n_head, a8=act8)
        h = layer_norm(x, bp["mlp_ln"])
        x = x + dense(jax.nn.gelu(dense(h, bp["fc1"], act8)), bp["fc2"], act8)
        if seq_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, seq_sharding)
        return x, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _pallas_cross_decode_gate() -> bool:
    """Opt-in gate for the Pallas T==1 int8 cross-attention kernel
    (ops/attention_decode.py). Read at TRACE time — A/B runs need separate
    processes (jit caches don't key on env). Off until measured on-chip."""
    import os

    return os.environ.get("WKTPU_PALLAS_CROSS_DECODE") == "1"


def _pallas_self_decode_gate() -> bool:
    """Opt-in gate for the Pallas T==1 self-attention kernels (raw + int8
    cache forms, ops/attention_decode.py). Same trace-time A/B discipline
    as the cross gate. Off until measured on-chip."""
    import os

    return os.environ.get("WKTPU_PALLAS_SELF_DECODE") == "1"


def _cross_attend(cq, ck, cv, capture_probs: bool):
    """Cross-attention over per-window cached K/V.

    ck/cv are either bf16/f32 arrays [B,H,1500,Dh] or int8 dicts
    {"q8", "scale"} from ops/quant.quantize_cross_kv. The int8 path does
    true int8×int8 MXU dots: K's per-channel scale folds into the query
    (contraction is over the channel axis), the query row is quantized, and
    the probs are quantized per-row for the V dot. Measured on v5e at b=32
    turbo shapes: 1.76 → 1.19 ms/step of cross-attention (tools/
    perf_crosskv.py), ~2.6% relative output error at random init — an
    opt-in serving mode (ComputeOptions), not the default.

    WKTPU_PALLAS_CROSS_DECODE=1 routes the T==1 no-capture case through the
    one-pass Pallas kernel instead (same int8 math, HBM traffic exactly
    K+V once — see ops/attention_decode.py).
    """
    if not isinstance(ck, dict):
        # f32 scores regardless of capture: the decode cross scores are
        # tiny ([B,H,T,1500]) and random-init logit gaps sit below bf16
        # resolution (pinned by test_pipeline.test_windows_hear_the_audio);
        # this was the historical behavior via the old always-True
        # capture_probs flag.
        return _attend(
            cq, ck, cv, capture_probs=capture_probs, force_f32_scores=True
        )
    scale = cq.shape[-1] ** -0.25  # same dh^-.25 on q as _attend (k's is folded)
    qs = cq.astype(jnp.float32) * (scale * scale) * ck["scale"]
    qi, q_scale = _q8_row_quantize(qs)
    if (
        cq.shape[-2] == 1
        and not capture_probs
        and _pallas_cross_decode_gate()
    ):
        from whisperkit_tpu.ops.attention_decode import cross_attend_q8_pallas

        return cross_attend_q8_pallas(
            qi, q_scale, ck["q8"], cv["q8"], cv["scale"]
        ).astype(cq.dtype)
    scores_i = jnp.einsum(
        "bhtd,bhsd->bhts", qi, ck["q8"], preferred_element_type=jnp.int32
    )
    probs = jax.nn.softmax(scores_i.astype(jnp.float32) * q_scale, axis=-1)
    p_scale = jnp.maximum(probs.max(axis=-1, keepdims=True) / 127.0, 1e-8)
    pi = jnp.clip(jnp.round(probs / p_scale), 0, 127).astype(jnp.int8)
    out_i = jnp.einsum(
        "bhts,bhsd->bhtd", pi, cv["q8"], preferred_element_type=jnp.int32
    )
    out = (out_i.astype(jnp.float32) * p_scale * cv["scale"]).astype(cq.dtype)
    if capture_probs:
        return out, probs
    return out


def compute_cross_kv(params: PyTree, enc_out: jnp.ndarray, dims: WhisperDims):
    """Precompute per-layer cross-attention K/V from encoder output.

    Returns (k, v): each [L, B, H, 1500, Dh].
    """
    n_head = dims.n_text_head

    def per_layer(bp):
        k = _split_heads(dense(enc_out, bp["cross_attn"]["k"]), n_head)
        v = _split_heads(dense(enc_out, bp["cross_attn"]["v"]), n_head)
        return k, v

    return jax.vmap(per_layer)(params["decoder"]["blocks"])


def compute_cross_kv_quantized(params: PyTree, enc_out: jnp.ndarray, dims: WhisperDims):
    """Project AND int8-quantize the cross-attention K/V one layer at a
    time, so at most ONE layer's bf16 K/V ever exists on device.

    Numerically identical to `ops.quant.quantize_cross_kv(compute_cross_kv(
    ...))` (same projection, same per-channel scale math) but with an
    L-times smaller bf16 transient: large-v3 b=32 cross-KV is 7.9 GB in
    bf16 — quantizing after the fact peaks at bf16+int8 simultaneously and
    OOMs the 16 GB chip, while this per-layer `lax.map` peaks at ~2 GB int8
    + 0.25 GB (one layer). This is what makes 32-window groups decodable on
    one v5e (VERDICT r2 next-round #1).

    Returns ({"q8", "scale"}, {"q8", "scale"}) with q8 [L,B,H,1500,Dh] int8
    and scale [L,B,H,1,Dh] f32 — the layout ops/quant.quantize_cross_kv
    emits and _cross_attend consumes.
    """
    n_head = dims.n_text_head
    cross_w = params["decoder"]["blocks"]["cross_attn"]

    def q8(x):  # per-channel (Dh) symmetric int8 over the frame axis
        x32 = x.astype(jnp.float32)
        scale = jnp.maximum(jnp.abs(x32).max(axis=-2, keepdims=True) / 127.0, 1e-8)
        return jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8), scale

    def per_layer(wp):
        kq, ks = q8(_split_heads(dense(enc_out, wp["k"]), n_head))
        vq, vs = q8(_split_heads(dense(enc_out, wp["v"]), n_head))
        return kq, ks, vq, vs

    kq, ks, vq, vs = jax.lax.map(
        per_layer, {"k": cross_w["k"], "v": cross_w["v"]}
    )
    return {"q8": kq, "scale": ks}, {"q8": vq, "scale": vs}


def init_kv_cache(dims: WhisperDims, batch: int, dtype=jnp.bfloat16):
    """Self-attention KV cache [L, B, H, n_text_ctx, Dh] ×2.

    Reference: TextDecoder.swift:109-161 allocates keyCache/valueCache
    [1, kvDim, 1, 448]; here the cache is batched and laid out for MXU
    attention, updated in place via dynamic_update_slice (the reference's
    concurrentPerform scatter, TextDecoder.swift:218-270, becomes one op).
    """
    shape = (
        dims.n_text_layer,
        batch,
        dims.n_text_head,
        dims.n_text_ctx,
        dims.head_dim,
    )
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def decoder_forward(
    params: PyTree,
    tokens: jnp.ndarray,  # [B, T] int32
    pos_offset,  # scalar int: position of tokens[:, 0]
    kv_k,  # [L, B, H, S, Dh]
    kv_v,
    cross_k,  # [L, B, H, 1500, Dh]
    cross_v,
    dims: WhisperDims,
    capture_alignment: bool = False,
    alignment_heads: Optional[jnp.ndarray] = None,  # [A, 2] (layer, head)
    ablate: tuple = (),  # static perf-attribution switches (tools/
    # perf_decode.py): "self" drops self-attention, "kv_update" keeps
    # self-attention but skips the cache write, "cross" drops
    # cross-attention, "vocab" projects logits from a 1024-row slice of the
    # embedding (padded back to V). Production callers leave this empty —
    # every branch is static, so the default compiles to the same program
    # as before.
):
    """Run T tokens through the decoder, updating the KV cache at
    [pos_offset, pos_offset+T). Works for prefill (T=prompt) and step (T=1).

    Returns (logits [B, T, V] f32, (kv_k, kv_v), cross_probs or None).
    cross_probs: [L, B, H, T, 1500] f32 softmax probs (all heads; caller
    gathers alignment heads) — only when capture_alignment.
    """
    dec = params["decoder"]
    b, t = tokens.shape
    n_head = dims.n_text_head
    # kv_k/kv_v are raw arrays OR int8 {"q8","scale"} trees (opt-in
    # quantize_self_kv serving mode; written via _self_kv_write, read via
    # _attend's int8 dispatch)
    kv_is_q8 = isinstance(kv_k, dict)
    s_max = (kv_k["q8"] if kv_is_q8 else kv_k).shape[3]

    x = dec["token_embed"][tokens]
    pos = jax.lax.dynamic_slice_in_dim(dec["pos_embed"], pos_offset, t, 0)
    x = (x + pos[None]).astype(dec["token_embed"].dtype)

    # causal mask within the new tokens + visibility of all cached positions
    # key positions: 0..S-1; query i (absolute pos_offset+i) attends keys <= pos_offset+i
    key_pos = jnp.arange(s_max)[None, :]
    query_pos = pos_offset + jnp.arange(t)[:, None]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)[None, None]

    def block(x, layer_inputs):
        bp, kk, vv, ck, cv = layer_inputs
        cross_probs = None
        # self-attention with cache update
        if "self" not in ablate:
            h = layer_norm(x, bp["attn_ln"])
            q = _split_heads(dense(h, bp["attn"]["q"]), n_head)
            k_new = _split_heads(dense(h, bp["attn"]["k"]), n_head)
            v_new = _split_heads(dense(h, bp["attn"]["v"]), n_head)
            if "kv_update" not in ablate:
                kk = _self_kv_write(kk, k_new, (0, 0, pos_offset, 0))
                vv = _self_kv_write(vv, v_new, (0, 0, pos_offset, 0))
            attn = _attend(q, kk, vv, mask)
            x = x + dense(_merge_heads(attn), bp["attn"]["out"])

        # cross-attention (K/V precomputed; optionally int8-quantized).
        # capture_probs only when alignment capture actually needs them:
        # passing True unconditionally (pre-r6) made the Pallas
        # decode-kernel gate unreachable (DCE removed the unused probs
        # OUTPUT but not the flag's effect on dispatch). Raw-path scores
        # stay f32 via force_f32_scores inside _cross_attend.
        if "cross" not in ablate:
            h = layer_norm(x, bp["cross_attn_ln"])
            cq = _split_heads(dense(h, bp["cross_attn"]["q"]), n_head)
            if capture_alignment:
                cross_out, cross_probs = _cross_attend(
                    cq, ck, cv, capture_probs=True
                )
            else:
                cross_out = _cross_attend(cq, ck, cv, capture_probs=False)
            x = x + dense(_merge_heads(cross_out), bp["cross_attn"]["out"])
        elif capture_alignment:
            ck_frames = ck["q8"].shape[2] if isinstance(ck, dict) else ck.shape[2]
            cross_probs = jnp.zeros((b, n_head, t, ck_frames), jnp.float32)

        # mlp
        h = layer_norm(x, bp["mlp_ln"])
        x = x + dense(jax.nn.gelu(dense(h, bp["fc1"])), bp["fc2"])
        probs_out = cross_probs if capture_alignment else None
        return x, (kk, vv, probs_out)

    def scan_block(x, xs):
        bp, kk, vv, ck, cv = xs
        x, (kk, vv, probs) = block(x, (bp, kk, vv, ck, cv))
        return x, (kk, vv, probs)

    if t == 1:
        # Single-token step: unroll the layer loop and write each layer's
        # new K/V directly into the stacked cache at (layer, :, :, pos, :).
        # The scan path re-emits the WHOLE per-layer cache as stacked scan
        # outputs every step, which XLA cannot alias in place — measured
        # 1.43 ms/step of pure copy at b=32 turbo (29% of the step,
        # tools/perf_decode.py); the unrolled direct update removes it.
        # Fused q/k/v projection for the single-token step: 3 matvecs → 1
        # per layer. MEASURED AND REJECTED (docs/BENCHMARKS.md r5): 16.0
        # vs 13.3 ms/step at b=32 large-v3 serving — 21% SLOWER, refuting
        # the op-count-overhead theory it tested. Kept ONLY as an ablation
        # flag for reproducibility (token-exact parity pinned in
        # tests/test_decoding.py); never enable in production.
        fuse_qkv = "fuse_qkv" in ablate and "self" not in ablate
        if fuse_qkv:
            att = dec["blocks"]["attn"]
            d_model = dims.n_text_state
            # every weight representation (w | w_q+scale | w_q4+scale4)
            # concatenates along its out axis (-1)
            wf_all = {
                key: jnp.concatenate(
                    [att[k][key] for k in ("q", "k", "v")], axis=-1
                )
                for key in att["q"]
                if key != "b"
            }
            wf_all["b"] = jnp.concatenate(
                [
                    att["q"]["b"],
                    jnp.zeros_like(att["q"]["b"]),  # k has no bias
                    att["v"]["b"],
                ],
                axis=-1,
            )
        probs_layers = []
        for li in range(dims.n_text_layer):
            bp = jax.tree.map(lambda a: a[li], dec["blocks"])
            ck = jax.tree.map(lambda a: a[li], cross_k)
            cv = jax.tree.map(lambda a: a[li], cross_v)
            h = layer_norm(x, bp["attn_ln"])
            if fuse_qkv:
                qkv = dense(h, jax.tree.map(lambda a: a[li], wf_all))
                q = _split_heads(qkv[..., :d_model], n_head)
                k_new = _split_heads(qkv[..., d_model : 2 * d_model], n_head)
                v_new = _split_heads(qkv[..., 2 * d_model :], n_head)
            else:
                q = _split_heads(dense(h, bp["attn"]["q"]), n_head)
            if "self" not in ablate:
                if not fuse_qkv:
                    k_new = _split_heads(dense(h, bp["attn"]["k"]), n_head)
                    v_new = _split_heads(dense(h, bp["attn"]["v"]), n_head)
                if "kv_update" not in ablate:
                    kv_k = _self_kv_write(
                        kv_k, k_new[None], (li, 0, 0, pos_offset, 0)
                    )
                    kv_v = _self_kv_write(
                        kv_v, v_new[None], (li, 0, 0, pos_offset, 0)
                    )
                kk_li = (
                    jax.tree.map(lambda a: a[li], kv_k) if kv_is_q8 else kv_k[li]
                )
                vv_li = (
                    jax.tree.map(lambda a: a[li], kv_v) if kv_is_q8 else kv_v[li]
                )
                if _pallas_self_decode_gate():
                    # T==1 self-attention via the Pallas one-pass kernels
                    # (opt-in experiment; ops/attention_decode.py). The
                    # causal mask goes in as its [1,S] additive row.
                    mask_row = mask[0, 0]
                    dh = q.shape[-1]
                    if kv_is_q8:
                        from whisperkit_tpu.ops.attention_decode import (
                            self_attend_q8_pallas,
                        )

                        qi8, q_sc = _q8_row_quantize(
                            q.astype(jnp.float32) * (dh**-0.5)
                        )
                        attn = self_attend_q8_pallas(
                            qi8, q_sc, kk_li["q8"],
                            kk_li["scale"].astype(jnp.float32),
                            vv_li["q8"], vv_li["scale"].astype(jnp.float32),
                            mask_row,
                        ).astype(q.dtype)
                    else:
                        from whisperkit_tpu.ops.attention_decode import (
                            self_attend_pallas,
                        )

                        attn = self_attend_pallas(
                            q * (dh**-0.5), kk_li, vv_li, mask_row
                        ).astype(q.dtype)
                else:
                    attn = _attend(q, kk_li, vv_li, mask)
                x = x + dense(_merge_heads(attn), bp["attn"]["out"])
            if "cross" not in ablate:
                h = layer_norm(x, bp["cross_attn_ln"])
                cq = _split_heads(dense(h, bp["cross_attn"]["q"]), n_head)
                # capture_probs tracks capture_alignment (see scan block
                # note) — this is what lets the T==1 Pallas kernel gate
                # engage on production decode steps
                if capture_alignment:
                    cross_out, probs = _cross_attend(
                        cq, ck, cv, capture_probs=True
                    )
                    probs_layers.append(probs)
                else:
                    cross_out = _cross_attend(cq, ck, cv, capture_probs=False)
                x = x + dense(_merge_heads(cross_out), bp["cross_attn"]["out"])
            h = layer_norm(x, bp["mlp_ln"])
            x = x + dense(jax.nn.gelu(dense(h, bp["fc1"])), bp["fc2"])
        cross_probs = jnp.stack(probs_layers) if probs_layers else None
    else:
        x, (kv_k, kv_v, cross_probs) = jax.lax.scan(
            scan_block, x, (dec["blocks"], kv_k, kv_v, cross_k, cross_v)
        )
    x = layer_norm(x, dec["ln"])
    if "vocab" in ablate:  # perf attribution: 1/50th-size projection
        small = jnp.einsum(
            "btd,vd->btv", x, dec["token_embed"][:1024],
            precision=_prec(x, dec["token_embed"]),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.pad(
            small, ((0, 0), (0, 0), (0, dims.n_vocab - 1024)),
            constant_values=-1e4,
        )
    else:
        logits = jnp.einsum(
            "btd,vd->btv", x, dec["token_embed"],
            precision=_prec(x, dec["token_embed"]),
            preferred_element_type=jnp.float32,
        )
    return logits, (kv_k, kv_v), cross_probs
