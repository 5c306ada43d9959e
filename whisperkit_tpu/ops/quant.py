"""Weight-only int8 quantization (W8A16).

Reference: the reference's model matrix ships quantized Whisper variants
(626 MB / 594 MB / 947 MB / 954 MB, fastlane/Fastfile:26-55) and Qwen3-TTS
W8A16 CoreML components (Qwen3Config.swift:106-112 `Qwen3VariantDefaults`).
TPU equivalent: per-output-channel symmetric int8 weights with bf16 scales,
dequantized inside the matmul's producer fusion — halves the HBM bytes the
bandwidth-bound decode loop reads per token.

A quantized linear is the dict {"w_q": int8 [in, out], "scale": bf16 [out],
"b": ...}; `dense()` in models/whisper.py dispatches on the presence of
"w_q".
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

PyTree = Any


def quantize_weight(w: jnp.ndarray) -> dict:
    """[in, out] float → {"w_q" int8, "scale" [out]} (symmetric, per-column)."""
    w32 = w.astype(jnp.float32)
    max_abs = jnp.max(jnp.abs(w32), axis=0)  # per output channel
    scale = jnp.maximum(max_abs / 127.0, 1e-8)
    w_q = jnp.clip(jnp.round(w32 / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale.astype(jnp.bfloat16)}


def dequantize_weight(q: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (
        q["w_q"].astype(jnp.float32) * q["scale"].astype(jnp.float32)[None, :]
    ).astype(dtype)


def quantized_matmul(x: jnp.ndarray, q: dict) -> jnp.ndarray:
    """x [..., in] @ dequant(w) — XLA fuses the dequant into the matmul's
    operand read, so only int8 bytes cross HBM."""
    w = q["w_q"].astype(x.dtype) * q["scale"].astype(x.dtype)[None, :]
    return jnp.dot(x, w)


def quantized_matmul_w8a8(x: jnp.ndarray, q: dict) -> jnp.ndarray:
    """x [..., in] @ int8 w through an int8×int8 MXU dot (W8A8).

    The activation is row-quantized in-graph (symmetric per-token absmax,
    the `_q8_row_quantize` recipe) and the int32 accumulator rescaled by
    (row scale × per-output-channel weight scale). v5e's MXU runs int8 at
    2× the bf16 rate on paper; measured through XLA it is ~1.3× at encoder
    shapes (tools/probe_int8_matmul.py), so this pays only on
    COMPUTE-bound paths (the encoder) — the bandwidth-bound decode loop
    already gets its win from int8 weight reads alone (W8A16)."""
    x32 = x.astype(jnp.float32)
    a_scale = jnp.maximum(
        jnp.abs(x32).max(axis=-1, keepdims=True) / 127.0, 1e-8
    )
    xq = jnp.clip(jnp.round(x32 / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        q["w_q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * a_scale * q["scale"].astype(jnp.float32)
    return y.astype(x.dtype)


# --- W4A16 (4-bit weights, group-wise scales) --------------------------------
# TPU-native analog of the reference's 4-bit palettized model family (the
# 626/632 MB compressed variants, fastlane/Fastfile:26-55): instead of a
# k-means LUT per weight group (an ANE-friendly layout), symmetric 4-bit with
# one bf16 scale per `group` input rows per output channel. The 4-bit codes
# are MANUALLY nibble-packed into uint8 rather than stored as native S4 —
# tools/probe_int4_device.py (r7) showed S4 arrays cannot cross a jit
# boundary on the axon remote backend at all (`device_put` of a sub-byte
# dtype with an explicit tiled layout recurses). Packing is by HALF-PLANES
# (byte row p holds original row p in the low nibble and row p + in/2 in
# the high), NOT by adjacent-row interleave: an interleaving unpack needs a
# stack+reshape that XLA materializes as a full bf16 weight copy per step
# (measured r7: 20.6 ms/step large-v3 b=1 vs 2.2 W8A16), while the plane
# form turns x @ w into two half-dots plus an output add with the
# mask/shift/convert × scale chain fused into each dot's operand read —
# no relayout anywhere.

W4_GROUP = 64  # rows per scale group; divides every Whisper linear's d_model

# On-disk quantized-cache format versions (models/loader.save_quantized),
# PER SCHEME (ADVICE r3 #1: a w4-only layout bump must not invalidate
# w8a16 caches whose int8 layout never changed). The packed W4A16 bytes
# are layout-dependent — a cache written under one packing reads back with
# identical dtype/shape under another, silently dequantizing garbage — so
# the loader rejects caches whose recorded format differs from the
# scheme's current one and requantizes instead. Bump a scheme's entry
# whenever ITS stored representation changes.
# History: format 1 = native S4 / interleaved nibbles (r6, never
# shippable — S4 cannot cross the axon jit boundary); format 2 =
# half-plane nibble-packed uint8 for w4a16. Both schemes sit at 2 today
# because pre-split caches recorded the then-global version 2 — starting
# them lower would force a one-time spurious requantize of valid caches.
QUANT_FORMATS = {"w8a16": 2, "w4a16": 2}


def quant_format(scheme: str) -> int:
    return QUANT_FORMATS[scheme]


def quantize_weight_w4(w: jnp.ndarray, group: int = W4_GROUP) -> dict:
    """[in, out] float → {"w_q4" uint8 [in/2, out] (half-plane nibbles:
    row p low = original row p, high = row p + in/2), "scale4" bf16
    [in/group, out]} (symmetric per-(group × output-channel) scales; falls
    back to one group when `group` doesn't divide the input dim). Requires
    an even input dim (every supported model's is)."""
    w32 = w.astype(jnp.float32)
    din, dout = w32.shape
    assert din % 2 == 0, f"W4A16 needs an even input dim, got {din}"
    if din % group:
        group = din
    g = din // group
    wg = w32.reshape(g, group, dout)
    max_abs = jnp.max(jnp.abs(wg), axis=1)  # [g, out]
    scale = jnp.maximum(max_abs / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7).reshape(din, dout)
    u = (q.astype(jnp.int8) + 8).astype(jnp.uint8)  # codes in [1, 15]
    half = din // 2
    return {
        "w_q4": u[:half] | (u[half:] << 4),
        "scale4": scale.astype(jnp.bfloat16),
    }


def _scale4_full(q: dict, dtype) -> jnp.ndarray:
    """Broadcast the [g, out] group scales to the full [in, out] shape (a
    broadcast+reshape — stays inside the consumer fusion, never hits HBM)."""
    din, dout = 2 * q["w_q4"].shape[0], q["w_q4"].shape[1]
    g = q["scale4"].shape[0]
    return jnp.broadcast_to(
        q["scale4"].astype(dtype)[:, None, :], (g, din // g, dout)
    ).reshape(din, dout)


def _unpack4_planes(packed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 [in/2, out] → (lo, hi) int8 [in/2, out] codes in [-7, 7]: lo is
    original rows [0, in/2), hi is rows [in/2, in) — the inverse of
    quantize_weight_w4's half-plane packing."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    return lo, hi


def w4_dequant(q: dict, dtype) -> jnp.ndarray:
    """Dequantize a 2D {"w_q4","scale4"} dict to the full [in, out] weight.
    The plane concat materializes — use quantized_matmul_w4 on hot paths
    (it never forms the full weight); this form is for parity tests and
    cold one-shot consumers."""
    lo, hi = _unpack4_planes(q["w_q4"])
    s = _scale4_full(q, dtype)
    half = lo.shape[0]
    return jnp.concatenate(
        [lo.astype(dtype) * s[:half], hi.astype(dtype) * s[half:]], axis=0
    )


def dequantize_weight_w4(q: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    return w4_dequant(q, jnp.float32).astype(dtype)


def quantized_matmul_w4(
    x: jnp.ndarray, q: dict, preferred_element_type=None
) -> jnp.ndarray:
    """x [..., in] @ dequant4(w) WITHOUT materializing the full weight:
    two half-dots (x's low features against the low-nibble plane, high
    features against the high plane) summed on the tiny output — the
    mask/shift/convert × group-scale chain fuses into each dot's operand
    read, so only packed 4-bit bytes + [in/group, out] scales cross HBM.
    Plain 2D dots so Megatron row/column sharding of w_q4 partitions like
    the bf16/W8A16 paths."""
    lo, hi = _unpack4_planes(q["w_q4"])
    s = _scale4_full(q, x.dtype)
    half = lo.shape[0]
    y = jnp.dot(
        x[..., :half],
        lo.astype(x.dtype) * s[:half],
        preferred_element_type=preferred_element_type,
    )
    return y + jnp.dot(
        x[..., half:],
        hi.astype(x.dtype) * s[half:],
        preferred_element_type=preferred_element_type,
    )


# param-dict keys that hold LINEAR weights ([in, out] or stacked
# [L, in, out]); convs (also rank-3, but OIH layout) are excluded by name
_LINEAR_KEYS = {"q", "k", "v", "out", "fc1", "fc2"}


def quantize_whisper_params(
    params: PyTree, min_size: int = 1 << 16, bits: int = 8
) -> PyTree:
    """Quantize every linear weight ≥ min_size elements in a Whisper param
    tree (token/positional embeddings, norms, convs, biases stay bf16 —
    matching the reference's W8A16 recipe). bits=4 produces the W4A16 form
    (group-wise int4, the analog of the reference's 4-bit palettized
    variants)."""
    assert bits in (8, 4), bits
    qfn = quantize_weight if bits == 8 else quantize_weight_w4

    def quantize_linear(node: dict) -> dict:
        w = node["w"]
        out = {k: v for k, v in node.items() if k != "w"}
        if w.ndim == 2:
            out.update(qfn(w))
        else:  # stacked [L, in, out]
            qs = [qfn(w[i]) for i in range(w.shape[0])]
            for key in qs[0]:
                out[key] = jnp.stack([q[key] for q in qs])
        return out

    def walk(node, key=None):
        if isinstance(node, dict):
            if (
                key in _LINEAR_KEYS
                and "w" in node
                and hasattr(node["w"], "ndim")
                and node["w"].size >= min_size
            ):
                return quantize_linear(node)
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)


def quantized_size_bytes(params: PyTree) -> int:
    """Device-resident parameter bytes (W4A16 leaves are already manually
    nibble-packed into uint8, so a plain itemsize sum is exact)."""
    leaves = jax.tree.leaves(params)
    return sum(
        x.size * x.dtype.itemsize for x in leaves if hasattr(x, "size")
    )


# Qwen3-TTS stacked-block linear keys ([L, in, out]); embeddings, norms and
# the f32 vocoder convs stay unquantized (reference W8A16 recipe,
# Qwen3Config.swift:106-112).
_TTS_BLOCK_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_tts_params(
    params: PyTree, min_size: int = 1 << 16, bits: int = 8
) -> PyTree:
    """W8A16- (or, with bits=4, W4A16-) quantize a Qwen3-TTS param tree:
    every transformer linear of the backbone AND the code predictor
    (stacked per layer), the code0 head, and the 15 RVQ lm heads.
    Embeddings, norms, and the Code2Wav conv stack stay full precision.
    The code predictor is pure weight bandwidth (16 micro-steps ×
    weight-read per frame, docs/BENCHMARKS.md) — exactly the regime where
    4-bit weights pay."""
    assert bits in (8, 4), bits
    qfn = quantize_weight if bits == 8 else quantize_weight_w4

    def quantize_stacked(blocks: dict) -> dict:
        blocks = dict(blocks)
        for key in _TTS_BLOCK_KEYS:
            w = blocks.get(key)  # [L, in, out]
            if w is not None and hasattr(w, "size") and w.size >= min_size:
                blocks[key] = jax.vmap(qfn)(w)
        return blocks

    out = dict(params)
    out["blocks"] = quantize_stacked(params["blocks"])

    head = params["code0_head"]
    if hasattr(head, "size") and head.size >= min_size:
        out["code0_head"] = qfn(head)

    mc = dict(params["mc"])
    mc["blocks"] = quantize_stacked(mc["blocks"])
    mh = mc["heads"]  # [15, D, V]
    if hasattr(mh, "size") and mh.size >= min_size:
        mc["heads"] = jax.vmap(qfn)(mh)
    out["mc"] = mc
    return out


def quantize_conv_weight(w: jnp.ndarray) -> dict:
    """Conv weight [O, ...] → {"w_q" int8, "scale" [O,1,…]} (symmetric,
    per-output-channel; scale keeps trailing singleton axes so the dequant
    broadcasts in place)."""
    w32 = w.astype(jnp.float32)
    axes = tuple(range(1, w.ndim))
    max_abs = jnp.max(jnp.abs(w32), axis=axes, keepdims=True)
    scale = jnp.maximum(max_abs / 127.0, 1e-8)
    w_q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale.astype(jnp.bfloat16)}


# speaker-model weight keys: [in, out] matmuls vs [O, I, K…] convs.
# _SPEAKER_CONV_PARENTS is the ALLOWLIST of learned-conv parents (PyanNet
# sincnet convs + ResNet34 block/shortcut convs, models/pyannet.py) — the
# materialized "sinc" filterbank is deliberately NOT in it: its filters are
# analytically derived, and an allowlist means any future differently-named
# subtree stays unquantized by default rather than silently losing precision
# (ADVICE r2 #3).
_SPEAKER_MATMUL_KEYS = {"wx", "wh"}
_SPEAKER_CONV_PARENTS = {"conv1", "conv2", "down"}


def quantize_speaker_params(params: PyTree, min_size: int = 1 << 12) -> PyTree:
    """W8A16-quantize a PyanNet / WeSpeaker param tree: LSTM input/recurrent
    kernels, linear/classifier weights, and (BN-folded) conv kernels.
    Norm affines, biases, and the materialized sinc filterbank stay float
    (the sinc filters are analytically derived, not learned weights in our
    materialized form). Reference: the W8A16 pyannote variants in
    PyannoteConfig.swift:11-41."""

    def walk(node, key=None, parent=None):
        if isinstance(node, dict):
            if "w_q" in node:
                return node  # already quantized
            return {k: walk(v, k, key) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, key, parent) for v in node)
        if not hasattr(node, "ndim") or node.size < min_size:
            return node
        if key in _SPEAKER_MATMUL_KEYS and node.ndim == 2:
            return quantize_weight(node)
        if key == "w" and node.ndim == 2:  # linears/cls/seg_1 {"w","b"}
            return quantize_weight(node)
        if key == "w" and node.ndim in (3, 4) and parent in _SPEAKER_CONV_PARENTS:
            return quantize_conv_weight(node)
        return node

    return walk(params)


def quantize_cross_kv(cross_k: jnp.ndarray, cross_v: jnp.ndarray):
    """int8-quantize per-window cross-attention K/V [L,B,H,S,Dh] with
    per-channel (Dh) scales — the decode loop's bandwidth floor; consumed by
    models/whisper._cross_attend's int8 MXU path."""

    def q(x):
        # per-LAYER map: a whole-tensor f32 astype would transiently double
        # the ~4 GB large-v3 b=16 cross-KV and OOM the chip; scanning over
        # the leading layer axis caps the f32 transient at one layer
        def per_layer(xl):
            x32 = xl.astype(jnp.float32)
            scale = jnp.maximum(
                jnp.abs(x32).max(axis=-2, keepdims=True) / 127.0, 1e-8
            )
            q8 = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
            return q8, scale

        q8, scale = jax.lax.map(per_layer, x)
        return {"q8": q8, "scale": scale}

    return q(cross_k), q(cross_v)
