"""Qwen3-TTS model stack, TPU-native JAX.

Reference: Sources/TTSKit/Qwen3TTS/ — the reference drives six CoreML
components (Qwen3Models.swift:18-82 constants; Qwen3CodeDecoder.swift,
Qwen3MultiCodeDecoder.swift, Qwen3SpeechDecoder.swift, Qwen3TextProjector /
Qwen3Embedders.swift). The CoreML graphs are opaque blobs, but their
architecture is the published Qwen3-Omni talker stack
(`transformers.models.qwen3_omni_moe`), pinned here by the reference's
cache geometry (Qwen3Models.swift:48-57):

  * CodeDecoder — 28-layer Qwen3 backbone (RMSNorm, rotary, GQA with
    head_dim 128, SwiGLU): cdCacheDim 28672 = 28 layers x 8 kv x 128.
  * MultiCodeDecoder — a real 5-layer KV-cached transformer (the HF
    `TalkerCodePredictor`): mcdCacheDim 5120 = 5 layers x 8 kv x 128.
    Per frame it runs over the sequence [frame hidden, code0 embed,
    code1..14 embeds] with 15 per-group embedding tables + 15 lm heads
    (Qwen3MultiCodeDecoder.swift:249-345 `generateMultiCodes`).
  * SpeechDecoder — the HF `Code2Wav`: an 8-layer sliding-window(72)
    pre-transformer with LayerScale over mean-pooled 16-codebook
    embeddings, then ConvNeXt x2 upsampling (x2,x2) and four SnakeBeta
    decoder blocks (x8,x5,x4,x3) -> 1920 samples / 12.5 Hz frame.
    sdCacheDim 8192 = 8 layers x 16 kv x 64; the rolling 16-frame
    hidden context (Qwen3SpeechDecoder.swift:45-60, KVCache.swift:159)
    covers the conv stack's ~9.4-frame receptive field so streaming
    frame decode is sample-exact vs whole-utterance decode.

Execution modes (TPU-first):
  * whole-utterance: `speech_decoder_forward` vocodes every frame of a
    batch in ONE dispatch (the reference decodes per-frame,
    Qwen3GenerateTask.swift:449-482).
  * streaming: `code2wav_decode_block` carries (transformer KV, rolling
    hidden context) across blocks — the reference's `decodeFrameAsync`
    semantics, batched over block frames.

Constants mirror Qwen3Models.swift:18-82 (codec PAD/BOS/EOS/think ids,
text PAD/BOS, speaker + language codec token ids).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any

# Codec-track special tokens (Qwen3Models.swift:21-26)
CODEC_PAD = 2148
CODEC_BOS = 2149
CODEC_EOS = 2150
CODEC_THINK = 2154
CODEC_THINK_BOS = 2156
CODEC_THINK_EOS = 2157
# Text-track special tokens (Qwen3Models.swift:30-31)
TEXT_PAD = 151_671
TEXT_BOS = 151_672

CODEC_VOCAB = 3072  # code0 logits/embedding rows (specials + speaker ids)
HEAD_VOCAB = 2048  # RVQ codebook size, heads 1..15 (Qwen3Models.swift:36)
N_RVQ = 16  # code0 + 15 heads
SAMPLES_PER_FRAME = 1920  # Qwen3Models.swift:40-41
OUTPUT_SAMPLE_RATE = 24_000
FRAME_RATE = OUTPUT_SAMPLE_RATE / SAMPLES_PER_FRAME  # 12.5 Hz

# Codec-0 ids suppressed during sampling: [2048, 3072) except EOS
# (Qwen3Models.swift:76-82).
SUPPRESS_BEGIN = 2048
SUPPRESS_END = 3072

# Speaker voices -> codec token ids (Qwen3Models.swift:88-150)
SPEAKERS: dict[str, int] = {
    "ryan": 3061,
    "aiden": 2861,
    "ono-anna": 2873,
    "sohee": 2864,
    "eric": 2875,
    "dylan": 2878,
    "serena": 3066,
    "vivian": 3065,
    "uncle-fu": 3010,
}
DEFAULT_SPEAKER = "ryan"

# Languages -> codec token ids (Qwen3Models.swift:157-174)
TTS_LANGUAGES: dict[str, int] = {
    "english": 2050,
    "chinese": 2055,
    "japanese": 2058,
    "korean": 2064,
    "german": 2053,
    "french": 2061,
    "russian": 2069,
    "portuguese": 2071,
    "spanish": 2054,
    "italian": 2070,
}
DEFAULT_TTS_LANGUAGE = "english"


@dataclasses.dataclass(frozen=True)
class Code2WavDims:
    """HF `Qwen3OmniMoeCode2WavConfig` defaults; total upsample = 1920."""

    d_model: int = 1024
    n_layer: int = 8
    n_head: int = 16
    n_kv_head: int = 16
    d_ff: int = 3072
    sliding_window: int = 72
    rope_theta: float = 10_000.0
    rms_eps: float = 1e-5
    layer_scale_init: float = 0.01
    codebook: int = 2048
    n_quantizers: int = 16
    upsampling_ratios: tuple = (2, 2)
    upsample_rates: tuple = (8, 5, 4, 3)
    decoder_dim: int = 1536

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head

    @property
    def total_upsample(self) -> int:
        u = 1
        for r in self.upsampling_ratios + self.upsample_rates:
            u *= r
        return u

    @property
    def conv_delay(self) -> int:
        """Samples lost to the decoder blocks' transposed-conv left trims:
        for T frames the conv stack emits T*total_upsample - conv_delay."""
        loss = 0
        for r in self.upsample_rates:
            loss = loss * r + r
        return loss


TINY_C2W_DIMS = Code2WavDims(
    d_model=32, n_layer=2, n_head=4, n_kv_head=2, d_ff=64, sliding_window=8,
    decoder_dim=32,
)


@dataclasses.dataclass(frozen=True)
class Qwen3TTSDims:
    # CodeDecoder backbone (Qwen3-0.6B geometry; explicit head_dim 128 —
    # cdCacheDim 28672 = 28 x 8 x 128, Qwen3Models.swift:50)
    text_vocab: int = 151_936
    d_model: int = 1024
    n_layer: int = 28
    n_head: int = 16
    n_kv_head: int = 8
    head_dim: int = 128
    d_ff: int = 3072
    rope_theta: float = 1_000_000.0
    max_seq: int = 2048
    # text-track special ids (overridable for tiny test vocabularies)
    text_pad: int = TEXT_PAD
    text_bos: int = TEXT_BOS
    # MultiCodeDecoder / code predictor (HF TalkerCodePredictor defaults;
    # mcdCacheDim 5120 = 5 x 8 x 128, Qwen3Models.swift:52)
    cp_layer: int = 5
    cp_head: int = 16
    cp_kv_head: int = 8
    cp_head_dim: int = 128
    cp_ff: int = 3072
    cp_rope_theta: float = 10_000.0
    # SpeechDecoder / Code2Wav
    c2w: Code2WavDims = dataclasses.field(default_factory=Code2WavDims)


TINY_TTS_DIMS = Qwen3TTSDims(
    text_vocab=512, d_model=64, n_layer=2, n_head=4, n_kv_head=2, head_dim=16,
    d_ff=128, max_seq=256, text_pad=510, text_bos=511,
    cp_layer=2, cp_head=2, cp_kv_head=1, cp_head_dim=16, cp_ff=32,
    c2w=TINY_C2W_DIMS,
)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _dense(key, d_in, d_out, dtype):
    return (jax.random.normal(key, (d_in, d_out)) * (d_in**-0.5)).astype(dtype)


def _qwen3_block_init(
    ks, d, h, kvh, dh, ff, dtype, *, qk_norm: bool, layer_scale: Optional[float]
) -> dict:
    p = {
        "ln1": jnp.ones((d,), dtype),
        "wq": _dense(next(ks), d, h * dh, dtype),
        "wk": _dense(next(ks), d, kvh * dh, dtype),
        "wv": _dense(next(ks), d, kvh * dh, dtype),
        "wo": _dense(next(ks), h * dh, d, dtype),
        "ln2": jnp.ones((d,), dtype),
        "w_gate": _dense(next(ks), d, ff, dtype),
        "w_up": _dense(next(ks), d, ff, dtype),
        "w_down": _dense(next(ks), ff, d, dtype),
    }
    if qk_norm:
        p["qnorm"] = jnp.ones((dh,), dtype)
        p["knorm"] = jnp.ones((dh,), dtype)
    if layer_scale is not None:
        p["attn_scale"] = jnp.full((d,), layer_scale, dtype)
        p["mlp_scale"] = jnp.full((d,), layer_scale, dtype)
    return p


def _stack_blocks(blocks: list) -> PyTree:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def _conv_init(key, out_c, in_c, k, dtype):
    fan_in = in_c * k
    return (jax.random.normal(key, (out_c, in_c, k)) * (fan_in**-0.5)).astype(dtype)


def _tconv_init(key, in_c, out_c, k, dtype):
    fan_in = in_c * k
    return (jax.random.normal(key, (in_c, out_c, k)) * (fan_in**-0.5)).astype(dtype)


def init_code2wav_params(key, dims: Code2WavDims, dtype=jnp.float32) -> PyTree:
    """Faithful `Qwen3OmniMoeCode2Wav` parameter tree (HF layout semantics;
    conv weights stored in torch [O,I,K] / transposed [I,O,K] order)."""
    h = dims.d_model
    ks = iter(jax.random.split(key, 1024))
    blocks = _stack_blocks(
        [
            _qwen3_block_init(
                ks, h, dims.n_head, dims.n_kv_head, dims.head_dim, dims.d_ff,
                dtype, qk_norm=False, layer_scale=dims.layer_scale_init,
            )
            for _ in range(dims.n_layer)
        ]
    )

    def convnext():
        return {
            "dw_w": _conv_init(next(ks), h, 1, 7, dtype),  # depthwise, groups=h
            "dw_b": jnp.zeros((h,), dtype),
            "ln_g": jnp.ones((h,), dtype),
            "ln_b": jnp.zeros((h,), dtype),
            "pw1_w": _dense(next(ks), h, 4 * h, dtype),
            "pw1_b": jnp.zeros((4 * h,), dtype),
            "pw2_w": _dense(next(ks), 4 * h, h, dtype),
            "pw2_b": jnp.zeros((h,), dtype),
            "gamma": jnp.full((h,), 1e-6, dtype),
        }

    upsample = []
    for factor in dims.upsampling_ratios:
        upsample.append(
            {
                "tconv_w": _tconv_init(next(ks), h, h, factor, dtype),
                "tconv_b": jnp.zeros((h,), dtype),
                "cnx": convnext(),
            }
        )

    def residual_unit(c):
        return {
            "a1": jnp.zeros((c,), dtype),  # SnakeBeta alpha (log-scale)
            "b1": jnp.zeros((c,), dtype),
            "c1_w": _conv_init(next(ks), c, c, 7, dtype),
            "c1_b": jnp.zeros((c,), dtype),
            "a2": jnp.zeros((c,), dtype),
            "b2": jnp.zeros((c,), dtype),
            "c2_w": _conv_init(next(ks), c, c, 1, dtype),
            "c2_b": jnp.zeros((c,), dtype),
        }

    dec_blocks = []
    for i, rate in enumerate(dims.upsample_rates):
        in_c = dims.decoder_dim // (2**i)
        out_c = dims.decoder_dim // (2 ** (i + 1))
        dec_blocks.append(
            {
                "snake_a": jnp.zeros((in_c,), dtype),
                "snake_b": jnp.zeros((in_c,), dtype),
                "tconv_w": _tconv_init(next(ks), in_c, out_c, 2 * rate, dtype),
                "tconv_b": jnp.zeros((out_c,), dtype),
                "units": [residual_unit(out_c) for _ in range(3)],
            }
        )
    out_c = dims.decoder_dim // (2 ** len(dims.upsample_rates))

    return {
        "code_embed": _dense(
            next(ks), dims.codebook * dims.n_quantizers, h, dtype
        ),
        "blocks": blocks,
        "ln_f": jnp.ones((h,), dtype),
        "upsample": upsample,
        "dec_in_w": _conv_init(next(ks), dims.decoder_dim, h, 7, dtype),
        "dec_in_b": jnp.zeros((dims.decoder_dim,), dtype),
        "dec_blocks": dec_blocks,
        "out_snake_a": jnp.zeros((out_c,), dtype),
        "out_snake_b": jnp.zeros((out_c,), dtype),
        "out_w": _conv_init(next(ks), 1, out_c, 7, dtype),
        "out_b": jnp.zeros((1,), dtype),
    }


def init_tts_params(key, dims: Qwen3TTSDims, dtype=jnp.bfloat16) -> PyTree:
    ks = iter(jax.random.split(key, 4096))
    d = dims.d_model

    backbone = _stack_blocks(
        [
            _qwen3_block_init(
                ks, d, dims.n_head, dims.n_kv_head, dims.head_dim, dims.d_ff,
                dtype, qk_norm=True, layer_scale=None,
            )
            for _ in range(dims.n_layer)
        ]
    )
    cp_blocks = _stack_blocks(
        [
            _qwen3_block_init(
                ks, d, dims.cp_head, dims.cp_kv_head, dims.cp_head_dim,
                dims.cp_ff, dtype, qk_norm=True, layer_scale=None,
            )
            for _ in range(dims.cp_layer)
        ]
    )

    return {
        "text_embed": _dense(next(ks), dims.text_vocab, d, dtype),  # TextProjector
        "code_embed": _dense(next(ks), CODEC_VOCAB, d, dtype),  # CodeEmbedder
        "blocks": backbone,
        "ln_f": jnp.ones((d,), dtype),
        "code0_head": _dense(next(ks), d, CODEC_VOCAB, dtype),
        # MultiCodeDecoder (HF TalkerCodePredictor): 15 embedding tables,
        # a small transformer, 15 lm heads
        "mc": {
            "embeds": jnp.stack(
                [_dense(next(ks), HEAD_VOCAB, d, dtype) for _ in range(15)]
            ),
            "blocks": cp_blocks,
            "ln_f": jnp.ones((d,), dtype),
            "heads": jnp.stack(
                [_dense(next(ks), d, HEAD_VOCAB, dtype) for _ in range(15)]
            ),
        },
        # SpeechDecoder (HF Code2Wav)
        "c2w": init_code2wav_params(next(ks), dims.c2w, dtype),
    }


# ---------------------------------------------------------------------------
# Transformer pieces
# ---------------------------------------------------------------------------


def rms_norm(x, g, eps=1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt((x32**2).mean(-1, keepdims=True) + eps)
    return (y * g.astype(jnp.float32)).astype(x.dtype)


def _rope(x, positions, theta):
    """x [B, T, H, Dh]; rotary on half-split pairs (HF rotate_half)."""
    dh = x.shape[-1]
    half = dh // 2
    freqs = 1.0 / (theta ** (np.arange(0, half) / half))
    angles = positions[:, :, None].astype(jnp.float32) * freqs[None, None, :]  # [B,T,half]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _mm(x, w):
    """x @ w, dispatching on W8A16 ({"w_q" int8, "scale"}) and W4A16
    ({"w_q4" int4, "scale4"}) dicts — the dequant broadcasts on the
    trailing axes and XLA fuses it into the matmul's operand read, so only
    int8/packed-int4 bytes cross HBM (ops/quant.py; reference ships W8A16
    TTS components, Qwen3Config.swift:106-112, and 4-bit palettized model
    folders, fastlane/Fastfile:26-55)."""
    if isinstance(w, dict) and "w_q4" in w:
        from whisperkit_tpu.ops.quant import quantized_matmul_w4

        return quantized_matmul_w4(x, w)  # two half-dots; never forms w
    elif isinstance(w, dict) and "w_q" in w:
        w = w["w_q"].astype(x.dtype) * w["scale"].astype(x.dtype)
    return x @ w


def _qwen3_layers(
    blocks: PyTree,  # stacked [L, ...] block params
    x: jnp.ndarray,  # [B, T, D]
    positions: jnp.ndarray,  # [B, T] rotary positions
    mask: jnp.ndarray,  # [.., .., T, S] additive f32
    pos_offset,  # scalar cache slot of x[:, 0]
    kv_k,  # [L, B, KVH, S, Dh]
    kv_v,
    *,
    n_head: int,
    n_kv_head: int,
    head_dim: int,
    rope_theta: float,
    qk_norm: bool,
    layer_scale: bool,
    rms_eps: float = 1e-6,
    unroll_t1: bool = False,
):
    """Shared Qwen3-family layer scan: RMSNorm -> GQA(+RoPE, optional
    per-head q/k norms) -> SwiGLU, with optional LayerScale residuals and a
    dynamic_update_slice KV cache. Used by the CodeDecoder backbone, the
    code predictor, and the Code2Wav pre-transformer."""
    b, t, _ = x.shape
    h, kvh, dh = n_head, n_kv_head, head_dim

    if t == 1 and unroll_t1:
        # Single-token step, OPT-IN (quantized code predictor only):
        # unroll the layer loop and write each layer's new K/V directly
        # into the stacked cache at (layer, :, :, pos, :). Unrolling lets
        # XLA fuse the W8A16 dequant into each matmul's operand read
        # (int8-only weight traffic), measured −26% per multicode frame
        # (4.06 → 3.00 ms, tools/probe_tts_dequant.py). It is NOT a
        # general win here, unlike the Whisper decoder's unrolled path:
        # bf16 weights get slice-copied per layer (multicode 5.05 → 7.30
        # ms/frame) and the 28-layer backbone regresses ~2 ms/frame even
        # at W8A16 (end-to-end ablation, docs/BENCHMARKS.md), so the
        # backbone and all bf16 callers keep the layer scan.
        L = kv_k.shape[0]
        for li in range(L):
            bp = jax.tree.map(lambda a: a[li], blocks)
            hthin = rms_norm(x, bp["ln1"], rms_eps)
            q = _mm(hthin, bp["wq"]).reshape(b, t, h, dh)
            k = _mm(hthin, bp["wk"]).reshape(b, t, kvh, dh)
            v = _mm(hthin, bp["wv"]).reshape(b, t, kvh, dh)
            if qk_norm:
                q = rms_norm(q, bp["qnorm"], rms_eps)
                k = rms_norm(k, bp["knorm"], rms_eps)
            q = _rope(q, positions, rope_theta)
            k = _rope(k, positions, rope_theta)
            kv_k = jax.lax.dynamic_update_slice(
                kv_k,
                k.transpose(0, 2, 1, 3)[None].astype(kv_k.dtype),
                (li, 0, 0, pos_offset, 0),
            )
            kv_v = jax.lax.dynamic_update_slice(
                kv_v,
                v.transpose(0, 2, 1, 3)[None].astype(kv_v.dtype),
                (li, 0, 0, pos_offset, 0),
            )
            rep = h // kvh
            kfull = jnp.repeat(kv_k[li], rep, axis=1)  # [B, H, S, Dh]
            vfull = jnp.repeat(kv_v[li], rep, axis=1)
            qh = q.transpose(0, 2, 1, 3)  # [B, H, T, Dh]
            scores = jnp.einsum(
                "bhtd,bhsd->bhts", qh, kfull,
                preferred_element_type=jnp.float32,
            ) / np.sqrt(dh)
            probs = jax.nn.softmax(scores + mask, axis=-1).astype(vfull.dtype)
            out = jnp.einsum("bhts,bhsd->bhtd", probs, vfull)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
            attn = _mm(out, bp["wo"])
            if layer_scale:
                attn = attn * bp["attn_scale"].astype(attn.dtype)
            x = x + attn
            hthin = rms_norm(x, bp["ln2"], rms_eps)
            mlp = _mm(
                jax.nn.silu(_mm(hthin, bp["w_gate"])) * _mm(hthin, bp["w_up"]),
                bp["w_down"],
            )
            if layer_scale:
                mlp = mlp * bp["mlp_scale"].astype(mlp.dtype)
            x = x + mlp
        return x, (kv_k, kv_v)

    def block(x, layer):
        bp, kk, vv = layer
        hthin = rms_norm(x, bp["ln1"], rms_eps)
        q = _mm(hthin, bp["wq"]).reshape(b, t, h, dh)
        k = _mm(hthin, bp["wk"]).reshape(b, t, kvh, dh)
        v = _mm(hthin, bp["wv"]).reshape(b, t, kvh, dh)
        if qk_norm:
            q = rms_norm(q, bp["qnorm"], rms_eps)
            k = rms_norm(k, bp["knorm"], rms_eps)
        q = _rope(q, positions, rope_theta)
        k = _rope(k, positions, rope_theta)
        kk = jax.lax.dynamic_update_slice(
            kk, k.transpose(0, 2, 1, 3).astype(kk.dtype), (0, 0, pos_offset, 0)
        )
        vv = jax.lax.dynamic_update_slice(
            vv, v.transpose(0, 2, 1, 3).astype(vv.dtype), (0, 0, pos_offset, 0)
        )
        rep = h // kvh
        kfull = jnp.repeat(kk, rep, axis=1)  # [B, H, S, Dh]
        vfull = jnp.repeat(vv, rep, axis=1)
        qh = q.transpose(0, 2, 1, 3)  # [B, H, T, Dh]
        scores = jnp.einsum(
            "bhtd,bhsd->bhts", qh, kfull, preferred_element_type=jnp.float32
        ) / np.sqrt(dh)
        probs = jax.nn.softmax(scores + mask, axis=-1).astype(vfull.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, vfull)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
        attn = _mm(out, bp["wo"])
        if layer_scale:
            attn = attn * bp["attn_scale"].astype(attn.dtype)
        x = x + attn

        hthin = rms_norm(x, bp["ln2"], rms_eps)
        mlp = _mm(
            jax.nn.silu(_mm(hthin, bp["w_gate"])) * _mm(hthin, bp["w_up"]),
            bp["w_down"],
        )
        if layer_scale:
            mlp = mlp * bp["mlp_scale"].astype(mlp.dtype)
        x = x + mlp
        return x, (kk, vv)

    x, (kv_k, kv_v) = jax.lax.scan(block, x, (blocks, kv_k, kv_v))
    return x, (kv_k, kv_v)


def init_code_kv_cache(dims: Qwen3TTSDims, batch: int, max_seq: Optional[int] = None):
    s = max_seq or dims.max_seq
    shape = (dims.n_layer, batch, dims.n_kv_head, s, dims.head_dim)
    return jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16)


def code_decoder_forward(
    params: PyTree,
    embeds: jnp.ndarray,  # [B, T, D] input embeddings (text+codec tracks)
    pos_offset,  # scalar: cache SLOT of embeds[:, 0]
    kv_k,
    kv_v,
    dims: Qwen3TTSDims,
    rope_offset=None,  # [B] logical position of embeds[:, 0] (left-padding
    # shifts logical positions without moving cache slots); default = slot
    key_invalid=None,  # [B, S] True at cache slots that must never be
    # attended (left-pad embeddings)
):
    """AR backbone step/prefill → (code0 logits [B,T,V], hidden [B,T,D], kv).

    Reference: Qwen3CodeDecoder.swift `decode(inputEmbeds:cache:state:)`.
    """
    b, t, d = embeds.shape
    s_max = kv_k.shape[3]
    if rope_offset is None:
        positions = pos_offset + jnp.arange(t)[None, :].repeat(b, 0)
    else:
        positions = jnp.maximum(
            rope_offset[:, None] + jnp.arange(t)[None, :], 0
        )

    key_pos = jnp.arange(s_max)[None, :]
    query_pos = pos_offset + jnp.arange(t)[:, None]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)[None, None]
    if key_invalid is not None:
        # hide pad slots from every OTHER query; a pad slot still attends
        # to itself so its activations stay finite (NaN k/v would otherwise
        # poison later layers through the softmax)
        is_self = (key_pos == query_pos)[None, None]  # [1,1,T,S]
        inv = key_invalid[:, None, None, :] & ~is_self
        mask = mask + jnp.where(inv, -jnp.inf, 0.0).astype(jnp.float32)

    x, (kv_k, kv_v) = _qwen3_layers(
        params["blocks"], embeds, positions, mask, pos_offset, kv_k, kv_v,
        n_head=dims.n_head, n_kv_head=dims.n_kv_head, head_dim=dims.head_dim,
        rope_theta=dims.rope_theta, qk_norm=True, layer_scale=False,
    )
    hidden = rms_norm(x, params["ln_f"])
    logits = _mm(hidden, params["code0_head"]).astype(jnp.float32)
    return logits, hidden, (kv_k, kv_v)


# ---------------------------------------------------------------------------
# MultiCodeDecoder (code predictor)
# ---------------------------------------------------------------------------


def _unroll_t1_gate(auto: bool) -> bool:
    """T==1 layer-unroll gate for the code predictor; WKTPU_TTS_UNROLL_T1=0/1
    forces it off/on (ablation + equivalence tests), unset keeps `auto`."""
    env = os.environ.get("WKTPU_TTS_UNROLL_T1")
    if env in ("0", "1"):
        return env == "1"
    return auto


def code_predictor_forward(
    mc: PyTree,
    embeds: jnp.ndarray,  # [B, T, D]
    pos_offset,
    kv_k,  # [cpL, B, cpKV, S, cpDh]
    kv_v,
    dims: Qwen3TTSDims,
):
    """One step/prefill of the per-frame code predictor → (hidden, kv)."""
    b, t, _ = embeds.shape
    s_max = kv_k.shape[3]
    positions = pos_offset + jnp.arange(t)[None, :].repeat(b, 0)
    key_pos = jnp.arange(s_max)[None, :]
    query_pos = pos_offset + jnp.arange(t)[:, None]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)[None, None]
    x, kv = _qwen3_layers(
        mc["blocks"], embeds, positions, mask, pos_offset, kv_k, kv_v,
        n_head=dims.cp_head, n_kv_head=dims.cp_kv_head,
        head_dim=dims.cp_head_dim, rope_theta=dims.cp_rope_theta,
        qk_norm=True, layer_scale=False,
        # W8A16 micro-steps unroll (dequant fuses into each matmul read):
        # a measured A-B win only at 0.6b width (d1024: 5.14 → 4.21 ms/frame
        # e2e W8A16; d2048 regresses 8.58 → 10.70 — the per-layer stacked-
        # weight slices outgrow the fusion win), so the gate is quantized AND
        # narrow. bf16 always keeps the scan (5.05 → 7.30 regression).
        # WKTPU_TTS_UNROLL_T1=0/1 overrides (ablation hook,
        # tools/probe_tts_dequant.py; A-B table in docs/BENCHMARKS.md).
        unroll_t1=_unroll_t1_gate(
            isinstance(mc["blocks"]["wq"], dict) and embeds.shape[-1] <= 1024
        ),
    )
    return rms_norm(x, mc["ln_f"]), kv


def _sample_topk(logits, key, temperature, top_k: int):
    top_vals, top_idx = jax.lax.top_k(logits, top_k)
    choice = jax.random.categorical(key, top_vals / jnp.maximum(temperature, 1e-4))
    sampled = jnp.take_along_axis(top_idx, choice[:, None], 1)[:, 0]
    greedy = jnp.argmax(logits, -1)
    return jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)


def multicode_forward(
    params: PyTree,
    hidden: jnp.ndarray,  # [B, D] frame hidden state from the backbone
    code0: jnp.ndarray,  # [B] sampled codec-0 token
    key,
    temperature,
    top_k: int = 5,
    *,
    dims: Qwen3TTSDims,
):
    """Frame hidden + code0 → (15 RVQ head codes [B,15], codec_sum [B,D]).

    Reference: Qwen3MultiCodeDecoder.swift `generateMultiCodes` (:249-345) —
    a fresh KV-cached transformer per frame, prefilled with
    [hidden, code0_embed], then 14 AR steps; head i's logits sample code
    i+1 and its embedding feeds the next step. `codec_sum` is the sum of
    all 16 code embeddings the backbone consumes as the next frame's codec
    track (Qwen3GenerateTask.swift:421-448 sumEmbeddings incl. code15).
    """
    mc = params["mc"]
    b, d = hidden.shape
    s_max = 17  # hidden + code0 + 14 fed-back head embeddings
    kv_shape = (dims.cp_layer, b, dims.cp_kv_head, s_max, dims.cp_head_dim)
    kv_k = jnp.zeros(kv_shape, hidden.dtype)
    kv_v = jnp.zeros(kv_shape, hidden.dtype)

    c0e = params["code_embed"][code0].astype(hidden.dtype)
    prefill = jnp.stack([hidden, c0e], axis=1)  # [B, 2, D]
    h, (kv_k, kv_v) = code_predictor_forward(mc, prefill, 0, kv_k, kv_v, dims)
    last = h[:, -1]

    heads = mc["heads"]
    embeds = mc["embeds"]

    def head_step(carry, xs):
        last, kv_k, kv_v, key, csum, i = carry
        head_i, embed_i = xs
        if isinstance(head_i, dict) and "w_q4" in head_i:  # W4A16 head
            from whisperkit_tpu.ops.quant import quantized_matmul_w4

            logits = quantized_matmul_w4(
                last, head_i, preferred_element_type=jnp.float32
            )
        else:
            if isinstance(head_i, dict):  # W8A16: dequant this head's slice
                w_i = head_i["w_q"].astype(last.dtype) * head_i["scale"].astype(
                    last.dtype
                )
            else:
                w_i = head_i
            logits = jnp.einsum(
                "bd,dv->bv", last, w_i, preferred_element_type=jnp.float32
            )
        key, sub = jax.random.split(key)
        code = _sample_topk(logits, sub, temperature, top_k)
        emb = embed_i[code].astype(last.dtype)  # [B, D]
        csum = csum + emb
        h, (kv_k, kv_v) = code_predictor_forward(
            mc, emb[:, None], 2 + i, kv_k, kv_v, dims
        )
        return (h[:, -1], kv_k, kv_v, key, csum, i + 1), code

    (_, _, _, _, codec_sum, _), codes = jax.lax.scan(
        head_step,
        (last, kv_k, kv_v, key, c0e, jnp.asarray(0, jnp.int32)),
        (heads, embeds),
    )
    return codes.T, codec_sum  # [B, 15], [B, D]


# ---------------------------------------------------------------------------
# Speech decoder (Code2Wav)
# ---------------------------------------------------------------------------


def _snake_beta(x, alpha, beta):
    """SnakeBeta: x + (1/exp(beta)) * sin(exp(alpha) * x)^2, per channel.
    x [B, C, T]; alpha/beta stored in log scale (HF SnakeBeta)."""
    a = jnp.exp(alpha.astype(jnp.float32))[None, :, None]
    b = jnp.exp(beta.astype(jnp.float32))[None, :, None]
    x32 = x.astype(jnp.float32)
    return (x32 + (1.0 / (b + 1e-9)) * jnp.sin(x32 * a) ** 2).astype(x.dtype)


def _causal_conv(x, w, b, dilation=1, groups=1):
    """x [B, C, T] stride-1 causal conv; w [O, I/groups, K] (torch order)."""
    k = w.shape[-1]
    pad = (k - 1) * dilation
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), [(pad, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
    )
    return y + b.astype(x.dtype)[None, :, None]


def _causal_tconv(x, w, b, stride):
    """Causal transposed conv (HF CausalTransConvNet): torch
    ConvTranspose1d(k, s) then trim (k - s) from BOTH sides. w [I, O, K].

    Expressed as phase einsums (MXU matmuls) instead of lax.conv_transpose:
    out[b,o,t*s+j] = sum_i x[b,i,t] * w[i,o,j]; kernel taps beyond s wrap
    to the next t. Supports k == s (upsample stages, no trim) and k == 2s
    (decoder blocks, trim s)."""
    i_c, o_c, k = w.shape
    bsz, _, t = x.shape
    w = w.astype(x.dtype)
    if k == stride:
        y = jnp.einsum("bit,ioj->botj", x, w).reshape(bsz, o_c, t * stride)
        return y + b.astype(x.dtype)[None, :, None]
    assert k == 2 * stride, "Code2Wav uses k==s or k==2s transposed convs"
    a = jnp.einsum("bit,ioj->botj", x, w[:, :, :stride])  # tap j at t
    c = jnp.einsum("bit,ioj->botj", x, w[:, :, stride:])  # tap s+j at t -> t+1
    c_shift = jnp.pad(c, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :t]
    y = (a + c_shift).reshape(bsz, o_c, t * stride)
    # full ConvTranspose output is length (t+1)*s; positions [s, t*s) survive
    # the symmetric trim of s. (The final s positions, fed only by the last
    # input's high taps, are cut by the right trim.)
    return y[..., stride:] + b.astype(x.dtype)[None, :, None]


def _convnext_block(x, p):
    """HF Qwen3OmniMoeConvNeXtBlock: causal depthwise k7 -> LayerNorm ->
    pointwise 4x GELU pointwise -> gamma, residual. x [B, C, T]."""
    c = x.shape[1]
    h = _causal_conv(x, p["dw_w"], p["dw_b"], groups=c)
    h = h.transpose(0, 2, 1)  # [B, T, C]
    h32 = h.astype(jnp.float32)
    mu = h32.mean(-1, keepdims=True)
    var = ((h32 - mu) ** 2).mean(-1, keepdims=True)
    h = (
        (h32 - mu) * jax.lax.rsqrt(var + 1e-6) * p["ln_g"].astype(jnp.float32)
        + p["ln_b"].astype(jnp.float32)
    ).astype(x.dtype)
    h = _mm(h, p["pw1_w"]) + p["pw1_b"].astype(x.dtype)
    # HF nn.GELU() default is the exact (erf) form
    h = jax.nn.gelu(h, approximate=False)
    h = _mm(h, p["pw2_w"]) + p["pw2_b"].astype(x.dtype)
    h = (h * p["gamma"].astype(x.dtype)).transpose(0, 2, 1)
    return x + h


def _c2w_embed(c2w: PyTree, codes: jnp.ndarray, dims: Code2WavDims):
    """codes [B, T, nq] → mean-pooled embeddings [B, T, H] (HF offsets)."""
    offsets = (jnp.arange(dims.n_quantizers, dtype=jnp.int32) * dims.codebook)[
        None, None, :
    ]
    ids = jnp.clip(codes, 0, dims.codebook - 1) + offsets
    return c2w["code_embed"][ids].mean(axis=2)


def _c2w_transformer_mask(query_pos, key_pos, window: int):
    ok = (key_pos <= query_pos) & (key_pos > query_pos - window)
    return jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)[None, None]


def _c2w_conv_stack(c2w: PyTree, hidden: jnp.ndarray, dims: Code2WavDims):
    """hidden [B, T, H] → waveform [B, T*total_upsample - conv_delay]."""
    x = hidden.transpose(0, 2, 1)  # [B, H, T]
    for (factor, stage) in zip(dims.upsampling_ratios, c2w["upsample"]):
        x = _causal_tconv(x, stage["tconv_w"], stage["tconv_b"], factor)
        x = _convnext_block(x, stage["cnx"])
    x = _causal_conv(x, c2w["dec_in_w"], c2w["dec_in_b"])
    for (rate, blk) in zip(dims.upsample_rates, c2w["dec_blocks"]):
        x = _snake_beta(x, blk["snake_a"], blk["snake_b"])
        x = _causal_tconv(x, blk["tconv_w"], blk["tconv_b"], rate)
        for u, dilation in zip(blk["units"], (1, 3, 9)):
            r = x
            x = _snake_beta(x, u["a1"], u["b1"])
            x = _causal_conv(x, u["c1_w"], u["c1_b"], dilation=dilation)
            x = _snake_beta(x, u["a2"], u["b2"])
            x = _causal_conv(x, u["c2_w"], u["c2_b"])
            x = x + r
    x = _snake_beta(x, c2w["out_snake_a"], c2w["out_snake_b"])
    x = _causal_conv(x, c2w["out_w"], c2w["out_b"])  # [B, 1, T']
    return jnp.clip(x[:, 0], -1.0, 1.0)


@functools.partial(jax.jit, static_argnames=("dims",))
def code2wav_forward(
    c2w: PyTree,
    codes: jnp.ndarray,  # [B, T, nq] RVQ codes per frame
    dims: Code2WavDims,
) -> jnp.ndarray:
    """Whole-utterance Code2Wav — bit-matches the HF torch module.

    Returns [B, T*total_upsample - conv_delay] (the decoder blocks'
    transposed convs trim `conv_delay` samples; the streaming/pipeline
    wrappers re-align to exact frame boundaries).
    """
    emb = _c2w_embed(c2w, codes, dims)
    b, t, _ = emb.shape
    pos = jnp.arange(t)
    mask = _c2w_transformer_mask(pos[:, None], pos[None, :], dims.sliding_window)
    kv_shape = (dims.n_layer, b, dims.n_kv_head, t, dims.head_dim)
    hidden, _ = _qwen3_layers(
        c2w["blocks"], emb, pos[None, :].repeat(b, 0), mask, 0,
        jnp.zeros(kv_shape, emb.dtype), jnp.zeros(kv_shape, emb.dtype),
        n_head=dims.n_head, n_kv_head=dims.n_kv_head, head_dim=dims.head_dim,
        rope_theta=dims.rope_theta, qk_norm=False, layer_scale=True,
        rms_eps=dims.rms_eps,
    )
    hidden = rms_norm(hidden, c2w["ln_f"], dims.rms_eps)
    return _c2w_conv_stack(c2w, hidden, dims)


@functools.partial(jax.jit, static_argnames=("dims",))
def speech_decoder_forward(
    params: PyTree,
    codes: jnp.ndarray,  # [B, T, 16] RVQ codes per frame
    dims: Qwen3TTSDims,
) -> jnp.ndarray:
    """codes → waveform [B, T*1920] @ 24 kHz, whole batch in one dispatch.

    Reference: Qwen3SpeechDecoder.swift decodes ONE frame per call
    (:62,:109); here any number of frames vocode in a single call. The
    `conv_delay` samples the transposed convs trim are re-inserted as
    leading silence so frame i occupies samples [i*1920, (i+1)*1920) —
    the vocoder's group delay, constant across utterances.
    """
    b, t, n = codes.shape
    wave = code2wav_forward(params["c2w"], codes, dims.c2w)
    delay = dims.c2w.conv_delay
    out = jnp.zeros((b, t * dims.c2w.total_upsample), wave.dtype)
    return jax.lax.dynamic_update_slice(out, wave, (0, delay))


class Code2WavCache(NamedTuple):
    """Streaming vocoder state (reference SpeechDecoderCache,
    KVCache.swift:159-210): pre-transformer KV + rolling 16-frame hidden
    context + next frame index."""

    kv_k: jnp.ndarray  # [L, B, KVH, S, Dh]
    kv_v: jnp.ndarray
    pos: jnp.ndarray  # scalar i32 — frames decoded so far
    hidden_ctx: jnp.ndarray  # [B, CTX, H] rolling post-transformer states


C2W_CONTEXT_FRAMES = 16  # sdHiddenContextLen (Qwen3Models.swift:57)


def init_code2wav_cache(
    dims: Code2WavDims, batch: int, max_frames: int = 256, dtype=jnp.float32
) -> Code2WavCache:
    kv_shape = (dims.n_layer, batch, dims.n_kv_head, max_frames, dims.head_dim)
    return Code2WavCache(
        kv_k=jnp.zeros(kv_shape, dtype),
        kv_v=jnp.zeros(kv_shape, dtype),
        pos=jnp.asarray(0, jnp.int32),
        hidden_ctx=jnp.zeros((batch, C2W_CONTEXT_FRAMES, dims.d_model), dtype),
    )


@functools.partial(jax.jit, static_argnames=("dims", "ctx_frames"))
def code2wav_decode_block(
    c2w: PyTree,
    codes: jnp.ndarray,  # [B, n, 16] new frames
    cache: Code2WavCache,
    dims: Code2WavDims,
    *,
    ctx_frames: int,  # static: REAL frames in cache.hidden_ctx to use —
    # min(frames decoded so far, 16); 0 on the utterance's first block
) -> tuple[jnp.ndarray, Code2WavCache]:
    """Streaming block decode → ([B, n*1920], cache); sample-exact vs
    `speech_decoder_forward` because 16 context frames cover the conv
    stack's ~9.4-frame receptive field and the KV cache makes the
    sliding-window transformer exact. `ctx_frames` is static so a fixed
    block size compiles at most three shapes (first / ramp-up / steady)."""
    emb = _c2w_embed(c2w, codes, dims)
    b, n, _ = emb.shape
    s_max = cache.kv_k.shape[3]
    positions = cache.pos + jnp.arange(n)[None, :].repeat(b, 0)
    key_pos = jnp.arange(s_max)[None, :]
    query_pos = cache.pos + jnp.arange(n)[:, None]
    mask = _c2w_transformer_mask(query_pos, key_pos, dims.sliding_window)
    hidden, (kv_k, kv_v) = _qwen3_layers(
        c2w["blocks"], emb, positions, mask, cache.pos,
        cache.kv_k, cache.kv_v,
        n_head=dims.n_head, n_kv_head=dims.n_kv_head, head_dim=dims.head_dim,
        rope_theta=dims.rope_theta, qk_norm=False, layer_scale=True,
        rms_eps=dims.rms_eps,
    )
    hidden = rms_norm(hidden, c2w["ln_f"], dims.rms_eps)

    spf = dims.total_upsample
    if ctx_frames == 0:
        wave = _c2w_conv_stack(c2w, hidden, dims)  # [B, n*spf - delay]
        out = jnp.zeros((b, n * spf), wave.dtype)
        out = jax.lax.dynamic_update_slice(out, wave, (0, dims.conv_delay))
    else:
        ctx = cache.hidden_ctx[:, C2W_CONTEXT_FRAMES - ctx_frames:]
        full = jnp.concatenate([ctx.astype(hidden.dtype), hidden], 1)
        wave = _c2w_conv_stack(c2w, full, dims)
        out = wave[:, -n * spf:]
    new_ctx = jnp.concatenate([cache.hidden_ctx.astype(hidden.dtype), hidden], 1)[
        :, -C2W_CONTEXT_FRAMES:
    ]
    return out, Code2WavCache(kv_k, kv_v, cache.pos + n, new_ctx)
