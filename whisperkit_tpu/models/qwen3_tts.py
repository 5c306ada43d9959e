"""Qwen3-TTS model stack, TPU-native JAX.

Reference: Sources/TTSKit/Qwen3TTS/ — the reference drives six CoreML
components (Qwen3Models.swift:22-57 constants; Qwen3CodeDecoder.swift,
Qwen3MultiCodeDecoder.swift, Qwen3SpeechDecoder.swift, Qwen3TextProjector /
Qwen3Embedders.swift). Here the same roles are filled by from-scratch JAX
modules with a Qwen3-style architecture:

  * TextProjector / CodeEmbedder — embedding lookups (`jnp.take`)
  * CodeDecoder — AR transformer (RMSNorm, rotary, grouped-query
    attention, SwiGLU) with a dynamic_update_slice KV cache; emits codec-0
    logits + a hidden state per 12.5 Hz frame
  * MultiCodeDecoder — 15 RVQ heads run as a 15-step `lax.scan`, each head
    conditioned on the frame hidden state + embeddings of previous codes
  * SpeechDecoder — RVQ frame (16 codes) → 1920 samples @ 24 kHz. The
    reference decodes frame-by-frame with a rolling 16-frame context; here
    the vocoder is a *causal dilated conv stack*, so a whole utterance (or
    any block of frames) decodes in ONE batched call — the TPU-first
    replacement for the reference's per-frame `decodeFrameAsync` overlap
    (Qwen3GenerateTask.swift:449-482).

Constants mirror Qwen3Models.swift: codec BOS 2149 / EOS 2150, 1920
samples per frame at 24 kHz (12.5 Hz frame rate).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any

CODEC_BOS = 2149  # Qwen3Models.swift:22-30
CODEC_EOS = 2150
CODEC_VOCAB = 2151
HEAD_VOCAB = 2048  # RVQ codebook size for heads 1..15
N_RVQ = 16  # code0 + 15 heads
SAMPLES_PER_FRAME = 1920  # Qwen3Models.swift:40-41
OUTPUT_SAMPLE_RATE = 24_000
FRAME_RATE = OUTPUT_SAMPLE_RATE / SAMPLES_PER_FRAME  # 12.5 Hz


@dataclasses.dataclass(frozen=True)
class Qwen3TTSDims:
    text_vocab: int = 151_936
    d_model: int = 1024
    n_layer: int = 28
    n_head: int = 16
    n_kv_head: int = 8
    d_ff: int = 3072
    rope_theta: float = 1_000_000.0
    max_seq: int = 2048
    # speech decoder
    voc_channels: int = 256
    voc_layers: int = 8

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head


TINY_TTS_DIMS = Qwen3TTSDims(
    text_vocab=512, d_model=64, n_layer=2, n_head=4, n_kv_head=2, d_ff=128,
    max_seq=256, voc_channels=32, voc_layers=4,
)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _dense(key, d_in, d_out, dtype):
    return (jax.random.normal(key, (d_in, d_out)) * (d_in**-0.5)).astype(dtype)


def init_tts_params(key, dims: Qwen3TTSDims, dtype=jnp.bfloat16) -> PyTree:
    ks = iter(jax.random.split(key, 16 + dims.n_layer * 8 + dims.voc_layers * 2))
    d, h, kvh, dh = dims.d_model, dims.n_head, dims.n_kv_head, dims.head_dim

    def block():
        return {
            "ln1": jnp.ones((d,), dtype),
            "wq": _dense(next(ks), d, h * dh, dtype),
            "wk": _dense(next(ks), d, kvh * dh, dtype),
            "wv": _dense(next(ks), d, kvh * dh, dtype),
            "wo": _dense(next(ks), h * dh, d, dtype),
            "qnorm": jnp.ones((dh,), dtype),  # qwen3 per-head q/k norm
            "knorm": jnp.ones((dh,), dtype),
            "ln2": jnp.ones((d,), dtype),
            "w_gate": _dense(next(ks), d, dims.d_ff, dtype),
            "w_up": _dense(next(ks), d, dims.d_ff, dtype),
            "w_down": _dense(next(ks), dims.d_ff, d, dtype),
        }

    blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *[block() for _ in range(dims.n_layer)])

    vc = dims.voc_channels
    voc_blocks = []
    for i in range(dims.voc_layers):
        voc_blocks.append(
            {
                "w": (jax.random.normal(next(ks), (vc, vc, 3)) * ((vc * 3) ** -0.5)).astype(jnp.float32),
                "b": jnp.zeros((vc,), jnp.float32),
            }
        )

    return {
        "text_embed": _dense(next(ks), dims.text_vocab, d, dtype),  # TextProjector
        "code_embed": _dense(next(ks), CODEC_VOCAB, d, dtype),  # CodeEmbedder
        "blocks": blocks,
        "ln_f": jnp.ones((d,), dtype),
        "code0_head": _dense(next(ks), d, CODEC_VOCAB, dtype),
        # MultiCodeDecoder: per-head classifier + per-head code embedding
        "mc_embed": _dense(next(ks), 15 * HEAD_VOCAB, d, dtype),
        "mc_heads": _dense(next(ks), d, 15 * HEAD_VOCAB, dtype).reshape(d, 15, HEAD_VOCAB),
        # SpeechDecoder
        "voc_in": {
            "w": (jax.random.normal(next(ks), (vc, N_RVQ * 16, 1)) * 0.05).astype(jnp.float32),
            "b": jnp.zeros((vc,), jnp.float32),
        },
        # rows: codebook 0 (CODEC_VOCAB incl. BOS/EOS) then 15× HEAD_VOCAB
        "voc_code_embed": _dense(
            next(ks), CODEC_VOCAB + 15 * HEAD_VOCAB, 16, jnp.float32
        ),
        "voc_blocks": voc_blocks,
        "voc_out": {
            "w": (jax.random.normal(next(ks), (SAMPLES_PER_FRAME, vc, 1)) * (vc**-0.5)).astype(jnp.float32),
            "b": jnp.zeros((SAMPLES_PER_FRAME,), jnp.float32),
        },
    }


# ---------------------------------------------------------------------------
# Transformer pieces
# ---------------------------------------------------------------------------


def rms_norm(x, g, eps=1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt((x32**2).mean(-1, keepdims=True) + eps)
    return (y * g.astype(jnp.float32)).astype(x.dtype)


def _rope(x, positions, theta):
    """x [B, T, H, Dh]; rotary on pairs."""
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


def init_code_kv_cache(dims: Qwen3TTSDims, batch: int, max_seq: Optional[int] = None):
    s = max_seq or dims.max_seq
    shape = (dims.n_layer, batch, dims.n_kv_head, s, dims.head_dim)
    return jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16)



def _mm(x, w):
    """x @ w, dispatching on W8A16 dicts ({"w_q" int8, "scale"}) — the
    dequant broadcasts on the trailing axes and XLA fuses it into the
    matmul's operand read, so only int8 bytes cross HBM (ops/quant.py;
    reference ships W8A16 TTS components, Qwen3Config.swift:106-112)."""
    if isinstance(w, dict) and "w_q" in w:
        w = w["w_q"].astype(x.dtype) * w["scale"].astype(x.dtype)
    return x @ w


def code_decoder_forward(
    params: PyTree,
    embeds: jnp.ndarray,  # [B, T, D] input embeddings (text or code)
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
    h, kvh, dh = dims.n_head, dims.n_kv_head, dims.head_dim
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

    x = embeds

    def block(x, layer):
        bp, kk, vv = layer
        hthin = rms_norm(x, bp["ln1"])
        q = _mm(hthin, bp["wq"]).reshape(b, t, h, dh)
        k = _mm(hthin, bp["wk"]).reshape(b, t, kvh, dh)
        v = _mm(hthin, bp["wv"]).reshape(b, t, kvh, dh)
        q = rms_norm(q, bp["qnorm"])
        k = rms_norm(k, bp["knorm"])
        q = _rope(q, positions, dims.rope_theta)
        k = _rope(k, positions, dims.rope_theta)
        kk = jax.lax.dynamic_update_slice(
            kk, k.transpose(0, 2, 1, 3).astype(kk.dtype), (0, 0, pos_offset, 0)
        )
        vv = jax.lax.dynamic_update_slice(
            vv, v.transpose(0, 2, 1, 3).astype(vv.dtype), (0, 0, pos_offset, 0)
        )
        # grouped-query attention: repeat kv heads
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
        x = x + _mm(out, bp["wo"])

        hthin = rms_norm(x, bp["ln2"])
        x = x + _mm(jax.nn.silu(_mm(hthin, bp["w_gate"])) * _mm(hthin, bp["w_up"]), bp["w_down"])
        return x, (kk, vv)

    def scan_block(x, layer):
        return block(x, layer)

    x, (kv_k, kv_v) = jax.lax.scan(scan_block, x, (params["blocks"], kv_k, kv_v))
    hidden = rms_norm(x, params["ln_f"])
    logits = _mm(hidden, params["code0_head"]).astype(jnp.float32)
    return logits, hidden, (kv_k, kv_v)


def multicode_forward(
    params: PyTree, hidden: jnp.ndarray, key, temperature, top_k: int = 5
):
    """Frame hidden state [B, D] → 15 RVQ head codes [B, 15].

    Reference: Qwen3MultiCodeDecoder.swift `generateMultiCodes` (:249,349) —
    sequential head sampling with embeddings fed back; here a 15-step scan.
    """
    b, d = hidden.shape

    mc_heads = params["mc_heads"]

    def head_step(carry, i):
        state, key = carry
        if isinstance(mc_heads, dict):  # W8A16: dequant only head i's slice
            w_i = mc_heads["w_q"][:, i].astype(state.dtype) * mc_heads[
                "scale"
            ][i].astype(state.dtype)
        else:
            w_i = mc_heads[:, i]
        logits = jnp.einsum(
            "bd,dv->bv", state, w_i, preferred_element_type=jnp.float32
        )
        key, sub = jax.random.split(key)
        top_vals, top_idx = jax.lax.top_k(logits, top_k)
        choice = jax.random.categorical(sub, top_vals / jnp.maximum(temperature, 1e-4))
        sampled = jnp.take_along_axis(top_idx, choice[:, None], 1)[:, 0]
        greedy = jnp.argmax(logits, -1)
        code = jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)
        emb = params["mc_embed"][i * HEAD_VOCAB + code]
        return (state + emb.astype(state.dtype), key), code

    (_, _), codes = jax.lax.scan(
        head_step, (hidden, key), jnp.arange(15)
    )
    return codes.T  # [B, 15]


# ---------------------------------------------------------------------------
# Speech decoder (vocoder)
# ---------------------------------------------------------------------------


def _causal_conv(x, w, b, dilation):
    """x [B, C, T], left-padded causal conv."""
    k = w.shape[-1]
    pad = (k - 1) * dilation
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(pad, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + b[None, :, None]


@functools.partial(jax.jit, static_argnames=("dims",))
def speech_decoder_forward(
    params: PyTree,
    codes: jnp.ndarray,  # [B, T, 16] RVQ codes per frame
    dims: Qwen3TTSDims,
) -> jnp.ndarray:
    """codes → waveform [B, T*1920] @ 24 kHz, whole sequence in one call.

    Reference: Qwen3SpeechDecoder.swift decodes ONE frame per call with a
    rolling 16-frame hidden context (:62,:109). The dilated causal conv
    stack here has the same receptive field (> 16 frames) but vocodes any
    number of frames in a single dispatch; streaming callers pass blocks.
    """
    b, t, n = codes.shape
    # embed each codebook entry (16-d per code), concat → [B, T, 16*16];
    # codebook 0 spans CODEC_VOCAB rows, heads 1..15 HEAD_VOCAB rows each
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         CODEC_VOCAB + jnp.arange(n - 1, dtype=jnp.int32) * HEAD_VOCAB]
    )
    flat = (codes + offsets[None, None, :]).reshape(b, t * n)
    emb = params["voc_code_embed"][flat].reshape(b, t, n * 16)
    x = emb.transpose(0, 2, 1).astype(jnp.float32)  # [B, 16n, T]
    x = _causal_conv(x, params["voc_in"]["w"], params["voc_in"]["b"], 1)
    for i, bp in enumerate(params["voc_blocks"]):
        dilation = 2 ** (i % 4)
        x = x + jax.nn.gelu(_causal_conv(x, bp["w"], bp["b"], dilation))
    wave = _causal_conv(x, params["voc_out"]["w"], params["voc_out"]["b"], 1)
    # [B, 1920, T] → [B, T*1920]
    return jnp.tanh(wave).transpose(0, 2, 1).reshape(b, t * SAMPLES_PER_FRAME)
