"""Jitted Qwen3-TTS generation loop.

Reference: Sources/TTSKit/Qwen3TTS/Qwen3GenerateTask.swift — prefill
(:233-317) and the generation hot loop (:326-520): sample codec-0 (top-k,
repetition penalty, suppress set) → embed → 15 RVQ heads → next decoder
step, stopping on EOS / cache-full / maxNewTokens. The reference pays one
CoreML call per component per frame; here the whole frame loop (decoder
step + codec0 sampling + repetition-penalty bookkeeping + 15-head scan) is
one `lax.while_loop`, and the vocoder runs as a separate batched call
(models/qwen3_tts.py `speech_decoder_forward`).

Sampling matches TTSKit/Utilities/Sampling.swift: seeded top-k with
CTRL-style repetition penalty over the generated code0 history (:54,98).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from whisperkit_tpu.models.qwen3_tts import (
    CODEC_BOS,
    CODEC_EOS,
    CODEC_VOCAB,
    Qwen3TTSDims,
    code_decoder_forward,
    init_code_kv_cache,
    multicode_forward,
)


class TTSScalars(NamedTuple):
    temperature: jnp.ndarray  # f32
    repetition_penalty: jnp.ndarray  # f32 (1.0 = off)
    rng_key: jnp.ndarray


class TTSLoopOutput(NamedTuple):
    codes: jnp.ndarray  # [B, MAX, 16] int32 (code0 + 15 heads), EOS-padded
    n_frames: jnp.ndarray  # [B] frames generated per row (before EOS)
    kv: tuple  # final KV cache (for prompt caching)
    length: jnp.ndarray  # scalar final position


def apply_repetition_penalty(logits, counts, penalty):
    """CTRL-style: seen tokens' logits are divided (if >0) or multiplied
    (if <0) by the penalty. Reference: Sampling.swift:54-96."""
    seen = counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


@functools.partial(
    jax.jit,
    static_argnames=("dims", "max_new_tokens", "top_k", "max_seq", "cached_len"),
)
def tts_generate_loop(
    params,
    prompt_embeds: jnp.ndarray,  # [B, P, D] text-projector output
    scalars: TTSScalars,
    *,
    dims: Qwen3TTSDims,
    max_new_tokens: int,
    top_k: int = 50,
    max_seq: int = 0,
    cached_kv=None,  # (k, v) prefix snapshot from tts_prefill, batch 1
    cached_len: int = 0,
    prompt_pad=None,  # [B] left-pad counts within prompt_embeds
) -> TTSLoopOutput:
    b, p, d = prompt_embeds.shape
    total = cached_len + p + max_new_tokens + 1
    max_seq = max_seq or total
    kv_k, kv_v = init_code_kv_cache(dims, b, max_seq)
    if prompt_pad is None:
        prompt_pad = jnp.zeros((b,), jnp.int32)
    # pad slots sit right after any cached prefix: [cached_len, cached_len+pad)
    slot_idx = jnp.arange(max_seq)[None, :]
    key_invalid = (slot_idx >= cached_len) & (
        slot_idx < cached_len + prompt_pad[:, None]
    )
    if cached_kv is not None and cached_len > 0:
        # restore the voice/lang/instruction prefix KV (reference:
        # Qwen3GenerateTask.swift:233-317 "restore KV snapshot"); broadcast
        # the batch-1 snapshot to all rows
        ck = jnp.broadcast_to(
            cached_kv[0][:, :1, :, :cached_len], (dims.n_layer, b, dims.n_kv_head, cached_len, dims.head_dim)
        ).astype(kv_k.dtype)
        cv = jnp.broadcast_to(
            cached_kv[1][:, :1, :, :cached_len], (dims.n_layer, b, dims.n_kv_head, cached_len, dims.head_dim)
        ).astype(kv_v.dtype)
        kv_k = jax.lax.dynamic_update_slice(kv_k, ck, (0, 0, 0, 0, 0))
        kv_v = jax.lax.dynamic_update_slice(kv_v, cv, (0, 0, 0, 0, 0))

    # prefill text prompt (after any cached prefix), then feed codec BOS;
    # rotary positions shift left by the pad count so real tokens keep
    # contiguous logical positions
    _, _, (kv_k, kv_v) = code_decoder_forward(
        params, prompt_embeds.astype(kv_k.dtype), cached_len, kv_k, kv_v, dims,
        rope_offset=cached_len - prompt_pad, key_invalid=key_invalid,
    )
    p = cached_len + p  # cache slot of BOS
    bos_embed = params["code_embed"][jnp.full((b, 1), CODEC_BOS)]
    logits, hidden, (kv_k, kv_v) = code_decoder_forward(
        params, bos_embed.astype(kv_k.dtype), p, kv_k, kv_v, dims,
        rope_offset=p - prompt_pad, key_invalid=key_invalid,
    )

    codes = jnp.full((b, max_new_tokens, 16), CODEC_EOS, jnp.int32)
    counts = jnp.zeros((b, CODEC_VOCAB), jnp.int32)

    def cond(state):
        step, done = state[0], state[5]
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, codes, counts, (kv_k, kv_v), (logits, hidden), done, key = state

        lg = logits[:, -1]  # [B, V]
        lg = apply_repetition_penalty(lg, counts, scalars.repetition_penalty)
        # suppress BOS (never re-emitted)
        lg = lg.at[:, CODEC_BOS].set(-jnp.inf)

        key, k0, kmc = jax.random.split(key, 3)
        top_vals, top_idx = jax.lax.top_k(lg, top_k)
        choice = jax.random.categorical(
            k0, top_vals / jnp.maximum(scalars.temperature, 1e-4)
        )
        sampled = jnp.take_along_axis(top_idx, choice[:, None], 1)[:, 0]
        greedy = jnp.argmax(lg, -1)
        code0 = jnp.where(scalars.temperature > 0, sampled, greedy).astype(jnp.int32)
        code0 = jnp.where(done, CODEC_EOS, code0)
        done = done | (code0 == CODEC_EOS)

        counts = counts.at[jnp.arange(b), code0].add(1)

        # 15 RVQ heads from the frame hidden state
        mc = multicode_forward(
            params, hidden[:, -1], kmc, scalars.temperature, top_k=5
        )  # [B, 15]
        frame = jnp.concatenate([code0[:, None], mc], axis=1)  # [B, 16]
        frame = jnp.where(done[:, None], CODEC_EOS, frame)
        codes = jax.lax.dynamic_update_slice(codes, frame[:, None, :], (0, step, 0))

        # next decoder input: code0 embedding + mean multicode embedding
        c0e = params["code_embed"][code0]
        from whisperkit_tpu.models.qwen3_tts import HEAD_VOCAB

        mce = params["mc_embed"][
            (jnp.arange(15)[None, :] * HEAD_VOCAB + mc).reshape(-1)
        ].reshape(b, 15, -1).mean(1)
        nxt = (c0e + mce)[:, None].astype(kv_k.dtype)
        logits, hidden, (kv_k, kv_v) = code_decoder_forward(
            params, nxt, p + 1 + step, kv_k, kv_v, dims,
            rope_offset=p + 1 + step - prompt_pad, key_invalid=key_invalid,
        )
        return (step + 1, codes, counts, (kv_k, kv_v), (logits, hidden), done, key)

    state = (
        jnp.asarray(0, jnp.int32),
        codes,
        counts,
        (kv_k, kv_v),
        (logits, hidden),
        jnp.zeros((b,), bool),
        scalars.rng_key,
    )
    step, codes, _, kv, _, done, _ = jax.lax.while_loop(cond, body, state)

    n_frames = (codes[:, :, 0] != CODEC_EOS).sum(axis=1)
    return TTSLoopOutput(codes=codes, n_frames=n_frames, kv=kv, length=step)


@functools.partial(jax.jit, static_argnames=("dims", "max_seq"))
def tts_prefill(
    params,
    prompt_embeds: jnp.ndarray,  # [B, P, D]
    *,
    dims: Qwen3TTSDims,
    max_seq: int,
):
    """Prefill only — produces the KV snapshot for the prompt cache.

    Reference: TTSKit.swift `buildPromptCache` (:609-683).
    """
    kv_k, kv_v = init_code_kv_cache(dims, prompt_embeds.shape[0], max_seq)
    _, _, kv = code_decoder_forward(
        params, prompt_embeds.astype(kv_k.dtype), 0, kv_k, kv_v, dims
    )
    return kv
