"""Jitted Qwen3-TTS generation loop.

Reference: Sources/TTSKit/Qwen3TTS/Qwen3GenerateTask.swift — prefill
(:233-317) and the generation hot loop (:326-520): sample codec-0 (top-k,
repetition penalty, suppress set [2048,3072) except EOS,
Qwen3Models.swift:76-82) → 15-head code predictor → next decoder input =
SUM of all 16 code embeddings + trailing text-token embedding (textPAD once
text is exhausted) (:421-448), stopping on EOS / maxNewTokens / the
8x-prompt step cap (:370 maxStepsByPrefill). The reference pays one CoreML
call per component per frame; here the whole frame loop (decoder step +
codec0 sampling + the 16-step code-predictor transformer) is one
`lax.while_loop`, and the vocoder runs as a separate batched call
(models/qwen3_tts.py `speech_decoder_forward`).

Sampling matches TTSKit/Utilities/Sampling.swift: seeded top-k with
CTRL-style repetition penalty over the generated code0 history (:54,98).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperkit_tpu.models.qwen3_tts import (
    CODEC_BOS,
    CODEC_EOS,
    CODEC_VOCAB,
    SUPPRESS_BEGIN,
    SUPPRESS_END,
    Qwen3TTSDims,
    code_decoder_forward,
    init_code_kv_cache,
    multicode_forward,
)

# codec-0 ids suppressed during sampling (Qwen3Models.swift:76-82): the
# control range [2048, 3072) except EOS — this covers PAD/BOS/think ids and
# the speaker/language control tokens.
_SUPPRESS = np.zeros((CODEC_VOCAB,), np.float32)
_SUPPRESS[SUPPRESS_BEGIN:SUPPRESS_END] = -np.inf
_SUPPRESS[CODEC_EOS] = 0.0


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


class TTSGenState(NamedTuple):
    """Resumable generation state: everything a segment needs to continue.

    Enables TRUE streaming synthesis (the reference's `.stream` playback
    strategy): generate N frames → vocode+play the block → resume — TTFB is
    one prefill + one short segment instead of the full utterance.
    """

    step: jnp.ndarray  # scalar: frames generated so far
    bos_slot: jnp.ndarray  # scalar: cache slot of the last prompt position
    # (firstText + codecBOS — Qwen3GenerateTask.swift:210 variableEmbed)
    kv: tuple
    logits: jnp.ndarray  # [B, 1, V] last decoder logits
    hidden: jnp.ndarray  # [B, 1, D] last decoder hidden
    counts: jnp.ndarray  # [B, CODEC_VOCAB] repetition-penalty history
    done: jnp.ndarray  # [B]
    key: jnp.ndarray
    prompt_pad: jnp.ndarray  # [B]
    key_invalid: jnp.ndarray  # [B, S]
    trailing_text: jnp.ndarray  # [B, TT] text tokens fed one per frame,
    # textPAD-padded (Qwen3GenerateTask.swift:217 trailingTextTokens)
    step_cap: jnp.ndarray  # [B] per-row frame budget (8x prompt rule)


@functools.partial(
    jax.jit, static_argnames=("dims", "max_seq", "cached_len")
)
def tts_prefill_state(
    params,
    prompt_embeds: jnp.ndarray,  # [B, P, D] combined text+codec track embeds
    # ending with the variable position (firstText + codecBOS)
    trailing_text: jnp.ndarray,  # [B, TT] i32, textPAD-padded
    step_cap: jnp.ndarray,  # [B] i32
    rng_key,
    *,
    dims: Qwen3TTSDims,
    max_seq: int,
    cached_kv=None,  # (k, v) prefix snapshot from tts_prefill, batch 1
    cached_len: int = 0,
    prompt_pad=None,  # [B] left-pad counts within prompt_embeds
) -> TTSGenState:
    """Prefill the combined dual-track prompt (+restore cached prefix)."""
    b, p, d = prompt_embeds.shape
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
            cached_kv[0][:, :1, :, :cached_len],
            (dims.n_layer, b, dims.n_kv_head, cached_len, dims.head_dim),
        ).astype(kv_k.dtype)
        cv = jnp.broadcast_to(
            cached_kv[1][:, :1, :, :cached_len],
            (dims.n_layer, b, dims.n_kv_head, cached_len, dims.head_dim),
        ).astype(kv_v.dtype)
        kv_k = jax.lax.dynamic_update_slice(kv_k, ck, (0, 0, 0, 0, 0))
        kv_v = jax.lax.dynamic_update_slice(kv_v, cv, (0, 0, 0, 0, 0))

    # prefill the combined prompt (after any cached prefix); rotary
    # positions shift left by the pad count so real tokens keep contiguous
    # logical positions. The prompt's last position is the variable token
    # (firstText + codecBOS), so its logits start the frame loop.
    logits, hidden, (kv_k, kv_v) = code_decoder_forward(
        params, prompt_embeds.astype(kv_k.dtype), cached_len, kv_k, kv_v, dims,
        rope_offset=cached_len - prompt_pad, key_invalid=key_invalid,
    )
    return TTSGenState(
        step=jnp.asarray(0, jnp.int32),
        bos_slot=jnp.asarray(cached_len + p - 1, jnp.int32),
        kv=(kv_k, kv_v),
        logits=logits[:, -1:],
        hidden=hidden[:, -1:],
        counts=jnp.zeros((b, CODEC_VOCAB), jnp.int32),
        done=jnp.zeros((b,), bool),
        key=rng_key,
        prompt_pad=prompt_pad,
        key_invalid=key_invalid,
        trailing_text=trailing_text.astype(jnp.int32),
        step_cap=step_cap.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("dims", "n_frames", "top_k"))
def tts_generate_segment(
    params,
    state: TTSGenState,
    scalars: TTSScalars,
    *,
    dims: Qwen3TTSDims,
    n_frames: int,
    top_k: int = 50,
) -> tuple[jnp.ndarray, TTSGenState]:
    """Generate up to n_frames more frames; resumable via the new state."""
    b = state.counts.shape[0]
    codes = jnp.full((b, n_frames, 16), CODEC_EOS, jnp.int32)
    bos_slot = state.bos_slot
    prompt_pad = state.prompt_pad
    key_invalid = state.key_invalid
    tt = state.trailing_text.shape[1]
    suppress = jnp.asarray(_SUPPRESS)

    def cond(carry):
        i, _, st = carry
        return (i < n_frames) & ~jnp.all(st.done)

    def body(carry):
        i, codes, st = carry
        kv_k, kv_v = st.kv
        lg = st.logits[:, -1] + suppress[None, :]  # [B, V]
        lg = apply_repetition_penalty(lg, st.counts, scalars.repetition_penalty)

        key, k0, kmc = jax.random.split(st.key, 3)
        top_vals, top_idx = jax.lax.top_k(lg, top_k)
        choice = jax.random.categorical(
            k0, top_vals / jnp.maximum(scalars.temperature, 1e-4)
        )
        sampled = jnp.take_along_axis(top_idx, choice[:, None], 1)[:, 0]
        greedy = jnp.argmax(lg, -1)
        code0 = jnp.where(scalars.temperature > 0, sampled, greedy).astype(jnp.int32)
        code0 = jnp.where(st.done, CODEC_EOS, code0)
        done = st.done | (code0 == CODEC_EOS) | (st.step + 1 >= st.step_cap)
        counts = st.counts.at[jnp.arange(b), code0].add(1)

        # 15 RVQ heads via the code-predictor transformer; codec_sum is the
        # sum of all 16 code embeddings (the backbone's next codec track)
        mc, codec_sum = multicode_forward(
            params, st.hidden[:, -1], code0, kmc, scalars.temperature,
            top_k=5, dims=dims,
        )  # [B, 15], [B, D]
        frame = jnp.concatenate([code0[:, None], mc], axis=1)  # [B, 16]
        frame = jnp.where(done[:, None] & (code0 == CODEC_EOS)[:, None], CODEC_EOS, frame)
        codes = jax.lax.dynamic_update_slice(codes, frame[:, None, :], (0, i, 0))

        # next decoder input: codec hidden sum + trailing text embedding
        # (Qwen3GenerateTask.swift:421-448; textPAD once text is exhausted)
        t_idx = jnp.minimum(st.step, tt - 1)
        text_tok = jax.lax.dynamic_slice_in_dim(st.trailing_text, t_idx, 1, 1)[:, 0]
        text_emb = params["text_embed"][text_tok].astype(codec_sum.dtype)
        nxt = (codec_sum + text_emb)[:, None].astype(kv_k.dtype)
        slot = bos_slot + 1 + st.step
        logits, hidden, (kv_k, kv_v) = code_decoder_forward(
            params, nxt, slot, kv_k, kv_v, dims,
            rope_offset=slot - prompt_pad, key_invalid=key_invalid,
        )
        new_state = st._replace(
            step=st.step + 1, kv=(kv_k, kv_v), logits=logits, hidden=hidden,
            counts=counts, done=done, key=key,
        )
        return (i + 1, codes, new_state)

    _, codes, state = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), codes, state))
    return codes, state


@functools.partial(
    jax.jit,
    static_argnames=("dims", "max_new_tokens", "top_k", "max_seq", "cached_len"),
)
def tts_generate_loop(
    params,
    prompt_embeds: jnp.ndarray,  # [B, P, D] combined dual-track embeds
    scalars: TTSScalars,
    *,
    dims: Qwen3TTSDims,
    max_new_tokens: int,
    top_k: int = 50,
    max_seq: int = 0,
    cached_kv=None,
    cached_len: int = 0,
    prompt_pad=None,  # [B] left-pad counts within prompt_embeds
    trailing_text=None,  # [B, TT] i32; defaults to all-textPAD
    step_cap=None,  # [B] i32; defaults to max_new_tokens
) -> TTSLoopOutput:
    b, p, d = prompt_embeds.shape
    total = cached_len + p + max_new_tokens + 1
    max_seq = max_seq or total
    if trailing_text is None:
        trailing_text = jnp.full((b, 1), dims.text_pad, jnp.int32)
    if step_cap is None:
        step_cap = jnp.full((b,), max_new_tokens, jnp.int32)
    state = tts_prefill_state(
        params, prompt_embeds, trailing_text, step_cap, scalars.rng_key,
        dims=dims, max_seq=max_seq,
        cached_kv=cached_kv, cached_len=cached_len, prompt_pad=prompt_pad,
    )
    codes, state = tts_generate_segment(
        params, state, scalars, dims=dims, n_frames=max_new_tokens, top_k=top_k
    )
    n_frames = (codes[:, :, 0] != CODEC_EOS).sum(axis=1)
    return TTSLoopOutput(codes=codes, n_frames=n_frames, kv=state.kv, length=state.step)


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
