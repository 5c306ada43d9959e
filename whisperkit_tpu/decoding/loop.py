"""The jitted Whisper decode loop — everything on-device.

Reference: Sources/WhisperKit/Core/TextDecoder.swift `decodeText` (:541-855).
The reference pays one host↔ANE round trip per token (predict → host filters
→ host sample → host KV scatter). Here the entire token loop — decoder step,
logits filters, sampling, KV update, stop checks — is a single
`lax.while_loop` inside one jitted function, so a 30 s window costs one
dispatch regardless of token count (SURVEY.md §7 "hard parts").

Batching: every function here is batched over B windows (the reference's
TaskGroup of batch-of-1 decodes, WhisperKit.swift:741-805, becomes a real
batch dimension feeding the MXU). Per-row `done` masks handle heterogeneous
finish times.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisperkit_tpu.decoding.filters import (
    apply_suppress_blank,
    apply_timestamp_rules,
)
from whisperkit_tpu.decoding.sampler import sample_token
from whisperkit_tpu.models.whisper import (
    WhisperDims,
    compute_cross_kv,
    decoder_forward,
    encoder_forward,
)
from whisperkit_tpu.text.tokenizer import SpecialTokens


class DecodeScalars(NamedTuple):
    """Per-call traced scalars — changing these does NOT recompile."""

    temperature: jnp.ndarray  # f32
    max_initial_timestamp_index: jnp.ndarray  # i32 (timestamp-token offset cap)
    first_token_logprob_threshold: jnp.ndarray  # f32 (-inf disables)
    rng_key: jnp.ndarray


class DecodeLoopOutput(NamedTuple):
    tokens: jnp.ndarray  # [B, TOTAL] i32 (prompt + sampled, EOT-padded)
    token_logprobs: jnp.ndarray  # [B, TOTAL] f32 (0 in prompt region)
    length: jnp.ndarray  # scalar i32: final write position (max over rows)
    no_speech_prob: jnp.ndarray  # [B] f32
    alignment: Optional[jnp.ndarray]  # [TOTAL, B, A, 1500] f32 or None


class DecodeState(NamedTuple):
    """Resumable mid-window decode state — one jitted segment advances it
    by ≤ n_steps tokens, so the host can check cancellation/progress every
    K tokens instead of only at window boundaries (the reference's
    per-token TranscriptionCallback granularity, Models.swift:643-728,
    recovered at segment granularity)."""

    pos: jnp.ndarray  # scalar i32: next write index
    tokens: jnp.ndarray  # [B, TOTAL]
    token_logprobs: jnp.ndarray  # [B, TOTAL]
    kv_k: jnp.ndarray
    kv_v: jnp.ndarray
    done: jnp.ndarray  # [B]
    last_logits: jnp.ndarray  # [B, V]
    key: jnp.ndarray
    align: jnp.ndarray  # [TOTAL, B, A, F] or the uncarried placeholder


class PrefillState(NamedTuple):
    """Prompt-pass results, reusable across the temperature-fallback ladder.

    The prefill (prompt forward pass) involves no sampling, so every rung of
    the ladder (TranscribeTask.swift:316-411) and any same-window re-decode
    can reuse it — the DecodingCache idea (Models.swift:325-339) made sound
    for Whisper: KV CANNOT be reused across *windows* (each decoder layer
    cross-attends to the window's encoder output), but within a window it is
    temperature-independent.
    """

    kv_k: jnp.ndarray  # [L, B, H, TOTAL, Dh] with prompt rows filled
    kv_v: jnp.ndarray
    last_logits: jnp.ndarray  # [B, V] logits at the last prompt position
    no_speech_prob: jnp.ndarray  # [B]
    align_prefix: Optional[jnp.ndarray]  # [P, B, A, 1500] or None


@functools.partial(jax.jit, static_argnames=("dims", "quantize_kv", "act8"))
def encode_window(
    params,
    mel: jnp.ndarray,
    dims: WhisperDims,
    quantize_kv: bool = False,
    act8: bool = False,
):
    """mel [B, n_mels, 3000] → (enc_out [B,1500,D], cross_k, cross_v).

    Split from the decode loop so the temperature-fallback ladder
    (TranscribeTask.swift:316-411) re-decodes without re-encoding.

    `quantize_kv=True` emits the int8 {"q8","scale"} cross-KV directly via
    the per-layer fused project+quantize (models/whisper.
    compute_cross_kv_quantized): at most ONE layer's bf16 K/V ever exists,
    so the ~8 GB whole-batch bf16 copy (large-v3 b=32) never materializes
    at all — this is what fits 32-window groups on one 16 GB v5e.

    `act8=True` (the "w8a8" scheme) runs int8-quantized encoder linears as
    int8×int8 MXU dots — models/whisper.encoder_forward.
    """
    enc_out = encoder_forward(params, mel, dims, act8=act8)
    if quantize_kv:
        from whisperkit_tpu.models.whisper import compute_cross_kv_quantized

        cross_k, cross_v = compute_cross_kv_quantized(params, enc_out, dims)
    else:
        cross_k, cross_v = compute_cross_kv(params, enc_out, dims)
    return enc_out, cross_k, cross_v


def _gather_alignment(cross_probs, align_heads: np.ndarray):
    """cross_probs [L,B,H,T,F] → [T,B,A,F] for the static (layer, head) pairs."""
    sel = cross_probs[align_heads[:, 0], :, align_heads[:, 1]]  # [A,B,T,F]
    return sel.transpose(2, 1, 0, 3)


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims",
        "special",
        "sample_begin",
        "max_new_tokens",
        "sot_index",
        "alignment_heads",
        "quantize_self_kv",
    ),
)
def prefill_window(
    params,
    cross_k,
    cross_v,
    prompt: jnp.ndarray,  # [B, P] i32
    *,
    dims: WhisperDims,
    special: SpecialTokens,
    sample_begin: int,
    max_new_tokens: int,
    sot_index: int,
    alignment_heads: Optional[tuple] = None,
    quantize_self_kv: bool = False,
) -> PrefillState:
    """Run the prompt through the decoder once; see PrefillState.

    `quantize_self_kv=True` allocates the self-attention cache in the int8
    per-token-scale form (models/whisper._self_kv_write quantizes rows at
    write time; _attend reads them with int8×int8 dots) — halves the
    per-step self-KV HBM read, which is 35% of the b=32 serving step
    (docs/BENCHMARKS.md r5 attribution). Opt-in serving mode like the int8
    cross-KV."""
    b, p = prompt.shape
    assert p == sample_begin
    total = sample_begin + max_new_tokens
    capture = alignment_heads is not None

    kv_shape = (dims.n_text_layer, b, dims.n_text_head, total, dims.head_dim)
    kv_dtype = params["decoder"]["token_embed"].dtype
    if quantize_self_kv:
        kv_k = {
            "q8": jnp.zeros(kv_shape, jnp.int8),
            "scale": jnp.zeros(kv_shape[:-1] + (1,), jnp.float32),
        }
        kv_v = jax.tree.map(jnp.copy, kv_k)
    else:
        kv_k = jnp.zeros(kv_shape, kv_dtype)
        kv_v = jnp.zeros(kv_shape, kv_dtype)

    logits, (kv_k, kv_v), cross_probs = decoder_forward(
        params, prompt, 0, kv_k, kv_v, cross_k, cross_v, dims,
        capture_alignment=capture,
    )
    no_speech_prob = jax.nn.softmax(logits[:, sot_index], axis=-1)[:, special.nospeech]
    align_prefix = (
        _gather_alignment(cross_probs, np.asarray(alignment_heads, np.int32))
        if capture
        else None
    )
    return PrefillState(kv_k, kv_v, logits[:, -1], no_speech_prob, align_prefix)


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims",
        "sample_begin",
        "max_new_tokens",
        "top_k",
        "sot_index",
        "use_timestamp_rules",
        "suppress_blank",
        "special",
        "alignment_heads",
        "ablate",
        "quantize_self_kv",
    ),
)
def decode_loop(
    params,
    cross_k,  # [L, B, H, 1500, Dh]
    cross_v,
    prompt: jnp.ndarray,  # [B, P] i32
    suppress_bias: jnp.ndarray,  # [V] f32 additive
    scalars: DecodeScalars,
    *,
    dims: WhisperDims,
    special: SpecialTokens,
    sample_begin: int,  # == P
    max_new_tokens: int,
    top_k: int,
    sot_index: int,
    use_timestamp_rules: bool,
    suppress_blank: bool,
    alignment_heads: Optional[tuple] = None,  # tuple of (layer, head) or None
    prefill: Optional[PrefillState] = None,  # reuse across fallback rungs
    ablate: tuple = (),  # static perf-attribution switches (see
    # models/whisper.decoder_forward); "sampler" additionally reduces
    # sampling to a bare argmax. Production callers leave this empty.
    quantize_self_kv: bool = False,
) -> DecodeLoopOutput:
    b, p = prompt.shape
    assert p == sample_begin
    total = sample_begin + max_new_tokens
    n_head = dims.n_text_head
    capture = alignment_heads is not None
    heads_np = np.asarray(alignment_heads, np.int32) if capture else None

    # ---- prefill (or reuse a cached prompt pass) ----------------------------
    if prefill is None:
        prefill = prefill_window(
            params, cross_k, cross_v, prompt,
            dims=dims, special=special, sample_begin=sample_begin,
            max_new_tokens=max_new_tokens, sot_index=sot_index,
            alignment_heads=alignment_heads, quantize_self_kv=quantize_self_kv,
        )
    kv_k, kv_v = prefill.kv_k, prefill.kv_v
    no_speech_prob = prefill.no_speech_prob
    last_logits = prefill.last_logits

    state = _init_decode_state(
        prompt, prefill, cross_k, scalars.rng_key,
        special=special, max_new_tokens=max_new_tokens,
        alignment_heads=alignment_heads,
    )
    state = decode_segment(
        params, cross_k, cross_v, suppress_bias, scalars, state,
        dims=dims, special=special, sample_begin=sample_begin, total=total,
        n_steps=max_new_tokens, top_k=top_k,
        use_timestamp_rules=use_timestamp_rules, suppress_blank=suppress_blank,
        alignment_heads=alignment_heads, ablate=ablate,
    )
    return DecodeLoopOutput(
        tokens=state.tokens,
        token_logprobs=state.token_logprobs,
        length=state.pos,
        no_speech_prob=no_speech_prob,
        alignment=state.align if capture else None,
    )


def _init_decode_state(
    prompt, prefill: PrefillState, cross_k, rng_key, *, special, max_new_tokens,
    alignment_heads,
) -> DecodeState:
    b, p = prompt.shape
    total = p + max_new_tokens
    capture = alignment_heads is not None
    tokens = jnp.concatenate(
        [prompt.astype(jnp.int32), jnp.full((b, max_new_tokens), special.eot, jnp.int32)],
        axis=1,
    )
    if capture:
        # int8 cross-KV arrives as a {"q8","scale"} dict (ops/quant.py)
        ck_frames = (
            cross_k["q8"].shape[3] if isinstance(cross_k, dict) else cross_k.shape[3]
        )
        align = jnp.zeros((total, b, len(alignment_heads), ck_frames), jnp.float32)
        align = jax.lax.dynamic_update_slice(
            align, prefill.align_prefix, (0, 0, 0, 0)
        )
    else:
        align = jnp.zeros((1, 1, 1, 1), jnp.float32)  # placeholder, uncarried shape
    return DecodeState(
        pos=jnp.asarray(p, jnp.int32),
        tokens=tokens,
        token_logprobs=jnp.zeros((b, total), jnp.float32),
        kv_k=prefill.kv_k,
        kv_v=prefill.kv_v,
        done=jnp.zeros((b,), bool),
        last_logits=prefill.last_logits,
        key=rng_key,
        align=align,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "special", "sample_begin", "total", "n_steps", "top_k",
        "use_timestamp_rules", "suppress_blank", "alignment_heads", "ablate",
    ),
)
def decode_segment(
    params,
    cross_k,
    cross_v,
    suppress_bias: jnp.ndarray,
    scalars: DecodeScalars,
    state: DecodeState,
    *,
    dims: WhisperDims,
    special: SpecialTokens,
    sample_begin: int,
    total: int,
    n_steps: int,
    top_k: int,
    use_timestamp_rules: bool,
    suppress_blank: bool,
    alignment_heads: Optional[tuple] = None,
    ablate: tuple = (),
) -> DecodeState:
    """Advance the decode while_loop by ≤ n_steps tokens (resumable)."""
    b = state.tokens.shape[0]
    capture = alignment_heads is not None
    heads_np = np.asarray(alignment_heads, np.int32) if capture else None
    seg_end = jnp.minimum(state.pos + n_steps, total)

    def apply_filters(logits_f, tokens_buf, pos):
        logits_f = logits_f + suppress_bias[None, :]
        at_begin = pos == sample_begin
        if suppress_blank:
            logits_f = apply_suppress_blank(logits_f, special, at_begin)
        if use_timestamp_rules:
            logits_f = apply_timestamp_rules(
                logits_f, tokens_buf, pos, sample_begin, special,
                scalars.max_initial_timestamp_index,
            )
        return logits_f

    def cond(st: DecodeState):
        return (st.pos < seg_end) & ~jnp.all(st.done)

    def body(st: DecodeState):
        pos, tokens, tlp = st.pos, st.tokens, st.token_logprobs
        kv_k, kv_v, done, key, align = st.kv_k, st.kv_v, st.done, st.key, st.align

        filtered = apply_filters(st.last_logits, tokens, pos)
        key, sub = jax.random.split(key)
        if "sampler" in ablate:  # perf attribution: bare argmax
            token = jnp.argmax(filtered, -1).astype(jnp.int32)
            logprob = jnp.zeros((b,), jnp.float32)
        else:
            token, logprob = sample_token(filtered, scalars.temperature, sub, top_k)

        # stop checks (reference TextDecoder.swift:662-678): EOT, context cap
        # (loop bound), first-token logprob floor.
        first_fail = (pos == sample_begin) & (
            logprob < scalars.first_token_logprob_threshold
        )
        token = jnp.where(done | first_fail, special.eot, token)
        logprob = jnp.where(done | first_fail, 0.0, logprob)

        tokens = jax.lax.dynamic_update_slice(tokens, token[:, None], (0, pos))
        tlp = jax.lax.dynamic_update_slice(tlp, logprob[:, None], (0, pos))
        done = done | first_fail | (token == special.eot)

        logits, (kv_k, kv_v), cross_probs = decoder_forward(
            params, token[:, None], pos, kv_k, kv_v, cross_k, cross_v, dims,
            capture_alignment=capture, ablate=ablate,
        )
        if capture:
            align = jax.lax.dynamic_update_slice(
                align, _gather_alignment(cross_probs, heads_np), (pos, 0, 0, 0)
            )
        return DecodeState(
            pos + 1, tokens, tlp, kv_k, kv_v, done, logits[:, -1], key, align
        )

    return jax.lax.while_loop(cond, body, state)


def decode_loop_segmented(
    params,
    cross_k,
    cross_v,
    prompt: jnp.ndarray,
    suppress_bias: jnp.ndarray,
    scalars: DecodeScalars,
    *,
    dims: WhisperDims,
    special: SpecialTokens,
    sample_begin: int,
    max_new_tokens: int,
    top_k: int,
    sot_index: int,
    use_timestamp_rules: bool,
    suppress_blank: bool,
    alignment_heads: Optional[tuple] = None,
    prefill: Optional[PrefillState] = None,
    segment_tokens: int = 32,
    should_stop=None,  # host callable () -> bool, polled between segments
    compact: bool = False,
    quantize_self_kv: bool = False,
) -> DecodeLoopOutput:
    """decode_loop with HOST checkpoints every `segment_tokens` tokens.

    Recovers the reference's mid-window cancellation (EarlyStopActor via
    TranscriptionCallback, Models.swift:643-728, TextDecoder.swift:733-756)
    at ~segment granularity: between jitted segments the host polls
    `should_stop` and breaks out, abandoning at most segment_tokens of
    work. All segments share ONE compiled shape per batch size (the
    in-graph bound is min(pos + n, total)). Cancelled rows keep the tokens
    decoded so far (the buffer is EOT-padded).

    With `compact=True`, finished rows stop burning compute: whenever the
    active rows fit in half the batch, the state (KV, cross-KV, buffers)
    is gathered down to the next power-of-two batch — real speech finishes
    at ~50-80 of 224 tokens, so the slowest row no longer sets everyone's
    cost (VERDICT r2 weak #2). Each halved size compiles once."""
    total = sample_begin + max_new_tokens
    capture = alignment_heads is not None
    if prefill is None:
        prefill = prefill_window(
            params, cross_k, cross_v, prompt,
            dims=dims, special=special, sample_begin=sample_begin,
            max_new_tokens=max_new_tokens, sot_index=sot_index,
            alignment_heads=alignment_heads, quantize_self_kv=quantize_self_kv,
        )
    state = _init_decode_state(
        prompt, prefill, cross_k, scalars.rng_key,
        special=special, max_new_tokens=max_new_tokens,
        alignment_heads=alignment_heads,
    )
    b0 = prompt.shape[0]
    # rows[i] = original index of current row i; None entries = pad rows
    rows: list[Optional[int]] = list(range(b0))
    # per-original-row final host buffers, filled when a row is compacted
    # out (or at the end)
    final_tokens = np.empty((b0, total), np.int32)
    final_tlp = np.empty((b0, total), np.float32)
    align_store: dict[int, np.ndarray] = {}

    def bank_many(pairs: list[tuple[int, int]], st: DecodeState) -> None:
        """pairs = [(current_row, original_row)]. One batched host pull per
        sweep — per-row pulls would pay the tunnel RTT (~5-10 ms) each."""
        if not pairs:
            return
        cur = [c for c, _ in pairs]
        tok = np.asarray(jnp.take(st.tokens, jnp.asarray(cur), axis=0))
        tlp = np.asarray(jnp.take(st.token_logprobs, jnp.asarray(cur), axis=0))
        al = (
            np.asarray(jnp.take(st.align, jnp.asarray(cur), axis=1))
            if capture
            else None
        )
        for j, (_, orig) in enumerate(pairs):
            final_tokens[orig] = tok[j]
            final_tlp[orig] = tlp[j]
            if capture:
                align_store[orig] = al[:, j]

    n_segments = -(-max_new_tokens // segment_tokens)
    for seg in range(n_segments):
        state = decode_segment(
            params, cross_k, cross_v, suppress_bias, scalars, state,
            dims=dims, special=special, sample_begin=sample_begin,
            total=total, n_steps=segment_tokens, top_k=top_k,
            use_timestamp_rules=use_timestamp_rules,
            suppress_blank=suppress_blank, alignment_heads=alignment_heads,
        )
        done_np = np.asarray(state.done)
        if done_np.all():
            break
        if should_stop is not None and should_stop():
            break
        if not compact or seg >= n_segments - 2:
            continue
        active = [i for i, r in enumerate(rows) if r is not None and not done_np[i]]
        b_cur = len(rows)
        b_new = max(1, 1 << (len(active) - 1).bit_length()) if active else 1
        if b_new > b_cur // 2:
            continue
        # bank finished rows' buffers, then gather the active subset
        # (padded to b_new by repeating row 0 with done=True)
        bank_many(
            [(i, r) for i, r in enumerate(rows) if r is not None and done_np[i]],
            state,
        )
        idx = active + [active[0]] * (b_new - len(active))
        gather = jnp.asarray(idx, jnp.int32)

        def take1(x):  # batch axis 0
            return jnp.take(x, gather, axis=0)

        state = DecodeState(
            pos=state.pos,
            tokens=take1(state.tokens),
            token_logprobs=take1(state.token_logprobs),
            kv_k=jax.tree.map(lambda x: jnp.take(x, gather, axis=1), state.kv_k),
            kv_v=jax.tree.map(lambda x: jnp.take(x, gather, axis=1), state.kv_v),
            done=take1(state.done).at[len(active):].set(True),
            last_logits=take1(state.last_logits),
            key=state.key,
            align=(
                jnp.take(state.align, gather, axis=1) if capture else state.align
            ),
        )
        cross_k = jax.tree.map(lambda x: jnp.take(x, gather, axis=1), cross_k)
        cross_v = jax.tree.map(lambda x: jnp.take(x, gather, axis=1), cross_v)
        rows = [rows[i] for i in active] + [None] * (b_new - len(active))

    if len(rows) == b0 and all(r == i for i, r in enumerate(rows)):
        # never compacted: return device arrays directly (no host detour)
        return DecodeLoopOutput(
            tokens=state.tokens,
            token_logprobs=state.token_logprobs,
            length=state.pos,
            no_speech_prob=prefill.no_speech_prob,
            alignment=state.align if capture else None,
        )
    # bank whatever is still live (pads are dropped by rows[i] is None)
    bank_many([(i, r) for i, r in enumerate(rows) if r is not None], state)
    alignment = None
    if capture:
        a0 = next(iter(align_store.values()))
        alignment = np.zeros((total, b0) + a0.shape[1:], np.float32)
        for orig, a in align_store.items():
            alignment[:, orig] = a
    return DecodeLoopOutput(
        tokens=jnp.asarray(final_tokens),
        token_logprobs=jnp.asarray(final_tlp),
        length=state.pos,
        no_speech_prob=prefill.no_speech_prob,
        alignment=jnp.asarray(alignment) if capture else None,
    )


@functools.partial(
    jax.jit, static_argnames=("dims", "alignment_heads")
)
def alignment_forward(
    params,
    cross_k,
    cross_v,
    tokens: jnp.ndarray,  # [B, T] full sequence (prompt + sampled)
    *,
    dims: WhisperDims,
    alignment_heads: tuple,
) -> jnp.ndarray:
    """One teacher-forced pass capturing alignment-head cross-attention.

    Used when the sampling loop didn't capture alignment (beam search) —
    the same strategy openai/whisper timing.py uses (a dedicated forward
    for word timestamps). Returns [T, B, A, 1500].
    """
    b, t = tokens.shape
    kv_shape = (dims.n_text_layer, b, dims.n_text_head, t, dims.head_dim)
    kv_dtype = params["decoder"]["token_embed"].dtype  # f32 on parity paths
    kv = (jnp.zeros(kv_shape, kv_dtype), jnp.zeros(kv_shape, kv_dtype))
    _, _, cross_probs = decoder_forward(
        params, tokens, 0, kv[0], kv[1], cross_k, cross_v, dims,
        capture_alignment=True,
    )
    return _gather_alignment(cross_probs, np.asarray(alignment_heads, np.int32))


@functools.partial(jax.jit, static_argnames=("dims", "special"))
def detect_language_logits(
    params, cross_k, cross_v, *, dims: WhisperDims, special: SpecialTokens
) -> jnp.ndarray:
    """One masked decode step from SOT → language probabilities [B, n_languages].

    Reference: TextDecoder.swift:420-539 `detectLanguage` with
    `LanguageLogitsFilter` (LogitsFilter.swift:245-276).
    """
    # int8 cross-KV arrives as a {"q8","scale"} dict (ops/quant.py)
    b = cross_k["q8"].shape[1] if isinstance(cross_k, dict) else cross_k.shape[1]
    total = 8  # tiny KV for a single step
    kv_shape = (dims.n_text_layer, b, dims.n_text_head, total, dims.head_dim)
    kv_dtype = params["decoder"]["token_embed"].dtype
    kv = (jnp.zeros(kv_shape, kv_dtype), jnp.zeros(kv_shape, kv_dtype))
    prompt = jnp.full((b, 1), special.sot, jnp.int32)
    logits, _, _ = decoder_forward(
        params, prompt, 0, kv[0], kv[1], cross_k, cross_v, dims
    )
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits[:, 0], special.language_begin, special.n_languages, axis=-1
    )
    return jax.nn.softmax(lang_logits, axis=-1)
