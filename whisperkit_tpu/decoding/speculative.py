"""Lossless speculative decoding: a small draft Whisper proposes k tokens,
the target verifies them in ONE T=k+1 teacher-forced pass.

No reference equivalent (exceeds scope — the reference decodes one token
per ANE call, TextDecoder.swift:573-757); this is the TPU-native latency
lever for batch-1 serving/streaming: the target's per-step cost is
dominated by reading its weights + cross-KV from HBM, so verifying k+1
positions in one pass costs barely more than one step, and a 4-layer draft
(large-v3-turbo / distil-large-v3 share large-v3's vocab and mel front
end) steps ~10× cheaper than the 32-layer target.

GREEDY-LOSSLESS by construction: a draft token is accepted iff it equals
the target's filtered argmax given the same prefix, and the first
mismatch position is replaced by the target's own choice — so the
committed sequence is EXACTLY what `decoding/loop.decode_loop` would
produce at temperature 0, for ANY draft model (tests/test_speculative.py
pins equality against an independent random draft). Quality gates, the
fallback ladder, and timestamp rules therefore behave identically.

Scope: batch 1 (per-row acceptance lengths desynchronize a shared batch
position; batched serving already saturates the MXU without speculation),
greedy rung only, no alignment capture (word-timestamp decodes take the
normal loop).

KV discipline: both models write their caches at the true token positions
during draft/verify; entries past the accepted prefix are stale but are
always overwritten before any query can attend them (queries at position q
attend keys <= q; within a round each step writes its own position before
attending it, and across rounds the next round's first write is at
pos'-1 <= the first stale position). A round's draft phase makes k+1 KV
writes (positions pos-1 .. pos+k-1): the final write covers the
full-accept case where pos advances by k+1 — without it, slot pos+k-1
would be a permanent zero hole in the draft cache
(tests/test_speculative.py::test_draft_kv_matches_target_kv).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from whisperkit_tpu.decoding.filters import (
    apply_suppress_blank,
    apply_timestamp_rules,
)
from whisperkit_tpu.decoding.loop import (
    DecodeLoopOutput,
    DecodeScalars,
    PrefillState,
    prefill_window,
)
from whisperkit_tpu.models.whisper import WhisperDims, decoder_forward
from whisperkit_tpu.text.tokenizer import SpecialTokens


class _SpecState(NamedTuple):
    pos: jnp.ndarray  # scalar i32: next position to commit
    last_token: jnp.ndarray  # [1] i32: newest committed token (at pos-1)
    tokens: jnp.ndarray  # [1, TOTAL + k + 1] (headroom for over-draft)
    token_logprobs: jnp.ndarray  # [1, TOTAL + k + 1]
    kv_t_k: jnp.ndarray  # target KV
    kv_t_v: jnp.ndarray
    kv_d_k: jnp.ndarray  # draft KV
    kv_d_v: jnp.ndarray
    done: jnp.ndarray  # [1] bool


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims",
        "draft_dims",
        "special",
        "sample_begin",
        "max_new_tokens",
        "draft_k",
        "sot_index",
        "use_timestamp_rules",
        "suppress_blank",
        "return_state",
    ),
)
def speculative_decode_loop(
    params,
    draft_params,
    cross_k,  # target cross-KV [L, 1, H, 1500, Dh] (or int8 dict)
    cross_v,
    draft_cross_k,  # draft cross-KV
    draft_cross_v,
    prompt: jnp.ndarray,  # [1, P] i32
    suppress_bias: jnp.ndarray,  # [V] f32 additive
    scalars: DecodeScalars,
    *,
    dims: WhisperDims,
    draft_dims: WhisperDims,
    special: SpecialTokens,
    sample_begin: int,
    max_new_tokens: int,
    draft_k: int = 4,
    sot_index: int = 0,
    use_timestamp_rules: bool = True,
    suppress_blank: bool = False,
    prefill: PrefillState | None = None,
    draft_prefill: PrefillState | None = None,
    return_state: bool = False,  # testing: also return the final _SpecState
) -> DecodeLoopOutput:
    """Greedy decode, bit-identical to `decode_loop(temperature=0)`."""
    b, p = prompt.shape
    assert b == 1, "speculative decoding is the batch-1 latency mode"
    assert p == sample_begin
    assert dims.n_vocab == draft_dims.n_vocab, "draft must share the vocab"
    k = draft_k
    total = sample_begin + max_new_tokens
    width = total + k + 1  # headroom so in-round writes never clamp

    if prefill is None:
        prefill = prefill_window(
            params, cross_k, cross_v, prompt,
            dims=dims, special=special, sample_begin=sample_begin,
            max_new_tokens=max_new_tokens + k + 1, sot_index=sot_index,
        )
    if draft_prefill is None:
        draft_prefill = prefill_window(
            draft_params, draft_cross_k, draft_cross_v, prompt,
            dims=draft_dims, special=special, sample_begin=sample_begin,
            max_new_tokens=max_new_tokens + k + 1, sot_index=sot_index,
        )

    tokens = jnp.concatenate(
        [
            prompt.astype(jnp.int32),
            jnp.full((1, width - p), special.eot, jnp.int32),
        ],
        axis=1,
    )

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

    def greedy(logits_f):
        token = jnp.argmax(logits_f, axis=-1).astype(jnp.int32)
        norm = jax.scipy.special.logsumexp(logits_f, axis=-1)
        lp = jnp.take_along_axis(logits_f, token[:, None], axis=1)[:, 0] - norm
        return token, lp

    state = _SpecState(
        pos=jnp.asarray(p, jnp.int32),
        last_token=prompt[:, -1].astype(jnp.int32),
        tokens=tokens,
        token_logprobs=jnp.zeros((1, width), jnp.float32),
        kv_t_k=prefill.kv_k,
        kv_t_v=prefill.kv_v,
        kv_d_k=draft_prefill.kv_k,
        kv_d_v=draft_prefill.kv_v,
        done=jnp.zeros((1,), bool),
    )

    def cond(st: _SpecState):
        return (st.pos < total) & ~jnp.all(st.done)

    def body(st: _SpecState):
        pos, tokens, tlp = st.pos, st.tokens, st.token_logprobs
        kv_d_k, kv_d_v = st.kv_d_k, st.kv_d_v

        # ---- draft phase: k greedy steps, provisional writes ---------------
        # catch-up: the draft has not processed last round's bonus token, so
        # each round starts by forwarding last_token at pos-1 (a no-op
        # rewrite of identical KV when the token was draft-accepted).
        drafts = []
        x = st.last_token
        off = pos - 1
        for i in range(k):
            logits_d, (kv_d_k, kv_d_v), _ = decoder_forward(
                draft_params, x[:, None], off + i, kv_d_k, kv_d_v,
                draft_cross_k, draft_cross_v, draft_dims,
            )
            d_i, _ = greedy(apply_filters(logits_d[:, -1], tokens, pos + i))
            tokens = jax.lax.dynamic_update_slice(
                tokens, d_i[:, None], (0, pos + i)
            )
            drafts.append(d_i)
            x = d_i
        draft_vec = jnp.stack(drafts, axis=1)  # [1, k]
        # write d_{k-1}'s K/V at pos+k-1 (logits discarded): a full-accept
        # round advances pos by k+1, so the NEXT round's writes start at
        # pos+k — without this, slot pos+k-1 would never be written and
        # every later draft query would attend a zero key, silently
        # degrading acceptance in exactly the high-α regime (r5 review
        # finding; soundness pinned by test_draft_kv_matches_target_kv)
        _, (kv_d_k, kv_d_v), _ = decoder_forward(
            draft_params, x[:, None], off + k, kv_d_k, kv_d_v,
            draft_cross_k, draft_cross_v, draft_dims,
        )

        # ---- verify phase: one T=k+1 target pass ---------------------------
        verify_in = jnp.concatenate([st.last_token[:, None], draft_vec], axis=1)
        logits_t, (kv_t_k, kv_t_v), _ = decoder_forward(
            params, verify_in, pos - 1, st.kv_t_k, st.kv_t_v,
            cross_k, cross_v, dims,
        )  # logits for positions pos .. pos+k

        a_list, lp_list = [], []
        for i in range(k + 1):
            a_i, lp_i = greedy(apply_filters(logits_t[:, i], tokens, pos + i))
            a_list.append(a_i)
            lp_list.append(lp_i)
        target_vec = jnp.concatenate(a_list)  # [k+1] (b=1 rows squeezed)
        lp_vec = jnp.concatenate(lp_list)

        # first-token logprob floor (reference TextDecoder.swift:662-678)
        first_fail = (pos == sample_begin) & (
            lp_vec[0] < scalars.first_token_logprob_threshold
        )
        target_vec = target_vec.at[0].set(
            jnp.where(first_fail, special.eot, target_vec[0])
        )
        lp_vec = lp_vec.at[0].set(jnp.where(first_fail, 0.0, lp_vec[0]))

        # ---- acceptance + commit -------------------------------------------
        match = draft_vec[0] == target_vec[:k]  # [k]
        n_acc = jnp.where(
            first_fail, 0, jnp.cumprod(match.astype(jnp.int32)).sum()
        )
        idx = jnp.arange(k + 1)
        cand = idx <= n_acc
        eot_hit = (target_vec == special.eot) & cand
        first_eot = jnp.where(jnp.any(eot_hit), jnp.argmax(eot_hit), k + 1)
        commit_len = jnp.minimum(
            jnp.minimum(n_acc + 1, first_eot + 1), total - pos
        )
        committed = idx < commit_len
        write_tok = jnp.where(committed, target_vec, special.eot)[None]
        write_lp = jnp.where(committed, lp_vec, 0.0)[None]
        tokens = jax.lax.dynamic_update_slice(tokens, write_tok, (0, pos))
        tlp = jax.lax.dynamic_update_slice(tlp, write_lp, (0, pos))
        done = st.done | first_fail | jnp.any(
            (write_tok[0] == special.eot) & committed
        )
        last_token = target_vec[commit_len - 1][None]
        return _SpecState(
            pos + commit_len, last_token, tokens, tlp,
            kv_t_k, kv_t_v, kv_d_k, kv_d_v, done,
        )

    st = jax.lax.while_loop(cond, body, state)
    out = DecodeLoopOutput(
        tokens=st.tokens[:, :total],
        token_logprobs=st.token_logprobs[:, :total],
        length=jnp.minimum(st.pos, total),
        no_speech_prob=prefill.no_speech_prob,
        alignment=None,
    )
    if return_state:
        return out, st
    return out
