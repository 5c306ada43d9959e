"""Beam-search decoding — fully on-device, batched over windows × beams.

Reference: Sources/WhisperKit/Core/Text/TokenSampler.swift:254-290 declares
`BeamSearchTokenSampler` but its body is `fatalError("Not implemented")` —
beam search is API surface only in the reference. Here it is implemented for
real with openai/whisper `BeamSearchDecoder` semantics (decoding.py):

  * K beams per window, expanded from the top-2K (beam, token) candidates
  * hypotheses ending in EOT move to a finished set (best K kept)
  * a beam row finishes when its finished set can no longer be improved
  * final score = sum_logprob / length  (or the GNMT length penalty
    ((5+L)/6)^p when `length_penalty` is set)

Everything — expansion, KV-cache beam gather, filters — lives inside one
`lax.while_loop`, like the greedy loop (decoding/loop.py). The KV cache is
laid out [L, B*K, H, S, Dh]; beam reordering is one gather per step on the
B*K axis.
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
from whisperkit_tpu.models.whisper import WhisperDims, decoder_forward
from whisperkit_tpu.text.tokenizer import SpecialTokens

NEG = -1e9


class BeamDecodeOutput(NamedTuple):
    tokens: jnp.ndarray  # [B, TOTAL] best-hypothesis tokens (EOT-padded)
    token_logprobs: jnp.ndarray  # [B, TOTAL]
    sum_logprob: jnp.ndarray  # [B] of the winning hypothesis
    length: jnp.ndarray  # scalar: final position
    no_speech_prob: jnp.ndarray  # [B]


def _length_score(sum_lp, lengths, length_penalty: Optional[float]):
    lengths = jnp.maximum(lengths, 1)
    if length_penalty is None:
        return sum_lp / lengths
    return sum_lp / (((5.0 + lengths) / 6.0) ** length_penalty)


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims",
        "special",
        "sample_begin",
        "max_new_tokens",
        "beam_size",
        "sot_index",
        "use_timestamp_rules",
        "suppress_blank",
        "length_penalty",
    ),
)
def beam_decode_loop(
    params,
    cross_k,  # [L, B, H, 1500, Dh]
    cross_v,
    prompt: jnp.ndarray,  # [B, P]
    suppress_bias: jnp.ndarray,  # [V]
    max_initial_timestamp_index: jnp.ndarray,  # traced scalar
    *,
    dims: WhisperDims,
    special: SpecialTokens,
    sample_begin: int,
    max_new_tokens: int,
    beam_size: int,
    sot_index: int,
    use_timestamp_rules: bool,
    suppress_blank: bool,
    length_penalty: Optional[float] = None,
) -> BeamDecodeOutput:
    b, p = prompt.shape
    k = beam_size
    bk = b * k
    total = sample_begin + max_new_tokens
    v = dims.n_vocab
    n_head = dims.n_text_head

    # expand cross-KV to beams: [L, B*K, H, 1500, Dh]
    def expand(x):
        return jnp.repeat(x, k, axis=1)

    cross_k_b = expand(cross_k)
    cross_v_b = expand(cross_v)

    kv_shape = (dims.n_text_layer, bk, n_head, total, dims.head_dim)
    kv_dtype = params["decoder"]["token_embed"].dtype  # f32 on parity paths
    kv_k = jnp.zeros(kv_shape, kv_dtype)
    kv_v = jnp.zeros(kv_shape, kv_dtype)

    prompt_bk = jnp.repeat(prompt, k, axis=0)  # [B*K, P]
    logits, (kv_k, kv_v), _ = decoder_forward(
        params, prompt_bk, 0, kv_k, kv_v, cross_k_b, cross_v_b, dims
    )
    no_speech_prob = jax.nn.softmax(
        logits.reshape(b, k, p, v)[:, 0, sot_index], axis=-1
    )[:, special.nospeech]
    last_logits = logits[:, -1]  # [B*K, V]

    tokens = jnp.concatenate(
        [prompt_bk.astype(jnp.int32), jnp.full((bk, max_new_tokens), special.eot, jnp.int32)],
        axis=1,
    )  # [B*K, TOTAL]
    tok_lps = jnp.zeros((bk, total), jnp.float32)

    # beam scores: beam 0 active, others -inf so the first expansion draws
    # only from beam 0 (all beams identical after prefill)
    beam_lp = jnp.tile(jnp.asarray([0.0] + [NEG] * (k - 1), jnp.float32), (b,))  # [B*K]

    fin_tokens = jnp.full((bk, total), special.eot, jnp.int32)
    fin_lps = jnp.zeros((bk, total), jnp.float32)
    fin_sum = jnp.full((bk,), NEG, jnp.float32)
    fin_len = jnp.zeros((bk,), jnp.int32)  # sampled length incl. EOT

    def apply_filters(lg, tok_buf, pos):
        lg = lg + suppress_bias[None, :]
        at_begin = pos == sample_begin
        if suppress_blank:
            lg = apply_suppress_blank(lg, special, at_begin)
        if use_timestamp_rules:
            lg = apply_timestamp_rules(
                lg, tok_buf, pos, sample_begin, special, max_initial_timestamp_index
            )
        return lg

    def cond(state):
        pos, done = state[0], state[9]
        return (pos < total) & ~jnp.all(done)

    def body(state):
        (pos, tokens, tok_lps, kvs, beam_lp, last_logits,
         fins, fin_sum, fin_len, done) = state
        kv_k, kv_v = kvs
        fin_tokens, fin_lps = fins

        lg = apply_filters(last_logits, tokens, pos)  # [B*K, V]
        logprobs = jax.nn.log_softmax(lg, axis=-1)
        cand = beam_lp[:, None] + logprobs  # [B*K, V]
        cand = cand.reshape(b, k * v)

        top_lp, top_idx = jax.lax.top_k(cand, 2 * k)  # [B, 2K]
        src_beam = top_idx // v  # [B, 2K] beam index within window
        tok_id = (top_idx % v).astype(jnp.int32)
        is_eot = tok_id == special.eot

        # --- update finished set with EOT candidates -----------------------
        # candidate finished score (length includes the EOT token)
        new_len = pos - sample_begin + 1
        cand_fin_score = _length_score(top_lp, new_len, length_penalty)
        # existing finished scores
        fin_score = _length_score(fin_sum, fin_len, length_penalty).reshape(b, k)
        eot_lp = jnp.where(is_eot, top_lp, NEG)
        eot_score = jnp.where(is_eot, cand_fin_score, NEG)  # [B, 2K]

        merged_scores = jnp.concatenate([fin_score, eot_score], axis=1)  # [B, 3K]
        _, keep = jax.lax.top_k(merged_scores, k)  # indices into 3K
        from_old = keep < k  # [B, K]

        # gather merged finished storage
        batch_idx = jnp.arange(b)[:, None]
        old_rows = (batch_idx * k + jnp.clip(keep, 0, k - 1)).reshape(-1)
        new_sel = jnp.clip(keep - k, 0, 2 * k - 1)  # [B, K] into 2K candidates
        new_src_rows = (batch_idx * k + jnp.take_along_axis(src_beam, new_sel, 1)).reshape(-1)

        new_tok_val = jnp.take_along_axis(tok_id, new_sel, 1)  # [B, K] (EOT)
        # per-candidate step logprob of the EOT token itself
        step_lp = jnp.take_along_axis(top_lp, new_sel, 1) - jnp.take_along_axis(
            beam_lp.reshape(b, k), jnp.take_along_axis(src_beam, new_sel, 1), 1
        )

        # merge finished storage: keep old rows or materialize new EOT-ended
        # hypotheses from their source beams
        new_fin_t = jax.vmap(
            lambda row, t: jax.lax.dynamic_update_slice(row, t[None], (pos,))
        )(tokens[new_src_rows], new_tok_val.reshape(-1))
        new_fin_l = jax.vmap(
            lambda row, x: jax.lax.dynamic_update_slice(row, x[None], (pos,))
        )(tok_lps[new_src_rows], step_lp.reshape(-1))
        sel = from_old.reshape(-1)[:, None]
        fin_tokens_new = jnp.where(sel, fin_tokens[old_rows], new_fin_t)
        fin_lps_new = jnp.where(sel, fin_lps[old_rows], new_fin_l)

        # freeze rows of windows that already finished
        frozen = jnp.repeat(done, k)  # [B*K]
        fin_tokens_new = jnp.where(frozen[:, None], fin_tokens, fin_tokens_new)
        fin_lps_new = jnp.where(frozen[:, None], fin_lps, fin_lps_new)
        fin_sum_new = jnp.where(
            from_old,
            fin_sum.reshape(b, k)[batch_idx, jnp.clip(keep, 0, k - 1)],
            jnp.take_along_axis(eot_lp, new_sel, 1),
        ).reshape(-1)
        fin_len_new = jnp.where(
            from_old,
            fin_len.reshape(b, k)[batch_idx, jnp.clip(keep, 0, k - 1)],
            new_len,
        ).reshape(-1)
        fin_sum_new = jnp.where(frozen, fin_sum, fin_sum_new)
        fin_len_new = jnp.where(frozen, fin_len, fin_len_new)

        # --- pick K live (non-EOT) continuations ---------------------------
        live_lp = jnp.where(is_eot, NEG, top_lp)  # [B, 2K]
        live_sel_lp, live_sel = jax.lax.top_k(live_lp, k)  # [B, K]
        live_beam = jnp.take_along_axis(src_beam, live_sel, 1)  # [B, K]
        live_tok = jnp.take_along_axis(tok_id, live_sel, 1)  # [B, K]
        src_rows = (batch_idx * k + live_beam).reshape(-1)  # [B*K]
        # frozen windows map to themselves and re-write EOT (a no-op on the
        # EOT-padded tail)
        own = jnp.arange(bk)
        src_rows = jnp.where(frozen, own, src_rows)
        write_tok = jnp.where(frozen, special.eot, live_tok.reshape(-1))

        step_live_lp = (live_sel_lp - jnp.take_along_axis(
            beam_lp.reshape(b, k), live_beam, 1
        )).reshape(-1)
        step_live_lp = jnp.where(frozen, 0.0, step_live_lp)
        tokens = jax.vmap(
            lambda row, t: jax.lax.dynamic_update_slice(row, t[None], (pos,))
        )(tokens[src_rows], write_tok)
        tok_lps_g = jax.vmap(
            lambda row, x: jax.lax.dynamic_update_slice(row, x[None], (pos,))
        )(tok_lps[src_rows], step_live_lp)
        beam_lp = jnp.where(frozen, beam_lp, live_sel_lp.reshape(-1))

        # reorder KV caches along the beam axis
        kv_k = kv_k[:, src_rows]
        kv_v = kv_v[:, src_rows]

        # early termination: best possible live score can't beat the worst
        # kept finished score
        best_live = _length_score(beam_lp.reshape(b, k), new_len, length_penalty).max(1)
        worst_fin = _length_score(fin_sum_new.reshape(b, k), jnp.maximum(fin_len_new.reshape(b, k), 1), length_penalty).min(1)
        have_k_fin = (fin_sum_new.reshape(b, k) > NEG / 2).all(1)
        done = done | (have_k_fin & (best_live < worst_fin))

        # decoder step for all live beams
        logits, (kv_k, kv_v), _ = decoder_forward(
            params, jax.lax.dynamic_slice_in_dim(tokens, pos, 1, 1),
            pos, kv_k, kv_v, cross_k_b, cross_v_b, dims,
        )

        return (
            pos + 1, tokens, tok_lps_g, (kv_k, kv_v), beam_lp, logits[:, -1],
            (fin_tokens_new, fin_lps_new), fin_sum_new, fin_len_new, done,
        )

    state = (
        jnp.asarray(sample_begin, jnp.int32),
        tokens,
        tok_lps,
        (kv_k, kv_v),
        beam_lp,
        last_logits,
        (fin_tokens, fin_lps),
        fin_sum,
        fin_len,
        jnp.zeros((b,), bool),
    )
    (pos, tokens, tok_lps, _, beam_lp, _, fins, fin_sum, fin_len, _) = jax.lax.while_loop(
        cond, body, state
    )
    fin_tokens, fin_lps = fins

    # choose best hypothesis per window: finished if any, else best live
    fin_score = _length_score(fin_sum.reshape(b, k), jnp.maximum(fin_len.reshape(b, k), 1), length_penalty)
    live_len = pos - sample_begin
    live_score = _length_score(beam_lp.reshape(b, k), jnp.maximum(live_len, 1), length_penalty)
    have_fin = fin_sum.reshape(b, k) > NEG / 2
    score = jnp.where(have_fin, fin_score, NEG)
    any_fin = have_fin.any(axis=1)
    best_fin = jnp.argmax(score, axis=1)
    best_live = jnp.argmax(live_score, axis=1)

    batch = jnp.arange(b)
    rows_fin = batch * k + best_fin
    rows_live = batch * k + best_live
    pick_fin = any_fin[:, None]
    out_tokens = jnp.where(pick_fin, fin_tokens[rows_fin], tokens[rows_live])
    out_lps = jnp.where(pick_fin, fin_lps[rows_fin], tok_lps[rows_live])
    out_sum = jnp.where(any_fin, fin_sum[rows_fin], beam_lp[rows_live])

    return BeamDecodeOutput(
        tokens=out_tokens,
        token_logprobs=out_lps,
        sum_logprob=out_sum,
        length=pos,
        no_speech_prob=no_speech_prob,
    )
