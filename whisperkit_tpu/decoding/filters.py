"""Logits filters as vectorized in-graph masks.

Reference: Sources/WhisperKit/Core/Text/LogitsFilter.swift —
`SuppressTokensFilter` (:12-25), `SuppressBlankFilter` (:27-51),
`TimestampRulesFilter` (:54-243), `LanguageLogitsFilter` (:245-276).

The reference applies these one token at a time on CPU/BNNS between CoreML
calls. Here every filter is a pure function on a [B, V] logits array built
from `jnp.where` masks, so the whole chain stays inside the jitted decode
loop — zero host round trips (SURVEY.md §7 "keeping the token loop
on-device").
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from whisperkit_tpu.text.tokenizer import SpecialTokens

NEG_INF = float("-inf")


def suppress_tokens_bias(n_vocab: int, suppress: Sequence[int]) -> np.ndarray:
    """Static additive bias implementing SuppressTokensFilter."""
    bias = np.zeros((n_vocab,), np.float32)
    ids = [t for t in suppress if 0 <= t < n_vocab]
    if ids:
        bias[np.asarray(ids)] = NEG_INF
    return bias


def non_speech_token_ids(sp: SpecialTokens, tokenizer=None) -> list[int]:
    """The default suppress list (openai's `non_speech_tokens` +
    specials), used when options.suppress_tokens == [-1].

    Reference: TextDecoder.swift:857-899 `createLogitsFilters` builds the
    suppress set from `options.supressTokens`; openai's default list masks
    sounds/annotations like ♪ and bracketed cues.
    """
    ids = {sp.translate, sp.transcribe, sp.sot, sp.startofprev, sp.startoflm}
    if tokenizer is not None and hasattr(tokenizer, "encode"):
        symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』') + (
            "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] {{ }} ♪♪ ♪♪♪".split()
        )
        miscellaneous = set("♩♪♫♬♭♮♯")
        for symbol in symbols + list(miscellaneous):
            for tok in (symbol, " " + symbol):
                try:
                    enc = tokenizer.encode(tok)
                except Exception:
                    continue
                if len(enc) == 1:
                    ids.add(enc[0])
    return sorted(t for t in ids if 0 <= t < sp.n_vocab)


def apply_suppress_blank(
    logits: jnp.ndarray, sp: SpecialTokens, at_begin: jnp.ndarray
) -> jnp.ndarray:
    """Mask ' ' and EOT at the first sampled position.

    Reference: LogitsFilter.swift:27-51. `at_begin` is a traced bool.
    """
    v = logits.shape[-1]
    ids = jnp.arange(v)
    blank = (ids == sp.whitespace) | (ids == sp.eot)
    return jnp.where(at_begin & blank[None, :], NEG_INF, logits)


def apply_timestamp_rules(
    logits: jnp.ndarray,  # [B, V] f32
    tokens: jnp.ndarray,  # [B, T] token buffer
    pos: jnp.ndarray,  # scalar: current length (next write index)
    sample_begin: int,
    sp: SpecialTokens,
    max_initial_timestamp_index: jnp.ndarray,  # scalar int (or large if None)
) -> jnp.ndarray:
    """Whisper timestamp pairing/monotonicity rules, fully vectorized.

    Reference: LogitsFilter.swift:54-243 (`TimestampRulesFilter`), which
    mirrors openai/whisper `ApplyTimestampRules`:
      * <|notimestamps|> is always suppressed
      * timestamps come in pairs (except directly before EOT): after a lone
        timestamp, text is masked; after a pair, timestamps are masked
      * timestamps are non-decreasing across the window
      * the first sampled token must be a timestamp, capped by
        max_initial_timestamp
      * if the total probability mass on timestamps beats the best text
        token, text is masked
    """
    b, v = logits.shape
    ids = jnp.arange(v)
    is_ts = ids >= sp.timestamp_begin

    logits = jnp.where(ids[None, :] == sp.notimestamps, NEG_INF, logits)

    last = jnp.take_along_axis(tokens, jnp.maximum(pos - 1, 0)[None, None].repeat(b, 0), axis=1)[:, 0]
    penult = jnp.take_along_axis(tokens, jnp.maximum(pos - 2, 0)[None, None].repeat(b, 0), axis=1)[:, 0]
    have_last = pos - 1 >= sample_begin
    have_penult = pos - 2 >= sample_begin
    last_was_ts = have_last & (last >= sp.timestamp_begin)
    penult_was_ts = ~have_penult | (penult >= sp.timestamp_begin)

    # after lone timestamp → mask text (incl. specials below eot is text only;
    # EOT must stay allowed). after a completed pair → mask timestamps.
    mask_text = last_was_ts & ~penult_was_ts
    mask_ts = last_was_ts & penult_was_ts
    text_ids = ids < sp.eot
    logits = jnp.where(mask_text[:, None] & text_ids[None, :], NEG_INF, logits)
    logits = jnp.where(mask_ts[:, None] & is_ts[None, :], NEG_INF, logits)

    # monotonic timestamps: mask [timestamp_begin, floor)
    positions = jnp.arange(tokens.shape[1])
    sampled = (positions[None, :] >= sample_begin) & (positions[None, :] < pos)
    ts_vals = jnp.where(sampled & (tokens >= sp.timestamp_begin), tokens, -1)
    max_ts = ts_vals.max(axis=1)  # -1 if none
    have_ts = max_ts >= 0
    floor = jnp.where(last_was_ts & ~penult_was_ts, max_ts, max_ts + 1)
    mono = have_ts[:, None] & is_ts[None, :] & (ids[None, :] < floor[:, None])
    logits = jnp.where(mono, NEG_INF, logits)

    # first sampled token must be a timestamp, within the initial cap
    at_begin = pos == sample_begin
    logits = jnp.where(at_begin & ~is_ts[None, :], NEG_INF, logits)
    too_late = ids[None, :] > sp.timestamp_begin + max_initial_timestamp_index
    logits = jnp.where(at_begin & is_ts[None, :] & too_late, NEG_INF, logits)

    # sum-of-timestamp-probability rule
    return _apply_ts_prob_rule(logits, is_ts, sp)


def _apply_ts_prob_rule(logits: jnp.ndarray, is_ts: jnp.ndarray, sp: SpecialTokens) -> jnp.ndarray:
    import jax

    # the softmax normalizer cancels on both sides of the comparison, so
    # raw logits suffice — no per-step log_softmax over [B, V]
    ts_logprob = jax.scipy.special.logsumexp(
        jnp.where(is_ts[None, :], logits, NEG_INF), axis=-1
    )
    max_text = jnp.where(is_ts[None, :], NEG_INF, logits).max(axis=-1)
    force_ts = ts_logprob > max_text
    return jnp.where(force_ts[:, None] & ~is_ts[None, :], NEG_INF, logits)


def language_token_mask(sp: SpecialTokens) -> np.ndarray:
    """Bias that keeps only language tokens (LanguageLogitsFilter,
    LogitsFilter.swift:245-276)."""
    bias = np.full((sp.n_vocab,), NEG_INF, np.float32)
    bias[sp.language_begin : sp.language_begin + sp.n_languages] = 0.0
    return bias
