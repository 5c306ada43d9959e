"""End-to-end quantization quality harness: WER delta + token divergence
vs the bf16 pipeline on the same weights and audio.

Reference: Tests/WhisperKitTests/RegressionTests.swift:293-296 — the
reference's correctness metric for a model variant is WER vs reference
transcripts. With zero egress there are no real weights, so the strongest
offline statement is DIVERGENCE FROM BF16: run the identical checkpoint
through each quantization scheme on real audio fixtures and measure
(a) text WER of the quantized transcript against the bf16 transcript and
(b) token-level edit distance — both zero when a scheme is lossless at
decode-decision level. This composes the pieces VERDICT r4 #3 named:
shared-weight models, real fixtures, eval/wer alignment.

Used by tools/eval_quant_wer.py (full table on TPU) and
tests/test_quant.py (pinned bounds for the blessed presets at test scale).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from whisperkit_tpu.eval.wer import align_words, evaluate

# scheme name → (weight_bits or None, ComputeOptions overrides)
DEFAULT_SCHEMES: dict[str, tuple[Optional[int], dict]] = {
    # the blessed serving preset: int8 cross-KV, bf16 weights
    "serving_int8_cross_kv": (None, {"quantize_cross_kv": True}),
    "int8_self_kv": (None, {"quantize_self_kv": True}),
    "w8a16_int8kv": (8, {"quantize_cross_kv": True, "quantization": "w8a16"}),
    "w8a8_int8kv": (8, {"quantize_cross_kv": True, "quantization": "w8a8"}),
    "w4a16_int8kv": (4, {"quantize_cross_kv": True, "quantization": "w4a16"}),
}


@dataclasses.dataclass
class SchemeDelta:
    scheme: str
    wer_vs_bf16: float  # normalized-text WER, bf16 transcript as reference
    token_divergence: float  # token edit distance / bf16 token count
    n_ref_tokens: int
    n_diverged_tokens: int
    identical_text: bool


@dataclasses.dataclass
class TeacherForcedDelta:
    """Per-STEP decision stability, free of trajectory compounding.

    Free-running greedy divergence (SchemeDelta) saturates on random-init
    weights: logit margins are near zero, so the first flipped token
    decorrelates everything after it. Teacher forcing feeds every scheme
    the SAME bf16-greedy prefix at every position and asks only "would
    this scheme have picked the same next token?" — the per-step flip
    probability, plus the bf16 logit margins that contextualize it
    (a flip at margin 0.001 is noise; a flip at margin 5 is damage)."""

    scheme: str
    tf_agreement: float  # fraction of steps whose argmax matches bf16
    n_steps: int
    n_flips: int
    margin_bf16_median: float  # median top1-top2 bf16 logit gap, all steps
    flip_margin_median: Optional[float]  # median bf16 margin at flips (None if none)
    mean_abs_logit_delta: float  # mean |logits_scheme - logits_bf16|, eval rows


def _result_tokens(result) -> list[int]:
    out: list[int] = []
    for seg in result.segments:
        out.extend(int(t) for t in seg.tokens)
    return out


def _token_edit_distance(ref: list[int], hyp: list[int]) -> int:
    if not ref and not hyp:
        return 0
    chunks = align_words([str(t) for t in ref], [str(t) for t in hyp])
    dist = 0
    for c in chunks:
        if c.kind != "equal":
            dist += max(c.ref_end - c.ref_start, c.hyp_end - c.hyp_start)
    return dist


def quant_divergence(
    dims,
    params,
    audio_list: Sequence[np.ndarray],
    options,
    schemes: Optional[dict] = None,
    normalizer=None,
) -> list[SchemeDelta]:
    """Transcribe `audio_list` with bf16 and with each scheme (same weight
    tree, quantized where the scheme says) and report per-scheme deltas.

    `options` should disable the fallback ladder when weights are
    random-init (bench.pipeline_options does) so every scheme decodes one
    honest pass per window.
    """
    from whisperkit_tpu.core.configurations import ComputeOptions, WhisperConfig
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    schemes = DEFAULT_SCHEMES if schemes is None else schemes

    def run(compute: ComputeOptions, p) -> tuple[list[str], list[list[int]]]:
        pipe = WhisperPipeline(
            WhisperConfig(compute_options=compute), dims=dims, params=p
        )
        texts, tokens = [], []
        for audio in audio_list:
            res = pipe.transcribe(audio, options)
            texts.append(res.text)
            tokens.append(_result_tokens(res))
        pipe.params = None
        return texts, tokens

    base_texts, base_tokens = run(ComputeOptions(), params)

    quant_trees: dict[int, object] = {}

    def tree_for(bits: Optional[int]):
        if bits is None:
            return params
        if bits not in quant_trees:
            from whisperkit_tpu.ops.quant import quantize_whisper_params

            quant_trees[bits] = quantize_whisper_params(params, bits=bits)
        return quant_trees[bits]

    reports: list[SchemeDelta] = []
    for name, (bits, overrides) in schemes.items():
        texts, tokens = run(ComputeOptions(**overrides), tree_for(bits))
        n_ref = sum(len(t) for t in base_tokens)
        dist = sum(
            _token_edit_distance(r, h) for r, h in zip(base_tokens, tokens)
        )
        wers = [
            evaluate(r, h, normalizer=normalizer)
            for r, h in zip(base_texts, texts)
        ]
        total_ref_words = sum(w.n_ref_words for w in wers) or 1
        wer = (
            sum(w.substitutions + w.deletions + w.insertions for w in wers)
            / total_ref_words
        )
        reports.append(
            SchemeDelta(
                scheme=name,
                wer_vs_bf16=round(wer, 5),
                token_divergence=round(dist / max(n_ref, 1), 5),
                n_ref_tokens=n_ref,
                n_diverged_tokens=dist,
                identical_text=texts == base_texts,
            )
        )
    return reports


def _scheme_logits(dims, tree, mel, seq, overrides: dict):
    """Full-sequence teacher-forced decoder logits [T, V] f32 for one
    scheme's compute path (the same model functions the pipeline wires:
    act8 encoder for w8a8, int8 cross-KV, int8 self-KV cache layout).

    One jit per scheme (the compute path is structurally different), with
    tree/mel/tokens as real arguments — eager per-op dispatch would pay
    one tunnel RTT per op on the remote TPU backend."""
    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.models.whisper import (
        compute_cross_kv,
        compute_cross_kv_quantized,
        decoder_forward,
        encoder_forward,
    )

    act8 = overrides.get("quantization") == "w8a8"
    q8_cross = bool(overrides.get("quantize_cross_kv"))
    q8_self = bool(overrides.get("quantize_self_kv"))
    t = len(seq)

    @jax.jit
    def run(tree, mel, tokens):
        enc = encoder_forward(tree, mel, dims, act8=act8)
        if q8_cross:
            cross_k, cross_v = compute_cross_kv_quantized(tree, enc, dims)
        else:
            cross_k, cross_v = compute_cross_kv(tree, enc, dims)

        kv_shape = (dims.n_text_layer, 1, dims.n_text_head, t, dims.head_dim)
        if q8_self:
            kv_k = {
                "q8": jnp.zeros(kv_shape, jnp.int8),
                "scale": jnp.zeros(kv_shape[:-1] + (1,), jnp.float32),
            }
            kv_v = {
                "q8": jnp.zeros(kv_shape, jnp.int8),
                "scale": jnp.zeros(kv_shape[:-1] + (1,), jnp.float32),
            }
        else:
            kv_dtype = tree["decoder"]["token_embed"].dtype
            kv_k = jnp.zeros(kv_shape, kv_dtype)
            kv_v = jnp.zeros(kv_shape, kv_dtype)
        logits, _, _ = decoder_forward(
            tree, tokens, 0, kv_k, kv_v, cross_k, cross_v, dims
        )
        return logits[0]

    tokens = jnp.asarray(seq, jnp.int32)[None]
    return np.asarray(run(tree, mel, tokens), np.float32)


def teacher_forced_divergence(
    dims,
    params,
    audio: np.ndarray,
    language: str = "en",
    schemes: Optional[dict] = None,
    max_tokens: int = 96,
) -> list[TeacherForcedDelta]:
    """Per-step argmax agreement of each scheme vs bf16 under teacher
    forcing (see TeacherForcedDelta). The teacher sequence is the bf16
    raw-greedy trajectory on the first 30 s window (no logit filters —
    this probes the model numerics, not the decode rules); every scheme
    then scores the identical [prompt + teacher] sequence in ONE
    full-sequence decoder pass, so flips cannot compound.

    Reference metric analog: RegressionTests.swift:293-296 measures WER on
    real weights; offline, per-step flip rate + margins is the sharpest
    scheme-quality statement random-init weights admit."""
    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.audio.io import pad_or_trim
    from whisperkit_tpu.models.whisper import decoder_forward, init_kv_cache
    from whisperkit_tpu.ops.mel import log_mel_spectrogram
    from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab

    schemes = DEFAULT_SCHEMES if schemes is None else schemes
    sp = special_tokens_for_vocab(dims.n_vocab)
    window = pad_or_trim(np.asarray(audio, np.float32))
    mel = jax.jit(lambda a: log_mel_spectrogram(a, n_mels=dims.n_mels))(
        jnp.asarray(window)
    )[None]

    prompt = [sp.sot, sp.language_token(language), sp.transcribe, sp.notimestamps]

    # bf16 raw-greedy teacher trajectory: prefill + T==1 steps (harness
    # path — per-step host pulls are fine here, this is not the serving loop)
    from whisperkit_tpu.models.whisper import compute_cross_kv, encoder_forward

    encode = jax.jit(
        lambda p, m: compute_cross_kv(p, encoder_forward(p, m, dims), dims)
    )
    cross_k, cross_v = encode(params, mel)
    total = len(prompt) + max_tokens
    kv_k, kv_v = init_kv_cache(dims, 1, dtype=params["decoder"]["token_embed"].dtype)
    step = jax.jit(
        lambda p, t, off, kk, vv, ck, cv: decoder_forward(
            p, t, off, kk, vv, ck, cv, dims
        )[:2]
    )
    toks = jnp.asarray(prompt, jnp.int32)[None]
    logits, (kv_k, kv_v) = step(params, toks, 0, kv_k, kv_v, cross_k, cross_v)
    teacher: list[int] = []
    nxt = int(np.argmax(np.asarray(logits[0, -1])))
    for pos in range(len(prompt), total):
        teacher.append(nxt)
        if nxt == sp.eot:
            break
        logits, (kv_k, kv_v) = step(
            params, jnp.asarray([[nxt]], jnp.int32), pos, kv_k, kv_v,
            cross_k, cross_v,
        )
        nxt = int(np.argmax(np.asarray(logits[0, -1])))

    seq = prompt + teacher
    eval_lo = len(prompt) - 1  # row i predicts seq[i+1]
    base = _scheme_logits(dims, params, mel, seq, {})
    rows = base[eval_lo:-1] if len(seq) > eval_lo + 1 else base[eval_lo:eval_lo + 1]
    base_arg = rows.argmax(axis=-1)
    part = np.partition(rows, -2, axis=-1)
    margins = part[:, -1] - part[:, -2]

    quant_trees: dict[int, object] = {}

    def tree_for(bits: Optional[int]):
        if bits is None:
            return params
        if bits not in quant_trees:
            from whisperkit_tpu.ops.quant import quantize_whisper_params

            quant_trees[bits] = quantize_whisper_params(params, bits=bits)
        return quant_trees[bits]

    reports: list[TeacherForcedDelta] = []
    for name, (bits, overrides) in schemes.items():
        ql = _scheme_logits(dims, tree_for(bits), mel, seq, overrides)
        qrows = ql[eval_lo:-1] if len(seq) > eval_lo + 1 else ql[eval_lo:eval_lo + 1]
        flips = qrows.argmax(axis=-1) != base_arg
        n = len(base_arg)
        reports.append(
            TeacherForcedDelta(
                scheme=name,
                tf_agreement=round(float(1.0 - flips.mean()), 5),
                n_steps=n,
                n_flips=int(flips.sum()),
                margin_bf16_median=round(float(np.median(margins)), 5),
                flip_margin_median=(
                    round(float(np.median(margins[flips])), 5)
                    if flips.any() else None
                ),
                mean_abs_logit_delta=round(
                    float(np.abs(qrows - rows).mean()), 5
                ),
            )
        )
    return reports
