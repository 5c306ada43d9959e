"""WER computation with word-level alignment.

Reference: Tests/WhisperKitTests/Evaluate/ —
`DistanceCalculation.swift:8-196` (Needleman-Wunsch / Hirschberg /
Levenshtein alignment) and `WERUtils.swift:44-125`
(`processWords`/`evaluate`). The alignment here is a vectorized
Needleman-Wunsch over words (rows computed as NumPy vector ops), returning
the same hit/substitution/deletion/insertion counts the reference reports.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from whisperkit_tpu.eval.normalize import EnglishTextNormalizer


@dataclasses.dataclass
class AlignmentChunk:
    """One aligned op span (jiwer-style, like the reference's ops list)."""

    kind: str  # "equal" | "replace" | "delete" | "insert"
    ref_start: int
    ref_end: int
    hyp_start: int
    hyp_end: int


@dataclasses.dataclass
class WERResult:
    wer: float
    hits: int
    substitutions: int
    deletions: int
    insertions: int
    n_ref_words: int
    chunks: list[AlignmentChunk]

    @property
    def accuracy(self) -> float:
        return 1.0 - self.wer


def _edit_matrix(ref: Sequence[str], hyp: Sequence[str]) -> np.ndarray:
    """Full DP cost matrix (substitution=1) computed row-wise vectorized."""
    n, m = len(ref), len(hyp)
    hyp_arr = np.asarray(hyp, dtype=object)
    d = np.zeros((n + 1, m + 1), np.int32)
    d[0, :] = np.arange(m + 1)
    d[:, 0] = np.arange(n + 1)
    for i in range(1, n + 1):
        sub_cost = (hyp_arr != ref[i - 1]).astype(np.int32)
        row_prev = d[i - 1]
        row = d[i]
        # deletion candidates vectorized; substitution/insertion need the
        # sequential left-to-right pass (insertion depends on row[j-1])
        cand_del = row_prev[1:] + 1
        cand_sub = row_prev[:-1] + sub_cost
        best = np.minimum(cand_del, cand_sub)
        acc = row[0]
        out = np.empty(m, np.int32)
        for j in range(m):
            acc = min(best[j], acc + 1)
            out[j] = acc
        row[1:] = out
    return d


def align_words(ref: Sequence[str], hyp: Sequence[str]) -> list[AlignmentChunk]:
    d = _edit_matrix(ref, hyp)
    i, j = len(ref), len(hyp)
    ops: list[str] = []
    while i > 0 or j > 0:
        if i > 0 and j > 0 and ref[i - 1] == hyp[j - 1] and d[i, j] == d[i - 1, j - 1]:
            ops.append("equal")
            i, j = i - 1, j - 1
        elif i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + 1:
            ops.append("replace")
            i, j = i - 1, j - 1
        elif i > 0 and d[i, j] == d[i - 1, j] + 1:
            ops.append("delete")
            i -= 1
        else:
            ops.append("insert")
            j -= 1
    ops.reverse()

    chunks: list[AlignmentChunk] = []
    ri = hi = 0
    for op in ops:
        dr = 1 if op in ("equal", "replace", "delete") else 0
        dh = 1 if op in ("equal", "replace", "insert") else 0
        if chunks and chunks[-1].kind == op:
            chunks[-1].ref_end += dr
            chunks[-1].hyp_end += dh
        else:
            chunks.append(AlignmentChunk(op, ri, ri + dr, hi, hi + dh))
        ri += dr
        hi += dh
    return chunks


def evaluate(
    reference: str,
    hypothesis: str,
    normalizer=None,
) -> WERResult:
    """Normalized WER (reference: WERUtils.swift:110-125 `evaluate`)."""
    normalizer = normalizer or EnglishTextNormalizer()
    ref_words = normalizer(reference).split()
    hyp_words = normalizer(hypothesis).split()
    if not ref_words:
        wer = 0.0 if not hyp_words else 1.0
        return WERResult(wer, 0, 0, 0, len(hyp_words), 0, [])
    chunks = align_words(ref_words, hyp_words)
    hits = subs = dels = ins = 0
    for c in chunks:
        n = max(c.ref_end - c.ref_start, c.hyp_end - c.hyp_start)
        if c.kind == "equal":
            hits += n
        elif c.kind == "replace":
            subs += n
        elif c.kind == "delete":
            dels += n
        else:
            ins += n
    wer = (subs + dels + ins) / len(ref_words)
    return WERResult(
        wer=wer,
        hits=hits,
        substitutions=subs,
        deletions=dels,
        insertions=ins,
        n_ref_words=len(ref_words),
        chunks=chunks,
    )


def wer(reference: str, hypothesis: str, normalizer=None) -> float:
    return evaluate(reference, hypothesis, normalizer).wer
