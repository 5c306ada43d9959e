"""Continuous batching scheduler.

New TPU-native coverage (SURVEY.md §7.7) — the reference's equivalent is
TaskGroup batch tests (FunctionalTests.swift:89-187).
"""

import threading

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from whisperkit_tpu.core.configurations import DecodingOptions
from whisperkit_tpu.models.whisper import WhisperDims, init_params
from whisperkit_tpu.pipelines.scheduler import BatchScheduler
from whisperkit_tpu.pipelines.whisper import WhisperPipeline

DIMS = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)
OPTS = dict(sample_length=6, language="en")


@pytest.fixture(scope="module")
def pipe():
    return WhisperPipeline(dims=DIMS, params=init_params(jax.random.PRNGKey(0), DIMS))


def test_scheduler_batches_concurrent_requests(pipe):
    sched = BatchScheduler(pipe, max_batch=8, max_wait_ms=200.0)
    rng = np.random.default_rng(0)
    audios = [
        (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32) for _ in range(6)
    ]
    futures = [sched.submit(a, DecodingOptions(**OPTS)) for a in audios]
    results = [f.result(timeout=300) for f in futures]
    assert all(r.segments is not None for r in results)
    assert sched.jobs_run == 6
    # the collector should have coalesced them into few batches
    assert sched.batches_run <= 3
    sched.shutdown()


def test_scheduler_separates_incompatible_options(pipe):
    sched = BatchScheduler(pipe, max_batch=8, max_wait_ms=100.0)
    rng = np.random.default_rng(1)
    a = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    f1 = sched.submit(a, DecodingOptions(**OPTS))
    f2 = sched.submit(a, DecodingOptions(sample_length=6, language="en",
                                         without_timestamps=True))
    r1, r2 = f1.result(timeout=300), f2.result(timeout=300)
    sp = pipe.tokenizer.special
    assert any(t >= sp.timestamp_begin for s in r1.segments for t in s.tokens)
    assert all(t < sp.timestamp_begin for s in r2.segments for t in s.tokens)
    assert sched.batches_run >= 2  # incompatible → separate batches
    sched.shutdown()


def test_scheduler_long_audio_falls_back(pipe):
    sched = BatchScheduler(pipe, max_batch=4, max_wait_ms=50.0)
    rng = np.random.default_rng(2)
    long_audio = (rng.standard_normal(16000 * 40) * 0.1).astype(np.float32)
    res = sched.submit(
        long_audio, DecodingOptions(chunking_strategy="vad", **OPTS)
    ).result(timeout=600)
    assert res.segments
    assert res.timings.input_audio_seconds == pytest.approx(40.0, abs=0.2)
    sched.shutdown()


def test_scheduler_transcribe_sync_api(pipe):
    sched = BatchScheduler(pipe, max_batch=4, max_wait_ms=20.0)
    rng = np.random.default_rng(3)
    a = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    res = sched.transcribe(a, DecodingOptions(**OPTS), timeout=300)
    assert res.timings.input_audio_seconds == pytest.approx(1.0, abs=0.05)
    sched.shutdown()
