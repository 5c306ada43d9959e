"""Unit tests for the shared serving load harness (eval/loadgen.py).

The harness feeds both bench.py's serving secondary and
tools/perf_serve.py; these tests pin its measurement semantics with a
stub scheduler so no model/device is needed.
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading
import time

import numpy as np

from whisperkit_tpu.eval.loadgen import poisson_gaps, run_load


class _StubSched:
    """Minimal BatchScheduler surface for run_load: futures are completed
    externally by the test."""

    def __init__(self):
        self.batches_run = 0
        self.jobs_run = 0
        self.windows_run = 0
        self._queue = queue.Queue()
        self._pending = []
        self.futures: list[concurrent.futures.Future] = []

    def submit(self, clip, options):
        f: concurrent.futures.Future = concurrent.futures.Future()
        self.futures.append(f)
        return f


class _StubPipe:
    timings = None


def test_poisson_gaps_are_cumulative_and_positive():
    gaps = poisson_gaps(np.random.default_rng(0), rate_rps=4.0, n=32)
    assert len(gaps) == 32
    assert all(b > a for a, b in zip(gaps, gaps[1:]))
    # mean inter-arrival ~ 1/rate
    inter = np.diff([0.0] + gaps)
    assert 0.1 < float(np.mean(inter)) < 0.6


def test_latency_stamped_at_completion_not_observation():
    """A request that finishes while run_load is still blocked on an
    earlier future must record its COMPLETION-time latency, not the
    moment the collecting thread got around to observing it (mixed-
    duration staggered scenarios hit this ordering constantly)."""
    sched = _StubSched()

    def completer():
        while len(sched.futures) < 2:
            time.sleep(0.005)
        # second request finishes FIRST
        time.sleep(0.15)
        sched.futures[1].set_result("b")
        time.sleep(0.35)
        sched.futures[0].set_result("a")

    t = threading.Thread(target=completer, daemon=True)
    t.start()
    out = run_load(sched, _StubPipe(), [np.zeros(160), np.zeros(160)], None)
    t.join(timeout=2)
    # true latencies ~[0.5, 0.15] → p50 of sorted pair ≈ 0.325; the
    # observe-order bug would stamp both ≈0.5 → p50 0.5
    assert out["p50_s"] < 0.45, out
    assert out["p99_s"] >= 0.45, out
    assert out["requests"] == 2


def test_arrival_gaps_stagger_submissions():
    sched = _StubSched()
    seen_at: list[float] = []
    orig_submit = sched.submit

    def submit(clip, options):
        seen_at.append(time.perf_counter())
        f = orig_submit(clip, options)
        f.set_result("x")  # complete immediately
        return f

    sched.submit = submit
    run_load(
        sched, _StubPipe(), [np.zeros(160)] * 3, None,
        arrival_gaps=[0.0, 0.1, 0.2],
    )
    assert seen_at[1] - seen_at[0] >= 0.08
    assert seen_at[2] - seen_at[1] >= 0.08
