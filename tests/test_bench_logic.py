"""The bench acceptance methodology (converge-then-worst-of-N) as pure
logic — the headline's validity rests on these rules, so they get unit
tests even though bench.py itself only runs on TPU.

Reference metric analog: Models.swift:770-772 (RTF); the methodology is
this repo's own (docs/BENCHMARKS.md "Headline stability")."""

import time

import pytest

from bench import timed_converged, window_converged


def test_window_converged_needs_want_values():
    assert not window_converged([1.0], 2)
    assert window_converged([1.0, 1.01], 2)


def test_window_converged_tolerance():
    assert window_converged([1.0, 1.09], 2)  # 9% < 10%
    assert not window_converged([1.0, 1.11], 2)  # 11% spread
    # only the LAST want entries count — an early outlier is forgiven
    assert window_converged([5.0, 1.0, 1.02, 1.03], 3)
    # a late outlier (the mid-pass transport stall) breaks the window
    assert not window_converged([1.0, 1.02, 3.7], 3)


def test_timed_converged_reports_worst_of_converged_window():
    # durations: one-off spike at call 1, then steady — must keep timing
    # past the spike and report the worst of the final converged window,
    # NOT include the spike (worst-of-fixed-2 would) and NOT the best.
    durations = iter([0.02, 0.06, 0.021, 0.022])
    calls = []

    def fn(i):
        calls.append(i)
        time.sleep(next(durations))

    wall = timed_converged(fn, want=2, max_extra=3)
    assert len(calls) == 4  # 2 + 2 extras to re-converge
    assert 0.021 <= wall < 0.06  # worst of the converged window


def test_timed_converged_bounded_when_never_converging():
    # strictly growing durations never converge: the loop must stop at
    # want + max_extra calls and still return the worst of the last want
    durations = [0.01 * (1.5 ** k) for k in range(10)]
    it = iter(durations)
    n = 0

    def fn(i):
        nonlocal n
        n += 1
        time.sleep(next(it))

    wall = timed_converged(fn, want=2, max_extra=3)
    assert n == 5
    assert wall == pytest.approx(durations[4], rel=0.5)
