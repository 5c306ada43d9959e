"""Stage tracing: named scopes + wall-clock signpost intervals.

Reference: Sources/WhisperKit/Utilities/Logging.swift:9-48 — OSSignposter
intervals around TranscribeAudio / Decode / ExtractAudioFeatures /
EncodeAudio, used at TranscribeTask.swift:62, TextDecoder.swift:323,
FeatureExtractor.swift:49, AudioEncoder.swift:56.

TPU equivalents: `jax.profiler.TraceAnnotation` marks show up in profiler
traces (xprof/tensorboard); `signpost()` additionally records wall-clock
intervals queryable from tests/benchmarks. Start a device trace with
`start_trace(logdir)` / `stop_trace()` around a workload.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

_intervals: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def signpost(name: str) -> Iterator[None]:
    """Profiler annotation + wall-clock interval recording."""
    import jax

    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        _intervals[name].append(time.perf_counter() - t0)


def intervals(name: str) -> list[float]:
    return list(_intervals[name])


def reset() -> None:
    _intervals.clear()


def summary() -> dict[str, dict[str, float]]:
    out = {}
    for name, times in _intervals.items():
        out[name] = {
            "count": len(times),
            "total_s": sum(times),
            "mean_ms": 1000.0 * sum(times) / max(len(times), 1),
        }
    return out


def start_trace(logdir: str) -> None:
    import jax

    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    import jax

    jax.profiler.stop_trace()
