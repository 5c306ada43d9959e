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


def test_scheduler_long_windows_batch_with_short_requests(pipe):
    """r4 window-level continuous batching: a long request's VAD chunks
    share batches with concurrent short requests instead of decoding alone
    through padded fixed-size groups — and its result must equal the
    pipeline's own VAD path on the same audio."""
    rng = np.random.default_rng(4)
    long_audio = (rng.standard_normal(16000 * 65) * 0.1).astype(np.float32)
    short = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    # deterministic greedy config: with the ladder on, t>0 rungs sample
    # with row-position-dependent RNG, so outputs would legitimately
    # depend on batch composition
    opts = DecodingOptions(
        chunking_strategy="vad", temperature_fallback_count=0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, first_token_log_prob_threshold=None,
        **OPTS,
    )

    sched = BatchScheduler(pipe, max_batch=8, max_wait_ms=300.0)
    f_long = sched.submit(long_audio, opts)
    f_short = [sched.submit(short, opts) for _ in range(2)]
    res_long = f_long.result(timeout=600)
    for f in f_short:
        assert f.result(timeout=600).timings.input_audio_seconds > 0
    # 3 long windows + 2 shorts = 5 window units; window batching packs
    # them into a single bucket-8 batch (long job no longer runs alone)
    assert sched.windows_run == 5
    assert sched.batches_run == 1
    assert sched.jobs_run == 3
    sched.shutdown()

    # output equivalence vs the pipeline's own batched VAD path
    ref = pipe.transcribe(long_audio, opts)
    assert [s.tokens for s in res_long.segments] == [
        s.tokens for s in ref.segments
    ]
    assert [round(s.start, 3) for s in res_long.segments] == [
        round(s.start, 3) for s in ref.segments
    ]


def test_scheduler_long_job_single_language(pipe, monkeypatch):
    """A multi-window job with UNSET language decodes EVERY window in ONE
    language — the one detected for its lowest-index window (reference:
    one detection per transcription; only detect_language=True re-detects
    per window). Per-row detection returning different languages for
    different windows of the same job must not code-switch the transcript
    (r5 review finding)."""
    rng = np.random.default_rng(6)
    long_audio = (rng.standard_normal(16000 * 65) * 0.1).astype(np.float32)
    det = dict(
        chunking_strategy="vad", sample_length=6, temperature_fallback_count=0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, first_token_log_prob_threshold=None,
    )

    # per-row detection deliberately disagrees across rows: without per-job
    # consolidation the job's windows would decode in different languages
    def fake_detect(self, ck, cv, n_rows=None):
        return (["en", "zh"] * n_rows)[:n_rows]

    monkeypatch.setattr(
        WhisperPipeline, "_detect_languages_per_row", fake_detect
    )
    built = []
    orig_build = WhisperPipeline._build_prompt

    def spy_build(self, options, language):
        built.append(language)
        return orig_build(self, options, language)

    monkeypatch.setattr(WhisperPipeline, "_build_prompt", spy_build)

    sched = BatchScheduler(pipe, max_batch=8, max_wait_ms=300.0)
    res = sched.submit(long_audio, DecodingOptions(**det)).result(timeout=600)
    sched.shutdown()
    assert res.language == "en"  # window 0's detection
    assert set(built) == {"en"}  # every window decoded with the job language


def test_scheduler_mixed_language_batch(pipe, monkeypatch):
    """Jobs with UNSET language sharing one batch each detect and decode in
    their OWN language (per-row prompts in one static-shape decode) — one
    job's detection must not leak into another's (reference: each
    transcription detects independently, TextDecoder.swift:420)."""
    rng = np.random.default_rng(5)
    a1 = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    a2 = a1.copy()  # SAME audio: rows differ ONLY by per-row language
    # deterministic greedy (no ladder): batched rows must equal solo decodes
    det = dict(
        sample_length=6, temperature_fallback_count=0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, first_token_log_prob_threshold=None,
    )
    # pin per-row detection to the tiny model's two languages (random-init
    # weights make real detection arbitrary; the mechanics under test are
    # the per-row threading, not langid quality)
    calls = []

    def fake_detect(self, ck, cv, n_rows=None):
        calls.append(n_rows)
        return ["en", "zh"][:n_rows]

    monkeypatch.setattr(
        WhisperPipeline, "_detect_languages_per_row", fake_detect
    )
    built = []
    orig_build = WhisperPipeline._build_prompt

    def spy_build(self, options, language):
        prompt = orig_build(self, options, language)
        built.append((language, tuple(prompt[0])))
        return prompt

    monkeypatch.setattr(WhisperPipeline, "_build_prompt", spy_build)

    sched = BatchScheduler(pipe, max_batch=8, max_wait_ms=300.0)
    f1 = sched.submit(a1, DecodingOptions(**det))
    f2 = sched.submit(a2, DecodingOptions(**det))
    r1, r2 = f1.result(timeout=300), f2.result(timeout=300)
    assert sched.batches_run == 1  # one mixed batch
    assert calls == [2]  # one per-row detection for the group
    assert (r1.language, r2.language) == ("en", "zh")
    # the ONE batched decode built per-row prompts whose language TOKENS
    # differ (direct proof the detection didn't collapse to one language)
    by_lang = dict(built)
    assert {"en", "zh"} <= set(by_lang)
    assert by_lang["en"] != by_lang["zh"]
    assert len(by_lang["en"]) == len(by_lang["zh"])  # one static shape
    sched.shutdown()

    # each row must equal the SOLO decode under its own language — proof the
    # per-row prompt carried the right language token into the shared batch
    solo1 = pipe.transcribe(a1, DecodingOptions(language="en", **{
        k: v for k, v in det.items()}))
    solo2 = pipe.transcribe(a2, DecodingOptions(language="zh", **{
        k: v for k, v in det.items()}))
    assert [s.tokens for s in r1.segments] == [s.tokens for s in solo1.segments]
    assert [s.tokens for s in r2.segments] == [s.tokens for s in solo2.segments]


def test_scheduler_transcribe_sync_api(pipe):
    sched = BatchScheduler(pipe, max_batch=4, max_wait_ms=20.0)
    rng = np.random.default_rng(3)
    a = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    res = sched.transcribe(a, DecodingOptions(**OPTS), timeout=300)
    assert res.timings.input_audio_seconds == pytest.approx(1.0, abs=0.05)
    sched.shutdown()


def test_scheduler_latency_class_decodes_alone(pipe):
    """priority="latency" requests never wait to batch and decode at
    batch 1 even when submitted together (VERDICT r3 #7: the latency class
    is how a deployment reaches the speculative loop)."""
    sched = BatchScheduler(pipe, max_batch=8, max_wait_ms=300.0)
    rng = np.random.default_rng(5)
    audios = [
        (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
        for _ in range(3)
    ]
    opts = DecodingOptions(priority="latency", **OPTS)
    futures = [sched.submit(a, opts) for a in audios]
    results = [f.result(timeout=300) for f in futures]
    assert all(r.segments is not None for r in results)
    assert sched.batches_run == 3  # one b=1 decode per request
    # a latency request must match the plain pipeline's solo decode
    solo = pipe.transcribe(audios[0], DecodingOptions(**OPTS))
    assert [s.tokens for s in results[0].segments] == [
        s.tokens for s in solo.segments
    ]
    sched.shutdown()


def test_scheduler_latency_does_not_break_throughput_batching(pipe):
    """Mixed submission: throughput requests still coalesce; the latency
    request runs its own b=1 batch."""
    sched = BatchScheduler(pipe, max_batch=8, max_wait_ms=300.0)
    rng = np.random.default_rng(6)
    a = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    tp = [sched.submit(a, DecodingOptions(**OPTS)) for _ in range(4)]
    lat = sched.submit(a, DecodingOptions(priority="latency", **OPTS))
    for f in tp + [lat]:
        f.result(timeout=300)
    # 4 throughput jobs coalesce (1-2 batches); + one latency batch
    assert sched.batches_run <= 3
    assert sched.jobs_run == 5
    sched.shutdown()


def test_scheduler_latency_runs_speculative_with_draft(pipe, monkeypatch):
    """A latency-class request on a draft-armed pipeline routes through the
    lossless draft-verify loop (decoding/speculative.py) — the speculative
    feature is now reachable from the serving path."""
    import whisperkit_tpu.pipelines.whisper as wp

    draft_params = init_params(jax.random.PRNGKey(9), DIMS)
    spec_pipe = WhisperPipeline(
        dims=DIMS, params=pipe.params,
        draft_dims=DIMS, draft_params=draft_params,
    )
    calls = []
    orig = None
    from whisperkit_tpu.decoding import speculative as spec_mod

    orig = spec_mod.speculative_decode_loop

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(spec_mod, "speculative_decode_loop", spy)
    sched = BatchScheduler(spec_pipe, max_batch=8, max_wait_ms=50.0)
    rng = np.random.default_rng(7)
    a = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    res = sched.submit(
        a, DecodingOptions(priority="latency", **OPTS)
    ).result(timeout=300)
    assert res.segments is not None
    assert calls, "latency request did not take the speculative path"
    # lossless: tokens identical to the plain greedy decode
    plain = pipe.transcribe(a, DecodingOptions(**OPTS))
    assert [s.tokens for s in res.segments] == [
        s.tokens for s in plain.segments
    ]
    sched.shutdown()


def test_scheduler_latency_stream_does_not_starve_throughput(pipe, monkeypatch):
    """A continuous latency stream must not starve batched work: under
    contention the classes alternate, so throughput jobs complete while
    latency requests keep arriving (bounded wait both ways)."""
    order = []
    orig = BatchScheduler._process_group

    def spy(self, group):
        classes = {w.options.priority for w in group}
        assert len(classes) == 1, "a batch mixed latency+throughput windows"
        if "latency" in classes:
            assert len(group) == 1, "latency windows must decode alone"
        order.append(group[0].options.priority)
        return orig(self, group)

    monkeypatch.setattr(BatchScheduler, "_process_group", spy)
    sched = BatchScheduler(pipe, max_batch=8, max_wait_ms=100.0)
    rng = np.random.default_rng(8)
    a = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    lat_opts = DecodingOptions(priority="latency", **OPTS)
    tp_opts = DecodingOptions(**OPTS)
    # enqueue an interleaved burst: 4 latency + 4 throughput
    futs = []
    for _ in range(4):
        futs.append(sched.submit(a, lat_opts))
        futs.append(sched.submit(a, tp_opts))
    for f in futs:
        f.result(timeout=300)
    sched.shutdown()
    assert "throughput" in order and "latency" in order
    # no long latency run while throughput work was pending: between any
    # two throughput batches there is at most... directly: the first
    # throughput batch must run before the LAST latency batch (alternation
    # kicked in instead of draining every latency request first)
    assert order.index("throughput") < len(order) - 1 - order[::-1].index("latency")


def test_scheduler_latency_failure_reaches_future(pipe, monkeypatch):
    """A decode failure inside a latency group must surface on the
    request's future (same guarantee as the batched path), and the
    scheduler must keep serving afterwards."""
    calls = {"n": 0}
    orig = BatchScheduler._process_group

    def failing(self, group):
        if group[0].options.priority == "latency" and calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("injected decode failure")
        return orig(self, group)

    monkeypatch.setattr(BatchScheduler, "_process_group", failing)
    sched = BatchScheduler(pipe, max_batch=4, max_wait_ms=50.0)
    rng = np.random.default_rng(9)
    a = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    f_bad = sched.submit(a, DecodingOptions(priority="latency", **OPTS))
    with pytest.raises(RuntimeError, match="injected"):
        f_bad.result(timeout=300)
    # scheduler still alive: both classes decode fine afterwards
    f_lat = sched.submit(a, DecodingOptions(priority="latency", **OPTS))
    f_tp = sched.submit(a, DecodingOptions(**OPTS))
    assert f_lat.result(timeout=300).segments is not None
    assert f_tp.result(timeout=300).segments is not None
    sched.shutdown()


def test_scheduler_shutdown_does_not_hang_with_backlog(pipe):
    """shutdown() returns promptly even with queued work (bounded join)."""
    import time as _time

    sched = BatchScheduler(pipe, max_batch=4, max_wait_ms=50.0)
    rng = np.random.default_rng(10)
    a = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    futs = [sched.submit(a, DecodingOptions(**OPTS)) for _ in range(3)]
    for f in futs:  # let the in-flight work land first
        f.result(timeout=300)
    t0 = _time.perf_counter()
    sched.shutdown()
    assert _time.perf_counter() - t0 < 10.0


def test_scheduler_long_latency_request_demoted_to_batched(pipe):
    """A latency-class request longer than one window is demoted to
    throughput: serial b=1 decodes would be slower than its own batched
    path AND monopolize the collector (r8 self-review finding #1). Its
    windows must batch together, and concurrent work must still complete."""
    sched = BatchScheduler(pipe, max_batch=8, max_wait_ms=300.0)
    rng = np.random.default_rng(12)
    long_audio = (rng.standard_normal(16000 * 65) * 0.1).astype(np.float32)
    short = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    opts = dict(
        chunking_strategy="vad", temperature_fallback_count=0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, first_token_log_prob_threshold=None,
        **OPTS,
    )
    f_long = sched.submit(
        long_audio, DecodingOptions(priority="latency", **opts)
    )
    f_short = sched.submit(short, DecodingOptions(**opts))
    res_long = f_long.result(timeout=600)
    assert f_short.result(timeout=600).segments is not None
    assert res_long.segments
    # demoted: the long job's windows batched (NOT one b=1 batch per
    # window) — 3 windows + 1 short = ≤2 batches, not 4
    assert sched.batches_run <= 2
    sched.shutdown()


def test_scheduler_zero_window_request_resolves_and_collector_survives(pipe):
    """A long request whose clip_timestamps select an empty region expands
    to ZERO windows: its future must still resolve (empty result, matching
    the pipeline's own zero-chunk VAD behavior) and the collector thread
    must survive to serve later requests (an unguarded selection pass on
    an empty pending list used to raise StopIteration and kill it)."""
    sched = BatchScheduler(pipe, max_batch=4, max_wait_ms=50.0)
    rng = np.random.default_rng(7)
    long_audio = (rng.standard_normal(16000 * 40) * 0.1).astype(np.float32)
    f_empty = sched.submit(
        long_audio,
        DecodingOptions(**OPTS, chunking_strategy="vad",
                        clip_timestamps=[39.0, 39.0]),
    )
    r = f_empty.result(timeout=60)
    assert r.segments == [] and r.text == ""
    # the scheduler is still alive: a normal request completes
    short = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    r2 = sched.submit(short, DecodingOptions(**OPTS)).result(timeout=300)
    assert r2.segments is not None
    sched.shutdown()


def test_scheduler_progress_callback_streams_windows_in_order(pipe):
    """submit(progress_callback=...) fires one delta per decoded window in
    CHRONOLOGICAL order (windows land out of order across batches), and the
    concatenated deltas equal the final result text (the server's SSE
    streaming path rides this instead of racing the pipeline from
    per-request threads)."""
    sched = BatchScheduler(pipe, max_batch=4, max_wait_ms=50.0)
    rng = np.random.default_rng(8)
    long_audio = (rng.standard_normal(16000 * 65) * 0.1).astype(np.float32)
    deltas: list[str] = []
    res = sched.submit(
        long_audio,
        DecodingOptions(**OPTS, chunking_strategy="vad"),
        progress_callback=deltas.append,
    ).result(timeout=600)
    assert len(deltas) >= 2  # 65 s → multiple VAD windows
    assert "".join(deltas).strip() == res.text
    # short request: exactly one delta, equal to the result text
    short = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    short_deltas: list[str] = []
    r2 = sched.submit(
        short, DecodingOptions(**OPTS), progress_callback=short_deltas.append
    ).result(timeout=300)
    assert short_deltas == [r2.text]
    sched.shutdown()


def test_scheduler_progress_callback_cancels_remaining_windows(pipe):
    """A progress callback returning False after the first delta cancels
    the job: the future resolves with the partial (decoded-prefix) result
    instead of hanging, and undecoded windows are dropped."""
    sched = BatchScheduler(pipe, max_batch=1, max_wait_ms=50.0)
    rng = np.random.default_rng(9)
    long_audio = (rng.standard_normal(16000 * 65) * 0.1).astype(np.float32)
    deltas: list[str] = []

    def cancel_after_first(text: str):
        deltas.append(text)
        return False

    res = sched.submit(
        long_audio,
        DecodingOptions(**OPTS, chunking_strategy="vad"),
        progress_callback=cancel_after_first,
    ).result(timeout=600)
    assert len(deltas) == 1  # no deltas after the cancel
    assert res.text == deltas[0].strip()
    # the scheduler survives and serves later requests
    short = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    assert sched.submit(short, DecodingOptions(**OPTS)).result(
        timeout=300
    ).segments is not None
    sched.shutdown()


def test_scheduler_raising_progress_callback_is_contained(pipe):
    """A progress callback that RAISES (server event loop closed mid-decode)
    must act like a cancellation for ITS job only: the long job resolves
    with the partial result, a short request sharing the scheduler still
    succeeds, and a short request's own raising callback doesn't fail it."""
    sched = BatchScheduler(pipe, max_batch=4, max_wait_ms=50.0)
    rng = np.random.default_rng(11)
    long_audio = (rng.standard_normal(16000 * 65) * 0.1).astype(np.float32)
    short = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)

    deltas: list[str] = []

    def broken(text: str):
        deltas.append(text)
        raise RuntimeError("event loop is closed")

    f_long = sched.submit(
        long_audio,
        DecodingOptions(**OPTS, chunking_strategy="vad"),
        progress_callback=broken,
    )
    f_short = sched.submit(short, DecodingOptions(**OPTS))
    res_long = f_long.result(timeout=600)  # partial, NOT an exception
    assert len(deltas) == 1  # cancelled after the first (raising) delta
    assert res_long.text == deltas[0].strip()
    assert f_short.result(timeout=300).segments is not None  # blast radius: none

    # short request with a raising callback: still resolves with its result
    short_deltas: list[str] = []

    def broken_short(text: str):
        short_deltas.append(text)
        raise RuntimeError("event loop is closed")

    r = sched.submit(
        short, DecodingOptions(**OPTS), progress_callback=broken_short
    ).result(timeout=300)
    assert short_deltas == [r.text]
    sched.shutdown()


def test_scheduler_segments_carry_language(pipe):
    """Scheduler-assembled results stamp TranscriptionSegment.language like
    the pipeline's VAD/seek paths do, so the same audio yields the same
    segment metadata / writer output through BatchScheduler as through
    pipeline.transcribe (r4 advisor finding)."""
    rng = np.random.default_rng(9)
    sched = BatchScheduler(pipe, max_batch=8, max_wait_ms=200.0)
    # short (single-window) request
    short = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    res_s = sched.submit(short, DecodingOptions(**OPTS)).result(timeout=600)
    assert res_s.segments and all(s.language == "en" for s in res_s.segments)
    # long (multi-window) request
    long_audio = (rng.standard_normal(16000 * 65) * 0.1).astype(np.float32)
    det = dict(
        chunking_strategy="vad", sample_length=6, language="en",
        temperature_fallback_count=0, logprob_threshold=None,
        compression_ratio_threshold=None, no_speech_threshold=None,
        first_token_log_prob_threshold=None,
    )
    res_l = sched.submit(long_audio, DecodingOptions(**det)).result(timeout=600)
    sched.shutdown()
    assert res_l.segments and all(s.language == "en" for s in res_l.segments)
    assert res_l.language == "en"
