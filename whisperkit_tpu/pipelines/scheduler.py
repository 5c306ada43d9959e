"""Continuous batching: concurrent transcription requests share one decode.

Reference: the reference serves concurrent requests by running independent
batch-of-1 pipelines on TaskGroups (WhisperKit.swift:716-812,
`concurrentWorkerCount`). On TPU that wastes the batch dimension — the MXU
wants all concurrent 30 s windows STACKED. This scheduler is the TPU-native
replacement (SURVEY.md §7.7 "continuous batching of 30 s windows across
concurrent streams"):

  * `submit()` enqueues a request from any thread, returns a Future
  * a collector thread gathers compatible jobs (same decode-options
    signature → same compiled shapes) for up to `max_wait_ms`, up to
    `max_batch`
  * one batched mel → encode → decode runs per group; results fan back out

Batch sizes are bucketed to powers of two (padding with silent windows) so
XLA compiles a handful of shapes, not one per arrival pattern.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import math
import queue
import threading
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from whisperkit_tpu.audio.io import SAMPLE_RATE, pad_or_trim
from whisperkit_tpu.core.configurations import DecodingOptions
from whisperkit_tpu.core.results import TranscriptionResult
from whisperkit_tpu.text.segment_seeker import (
    WINDOW_FRAMES,
    find_seek_point_and_segments,
)

WINDOW_SAMPLES = 480_000


def _options_key(options: DecodingOptions) -> tuple:
    """Jobs share one batched decode ONLY when every decode-affecting
    option matches (the whole group is decoded with one options object)."""
    return (
        options.language,
        options.task,
        options.without_timestamps,
        options.word_timestamps,
        options.sample_length,
        options.beam_size,
        options.top_k,
        options.suppress_blank,
        tuple(options.prompt_tokens or ()),
        tuple(options.prefix_tokens or ()),
        options.temperature,
        options.temperature_increment_on_fallback,
        options.temperature_fallback_count,
        tuple(options.suppress_tokens or ()),
        options.compression_ratio_threshold,
        options.logprob_threshold,
        options.first_token_log_prob_threshold,
        options.no_speech_threshold,
        options.max_initial_timestamp,
        options.length_penalty,
        options.seed,
        options.detect_language,
    )


@dataclasses.dataclass
class _Job:
    audio: np.ndarray
    options: DecodingOptions
    future: concurrent.futures.Future
    enqueued_at: float
    long: bool = False  # > one window: runs alone via pipeline.transcribe


class BatchScheduler:
    """Batches ≤30 s requests; longer audio falls back to the pipeline's
    own (already batched) VAD path."""

    def __init__(
        self,
        pipeline,
        *,
        max_batch: int = 16,
        max_wait_ms: float = 30.0,
    ):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self._queue: "queue.Queue[Optional[_Job]]" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._running = True
        self._thread.start()
        self.batches_run = 0
        self.jobs_run = 0

    # -- public API ----------------------------------------------------------

    def submit(
        self, audio: np.ndarray, options: Optional[DecodingOptions] = None
    ) -> "concurrent.futures.Future[TranscriptionResult]":
        options = options or DecodingOptions()
        future: concurrent.futures.Future = concurrent.futures.Future()
        audio = np.asarray(audio, np.float32)
        # long-form jobs also go through the collector thread: the pipeline
        # object is not thread-safe (timings, language cache, lazy mesh), so
        # ALL pipeline use is serialized on that one thread; the long job's
        # own windows still batch internally via the VAD path
        self._queue.put(
            _Job(
                audio, options, future, time.perf_counter(),
                long=len(audio) > WINDOW_SAMPLES,
            )
        )
        return future

    def transcribe(self, audio, options=None, timeout: Optional[float] = None):
        return self.submit(audio, options).result(timeout)

    def shutdown(self) -> None:
        self._running = False
        self._queue.put(None)
        self._thread.join(timeout=5)

    # -- collector loop -------------------------------------------------------

    def _run(self) -> None:
        while self._running:
            job = self._queue.get()
            if job is None:
                continue
            if job.long:
                try:
                    job.future.set_result(
                        self.pipeline.transcribe(job.audio, job.options)
                    )
                    self.jobs_run += 1
                except Exception as e:
                    job.future.set_exception(e)
                continue
            group = [job]
            deadline = time.perf_counter() + self.max_wait_ms / 1000.0
            key = _options_key(job.options)
            spill: list[_Job] = []
            while len(group) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                if not nxt.long and _options_key(nxt.options) == key:
                    group.append(nxt)
                else:
                    spill.append(nxt)  # different options/long job: next round
            for s in spill:
                self._queue.put(s)
            try:
                self._process_group(group)
            except Exception as e:
                for j in group:
                    if not j.future.done():
                        j.future.set_exception(e)

    # -- batched execution -----------------------------------------------------

    def _bucket(self, n: int) -> int:
        return min(self.max_batch, 1 << max(0, math.ceil(math.log2(max(n, 1)))))

    def _process_group(self, group: list[_Job]) -> None:
        pipe = self.pipeline
        options = group[0].options
        n = len(group)
        bucket = self._bucket(n)

        mels = [
            pipe._mel(pad_or_trim(j.audio, WINDOW_SAMPLES)) for j in group
        ]
        while len(mels) < bucket:  # pad to the bucket with silence
            mels.append(pipe._mel(np.zeros(WINDOW_SAMPLES, np.float32)))
        mel_batch = jnp.stack(mels)

        # pipe._encode honors the serving config (fused int8 cross-KV)
        _, ck, cv = pipe._encode(mel_batch, options)
        language = pipe._resolve_language(options, ck, cv, n)
        decodes = pipe._decode_with_fallback(ck, cv, options, language, 0)[:n]

        sp = pipe.tokenizer.special
        for job, wd in zip(group, decodes):
            try:
                window_frames = min(
                    WINDOW_FRAMES, math.ceil(len(job.audio) / 160)
                )
                if pipe._should_skip_silent(wd, options):
                    segments = []
                else:
                    res = find_seek_point_and_segments(
                        tokens=wd.tokens,
                        token_logprobs=wd.logprobs,
                        special=sp,
                        time_offset=0.0,
                        window_frames=window_frames,
                        seek=0,
                        decode_fn=pipe.tokenizer.decode,
                        temperature=wd.temperature,
                        avg_logprob=wd.avg_logprob,
                        compression_ratio=wd.compression_ratio,
                        no_speech_prob=wd.no_speech_prob,
                    )
                    segments = res.segments
                    if options.word_timestamps and wd.alignment is not None:
                        segments = pipe._add_word_timestamps(
                            segments, wd, 0.0, window_frames, options
                        )
                text = "".join(s.text for s in segments).strip()
                result = TranscriptionResult(
                    text=text, segments=segments, language=language
                )
                result.timings.input_audio_seconds = len(job.audio) / SAMPLE_RATE
                job.future.set_result(result)
            except Exception as e:
                job.future.set_exception(e)
        self.batches_run += 1
        self.jobs_run += n
