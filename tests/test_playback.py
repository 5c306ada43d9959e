"""Streaming playback engine: pre-buffer gating, chunk scheduling, fades.

Reference: AudioOutput.swift:38-700 (setBufferDuration gating, scheduled
chunks with fades) and TTSKit.swift:994-1063 (`.auto` buffer sizing from
the first measured step). The engine is pull-based, so these tests drive it
on a VIRTUAL clock — a simulated generator enqueues audio slower than real
time while a simulated sink pulls in real time — no audio hardware and no
sleeps.
"""

import numpy as np
import pytest

from whisperkit_tpu.audio.output import PlaybackStrategy, StreamingAudioOutput

SR = 24_000
FRAME_S = 0.08  # one 12.5 Hz TTS frame
GEN_S = 0.1  # generation wall-time per frame → ratio 1.25 (slower than RT)


def _simulate(engine: StreamingAudioOutput, total_audio_s: float, tick_s=0.01):
    """Virtual-time co-simulation: the generator produces one FRAME_S chunk
    every GEN_S of virtual time; the sink pulls every tick. Returns the
    concatenated sink output."""
    n_frames = int(round(total_audio_s / FRAME_S))
    frame = np.ones(int(FRAME_S * SR), np.float32)  # constant 1.0 "audio"
    engine.set_measured_step(GEN_S, FRAME_S)

    t = 0.0
    produced = 0
    next_gen = GEN_S
    out = []
    # run until everything generated AND drained (cap iterations for safety)
    for _ in range(200_000):
        if produced < n_frames and t >= next_gen:
            engine.enqueue(frame * (produced + 1))  # identifiable chunks
            produced += 1
            next_gen += GEN_S
            if produced == n_frames:
                engine.finish()
        out.append(engine.pull(int(tick_s * SR)))
        t += tick_s
        if produced == n_frames and engine.drained:
            break
    return np.concatenate(out)


def test_auto_prebuffer_gapless():
    """With .auto sizing from the measured step, playback of 8 s generated
    at 1.25× slower than real time must be gapless (zero underruns) and
    deliver every sample in order."""
    engine = StreamingAudioOutput(SR, PlaybackStrategy.AUTO)
    got = _simulate(engine, total_audio_s=8.0)
    assert engine.underruns == 0
    # every enqueued sample delivered (fade ramps rescale a handful)
    nz = got[got != 0.0]
    total = int(8.0 / FRAME_S) * int(FRAME_S * SR)
    assert abs(len(nz) - total) <= 200
    # chunk ids must be non-decreasing (ordered scheduling)
    ids = nz[nz == np.round(nz)]  # fade ramps scale samples; exact ones are chunk ids
    assert (np.diff(ids) >= 0).all()
    # required buffer honored: nothing played before the gate opened
    assert engine.started_after_seconds >= engine.required_buffer_seconds


def test_stream_strategy_underruns_when_generation_is_slow():
    engine = StreamingAudioOutput(SR, PlaybackStrategy.STREAM)
    _simulate(engine, total_audio_s=8.0)
    assert engine.required_buffer_seconds == 0.0
    assert engine.underruns > 0  # no pre-buffer → starvation is expected


def test_generate_first_waits_for_finish():
    engine = StreamingAudioOutput(SR, PlaybackStrategy.GENERATE_FIRST)
    engine.enqueue(np.ones(SR, np.float32))
    assert engine.pull(100).sum() == 0.0  # gated: generation not finished
    engine.finish()
    assert engine.pull(100).sum() > 0.0


def test_explicit_buffer_duration():
    engine = StreamingAudioOutput(SR, PlaybackStrategy.AUTO)
    engine.set_buffer_duration(0.5)
    engine.enqueue(np.ones(int(0.25 * SR), np.float32))
    assert engine.pull(10).sum() == 0.0  # 0.25 s < 0.5 s gate
    engine.enqueue(np.ones(int(0.30 * SR), np.float32))
    assert engine.pull(10).sum() > 0.0  # gate open


def test_auto_sizing_first_measurement_wins():
    engine = StreamingAudioOutput(SR, PlaybackStrategy.AUTO)
    engine.set_measured_step(0.1, 0.08)
    first = engine.required_buffer_seconds
    engine.set_measured_step(10.0, 0.08)  # later, slower measurement ignored
    assert engine.required_buffer_seconds == first > 0.0


def test_fades_applied_on_start_and_drain():
    engine = StreamingAudioOutput(SR, PlaybackStrategy.STREAM, fade_seconds=0.001)
    engine.enqueue(np.ones(480, np.float32))
    out = engine.pull(480)
    assert out[0] < 0.1  # fade-in from silence
    assert out[-1] == pytest.approx(1.0)
    engine.enqueue(np.ones(100, np.float32))
    out2 = engine.pull(480)  # drains mid-pull → tail fade-out
    assert out2[99] < 1.0 or out2[0] < 1.0


def test_realtime_generation_needs_no_buffer():
    from whisperkit_tpu.audio.output import required_buffer_seconds

    assert required_buffer_seconds(PlaybackStrategy.AUTO, 0.05, 0.08) == 0.0
    assert required_buffer_seconds(PlaybackStrategy.AUTO, 0.16, 0.08) > 0.0


def test_pipeline_play_streaming_simulated_sink():
    """End-to-end: TTSPipeline.play_streaming on tiny dims drives the engine
    from a generator thread; a simulated sink drains it gapless after the
    gate opens."""
    jax = pytest.importorskip("jax")
    from whisperkit_tpu.pipelines.tts import GenerationOptions, TTSPipeline

    pipe = TTSPipeline()  # tiny-test dims by default
    opts = GenerationOptions(max_new_tokens=12, seed=3)
    engine, thread = pipe.play_streaming(
        "hello streaming", opts, PlaybackStrategy.STREAM, block_frames=4
    )
    thread.join(timeout=120)
    assert not thread.is_alive()
    chunks = []
    while not engine.drained:
        chunks.append(engine.pull(1024))
    audio = np.concatenate(chunks) if chunks else np.zeros(0)
    assert engine.pulled_samples > 0
    assert np.isfinite(audio).all()
