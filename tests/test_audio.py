"""Audio front-end tests.

Reference coverage model: UnitTests.swift:295-477 (load/resample/pad/trim/
energy/channel modes), :2117-2333 (VAD + chunker).
"""

import numpy as np
import pytest

from whisperkit_tpu.audio.chunker import VADAudioChunker
from whisperkit_tpu.audio.io import (
    ChannelMode,
    SAMPLE_RATE,
    WINDOW_SAMPLES,
    convert_to_mono,
    energy_per_frame,
    load_audio,
    pad_or_trim,
    relative_energy_db,
    resample_audio,
    rms_energy,
)
from whisperkit_tpu.audio.vad import EnergyVAD, is_voice_detected
from whisperkit_tpu.core.results import TranscriptionResult, TranscriptionSegment, WordTiming


def test_load_jfk_wav(jfk_audio):
    assert jfk_audio.dtype == np.float32
    assert jfk_audio.shape[0] == 176000  # 11 s at 16 kHz
    assert 0.01 < np.abs(jfk_audio).max() <= 1.0


def test_load_m4a_resampled(resources):
    audio = load_audio(resources / "jfk_441khz.m4a")
    # 44.1 kHz m4a of the same 11 s clip → ~176k samples at 16 kHz
    assert abs(audio.shape[0] - 176000) < SAMPLE_RATE // 2


def test_load_multichannel_modes(resources):
    summed = load_audio(resources / "8_Channel_ID.m4a")
    selected = load_audio(
        resources / "8_Channel_ID.m4a", channel_mode=ChannelMode.SELECT, channel=2
    )
    assert summed.shape == selected.shape
    assert not np.allclose(summed, selected)


def test_convert_to_mono_peak_renorm():
    x = np.stack([np.full(100, 0.5, np.float32), np.full(100, 0.5, np.float32)])
    mono = convert_to_mono(x)
    # sum would be 1.0; renormalized back to the original 0.5 peak
    assert np.abs(mono).max() == pytest.approx(0.5, abs=1e-6)


def test_resample_sine_preserves_frequency():
    t = np.arange(44100) / 44100.0
    sine = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = resample_audio(sine, 44100, 16000)
    assert abs(out.shape[0] - 16000) <= 1
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * 16000 / len(out)
    assert abs(peak_hz - 440.0) < 5.0


def test_pad_or_trim():
    x = np.ones(1000, np.float32)
    padded = pad_or_trim(x)
    assert padded.shape[0] == WINDOW_SAMPLES
    assert padded[:1000].sum() == pytest.approx(1000)
    assert padded[1000:].sum() == 0
    trimmed = pad_or_trim(np.ones(WINDOW_SAMPLES * 2, np.float32), start=100)
    assert trimmed.shape[0] == WINDOW_SAMPLES


def test_energy():
    silence = np.zeros(1600, np.float32)
    tone = np.full(1600, 0.5, np.float32)
    assert rms_energy(silence) == 0.0
    assert rms_energy(tone) == pytest.approx(0.5)
    frames = energy_per_frame(np.concatenate([silence, tone]), 1600)
    assert frames.shape == (2,)
    assert frames[0] < 0.02 < frames[1]
    assert relative_energy_db(1.0, 1.0) == pytest.approx(0.0)


def _speech_silence_speech(speech_s=2.0, silence_s=1.5):
    rng = np.random.default_rng(0)
    speech = (rng.standard_normal(int(speech_s * SAMPLE_RATE)) * 0.2).astype(np.float32)
    silence = np.zeros(int(silence_s * SAMPLE_RATE), np.float32)
    return np.concatenate([speech, silence, speech])


def test_energy_vad_activity():
    vad = EnergyVAD()
    audio = _speech_silence_speech()
    activity = vad.voice_activity(audio)
    # 2 s speech = 20 frames active, 1.5 s silence = 15 inactive, 20 active
    assert activity[:20].all()
    assert not activity[20:35].any()
    assert activity[35:55].all()
    silence = vad.find_longest_silence(list(activity))
    assert silence == (20, 35)
    chunks = vad.calculate_active_chunks(audio)
    assert len(chunks) == 2
    assert chunks[0][0] == 0
    clip_ts = vad.voice_activity_clip_timestamps(audio)
    assert len(clip_ts) == 4
    assert clip_ts[0] == pytest.approx(0.0)
    assert clip_ts[1] == pytest.approx(2.0, abs=0.1)


def test_is_voice_detected():
    audio = _speech_silence_speech()
    assert is_voice_detected(audio)  # ends with speech
    assert not is_voice_detected(np.zeros(SAMPLE_RATE, np.float32))


def test_chunker_short_audio_single_chunk():
    audio = np.ones(SAMPLE_RATE * 5, np.float32) * 0.1
    chunks = VADAudioChunker().chunk_all(audio)
    assert len(chunks) == 1
    assert chunks[0].seek_offset_index == 0
    assert chunks[0].audio_samples.shape[0] == audio.shape[0]


def test_chunker_splits_at_silence():
    # 50 s audio: speech with a clear silence at ~20 s into the second half
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(SAMPLE_RATE * 50) * 0.2).astype(np.float32)
    silence_start = int(SAMPLE_RATE * 20)
    audio[silence_start : silence_start + SAMPLE_RATE * 2] = 0.0
    chunks = VADAudioChunker().chunk_all(audio)
    assert len(chunks) >= 2
    assert all(c.audio_samples.shape[0] <= WINDOW_SAMPLES for c in chunks)
    # chunks tile the audio exactly
    assert sum(c.audio_samples.shape[0] for c in chunks) == audio.shape[0]
    offsets = [c.seek_offset_index for c in chunks]
    assert offsets == sorted(offsets)
    # first split lands inside the inserted silence
    assert silence_start <= chunks[0].audio_samples.shape[0] <= silence_start + SAMPLE_RATE * 2


def test_update_seek_offsets():
    seg = TranscriptionSegment(start=1.0, end=2.0,
                               words=[WordTiming("a", [1], 1.0, 1.5, 0.9)])
    res = TranscriptionResult(segments=[seg])
    out = VADAudioChunker.update_seek_offsets_for_results([res], [SAMPLE_RATE * 30])
    assert out[0].segments[0].start == pytest.approx(31.0)
    assert out[0].segments[0].end == pytest.approx(32.0)
    assert out[0].segments[0].words[0].start == pytest.approx(31.0)


def test_wav_extensible_float32(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE wrapping IEEE float32 must decode as float,
    not be reinterpreted as int32 PCM."""
    import struct

    import numpy as np

    from whisperkit_tpu.audio.io import _read_wav

    rate = 16000
    samples = (np.sin(np.linspace(0, 100, rate)) * 0.5).astype(np.float32)
    raw = samples.tobytes()
    # fmt chunk: extensible (0xFFFE), 1ch, 32-bit + 22-byte extension with
    # IEEE-float subformat GUID (first two bytes 0x0003)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, rate, rate * 4, 4, 32) + struct.pack("<H", 22) + struct.pack("<HI", 32, 0x4) + struct.pack("<H", 3) + b"\x00" * 14
    data = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw)) + b"WAVE"
    data += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data += b"data" + struct.pack("<I", len(raw)) + raw
    p = tmp_path / "ext_float.wav"
    p.write_bytes(data)

    af = _read_wav(p)
    assert af.sample_rate == rate
    np.testing.assert_allclose(af.samples[0], samples, atol=1e-6)


# ---- chunked long-audio loading (AudioProcessor.swift:307-350) -------------


def _write_wav16(path, data_i16, rate, channels):
    import wave

    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(data_i16, "<i2").tobytes())


def test_chunked_resampler_bit_identity():
    """_ChunkedResampler output equals whole-array resample_audio bitwise
    across rate pairs, lengths, and arbitrary push sizes."""
    from whisperkit_tpu.audio.io import _ChunkedResampler, resample_audio

    rng = np.random.default_rng(0)
    for from_rate in (44100, 48000, 8000, 22050):
        for n in (0, 7, 160_001):
            x = (rng.standard_normal(n) * 0.3).astype(np.float32)
            want = resample_audio(x, from_rate, 16000)
            r = _ChunkedResampler(from_rate, 16000)
            step = max(r.context, r.down * (30_000 // r.down + 1))
            outs, pos = [], 0
            while pos < n:
                adv = int(rng.integers(1, 50_000))
                outs += r.push(x[pos : pos + adv], step)
                pos += adv
            outs.append(r.finish())
            got = np.concatenate(outs) if outs else np.empty(0, np.float32)
            assert got.shape == want.shape
            assert np.array_equal(got, want), (from_rate, n)


def test_stream_audio_matches_load_audio_wav(tmp_path):
    """np.concatenate(stream_audio(...)) is BIT-identical to load_audio for
    stereo 44.1 kHz WAV across channel modes and time ranges."""
    from whisperkit_tpu.audio.io import ChannelMode, load_audio, stream_audio

    rng = np.random.default_rng(1)
    n = 44100 * 19
    stereo = (rng.standard_normal((n, 2)) * 8000).astype(np.int16)
    stereo[1234, 0] = -32768
    p = tmp_path / "s.wav"
    _write_wav16(p, stereo.reshape(-1), 44100, 2)
    for kwargs in (
        dict(),
        dict(channel_mode=ChannelMode.SELECT, channel=1),
        dict(start_time=3.21, end_time=14.7),
        dict(start_time=0.0, end_time=99.0),  # end past EOF
    ):
        want = load_audio(p, **kwargs)
        parts = list(stream_audio(p, chunk_seconds=4.0, **kwargs))
        got = np.concatenate(parts) if parts else np.zeros(0, np.float32)
        assert got.shape == want.shape, kwargs
        assert np.array_equal(got, want), kwargs


def test_stream_audio_matches_load_audio_native(resources):
    """Native incremental decode (wk_open/read/close) streams m4a with the
    same samples as the whole-file path, including the 8-channel SUM-mode
    global renormalization (two-pass)."""
    from whisperkit_tpu.audio import native
    from whisperkit_tpu.audio.io import load_audio, stream_audio

    if not native.stream_available():
        pytest.skip("native stream API unavailable")
    for name in ("ted_60.m4a", "8_Channel_ID.m4a"):
        p = resources / name
        want = load_audio(p)
        got = np.concatenate(list(stream_audio(p, chunk_seconds=3.0)))
        assert got.shape == want.shape
        assert np.array_equal(got, want), name


@pytest.mark.slow
def test_load_audio_one_hour_wav_bounded_rss(tmp_path):
    """1-hour WAV: the auto-chunked load_audio path returns bit-identical
    samples to the whole-file path while a subprocess's peak RSS stays
    bounded (VERDICT r4 #5 acceptance). Whole-file 22.05 kHz→16 kHz pays a
    ~630 MB f64 resample transient; chunked must stay well under it."""
    import subprocess
    import sys as _sys
    import textwrap

    from whisperkit_tpu.audio import io as aio

    rate, secs = 22050, 3600
    p = tmp_path / "hour.wav"
    rng = np.random.default_rng(2)
    import wave

    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        for _ in range(60):  # write in 1-min pieces to keep the TEST cheap
            blk = (rng.standard_normal(rate * 60) * 8000).astype("<i2")
            w.writeframes(blk.tobytes())

    # chunked load in a subprocess → attributable peak RSS
    code = textwrap.dedent(f"""
        import resource, sys
        import numpy as np
        sys.path.insert(0, {str(aio.Path(__file__).resolve().parents[1])!r})
        from whisperkit_tpu.audio.io import load_audio
        x = load_audio({str(p)!r})
        np.save({str(tmp_path / "chunked.npy")!r}, x)
        peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        print(f"PEAK_MB={{peak_mb:.0f}}")
    """)
    out = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True,
        timeout=900, env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                          "PYTHONPATH": ""},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    peak_mb = float(out.stdout.strip().split("PEAK_MB=")[1])
    # numpy+scipy baseline is ~150 MB; output f32 is 230 MB; the 10-min
    # chunk transient ~170 MB. Whole-file would exceed 1.2 GB.
    assert peak_mb < 800, f"chunked peak RSS {peak_mb:.0f} MB"

    got = np.load(tmp_path / "chunked.npy")
    # whole-file reference path (chunking disabled)
    orig = aio.CHUNKED_LOAD_SECONDS
    aio.CHUNKED_LOAD_SECONDS = float("inf")
    try:
        want = aio.load_audio(p)
    finally:
        aio.CHUNKED_LOAD_SECONDS = orig
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_native_f32_grid_to_i16_matches_numpy():
    """The native single-pass grid check + convert (wk_f32_grid_to_i16)
    must agree with the NumPy reference on grid membership AND converted
    values — including ties-to-even rounding, full-scale -1.0, and +1.0
    (32768, OUT of int16 range so not lossless)."""
    from whisperkit_tpu.audio import native

    if native._load() is None or not getattr(
        native._load(), "_wk_has_grid_api", False
    ):
        import pytest as _pytest

        _pytest.skip("native grid API unavailable")

    rng = np.random.default_rng(7)
    grid = (rng.standard_normal(4096) * 6000).astype(np.int16).astype(
        np.float32
    ) / 32768.0
    off = (rng.standard_normal(4096) * 0.1).astype(np.float32)
    tie = np.full(8, np.float32(2.5 / 32768.0))  # rint(2.5) = 2, ties-to-even
    edge = np.array([-1.0, 32767 / 32768.0, 0.0], np.float32)
    over = np.array([1.0, -1.5, 1.5], np.float32)  # beyond int16 range

    for arr, want_lossless in [
        (grid, True), (off, False), (tie, False),
        (edge, True), (over, False),
        (np.concatenate([grid, off]), False),
    ]:
        res = native.f32_grid_to_i16(arr)
        assert res is not None
        i16, lossless = res
        assert lossless == want_lossless, arr[:4]
        scaled = arr * np.float32(32768.0)
        ref = np.clip(np.rint(scaled), -32768, 32767).astype(np.int16)
        np.testing.assert_array_equal(i16, ref)
