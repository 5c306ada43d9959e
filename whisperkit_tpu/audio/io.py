"""Host-side audio loading / resampling / windowing.

Reference: Sources/WhisperKit/Core/Audio/AudioProcessor.swift — `loadAudio`
(:229-305), `resampleAudio` (:381-450), `convertToMono` (:526-625),
`padOrTrimAudio` (:151-174), energy functions (:674-741).

The reference decodes any container via AVFoundation; here the equivalent is a
native C++ decoder built on FFmpeg (native/audio_decoder.cpp, loaded via
ctypes) with a pure-NumPy RIFF/WAV parser as fallback so WAV always works.
"""

from __future__ import annotations

import dataclasses
import enum
import struct
from pathlib import Path
from typing import Optional, Sequence, Union

import numpy as np

from whisperkit_tpu.core.errors import LoadAudioFailed
from whisperkit_tpu.core.logging import logging

SAMPLE_RATE = 16_000
WINDOW_SAMPLES = 480_000  # 30 s (reference: Models.swift:1457 `windowSamples`)


class ChannelMode(enum.Enum):
    """Multichannel handling (reference: AudioProcessor.swift:526-625).

    SUM_CHANNELS sums all channels then renormalizes so the mono peak matches
    the original per-channel peak; SELECT picks one channel.
    """

    SUM_CHANNELS = "sumChannels"
    SELECT = "selectChannel"


@dataclasses.dataclass
class AudioFile:
    samples: np.ndarray  # float32 [channels, n] before mono mix
    sample_rate: int


def load_audio(
    path: Union[str, Path],
    sample_rate: int = SAMPLE_RATE,
    channel_mode: ChannelMode = ChannelMode.SUM_CHANNELS,
    channel: int = 0,
    start_time: Optional[float] = None,
    end_time: Optional[float] = None,
) -> np.ndarray:
    """Load any audio file → mono float32 at `sample_rate` (default 16 kHz).

    Mirrors AudioProcessor.loadAudio semantics: decode, optional time range,
    mono conversion, resample.
    """
    path = Path(path)
    if not path.exists():
        raise LoadAudioFailed(f"no such file: {path}")

    audio = _decode_file(path)

    mono = convert_to_mono(audio.samples, mode=channel_mode, channel=channel)
    if start_time is not None or end_time is not None:
        s = int((start_time or 0.0) * audio.sample_rate)
        e = int(end_time * audio.sample_rate) if end_time is not None else mono.shape[0]
        mono = mono[max(s, 0) : max(e, 0)]
    if audio.sample_rate != sample_rate:
        mono = resample_audio(mono, audio.sample_rate, sample_rate)
    return np.ascontiguousarray(mono, dtype=np.float32)


def load_audio_batch(paths: Sequence[Union[str, Path]], **kwargs) -> list[Union[np.ndarray, Exception]]:
    """Batch load preserving per-item failures.

    Reference: AudioProcessor.swift:352-371 parallel `loadAudio(at:)` — the
    result array keeps an error per failed path rather than failing the batch.
    """
    out: list[Union[np.ndarray, Exception]] = []
    for p in paths:
        try:
            out.append(load_audio(p, **kwargs))
        except Exception as e:  # noqa: BLE001 — per-item error propagation is the API
            out.append(e)
    return out


def _decode_file(path: Path) -> AudioFile:
    suffix = path.suffix.lower()
    if suffix in (".wav", ".wave"):
        try:
            return _read_wav(path)
        except LoadAudioFailed:
            pass  # fall through to native decoder (e.g. non-PCM wav)
    native = _native_decode(path)
    if native is not None:
        return native
    if suffix in (".wav", ".wave"):
        return _read_wav(path)
    raise LoadAudioFailed(
        f"cannot decode {path}: native FFmpeg decoder unavailable and file is not PCM WAV"
    )


def _native_decode(path: Path) -> Optional[AudioFile]:
    try:
        from whisperkit_tpu.audio import native

        if not native.available():
            return None
        samples, rate, channels = native.decode(str(path))
        return AudioFile(samples=samples.reshape(channels, -1, order="F"), sample_rate=rate)
    except Exception as e:  # noqa: BLE001
        logging.debug(f"native decode failed for {path}: {e}")
        return None


def _read_wav(path: Path) -> AudioFile:
    """Minimal RIFF/WAVE parser: PCM 8/16/24/32-bit and IEEE float32/64."""
    data = path.read_bytes()
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise LoadAudioFailed(f"not a RIFF/WAVE file: {path}")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_ext = body[18:] if len(body) > 18 else b""
        elif chunk_id == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise LoadAudioFailed(f"missing fmt/data chunk: {path}")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag is the
        # first 2 bytes of the SubFormat GUID; fmt_ext starts after cbSize,
        # so validBits(2) + channelMask(4) precede the GUID
        if len(fmt_ext) >= 8:
            (audio_format,) = struct.unpack_from("<H", fmt_ext, 6)
        else:
            audio_format = 1
    if audio_format == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            x = (
                (b[:, 0].astype(np.int32))
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = (x << 8 >> 8).astype(np.float32) / 8388608.0
        else:
            raise LoadAudioFailed(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        dtype = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    else:
        raise LoadAudioFailed(f"unsupported WAV format tag {audio_format}")
    n = (x.shape[0] // channels) * channels
    samples = x[:n].reshape(-1, channels).T  # [channels, frames]
    return AudioFile(samples=samples, sample_rate=rate)


def convert_to_mono(
    samples: np.ndarray, mode: ChannelMode = ChannelMode.SUM_CHANNELS, channel: int = 0
) -> np.ndarray:
    """Reference: AudioProcessor.swift:526-625."""
    if samples.ndim == 1:
        return samples.astype(np.float32)
    channels = samples.shape[0]
    if channels == 1:
        return samples[0].astype(np.float32)
    if mode == ChannelMode.SELECT:
        if not 0 <= channel < channels:
            raise LoadAudioFailed(f"channel {channel} out of range (0..{channels - 1})")
        return samples[channel].astype(np.float32)
    # sum + peak renormalization: keep the mono peak equal to the original peak
    summed = samples.sum(axis=0).astype(np.float32)
    orig_peak = float(np.abs(samples).max()) if samples.size else 0.0
    new_peak = float(np.abs(summed).max()) if summed.size else 0.0
    if new_peak > 0 and orig_peak > 0:
        summed *= orig_peak / new_peak
    return summed


def resample_audio(x: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    """Polyphase resample (host). Reference: AudioProcessor.swift:381-450.

    Uses a Kaiser-windowed polyphase filter (scipy) — comparable quality to
    the reference's AVAudioConverter 'mastering' algorithm.
    """
    if from_rate == to_rate:
        return x.astype(np.float32)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(from_rate, to_rate)
    up, down = to_rate // g, from_rate // g
    return resample_poly(x.astype(np.float64), up, down).astype(np.float32)


def pad_or_trim(
    x: np.ndarray, *, start: int = 0, length: int = WINDOW_SAMPLES
) -> np.ndarray:
    """Slice [start, start+length) zero-padded to exactly `length` samples.

    Reference: AudioProcessor.swift:151-174 `padOrTrimAudio`. `start` is
    keyword-only: a positional `pad_or_trim(x, WINDOW_SAMPLES)` used to
    parse as start=WINDOW_SAMPLES and silently return pure silence — that
    exact misuse fed SILENCE mels to every ≤30 s window path from r2 until
    it was caught in r4 (nothing asserts mel content under random weights;
    see tests/test_pipeline.py::test_windows_hear_the_audio).
    """
    seg = x[start : start + length]
    if seg.shape[0] < length:
        seg = np.concatenate([seg, np.zeros(length - seg.shape[0], dtype=np.float32)])
    return seg.astype(np.float32)


# ---- energy utilities (reference: AudioProcessor.swift:674-741) ----


def rms_energy(x: np.ndarray) -> float:
    if x.size == 0:
        return 0.0
    return float(np.sqrt(np.mean(np.square(x.astype(np.float64)))))


def energy_per_frame(x: np.ndarray, frame_length: int) -> np.ndarray:
    """RMS energy of consecutive frames (last partial frame included)."""
    n_frames = int(np.ceil(x.shape[0] / frame_length)) if x.shape[0] else 0
    out = np.zeros(n_frames, dtype=np.float32)
    for i in range(n_frames):
        out[i] = rms_energy(x[i * frame_length : (i + 1) * frame_length])
    return out


def relative_energy_db(signal_energy: float, reference_energy: float = 1.0) -> float:
    """Reference: AudioProcessor.swift `calculateRelativeEnergy` — dB vs reference."""
    return 20.0 * float(np.log10(max(signal_energy, 1e-10) / max(reference_energy, 1e-10)))
