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

# WAV files longer than this load through the chunked path (reference:
# AudioProcessor.swift:307-350 converts long files in 10-minute chunks to
# bound memory); the chunked path is bit-identical to whole-file loading,
# so this is purely a peak-RSS bound, not a behavior switch.
CHUNKED_LOAD_SECONDS = 20 * 60.0
CHUNK_SECONDS = 600.0  # the reference's 10-minute conversion chunk


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

    # long PCM WAVs load through the chunked path (bit-identical output,
    # bounded peak memory — reference: AudioProcessor.swift:307-350); other
    # containers go whole-file (stream_audio covers them for callers that
    # want bounded memory on non-WAV input)
    if path.suffix.lower() in (".wav", ".wave"):
        try:
            meta = _wav_meta(path)
        except LoadAudioFailed:
            meta = None
        if meta is not None and meta.duration_s > CHUNKED_LOAD_SECONDS:
            # the output length is known from the header, so fill a
            # preallocated array instead of concatenating a parts list —
            # concatenate would double the output's footprint at its peak
            from math import gcd

            n = meta.n_frames
            lo = max(int((start_time or 0.0) * meta.sample_rate), 0)
            hi = (
                max(int(end_time * meta.sample_rate), 0)
                if end_time is not None else None
            )
            cnt = len(range(*slice(lo, hi).indices(n)))
            if meta.sample_rate == sample_rate:
                n_out = cnt
            else:
                g = gcd(meta.sample_rate, sample_rate)
                n_out = -(-cnt * (sample_rate // g) // (meta.sample_rate // g))
            out = np.empty(n_out, np.float32)
            filled = 0
            # 2-minute blocks: the f64 resample transient scales with the
            # block (10-min blocks peaked ~830 MB for a 1-hour 22 kHz file;
            # 2-min keeps it ~450 MB) and the overlap context is tiny, so
            # smaller blocks cost nothing but bound the peak tighter
            for c in stream_audio(
                path, sample_rate=sample_rate, channel_mode=channel_mode,
                channel=channel, start_time=start_time, end_time=end_time,
                chunk_seconds=120.0,
            ):
                out[filled : filled + c.shape[0]] = c
                filled += c.shape[0]
            assert filled == n_out, (filled, n_out)
            return out

    audio = _decode_file(path)

    mono = convert_to_mono(audio.samples, mode=channel_mode, channel=channel)
    if start_time is not None or end_time is not None:
        s = int((start_time or 0.0) * audio.sample_rate)
        e = int(end_time * audio.sample_rate) if end_time is not None else mono.shape[0]
        mono = mono[max(s, 0) : max(e, 0)]
    if audio.sample_rate != sample_rate:
        mono = resample_audio(mono, audio.sample_rate, sample_rate)
    return np.ascontiguousarray(mono, dtype=np.float32)


def stream_audio(
    path: Union[str, Path],
    sample_rate: int = SAMPLE_RATE,
    channel_mode: ChannelMode = ChannelMode.SUM_CHANNELS,
    channel: int = 0,
    start_time: Optional[float] = None,
    end_time: Optional[float] = None,
    chunk_seconds: float = CHUNK_SECONDS,
):
    """Yield mono float32 chunks at `sample_rate` with bounded peak memory.

    `np.concatenate(list(stream_audio(p, ...)))` is BIT-IDENTICAL to
    `load_audio(p, ...)` with the same arguments: the WAV reader decodes
    frame ranges in place, the native FFmpeg decoder reads incrementally
    (native.AudioStream), and resampling goes through _ChunkedResampler
    (exact). Reference: AudioProcessor.swift:307-350 — long files convert
    in 10-minute chunks to bound memory.

    SUM_CHANNELS mono conversion renormalizes by the GLOBAL peak ratio, so
    multichannel input pays one extra metadata pass over the file (WAV:
    range reads; other containers: a second incremental decode).
    """
    path = Path(path)
    if not path.exists():
        raise LoadAudioFailed(f"no such file: {path}")

    def open_source():
        if path.suffix.lower() in (".wav", ".wave"):
            try:
                return _WavSource(path), True
            except LoadAudioFailed:
                pass  # non-PCM wav → native
        from whisperkit_tpu.audio import native

        if native.stream_available():
            return native.AudioStream(str(path)), False
        raise LoadAudioFailed(
            f"cannot stream {path}: native FFmpeg decoder unavailable "
            "and file is not PCM WAV"
        )

    src, random_access = open_source()
    try:
        channels = src.channels
        from_rate = src.sample_rate
        if channel_mode == ChannelMode.SELECT and not 0 <= channel < channels:
            raise LoadAudioFailed(
                f"channel {channel} out of range (0..{channels - 1})"
            )

        # global SUM-mode renormalization factor (convert_to_mono semantics:
        # peaks over the WHOLE file, before any time-range slice)
        scale = None
        if channel_mode == ChannelMode.SUM_CHANNELS and channels > 1:
            orig_peak = new_peak = 0.0
            blk = max(1, int(chunk_seconds * from_rate))

            def scan(reader):
                nonlocal orig_peak, new_peak
                while True:
                    c = reader()
                    if c is None or c.size == 0:
                        break
                    orig_peak = max(orig_peak, float(np.abs(c).max()))
                    new_peak = max(
                        new_peak,
                        float(np.abs(c.sum(axis=0).astype(np.float32)).max()),
                    )

            if random_access:
                pos = 0

                def rd():
                    nonlocal pos
                    c = src.read(pos, blk)
                    pos += blk
                    return c if c.shape[1] else None

                scan(rd)
            else:
                from whisperkit_tpu.audio import native

                with native.AudioStream(str(path)) as scan_src:
                    scan(lambda: scan_src.read(blk))
            if new_peak > 0 and orig_peak > 0:
                scale = orig_peak / new_peak

        def mono(chunk2d: np.ndarray) -> np.ndarray:
            if channels == 1:
                return chunk2d[0].astype(np.float32)
            if channel_mode == ChannelMode.SELECT:
                return chunk2d[channel].astype(np.float32)
            m = chunk2d.sum(axis=0).astype(np.float32)
            if scale is not None:
                m *= scale
            return m

        # time-range slice in SOURCE frames (load_audio applies it pre-resample)
        lo = max(int((start_time or 0.0) * from_rate), 0)
        hi = (
            max(int(end_time * from_rate), 0)
            if end_time is not None
            else None
        )
        if hi is not None and hi <= lo:
            return

        resampler = (
            None if from_rate == sample_rate
            else _ChunkedResampler(from_rate, sample_rate)
        )
        if resampler is None:
            step = max(1, int(chunk_seconds * from_rate))
        else:
            step = resampler.down * max(
                1, -(int(chunk_seconds * from_rate) // -resampler.down)
            )
            step = max(step, resampler.context)

        def emit_all():
            """Iterate sliced mono chunks of the source."""
            if random_access:
                pos = lo
                end = src.meta.n_frames if hi is None else min(hi, src.meta.n_frames)
                while pos < end:
                    c = src.read(pos, min(step, end - pos))
                    if c.shape[1] == 0:
                        break
                    pos += c.shape[1]
                    yield mono(c)
            else:
                seen = 0
                while True:
                    c = src.read(step)
                    if c is None:
                        break
                    s0, s1 = seen, seen + c.shape[1]
                    seen = s1
                    a = max(lo, s0)
                    b = s1 if hi is None else min(hi, s1)
                    if b > a:
                        yield mono(c[:, a - s0 : b - s0])
                    if hi is not None and s1 >= hi:
                        break

        for m in emit_all():
            if resampler is None:
                if m.size:
                    yield np.ascontiguousarray(m, dtype=np.float32)
            else:
                for out in resampler.push(m, step):
                    if out.size:
                        yield np.ascontiguousarray(out, dtype=np.float32)
        if resampler is not None:
            tail = resampler.finish()
            if tail.size:
                yield np.ascontiguousarray(tail, dtype=np.float32)
    finally:
        src.close()


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


@dataclasses.dataclass
class _WavMeta:
    """Header-only WAV description: enough to read any frame range."""

    audio_format: int  # 1 = PCM, 3 = IEEE float (after EXTENSIBLE unwrap)
    channels: int
    sample_rate: int
    bits: int
    data_offset: int  # byte offset of the data chunk's samples
    n_frames: int  # frames actually present (declared size ∩ file size)

    @property
    def block_align(self) -> int:
        return self.channels * (self.bits // 8)

    @property
    def duration_s(self) -> float:
        return self.n_frames / self.sample_rate if self.sample_rate else 0.0


def _wav_meta(path: Path) -> _WavMeta:
    """Parse RIFF headers with seeks only — the data chunk's bytes are
    never read here, so hour-scale files cost a few KB to open
    (r4 weak #6: `path.read_bytes()` doubled peak memory on large WAVs)."""
    file_size = path.stat().st_size
    with open(path, "rb") as f:
        head = f.read(12)
        if len(head) < 12 or head[:4] != b"RIFF" or head[8:12] != b"WAVE":
            raise LoadAudioFailed(f"not a RIFF/WAVE file: {path}")
        fmt = None
        fmt_ext = b""
        data_offset = None
        data_size = 0
        pos = 12
        while pos + 8 <= file_size:
            f.seek(pos)
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            chunk_id = hdr[:4]
            (size,) = struct.unpack_from("<I", hdr, 4)
            if chunk_id == b"fmt ":
                body = f.read(min(size, 4096))
                fmt = struct.unpack_from("<HHIIHH", body, 0)
                fmt_ext = body[18:] if len(body) > 18 else b""
            elif chunk_id == b"data":
                data_offset = pos + 8
                data_size = min(size, file_size - data_offset)
            pos += 8 + size + (size & 1)
    if fmt is None or data_offset is None:
        raise LoadAudioFailed(f"missing fmt/data chunk: {path}")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag is the
        # first 2 bytes of the SubFormat GUID; fmt_ext starts after cbSize,
        # so validBits(2) + channelMask(4) precede the GUID
        if len(fmt_ext) >= 8:
            (audio_format,) = struct.unpack_from("<H", fmt_ext, 6)
        else:
            audio_format = 1
    if audio_format == 1 and bits not in (8, 16, 24, 32):
        raise LoadAudioFailed(f"unsupported PCM bit depth {bits}")
    if audio_format == 3 and bits not in (32, 64):
        raise LoadAudioFailed(f"unsupported float bit depth {bits}")
    if audio_format not in (1, 3):
        raise LoadAudioFailed(f"unsupported WAV format tag {audio_format}")
    if channels <= 0 or rate <= 0:
        raise LoadAudioFailed(f"invalid WAV fmt (channels={channels}, rate={rate})")
    block = channels * (bits // 8)
    return _WavMeta(
        audio_format=audio_format, channels=channels, sample_rate=rate,
        bits=bits, data_offset=data_offset, n_frames=data_size // block,
    )


def _decode_pcm(raw: bytes, audio_format: int, bits: int) -> np.ndarray:
    """Raw sample bytes → float32 interleaved 1-D (whole frames only)."""
    if audio_format == 1:  # PCM
        if bits == 16:
            return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        if bits == 32:
            return np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        if bits == 8:
            return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        # 24-bit
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: (b.shape[0] // 3) * 3].reshape(-1, 3)
        x = (
            (b[:, 0].astype(np.int32))
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        return (x << 8 >> 8).astype(np.float32) / 8388608.0
    # IEEE float
    dtype = "<f4" if bits == 32 else "<f8"
    return np.frombuffer(raw, dtype=dtype).astype(np.float32)


class _WavSource:
    """Random-access frame reads from a PCM/float WAV (bounded memory)."""

    def __init__(self, path: Path):
        self.meta = _wav_meta(path)
        self._f = open(path, "rb")

    @property
    def channels(self) -> int:
        return self.meta.channels

    @property
    def sample_rate(self) -> int:
        return self.meta.sample_rate

    def read(self, frame_start: int, n_frames: int) -> np.ndarray:
        """→ float32 [channels, n] for frames [start, start+n) ∩ file."""
        m = self.meta
        f0 = max(0, min(frame_start, m.n_frames))
        f1 = max(f0, min(frame_start + n_frames, m.n_frames))
        self._f.seek(m.data_offset + f0 * m.block_align)
        raw = self._f.read((f1 - f0) * m.block_align)
        x = _decode_pcm(raw, m.audio_format, m.bits)
        n = (x.shape[0] // m.channels) * m.channels
        return x[:n].reshape(-1, m.channels).T

    def close(self) -> None:
        self._f.close()

    def __enter__(self) -> "_WavSource":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _read_wav(path: Path) -> AudioFile:
    """Minimal RIFF/WAVE parser: PCM 8/16/24/32-bit and IEEE float32/64."""
    with _WavSource(path) as src:
        samples = src.read(0, src.meta.n_frames)
    return AudioFile(samples=samples, sample_rate=src.meta.sample_rate)


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


class _ChunkedResampler:
    """Streaming `resample_poly` with BIT-IDENTICAL output.

    Each output sample of scipy's polyphase resampler depends on a bounded
    input window (half filter length `10*max(up,down)` in the upsampled
    domain), so feeding `resample_poly` an input block with ≥ that much
    real context on each side and cropping to the interior reproduces the
    whole-signal outputs exactly — same operands, same summation order.
    Block boundaries sit on multiples of `down` so local↔global output
    indices stay integral; the true start/end of the signal get scipy's own
    zero-padding, exactly like the whole-array call.
    """

    def __init__(self, from_rate: int, to_rate: int):
        from math import ceil, gcd

        g = gcd(from_rate, to_rate)
        self.up, self.down = to_rate // g, from_rate // g
        # real-context width (input samples), rounded up to a multiple of
        # `down`: half filter length / up, plus slack for edge taps
        need = 10 * max(self.up, self.down) / self.up + 2
        self.context = self.down * ceil(need / self.down)
        self._hist = np.empty(0, np.float32)  # ≤ context samples before `a`
        self._pend = np.empty(0, np.float32)  # samples from `a` onward
        self._consumed = 0  # input samples whose outputs were emitted

    def push(self, x: np.ndarray, block_frames: int) -> list[np.ndarray]:
        """Feed input samples; returns finished output blocks.
        `block_frames` must be a multiple of `down` and ≥ `context`."""
        self._pend = np.concatenate([self._pend, x.astype(np.float32)])
        out = []
        while len(self._pend) >= block_frames + self.context:
            out.append(self._block_interior(self._pend[:block_frames]))
            self._hist = self._pend[block_frames - self.context : block_frames]
            self._pend = self._pend[block_frames:]
            self._consumed += block_frames
        return out

    def _block_interior(self, body: np.ndarray) -> np.ndarray:
        # interior block: right context comes from pending lookahead
        lookahead = self._pend[len(body) : len(body) + self.context]
        from scipy.signal import resample_poly

        inp = np.concatenate([self._hist, body, lookahead])
        y = resample_poly(inp.astype(np.float64), self.up, self.down)
        j0 = len(self._hist) * self.up // self.down
        j1 = j0 + len(body) * self.up // self.down
        return y[j0:j1].astype(np.float32)

    def finish(self) -> np.ndarray:
        """Flush: resample the remaining tail with true end-of-signal
        padding (identical to the whole-array call's right edge)."""
        from scipy.signal import resample_poly

        inp = np.concatenate([self._hist, self._pend])
        y = resample_poly(inp.astype(np.float64), self.up, self.down)
        j0 = len(self._hist) * self.up // self.down  # hist len ≡ 0 (mod down)
        total_out = -((self._consumed + len(self._pend)) * self.up // -self.down)
        j1 = j0 + (total_out - self._consumed * self.up // self.down)
        self._hist = np.empty(0, np.float32)
        self._pend = np.empty(0, np.float32)
        return y[j0:j1].astype(np.float32)


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
