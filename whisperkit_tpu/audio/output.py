"""Audio output utilities: crossfade, WAV export, playback strategies.

Reference: Sources/TTSKit/Utilities/AudioOutput.swift — equal-power
`crossfade` of chunk arrays (:292-353), WAV/M4A export (:227-272),
pre-buffer gating + playback strategies (`PlaybackStrategy` + required-
buffer math, TTSKit/Models.swift:144-218). Playback hardware is optional on
a TPU host: `play` uses `sounddevice` when importable and otherwise raises
with a pointer to `save_wav`.
"""

from __future__ import annotations

import enum
import wave
from pathlib import Path
from typing import Sequence, Union

import numpy as np


class PlaybackStrategy(str, enum.Enum):
    """Reference: TTSKit/Models.swift:144-218."""

    AUTO = "auto"  # pre-buffer sized from first measured step time
    STREAM = "stream"  # play as chunks arrive
    BUFFERED = "buffered"  # wait for the full chunk
    GENERATE_FIRST = "generateFirst"  # synthesize everything, then play


def required_buffer_seconds(
    strategy: PlaybackStrategy,
    seconds_per_frame_generated: float,
    frame_seconds: float,
) -> float:
    """Pre-buffer needed so playback never starves.

    Reference: Models.swift `requiredBuffer` — if generation is slower than
    real time, buffer the shortfall; AUTO measures the first step.
    """
    if strategy == PlaybackStrategy.STREAM:
        return 0.0
    if strategy == PlaybackStrategy.GENERATE_FIRST:
        return float("inf")
    ratio = seconds_per_frame_generated / max(frame_seconds, 1e-9)
    if ratio <= 1.0:
        return 0.0
    # enough head start that (gen time - playback time) never goes negative
    return min(10.0, (ratio - 1.0) * 10.0)


def crossfade(
    chunks: Sequence[np.ndarray],
    sample_rate: int,
    crossfade_seconds: float = 0.1,
) -> np.ndarray:
    """Equal-power crossfade between consecutive chunks.

    Reference: AudioOutput.swift:292-353 (100 ms default, equal-power
    sin/cos ramps).
    """
    chunks = [np.asarray(c, np.float32) for c in chunks if len(c)]
    if not chunks:
        return np.zeros(0, np.float32)
    if len(chunks) == 1:
        return chunks[0]
    n_fade = int(crossfade_seconds * sample_rate)
    out = chunks[0]
    for nxt in chunks[1:]:
        fade = min(n_fade, len(out), len(nxt))
        if fade == 0:
            out = np.concatenate([out, nxt])
            continue
        t = np.linspace(0.0, np.pi / 2, fade, dtype=np.float32)
        fade_out = np.cos(t)
        fade_in = np.sin(t)
        blended = out[-fade:] * fade_out + nxt[:fade] * fade_in
        out = np.concatenate([out[:-fade], blended, nxt[fade:]])
    return out


def save_wav(
    samples: np.ndarray, path: Union[str, Path], sample_rate: int
) -> Path:
    """Reference: AudioOutput.swift:227-272 (WAV export branch)."""
    path = Path(path)
    pcm = (np.clip(np.asarray(samples, np.float32), -1.0, 1.0) * 32767).astype(
        np.int16
    )
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return path


def save_audio(
    samples: np.ndarray, path: Union[str, Path], sample_rate: int
) -> Path:
    """Format-inferring export: WAV natively, anything else (m4a/mp3/flac/
    ogg) through the ffmpeg binary (reference: AudioOutput's WAV/M4A(AAC)
    export, AudioOutput.swift:227-272)."""
    path = Path(path)
    if path.suffix.lower() in ("", ".wav"):
        return save_wav(samples, path, sample_rate)
    import shutil
    import subprocess
    import tempfile

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            f"exporting {path.suffix} needs the ffmpeg binary; use .wav instead"
        )
    with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
        save_wav(samples, tmp.name, sample_rate)
        subprocess.run(
            [ffmpeg, "-y", "-loglevel", "error", "-i", tmp.name, str(path)],
            check=True,
        )
    return path


def play(samples: np.ndarray, sample_rate: int) -> None:
    try:
        import sounddevice
    except ImportError as e:
        raise RuntimeError(
            "no audio playback backend on this host (sounddevice missing); "
            "use save_wav() instead"
        ) from e
    sounddevice.play(np.asarray(samples, np.float32), samplerate=sample_rate)
    sounddevice.wait()
