"""ctypes binding for the native FFmpeg audio decoder (native/audio_decoder.cpp).

Builds the shared library on first use if the toolchain is available; degrades
gracefully (callers fall back to the pure-NumPy WAV parser).

Library discovery works in BOTH layouts (reference analog: SPM compiles at
install time, Package.swift; a wheel can't assume that):
  1. `WKTPU_NATIVE_LIB` env var — explicit .so path;
  2. `whisperkit_tpu/_native/libwhisperkit_audio.so` — prebuilt inside an
     installed wheel (setup.py build hook);
  3. `<repo>/native/libwhisperkit_audio.so` — the dev checkout layout;
  4. lazily built into `~/.cache/whisperkit_tpu/native/<source-hash>/`
     from the sources shipped with the package (`_native/`) or the repo
     checkout (hash-keyed so a stale cached .so can't shadow newer
     sources after a wheel upgrade).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import ctypes

import numpy as np

from whisperkit_tpu.core.errors import LoadAudioFailed
from whisperkit_tpu.core.logging import logging

_LIB_NAME = "libwhisperkit_audio.so"
_PKG_NATIVE_DIR = Path(__file__).resolve().parent.parent / "_native"
_REPO_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SOURCES = ("audio_decoder.cpp", "Makefile")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _source_hash() -> Optional[str]:
    """Short content hash of the shipped decoder sources. Keys the user
    cache dir so a wheel upgrade that changes the C++ (a new function
    signature, a decode fix) can never be shadowed by a stale cached .so
    built from older sources — ctypes would call the new Python prototype
    against the old native ABI."""
    src = _source_dir()
    if src is None:
        return None
    import hashlib

    h = hashlib.sha1()
    for s in _SOURCES:
        h.update((src / s).read_bytes())
    return h.hexdigest()[:12]


def _cache_native_dir() -> Path:
    base = Path(
        os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")
    )
    tag = _source_hash() or "unversioned"
    return base / "whisperkit_tpu" / "native" / tag


def _candidate_paths() -> list[Path]:
    paths = []
    env = os.environ.get("WKTPU_NATIVE_LIB")
    if env:
        if not Path(env).exists():
            # an EXPLICIT override that doesn't exist is a
            # misconfiguration — falling through silently would mask the
            # typo behind whatever stale library discovery finds next
            logging.error(
                f"WKTPU_NATIVE_LIB={env} does not exist; "
                "falling back to default native-library discovery"
            )
        paths.append(Path(env))
    paths.append(_PKG_NATIVE_DIR / _LIB_NAME)
    paths.append(_REPO_NATIVE_DIR / _LIB_NAME)
    paths.append(_cache_native_dir() / _LIB_NAME)
    return paths


def _source_dir() -> Optional[Path]:
    for d in (_REPO_NATIVE_DIR, _PKG_NATIVE_DIR):
        if all((d / s).exists() for s in _SOURCES):
            return d
    return None


def _build() -> Optional[Path]:
    """Compile the decoder. Prefers building in place next to the sources
    (dev checkout); falls back to the user cache dir (installed wheel whose
    site-packages may be read-only)."""
    src = _source_dir()
    if src is None:
        return None
    build_dirs = [src] if os.access(src, os.W_OK) else []
    build_dirs.append(_cache_native_dir())
    for d in build_dirs:
        try:
            if d != src:
                d.mkdir(parents=True, exist_ok=True)
                for s in _SOURCES:
                    shutil.copy2(src / s, d / s)
            subprocess.run(
                ["make", "-C", str(d)],
                check=True, capture_output=True, timeout=300,
            )
            if (d / _LIB_NAME).exists():
                return d / _LIB_NAME
        except Exception as e:  # noqa: BLE001
            logging.debug(f"native audio decoder build in {d} failed: {e}")
    return None


def _find_lib() -> Optional[Path]:
    global _build_attempted
    for p in _candidate_paths():
        if p.exists():
            return p
    if not _build_attempted:
        _build_attempted = True
        return _build()
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        path = _find_lib()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError as e:
            logging.debug(f"failed to load native audio decoder: {e}")
            return None
        lib.wk_decode_audio.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wk_decode_audio.restype = ctypes.c_int
        lib.wk_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.wk_free.restype = None
        # incremental-read API (chunked long-file loading; may be absent
        # in an older cached library — hash-keyed discovery makes that
        # unlikely, but degrade to whole-file decode rather than crash)
        try:
            lib.wk_open_audio.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.wk_open_audio.restype = ctypes.c_void_p
            lib.wk_read_audio.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            lib.wk_read_audio.restype = ctypes.c_int64
            lib.wk_close_audio.argtypes = [ctypes.c_void_p]
            lib.wk_close_audio.restype = None
            lib._wk_has_stream_api = True
        except AttributeError:
            lib._wk_has_stream_api = False
        # single-pass grid check + int16 convert (int16 wire format);
        # absent in an older cached library → NumPy fallback
        try:
            lib.wk_f32_grid_to_i16.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16),
            ]
            lib.wk_f32_grid_to_i16.restype = ctypes.c_int
            lib._wk_has_grid_api = True
        except AttributeError:
            lib._wk_has_grid_api = False
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def f32_grid_to_i16(arr: np.ndarray) -> Optional[Tuple[np.ndarray, bool]]:
    """Single-pass (check, convert) for the int16 audio wire format:
    returns (int16 array, lossless) where lossless means every sample lies
    exactly on the i/32768 grid within int16 range, or None when the
    native library is unavailable (callers keep their NumPy path). The C
    pass replaces ~7 NumPy passes over the full array — ~4 s of
    host-blocking work per 60-min transcribe call
    (pipelines/whisper._upload_audio)."""
    lib = _load()
    if lib is None or not getattr(lib, "_wk_has_grid_api", False):
        return None
    arr = np.ascontiguousarray(arr, np.float32)
    out = np.empty(arr.shape, np.int16)
    lossless = lib.wk_f32_grid_to_i16(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(arr.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out, bool(lossless)


def decode(path: str) -> Tuple[np.ndarray, int, int]:
    """Decode any audio file. Returns (interleaved float32, sample_rate, channels)."""
    lib = _load()
    if lib is None:
        raise LoadAudioFailed("native audio decoder unavailable")
    buf = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    ret = lib.wk_decode_audio(
        str(path).encode(), ctypes.byref(buf), ctypes.byref(frames),
        ctypes.byref(channels), ctypes.byref(rate),
    )
    if ret != 0 or not buf:
        raise LoadAudioFailed(f"native decode failed for {path} (code {ret})")
    try:
        n = frames.value * channels.value
        samples = np.ctypeslib.as_array(buf, shape=(n,)).astype(np.float32, copy=True)
    finally:
        lib.wk_free(buf)
    return samples, rate.value, channels.value


def stream_available() -> bool:
    lib = _load()
    return lib is not None and getattr(lib, "_wk_has_stream_api", False)


class AudioStream:
    """Incremental native decode (reference analog:
    AudioProcessor.swift:307-350 chunked conversion). Successive `read`
    calls traverse the file start-to-end; the concatenation of all reads is
    identical to `decode(path)` (both drive the same C read loop).

    Usage: with AudioStream(path) as s: s.read(n) → [channels, n'] f32
    (n' < n only at EOF; None at EOF).
    """

    def __init__(self, path: str):
        lib = _load()
        if lib is None or not getattr(lib, "_wk_has_stream_api", False):
            raise LoadAudioFailed("native audio stream API unavailable")
        self._lib = lib
        ch = ctypes.c_int32()
        rate = ctypes.c_int32()
        err = ctypes.c_int32()
        self._handle = lib.wk_open_audio(
            str(path).encode(), ctypes.byref(ch), ctypes.byref(rate),
            ctypes.byref(err),
        )
        if not self._handle:
            raise LoadAudioFailed(
                f"native stream open failed for {path} (code {err.value})"
            )
        self.channels = ch.value
        self.sample_rate = rate.value

    def read(self, max_frames: int) -> Optional[np.ndarray]:
        """→ float32 [channels, n] (n ≤ max_frames), or None at EOF."""
        if self._handle is None:
            raise LoadAudioFailed("stream is closed")
        buf = np.empty(max_frames * self.channels, np.float32)
        got = self._lib.wk_read_audio(
            self._handle,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_frames,
        )
        if got < 0:
            raise LoadAudioFailed(f"native stream read failed (code {got})")
        if got == 0:
            return None
        n = int(got) * self.channels
        return buf[:n].reshape(self.channels, -1, order="F")

    def close(self) -> None:
        if self._handle is not None:
            self._lib.wk_close_audio(self._handle)
            self._handle = None

    def __enter__(self) -> "AudioStream":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass
