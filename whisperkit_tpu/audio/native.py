"""ctypes binding for the native FFmpeg audio decoder (native/audio_decoder.cpp).

Builds the shared library on first use if the toolchain is available; degrades
gracefully (callers fall back to the pure-NumPy WAV parser).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from whisperkit_tpu.core.errors import LoadAudioFailed
from whisperkit_tpu.core.logging import logging

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libwhisperkit_audio.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists() and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception as e:  # noqa: BLE001
                logging.debug(f"native audio decoder build failed: {e}")
                return None
        if not _LIB_PATH.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
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
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


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
