"""Build hook: ship the native FFmpeg decoder with the wheel.

The SPM reference compiles everything at install time; a Python wheel
can't assume a toolchain on the target machine, so the strategy is:

  * always copy `native/audio_decoder.cpp` + `Makefile` into the package
    as `whisperkit_tpu/_native/` (source of truth stays in `native/`);
  * best-effort compile at build time — if g++/FFmpeg headers are
    present, the wheel ships a prebuilt `libwhisperkit_audio.so`;
  * otherwise `whisperkit_tpu/audio/native.py` builds it lazily at
    runtime into the user cache (and WAV decode always works via the
    pure-NumPy fallback).
"""

import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

_NATIVE_SOURCES = ("audio_decoder.cpp", "Makefile")


class build_py_with_native(build_py):
    def run(self):
        super().run()
        root = Path(__file__).resolve().parent
        src = root / "native"
        dest = Path(self.build_lib) / "whisperkit_tpu" / "_native"
        dest.mkdir(parents=True, exist_ok=True)
        for name in _NATIVE_SOURCES:
            if (src / name).exists():
                shutil.copy2(src / name, dest / name)
        try:
            subprocess.run(
                ["make", "-C", str(dest)],
                check=True, capture_output=True, timeout=300,
            )
        except Exception:
            pass  # sources ship; runtime builds lazily (audio/native.py)


setup(cmdclass={"build_py": build_py_with_native})
