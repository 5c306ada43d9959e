"""Installability: wheel build + clean-venv install + console script.

Reference: the project is an installable SPM package with products and
pinned dependencies (/root/reference/Package.swift:1-150). The pip analog
must work the same way: `pip install whisperkit-tpu` gives a
`whisperkit-tpu` console script that runs from ANY cwd (not just the repo
root), with the native decoder discoverable outside the checkout
(audio/native.py candidate paths).

The venv uses --system-site-packages so the baked-in jax/numpy resolve
(this environment has no package index); the wheel itself installs with
--no-index --no-deps, which is exactly what a hermetic deploy would do.
"""

import os
import subprocess
import sys
import sysconfig
import venv
import wave
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent


def _run(cmd, **kw):
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, **kw
    )
    assert proc.returncode == 0, (
        f"{cmd} failed rc={proc.returncode}\nstdout: {proc.stdout[-3000:]}"
        f"\nstderr: {proc.stderr[-3000:]}"
    )
    return proc


@pytest.fixture(scope="module")
def wheel_path(tmp_path_factory):
    wheel_dir = tmp_path_factory.mktemp("wheel")
    _run(
        [
            sys.executable, "-m", "pip", "wheel", "--no-deps",
            "--no-build-isolation", "--no-index", "-w", str(wheel_dir),
            str(REPO_ROOT),
        ],
        cwd=str(wheel_dir),  # build from a foreign cwd on purpose
    )
    wheels = list(wheel_dir.glob("whisperkit_tpu-*.whl"))
    assert len(wheels) == 1, f"expected one wheel, got {wheels}"
    return wheels[0]


def test_wheel_contains_package_and_native_sources(wheel_path):
    import zipfile

    names = zipfile.ZipFile(wheel_path).namelist()
    assert any(n == "whisperkit_tpu/__init__.py" for n in names)
    assert any(n.startswith("whisperkit_tpu/cli/") for n in names)
    # native decoder sources ride along so an installed package can build
    # the .so lazily on machines with a toolchain (audio/native.py)
    assert "whisperkit_tpu/_native/audio_decoder.cpp" in names
    assert "whisperkit_tpu/_native/Makefile" in names
    # tests and tools must NOT ship
    assert not any(n.startswith(("tests/", "tools/")) for n in names)


@pytest.mark.slow
def test_clean_venv_install_and_cli_from_foreign_cwd(wheel_path, tmp_path):
    """pip install the wheel into a fresh venv and run
    `whisperkit-tpu transcribe <wav>` from an unrelated cwd
    (VERDICT r3 next-round #1 acceptance)."""
    venv_dir = tmp_path / "venv"
    venv.EnvBuilder(
        system_site_packages=True, with_pip=True, symlinks=True
    ).create(venv_dir)
    vpy = venv_dir / "bin" / "python"
    # the test runner may itself live in a venv (system_site_packages only
    # exposes the BASE interpreter's packages) — link the runner's
    # site-packages in so the baked-in jax/numpy resolve without a network
    site_pkgs = (
        venv_dir / "lib"
        / f"python{sys.version_info.major}.{sys.version_info.minor}"
        / "site-packages"
    )
    (site_pkgs / "_baked_deps.pth").write_text(
        sysconfig.get_paths()["purelib"] + "\n"
    )
    _run(
        [
            str(vpy), "-m", "pip", "install", "--no-index", "--no-deps",
            "--no-build-isolation", str(wheel_path),
        ]
    )

    # a tiny random HF-format checkpoint (same recipe as the CLI tests)
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    ckpt = tmp_path / "ckpt"
    torch.manual_seed(0)
    WhisperForConditionalGeneration(
        HFWhisperConfig(
            vocab_size=207, num_mel_bins=80, d_model=64, encoder_layers=2,
            encoder_attention_heads=4, decoder_layers=2,
            decoder_attention_heads=4, encoder_ffn_dim=256,
            decoder_ffn_dim=256, max_source_positions=1500,
            max_target_positions=64, pad_token_id=0, bos_token_id=1,
            eos_token_id=2, decoder_start_token_id=3, suppress_tokens=[],
            begin_suppress_tokens=[],
        )
    ).save_pretrained(ckpt, safe_serialization=True)

    wav = tmp_path / "clip.wav"
    rng = np.random.default_rng(5)
    pcm = (np.clip(rng.standard_normal(16000 * 2) * 0.1, -1, 1) * 32767).astype(
        np.int16
    )
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    foreign = tmp_path / "somewhere-else"
    foreign.mkdir()
    report_dir = tmp_path / "reports"
    report_dir.mkdir()

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"  # no sitecustomize → env var wins

    script = venv_dir / "bin" / "whisperkit-tpu"
    assert script.exists(), "console script not installed"
    proc = _run(
        [
            str(script), "transcribe", "--audio-path", str(wav),
            "--model-folder", str(ckpt), "--language", "en",
            "--sample-length", "6", "--report", "--report-path",
            str(report_dir), "--device-probe-timeout", "0",
        ],
        cwd=str(foreign),
        env=env,
    )
    assert (report_dir / "clip.json").exists()
    assert "clip.wav" in proc.stderr  # the RTF summary line

    # the installed package resolves OUTSIDE the repo checkout
    proc2 = _run(
        [
            str(vpy), "-c",
            "import whisperkit_tpu, pathlib;"
            "print(pathlib.Path(whisperkit_tpu.__file__).resolve())",
        ],
        cwd=str(foreign),
        env=env,
    )
    assert str(venv_dir) in proc2.stdout

    # when the build toolchain compiled the decoder into the wheel, the
    # installed package must find and load it WITHOUT the repo checkout
    import zipfile

    if any(
        n.endswith("libwhisperkit_audio.so")
        for n in zipfile.ZipFile(wheel_path).namelist()
    ):
        proc3 = _run(
            [
                str(vpy), "-c",
                "from whisperkit_tpu.audio import native;"
                "import whisperkit_tpu.audio.native as n;"
                "print('native:', native.available(), n._find_lib())",
            ],
            cwd=str(foreign),
            env=env,
        )
        assert "native: True" in proc3.stdout
        assert str(venv_dir) in proc3.stdout  # loaded from the wheel, not the repo
