"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's CI approach of testing on whatever host runs the suite
(SURVEY.md §4): multi-chip sharding is validated on virtual CPU devices via
--xla_force_host_platform_device_count, no real TPU pod required.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A sitecustomize hook may have imported jax and registered a TPU backend
# before this conftest runs; steer backend selection to CPU regardless.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import pytest

REFERENCE_RESOURCES = Path("/root/reference/Tests/WhisperKitTests/Resources")


@pytest.fixture(scope="session")
def resources() -> Path:
    if not REFERENCE_RESOURCES.exists():
        pytest.skip("reference audio fixtures unavailable")
    return REFERENCE_RESOURCES


@pytest.fixture(scope="session")
def jfk_audio(resources):
    from whisperkit_tpu.audio.io import load_audio

    return load_audio(resources / "jfk.wav")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound accumulated XLA CPU state: with ~260 tests in one process the
    suite deterministically segfaulted inside LLVM during a late fresh
    compile (r4; crash in backend_compile_and_load with >250 live compiled
    programs, independent of which modules ran — any ~100-test subset
    passes). Dropping compiled-program caches at module teardown keeps the
    live-executable count bounded; the persistent on-disk cache makes the
    recompiles cheap."""
    yield
    import jax

    jax.clear_caches()
