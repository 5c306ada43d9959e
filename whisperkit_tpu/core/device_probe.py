"""Fail-fast accelerator probe.

JAX backend initialization has no timeout: when the TPU plugin's target is
unreachable (this environment's axon tunnel has measured multi-hour
outages), the first `jax.devices()` call hangs the process for ~15 minutes
before raising UNAVAILABLE — which for a server means hanging at startup
with no diagnostics. The probe initializes the backend in a THROWAWAY
subprocess under a hard timeout, so the parent can fail fast (or fall back
to CPU) with a clear message while its own jax stays uninitialized.

Reference behavior: WhisperKit wraps model-load failures in actionable
errors (WhisperKit.swift:344-350); this is the TPU-runtime analog for the
accelerator itself.
"""

from __future__ import annotations

import subprocess
import sys
from typing import NamedTuple


class ProbeResult(NamedTuple):
    ok: bool
    message: str


_PROBE_CODE = (
    "import jax; d = jax.devices(); "
    "print(d[0].platform, len(d))"
)


def probe_backend(timeout_s: float = 90.0) -> ProbeResult:
    """Initialize the default JAX backend in a subprocess under a timeout.

    Returns ProbeResult(ok, message). `ok=False` means the backend either
    errored (message carries the tail of its stderr) or hung past
    `timeout_s` (the signature of an unreachable remote accelerator).
    The parent process's JAX state is untouched either way.
    """
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return ProbeResult(
            False,
            f"accelerator backend did not initialize within {timeout_s:.0f}s "
            "(remote device unreachable?); set JAX_PLATFORMS=cpu to run on "
            "host, or retry when the device tunnel is back",
        )
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-1:]
        return ProbeResult(
            False, f"accelerator backend failed to initialize: {' '.join(tail)}"
        )
    return ProbeResult(True, proc.stdout.strip())
