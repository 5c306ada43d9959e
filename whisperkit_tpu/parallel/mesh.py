"""Device mesh + batch sharding for multi-chip inference.

Reference parallelism inventory: SURVEY.md §2.6 — the reference's only
"distribution" is CoreML compute-unit dispatch plus TaskGroups of
batch-of-1 decodes over VAD chunks (WhisperKit.swift:741-805). The
TPU-native replacement: stack chunks into a batch and shard that batch over
a `dp` mesh axis on ICI; parameters are replicated (Whisper large-v3 ≈ 3 GB
bf16 fits every chip), so the decode loop needs NO collectives at all —
XLA partitions the batch dimension and each chip decodes its rows
independently. `tp` is reserved for tensor-parallel sharding of the FFN/
attention weights of larger future models.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    mesh: Mesh
    dp: int
    tp: int

    @property
    def batch_sharding(self) -> NamedSharding:
        """Leading-axis (batch/window) sharding over dp."""
        return NamedSharding(self.mesh, P("dp"))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def pad_batch(self, n: int) -> int:
        """Round a batch size up to a multiple of dp (done with silent
        windows so every chip gets equal rows)."""
        return ((n + self.dp - 1) // self.dp) * self.dp


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> MeshPlan:
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    n = dp * tp
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(dp, tp)
    return MeshPlan(mesh=Mesh(grid, ("dp", "tp")), dp=dp, tp=tp)


def shard_params_replicated(plan: MeshPlan, params):
    return jax.device_put(params, plan.replicated)


def shard_batch(plan: MeshPlan, *arrays):
    out = tuple(jax.device_put(a, plan.batch_sharding) for a in arrays)
    return out if len(out) > 1 else out[0]
