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

Multi-host (multi-slice) deployments add an outer `dcn` axis: slices are
connected over data-center network, ~100× worse latency/bandwidth than
ICI, so NOTHING may ride it on the hot path. Two mechanisms enforce that:

  * the mesh is built slice-major (`mesh_utils.create_hybrid_device_mesh`
    on real multi-slice topologies), so `dp`/`tp` collectives stay inside
    one slice's ICI by construction of the device grid;
  * `dcn_shard` additionally marks the dcn axis MANUAL via `jax.shard_map`
    — GSPMD then CANNOT insert a collective over dcn at all (any
    cross-slice communication would need an explicit named collective,
    and the step functions have none). Scaling over dcn is therefore
    provably embarrassingly parallel: each slice decodes its own batch
    rows, the only cross-DCN traffic is the parameter broadcast at load.
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
    dcn: int = 1

    @property
    def batch_sharding(self) -> NamedSharding:
        """Leading-axis (batch/window) sharding over dcn×dp."""
        if "dcn" in self.mesh.axis_names:
            return NamedSharding(self.mesh, P(("dcn", "dp")))
        return NamedSharding(self.mesh, P("dp"))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def pad_batch(self, n: int) -> int:
        """Round a batch size up to a multiple of dcn×dp (done with silent
        windows so every chip gets equal rows)."""
        m = self.dp * self.dcn
        return ((n + m - 1) // m) * m


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, dcn: int = 1, devices=None
) -> MeshPlan:
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // (tp * dcn)
    n = dcn * dp * tp
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if dcn <= 1:
        grid = np.asarray(devices[:n]).reshape(dp, tp)
        return MeshPlan(mesh=Mesh(grid, ("dp", "tp")), dp=dp, tp=tp)
    # multi-slice: slice-major grid so dp/tp collectives stay on one
    # slice's ICI. Real multi-slice devices carry slice_index — use the
    # topology-aware builder; virtual/CPU devices fall back to a plain
    # reshape (device order stands in for slice grouping).
    if len({getattr(d, "slice_index", 0) for d in devices[:n]}) > 1:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (1, dp, tp), (dcn, 1, 1), devices=devices[:n]
        )
    else:
        grid = np.asarray(devices[:n]).reshape(dcn, dp, tp)
    return MeshPlan(mesh=Mesh(grid, ("dcn", "dp", "tp")), dp=dp, tp=tp, dcn=dcn)


def shard_params_replicated(plan: MeshPlan, params):
    return jax.device_put(params, plan.replicated)


def shard_batch(plan: MeshPlan, *arrays):
    out = tuple(jax.device_put(a, plan.batch_sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def dcn_shard(plan: MeshPlan, fn, *, batch_argnums: tuple[int, ...]):
    """Wrap a step function so the dcn axis is MANUAL (`jax.shard_map`).

    `batch_argnums` are the positional args carrying a leading batch axis
    (sharded dcn-major); every other arg is replicated across slices.
    Inside the body dp/tp stay AUTO — GSPMD still partitions each slice's
    shard over its ICI mesh — but no collective can be inserted over dcn:
    cross-slice traffic on the hot path is impossible by construction, not
    by inspection.
    """
    if "dcn" not in plan.mesh.axis_names:
        return fn

    def spec_for(i):
        return P("dcn") if i in batch_argnums else P()

    def wrapper(*args):
        in_specs = tuple(spec_for(i) for i in range(len(args)))
        return jax.shard_map(
            fn,
            mesh=plan.mesh,
            in_specs=in_specs,
            out_specs=P("dcn"),
            axis_names=frozenset({"dcn"}),
        )(*args)

    return wrapper
