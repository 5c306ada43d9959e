"""Parameter/activation sharding rules for tensor-parallel inference.

SURVEY.md §2.6: Whisper sizes don't NEED tensor parallelism (large-v3 fits
one v5e chip in bf16), so the default deployment is dp-only with replicated
params. TP is still implemented for headroom (larger future models, or
latency-critical batch-1 serving): the classic Megatron split —

  * attention q/k/v weights column-split over `tp` (heads shard),
    out-projection row-split (all-reduce after)
  * MLP fc1 column-split, fc2 row-split (one all-reduce per block)
  * everything else (embeddings, layer norms, convs) replicated

XLA inserts the psum collectives automatically from these NamedShardings —
no hand-written collectives (the "let XLA insert collectives" recipe).
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from whisperkit_tpu.parallel.mesh import MeshPlan


def _spec(plan: MeshPlan, *axes) -> NamedSharding:
    return NamedSharding(plan.mesh, P(*axes))


# Megatron roles by linear name inside a block: column-split linears shard
# their out-features (and bias/scale); row-split shard in-features (bias and
# per-out-channel quant scale stay replicated). Everything else replicates.
_COL_KEYS = frozenset({"q", "k", "v", "fc1"})
_ROW_KEYS = frozenset({"out", "fc2"})


def whisper_param_shardings(plan: MeshPlan, params) -> dict:
    """NamedSharding pytree mirroring models/whisper.py's parameter tree.

    Built by walking the actual param tree (not a static template), so it
    covers both bf16 trees ({"w": [L, in, out], "b": [L, out]}) and the
    W8A16 trees ops/quant.py produces ({"w_q": int8 [L, in, out],
    "scale": [L, out], "b": ...}): w_q shards exactly like w would, and a
    column-split linear's per-out-channel scale shards with the out axis
    while a row-split linear's scale replicates (out axis is unsplit).
    Block params carry a leading stacked-layer axis (scanned), rank-3
    weights are [L, in, out]; non-stacked rank-2 weights get the same roles
    without the layer axis.
    """
    rep = _spec(plan)

    def leaf_spec(leaf, leaf_key, parent_key):
        ndim = getattr(leaf, "ndim", None)
        if parent_key in _COL_KEYS:
            if leaf_key in ("w", "w_q", "w_q4"):
                return _spec(plan, *([None] * (ndim - 1)), "tp")
            if leaf_key in ("b", "scale", "scale4"):
                # scale4 [*, g, out] shards its out axis like scale [*, out]
                return _spec(plan, *([None] * (ndim - 1)), "tp")
        elif parent_key in _ROW_KEYS:
            if leaf_key in ("w", "w_q", "w_q4"):
                return _spec(plan, *([None] * (ndim - 2)), "tp", None)
            # row-split scale4's group axis (in/64) is rarely divisible by
            # tp — replicate it (a few KB) and let the w_q4 dequant read the
            # local slice of the broadcast
        return rep

    def walk(node, key=None, parent=None):
        if isinstance(node, dict):
            return {k: walk(v, k, key) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, key, parent) for v in node)
        return leaf_spec(node, key, parent)

    shardings = walk(params)
    # sanity: the sharding tree must mirror the param tree
    jax.tree.map(lambda a, b: None, params, shardings)
    return shardings


def encoder_seq_sharding(plan: MeshPlan) -> NamedSharding:
    """Sequence-parallel activation sharding for `encoder_forward`.

    Small-batch latency mode (SURVEY.md §2.6 headroom): when the window
    batch is smaller than the mesh (e.g. a single streaming window), dp
    cannot use the chips — instead the encoder's 1500-token axis shards
    over the `tp` axis with REPLICATED params. LN/MLP/projections compute
    on local sequence shards; GSPMD all-gathers K/V per attention layer
    (1500×d_audio bf16 ≈ 3.8 MB/layer for large-v3 — ICI-cheap). Distinct
    from Megatron TP (param shards, `whisper_param_shardings`): sp shards
    activations, tp shards weights; both ride the same mesh axis.
    """
    return _spec(plan, None, "tp", None)


def shard_whisper_params(plan: MeshPlan, params):
    """device_put the param tree with TP shardings (replicated when tp=1)."""
    if plan.tp <= 1:
        return jax.device_put(params, plan.replicated)
    shardings = whisper_param_shardings(plan, params)
    return jax.tree.map(jax.device_put, params, shardings)
