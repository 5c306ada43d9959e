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


def whisper_param_shardings(plan: MeshPlan, params) -> dict:
    """NamedSharding pytree matching models/whisper.py's parameter tree.

    Block params carry a leading stacked-layer axis (scanned), so weight
    matrices are rank-3: [L, in, out].
    """
    rep = _spec(plan)
    col = _spec(plan, None, None, "tp")  # [L, in, out] split out-features
    row = _spec(plan, None, "tp", None)  # [L, in, out] split in-features
    col_b = _spec(plan, None, "tp")  # [L, out] bias of a column-split matmul
    rep_l = rep

    def attn(p):
        return {
            "q": {"w": col, "b": col_b},
            "k": {"w": col},
            "v": {"w": col, "b": col_b},
            "out": {"w": row, "b": rep_l},
        }

    def block(cross: bool):
        d = {
            "attn_ln": {"g": rep_l, "b": rep_l},
            "attn": attn(None),
            "mlp_ln": {"g": rep_l, "b": rep_l},
            "fc1": {"w": col, "b": col_b},
            "fc2": {"w": row, "b": rep_l},
        }
        if cross:
            d["cross_attn_ln"] = {"g": rep_l, "b": rep_l}
            d["cross_attn"] = attn(None)
        return d

    shardings = {
        "encoder": {
            "conv1": {"w": rep, "b": rep},
            "conv2": {"w": rep, "b": rep},
            "pos_embed": rep,
            "blocks": block(cross=False),
            "ln_post": {"g": rep, "b": rep},
        },
        "decoder": {
            "token_embed": rep,
            "pos_embed": rep,
            "blocks": block(cross=True),
            "ln": {"g": rep, "b": rep},
        },
    }
    # sanity: the sharding tree must mirror the param tree
    jax.tree.map(lambda a, b: None, params, shardings)
    return shardings


def shard_whisper_params(plan: MeshPlan, params):
    """device_put the param tree with TP shardings (replicated when tp=1)."""
    if plan.tp <= 1:
        return jax.device_put(params, plan.replicated)
    shardings = whisper_param_shardings(plan, params)
    return jax.tree.map(jax.device_put, params, shardings)
