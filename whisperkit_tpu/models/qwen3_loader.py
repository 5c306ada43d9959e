"""Qwen3-TTS checkpoint loading: HF-style safetensors → our pytree.

Reference behavior: the reference resolves six CoreML component models per
variant (Qwen3Config.swift:106-112 `Qwen3VariantDefaults`, TTSKit façade
download/resolve). Here the backbone maps from standard HF Qwen3 weight
names (`model.layers.N.self_attn.q_proj.weight`, `mlp.gate_proj`, …); the
TTS-specific heads (code embedder, multicode heads, vocoder) load from
same-named tensors when present and random-initialize otherwise, so a
partially-converted checkpoint still runs.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from whisperkit_tpu.core.errors import ModelsUnavailable
from whisperkit_tpu.core.logging import logging
from whisperkit_tpu.models.qwen3_tts import Qwen3TTSDims, init_tts_params


def dims_from_qwen3_config(cfg: dict) -> Qwen3TTSDims:
    return Qwen3TTSDims(
        text_vocab=cfg.get("vocab_size", 151_936),
        d_model=cfg.get("hidden_size", 1024),
        n_layer=cfg.get("num_hidden_layers", 28),
        n_head=cfg.get("num_attention_heads", 16),
        n_kv_head=cfg.get("num_key_value_heads", 8),
        d_ff=cfg.get("intermediate_size", 3072),
        rope_theta=cfg.get("rope_theta", 1_000_000.0),
        max_seq=cfg.get("max_position_embeddings", 2048),
    )


def load_qwen3_tts(
    folder: Union[str, Path], dtype=jnp.bfloat16, seed: int = 0
) -> tuple[Qwen3TTSDims, dict]:
    """Load config.json + *.safetensors from `folder`."""
    folder = Path(folder)
    cfg_path = folder / "config.json"
    if not cfg_path.exists():
        raise ModelsUnavailable(f"missing config.json in {folder}")
    with open(cfg_path) as f:
        cfg = json.load(f)
    dims = dims_from_qwen3_config(cfg)

    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    for f in sorted(folder.glob("*.safetensors")):
        with safe_open(str(f), framework="np") as sf:
            for key in sf.keys():
                tensors[key] = sf.get_tensor(key)
    if not tensors:
        raise ModelsUnavailable(f"no .safetensors in {folder}")

    params = init_tts_params(jax.random.PRNGKey(seed), dims, dtype)
    loaded, missing = _apply_hf_qwen3(params, tensors, dims, dtype)
    logging.info(
        f"qwen3-tts from {folder}: {loaded} tensors mapped, "
        f"{missing} heads left at init"
    )
    return dims, params


def _apply_hf_qwen3(params, tensors, dims: Qwen3TTSDims, dtype) -> tuple[int, int]:
    loaded = 0
    missing = 0

    def get(name: str) -> Optional[np.ndarray]:
        if name in tensors:
            return tensors[name]
        alt = name[len("model."):] if name.startswith("model.") else "model." + name
        return tensors.get(alt)

    def put_lin(dst: dict, key: str, name: str) -> bool:
        t = get(name)
        if t is None:
            return False
        dst[key] = jnp.asarray(t.T, dtype)  # HF [out,in] → ours [in,out]
        return True

    emb = get("model.embed_tokens.weight")
    if emb is not None:
        params["text_embed"] = jnp.asarray(emb, dtype)
        loaded += 1

    blocks = params["blocks"]
    per_layer_keys = [
        ("wq", "self_attn.q_proj.weight"),
        ("wk", "self_attn.k_proj.weight"),
        ("wv", "self_attn.v_proj.weight"),
        ("wo", "self_attn.o_proj.weight"),
        ("w_gate", "mlp.gate_proj.weight"),
        ("w_up", "mlp.up_proj.weight"),
        ("w_down", "mlp.down_proj.weight"),
    ]
    norm_keys = [
        ("ln1", "input_layernorm.weight"),
        ("ln2", "post_attention_layernorm.weight"),
        ("qnorm", "self_attn.q_norm.weight"),
        ("knorm", "self_attn.k_norm.weight"),
    ]
    stacked: dict[str, list] = {}
    for i in range(dims.n_layer):
        prefix = f"model.layers.{i}."
        for key, suffix in per_layer_keys:
            t = get(prefix + suffix)
            stacked.setdefault(key, []).append(
                None if t is None else np.asarray(t.T)
            )
        for key, suffix in norm_keys:
            t = get(prefix + suffix)
            stacked.setdefault(key, []).append(None if t is None else np.asarray(t))
    for key, rows in stacked.items():
        if all(r is not None for r in rows):
            blocks[key] = jnp.asarray(np.stack(rows), dtype)
            loaded += len(rows)
        else:
            missing += sum(r is None for r in rows)

    ln_f = get("model.norm.weight")
    if ln_f is not None:
        params["ln_f"] = jnp.asarray(ln_f, dtype)
        loaded += 1

    # TTS-specific heads + vocoder (converted-checkpoint names); tensors
    # with neither matching nor transpose-matching shapes are skipped (and
    # counted missing) rather than assigned blindly
    def put_checked(container, key, name, want):
        nonlocal loaded, missing
        t = get(name)
        if t is None:
            missing += 1
            return
        tgt_dtype = container[key].dtype  # vocoder params stay f32
        if t.shape == want:
            container[key] = jnp.asarray(t, tgt_dtype)
        elif t.ndim == 2 and t.shape[::-1] == want:
            container[key] = jnp.asarray(t.T, tgt_dtype)
        else:
            logging.error(
                f"{name}: shape {t.shape} does not fit {want}; left at init"
            )
            missing += 1
            return
        loaded += 1

    for key, name in [
        ("code_embed", "tts.code_embed.weight"),
        ("code0_head", "tts.code0_head.weight"),
        ("mc_embed", "tts.mc_embed.weight"),
        ("mc_heads", "tts.mc_heads.weight"),
    ]:
        put_checked(params, key, name, params[key].shape)

    for key, name in [("voc_in", "tts.voc_in"), ("voc_out", "tts.voc_out")]:
        put_checked(params[key], "w", f"{name}.weight", params[key]["w"].shape)
        put_checked(params[key], "b", f"{name}.bias", params[key]["b"].shape)
    put_checked(
        params, "voc_code_embed", "tts.voc_code_embed.weight",
        params["voc_code_embed"].shape,
    )
    for i, bp in enumerate(params["voc_blocks"]):
        put_checked(bp, "w", f"tts.voc_blocks.{i}.weight", bp["w"].shape)
        put_checked(bp, "b", f"tts.voc_blocks.{i}.bias", bp["b"].shape)
    return loaded, missing
