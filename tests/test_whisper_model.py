"""Whisper model numerics: parity vs torch `transformers` with shared weights.

This replaces the reference's strategy of testing against the real CoreML tiny
model (UnitTests.swift:674-815): with no network access, we instead
instantiate a small random HF torch Whisper, save it, load it through our
checkpoint loader, and require logit-level agreement — which validates the
loader AND the model math end-to-end.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from whisperkit_tpu.models.loader import load_whisper
from whisperkit_tpu.models.whisper import (
    VARIANT_DIMS,
    WhisperDims,
    compute_cross_kv,
    decoder_forward,
    encoder_forward,
    init_kv_cache,
    init_params,
)

TINY_CFG = dict(
    vocab_size=207,
    num_mel_bins=80,
    d_model=64,
    encoder_layers=2,
    encoder_attention_heads=4,
    decoder_layers=2,
    decoder_attention_heads=4,
    encoder_ffn_dim=256,
    decoder_ffn_dim=256,
    max_source_positions=150,  # encoder ctx (mel frames = 300)
    max_target_positions=64,
    # small-vocab overrides for the default GPT-2-sized special ids
    pad_token_id=0,
    bos_token_id=1,
    eos_token_id=2,
    decoder_start_token_id=3,
    suppress_tokens=[],
    begin_suppress_tokens=[],
)


@pytest.fixture(scope="module")
def torch_whisper(tmp_path_factory):
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(WhisperConfig(**TINY_CFG)).eval()
    folder = tmp_path_factory.mktemp("hf_whisper")
    model.save_pretrained(folder, safe_serialization=True)
    return model, folder


@pytest.fixture(scope="module")
def ours(torch_whisper):
    _, folder = torch_whisper
    dims, params, _ = load_whisper(folder, dtype=jnp.float32)
    return dims, params


def test_dims_from_config(ours):
    dims, _ = ours
    assert dims.n_audio_state == 64
    assert dims.n_audio_ctx == 150
    assert dims.n_vocab == 207


def test_encoder_parity(torch_whisper, ours):
    import torch

    model, _ = torch_whisper
    dims, params = ours
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)

    with torch.no_grad():
        ref = model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    out = np.asarray(encoder_forward(params, jnp.asarray(mel), dims))
    assert out.shape == ref.shape == (2, dims.n_audio_ctx, dims.n_audio_state)
    assert np.abs(out - ref).max() < 2e-4, np.abs(out - ref).max()


def test_decoder_prefill_parity(torch_whisper, ours):
    import torch

    model, _ = torch_whisper
    dims, params = ours
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)
    tokens = rng.integers(0, dims.n_vocab, size=(1, 7)).astype(np.int32)

    with torch.no_grad():
        ref = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()

    enc = encoder_forward(params, jnp.asarray(mel), dims)
    cross_k, cross_v = compute_cross_kv(params, enc, dims)
    kv_k, kv_v = init_kv_cache(dims, 1, dtype=jnp.float32)
    logits, _, _ = decoder_forward(
        params, jnp.asarray(tokens), 0, kv_k, kv_v, cross_k, cross_v, dims
    )
    out = np.asarray(logits)
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 2e-3, np.abs(out - ref).max()


def test_incremental_matches_prefill(ours):
    """KV-cached single-token stepping must reproduce full-prefill logits."""
    dims, params = ours
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)
    tokens = rng.integers(0, dims.n_vocab, size=(1, 6)).astype(np.int32)

    enc = encoder_forward(params, jnp.asarray(mel), dims)
    cross_k, cross_v = compute_cross_kv(params, enc, dims)

    kv_k, kv_v = init_kv_cache(dims, 1, dtype=jnp.float32)
    full_logits, _, _ = decoder_forward(
        params, jnp.asarray(tokens), 0, kv_k, kv_v, cross_k, cross_v, dims
    )

    kv_k, kv_v = init_kv_cache(dims, 1, dtype=jnp.float32)
    step_logits = []
    for t in range(tokens.shape[1]):
        lg, (kv_k, kv_v), _ = decoder_forward(
            params, jnp.asarray(tokens[:, t : t + 1]), t, kv_k, kv_v, cross_k, cross_v, dims
        )
        step_logits.append(np.asarray(lg)[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    assert np.abs(step_logits - np.asarray(full_logits)).max() < 1e-3


def test_alignment_capture_shapes(ours):
    dims, params = ours
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)
    tokens = rng.integers(0, dims.n_vocab, size=(1, 4)).astype(np.int32)
    enc = encoder_forward(params, jnp.asarray(mel), dims)
    cross_k, cross_v = compute_cross_kv(params, enc, dims)
    kv_k, kv_v = init_kv_cache(dims, 1, dtype=jnp.float32)
    _, _, probs = decoder_forward(
        params, jnp.asarray(tokens), 0, kv_k, kv_v, cross_k, cross_v, dims,
        capture_alignment=True,
    )
    assert probs.shape == (dims.n_text_layer, 1, dims.n_text_head, 4, dims.n_audio_ctx)
    # softmax rows sum to 1
    assert np.allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-3)


def test_init_params_structure(ours):
    """Random init must produce the same tree structure as a loaded checkpoint."""
    dims, params = ours
    rand = init_params(jax.random.PRNGKey(0), dims, dtype=jnp.float32)
    ref_paths = {
        jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(params)
    }
    rand_paths = {
        jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(rand)
    }
    assert ref_paths == rand_paths
    for (p1, a), (p2, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params), key=lambda kv: jax.tree_util.keystr(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(rand), key=lambda kv: jax.tree_util.keystr(kv[0])),
    ):
        assert a.shape == b.shape, f"{jax.tree_util.keystr(p1)}: {a.shape} vs {b.shape}"


def test_variant_dims_table():
    assert VARIANT_DIMS["tiny"].n_audio_state == 384
    assert VARIANT_DIMS["large-v3"].n_mels == 128
    assert VARIANT_DIMS["large-v3"].n_vocab == 51866
    assert VARIANT_DIMS["large-v3-turbo"].n_text_layer == 4


def test_greedy_decode_parity_vs_torch(torch_whisper, ours):
    """End-to-end: our jitted while_loop greedy decode must produce the
    exact token sequence of a hand-rolled torch greedy loop on the same
    weights — validates prefill, KV cache, incremental steps, and logits
    head together."""
    import torch

    from whisperkit_tpu.decoding.loop import DecodeScalars, decode_loop, encode_window
    from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab

    model, _ = torch_whisper
    dims, params = ours
    sp = special_tokens_for_vocab(dims.n_vocab)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)
    prompt = [[3, 5], [3, 9]]  # decoder_start + arbitrary token
    max_new = 10

    # torch greedy
    with torch.no_grad():
        feats = torch.from_numpy(mel)
        ids = torch.tensor(prompt)
        enc = model.model.encoder(feats).last_hidden_state
        for _ in range(max_new):
            logits = model(encoder_outputs=(enc,), decoder_input_ids=ids).logits
            ids = torch.cat([ids, logits[:, -1].argmax(-1, keepdim=True)], dim=1)
    torch_tokens = ids[:, 2:].numpy()

    # ours
    _, ck, cv = encode_window(params, jnp.asarray(mel), dims)
    scalars = DecodeScalars(
        temperature=jnp.float32(0.0),
        max_initial_timestamp_index=jnp.int32(1500),
        first_token_logprob_threshold=jnp.float32(float("-inf")),
        rng_key=jax.random.PRNGKey(0),
    )
    out = decode_loop(
        params, ck, cv, jnp.asarray(prompt, jnp.int32),
        jnp.zeros((dims.n_vocab,), jnp.float32), scalars,
        dims=dims, special=sp, sample_begin=2, max_new_tokens=max_new,
        top_k=5, sot_index=0, use_timestamp_rules=False, suppress_blank=False,
    )
    our_tokens = np.asarray(out.tokens)[:, 2:]

    for row in range(2):
        t_row, o_row = torch_tokens[row], our_tokens[row]
        # compare up to our first EOT (we stop there; torch keeps going)
        eots = np.nonzero(o_row == sp.eot)[0]
        n = int(eots[0]) + 1 if len(eots) else max_new
        assert (t_row[:n] == o_row[:n]).all(), (row, t_row, o_row)


def test_converted_checkpoint_cache(torch_whisper):
    """Second load of the same folder hits the Orbax converted cache and
    matches the safetensors parse exactly."""
    _, folder = torch_whisper
    from whisperkit_tpu.models.loader import load_converted, save_converted

    dims, params, _ = load_whisper(folder, dtype=jnp.bfloat16)  # saves cache
    cached = load_converted(folder)
    assert cached is not None
    dims2, params2 = cached
    assert dims2 == dims
    np.testing.assert_array_equal(
        np.asarray(params2["decoder"]["token_embed"], np.float32),
        np.asarray(params["decoder"]["token_embed"], np.float32),
    )


def test_quantized_checkpoint_cache(torch_whisper):
    """load_whisper(quantization=...) returns a quantized tree, persists the
    quantized_<scheme>.orbax cache, and a second load restores it exactly
    (the reference's pre-quantized compressed-folder analog)."""
    _, folder = torch_whisper
    from whisperkit_tpu.models.loader import load_quantized

    for scheme, marker in (("w8a16", "w_q"), ("w4a16", "w_q4")):
        dims, params, _ = load_whisper(folder, quantization=scheme)
        # tiny model is below the default min_size gate for most linears,
        # but the cache mechanics must still round-trip the tree exactly
        cached = load_quantized(folder, scheme)
        assert cached is not None, scheme
        dims2, params2 = cached
        assert dims2 == dims
        leaves = jax.tree.leaves(params)
        leaves2 = jax.tree.leaves(params2)
        assert len(leaves) == len(leaves2)
        for a, b in zip(leaves, leaves2):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32)
            )


def test_quantized_cache_rejects_stale_pack_format(torch_whisper, tmp_path):
    """A quantized cache written under a different packed-weight layout
    (ops/quant.QUANT_FORMATS, per scheme) reads back with identical
    dtype/shape but garbage values — the loader must reject it and
    requantize, not restore it (the r6→r7 S4→half-plane repack is exactly
    this hazard). Runs on a per-test COPY of the checkpoint folder so a
    mid-test failure can't leave the module-scoped fixture's shared cache
    tampered (ADVICE r3 #2)."""
    import json as _json
    import shutil

    _, shared_folder = torch_whisper
    from pathlib import Path

    from whisperkit_tpu.models.loader import load_quantized

    folder = tmp_path / "ckpt"
    shutil.copytree(shared_folder, folder)
    load_whisper(folder, quantization="w4a16")  # writes the cache
    dims_path = Path(folder) / "quantized_w4a16_dims.json"
    meta = _json.loads(dims_path.read_text())
    assert meta["_quant_format"] >= 2
    meta["_quant_format"] = 1  # pretend the cache predates the repack
    dims_path.write_text(_json.dumps(meta))
    assert load_quantized(folder, "w4a16") is None
    # the pipeline-level load self-heals: requantizes and rewrites the cache
    load_whisper(folder, quantization="w4a16")
    assert _json.loads(dims_path.read_text())["_quant_format"] >= 2


def test_load_whisper_rejects_unknown_scheme(torch_whisper):
    _, folder = torch_whisper
    with pytest.raises(ValueError, match="unknown quantization scheme"):
        load_whisper(folder, quantization="w2a16")


def test_quantized_cache_roundtrips_int4_leaves(tmp_path):
    """Packed 4-bit leaves must survive the Orbax save/restore: use dims
    large enough to cross the min_size gate."""
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = dict(TINY_CFG, d_model=256, encoder_ffn_dim=1024, decoder_ffn_dim=1024)
    torch.manual_seed(1)
    WhisperForConditionalGeneration(WhisperConfig(**cfg)).save_pretrained(
        tmp_path, safe_serialization=True
    )
    dims, params, _ = load_whisper(tmp_path, quantization="w4a16")
    fc1 = params["encoder"]["blocks"]["fc1"]
    assert "w_q4" in fc1 and fc1["w_q4"].dtype == jnp.uint8
    from whisperkit_tpu.models.loader import load_quantized

    _, params2 = load_quantized(tmp_path, "w4a16")
    fc1b = params2["encoder"]["blocks"]["fc1"]
    assert fc1b["w_q4"].dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(fc1["w_q4"], np.uint8), np.asarray(fc1b["w_q4"], np.uint8)
    )
    np.testing.assert_array_equal(
        np.asarray(fc1["scale4"], np.float32),
        np.asarray(fc1b["scale4"], np.float32),
    )


def test_checkpoint_caches_reject_stale_sources(tmp_path):
    """Overwriting the checkpoint IN PLACE (re-export, new revision into
    the same folder) must invalidate both on-disk caches: they record a
    fingerprint of the source safetensors/config (size+mtime), and a
    mismatch reconverts/requantizes instead of silently serving the OLD
    weights (r10 verification caught the converted cache doing exactly
    that on a rebuilt checkpoint)."""
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    WhisperForConditionalGeneration(WhisperConfig(**TINY_CFG)).save_pretrained(
        tmp_path, safe_serialization=True
    )
    _, params_a, _ = load_whisper(tmp_path)  # writes converted cache
    _, qparams_a, _ = load_whisper(tmp_path, quantization="w8a16")
    emb_a = np.asarray(params_a["decoder"]["token_embed"], np.float32)

    # new weights, same folder, same shapes/sizes (mtime flags staleness)
    torch.manual_seed(7)
    WhisperForConditionalGeneration(WhisperConfig(**TINY_CFG)).save_pretrained(
        tmp_path, safe_serialization=True
    )
    from whisperkit_tpu.models.loader import load_converted, load_quantized

    assert load_converted(tmp_path) is None
    assert load_quantized(tmp_path, "w8a16") is None
    _, params_b, _ = load_whisper(tmp_path)
    emb_b = np.asarray(params_b["decoder"]["token_embed"], np.float32)
    assert not np.array_equal(emb_a, emb_b), "stale cache served old weights"
    # self-heal: the reload rewrote fresh caches that now validate
    assert load_converted(tmp_path) is not None
    _, qparams_b, _ = load_whisper(tmp_path, quantization="w8a16")
    assert load_quantized(tmp_path, "w8a16") is not None


def test_w8a8_shares_w8a16_cache(torch_whisper):
    """quantization="w8a8" loads the SAME int8 weight tree as "w8a16"
    (the A8 half is the encoder's runtime dispatch, not a representation):
    one quantized cache serves both schemes, and no quantized_w8a8 cache
    is ever written."""
    _, folder = torch_whisper
    from whisperkit_tpu.models.loader import load_quantized

    _, p16, _ = load_whisper(folder, quantization="w8a16")  # writes cache
    _, p88, _ = load_whisper(folder, quantization="w8a8")  # reads it
    for a, b in zip(jax.tree.leaves(p16), jax.tree.leaves(p88)):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )
    assert not (folder / "quantized_w8a8.orbax").exists()
    assert load_quantized(folder, "w8a16") is not None
