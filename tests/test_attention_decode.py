"""Pallas T==1 int8 cross-attention decode kernel (ops/attention_decode.py).

Reference hot loop: TextDecoder.swift:573-757; the kernel replaces the XLA
int8 einsum path of models/whisper._cross_attend under
WKTPU_PALLAS_CROSS_DECODE=1 (trace-time gate).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from whisperkit_tpu.models.whisper import _attend, _cross_attend
from whisperkit_tpu.ops.attention_decode import (
    cross_attend_q8_pallas,
    cross_attend_q8_reference,
)
from whisperkit_tpu.ops.quant import quantize_cross_kv


def _mk(b=4, h=4, s=300, dh=64, seed=0):
    rng = np.random.default_rng(seed)
    cq = jnp.asarray(rng.standard_normal((b, h, 1, dh)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, b, h, s, dh)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, b, h, s, dh)) * 0.5, jnp.float32)
    ckq, cvq = quantize_cross_kv(k, v)
    ck = {"q8": ckq["q8"][0], "scale": ckq["scale"][0]}
    cv = {"q8": cvq["q8"][0], "scale": cvq["scale"][0]}
    return cq, k[0], v[0], ck, cv


def _fold_quantize_q(cq, ck):
    scale = cq.shape[-1] ** -0.25
    qs = cq.astype(jnp.float32) * (scale * scale) * ck["scale"]
    q_scale = jnp.maximum(jnp.abs(qs).max(axis=-1, keepdims=True) / 127.0, 1e-8)
    qi = jnp.clip(jnp.round(qs / q_scale), -127, 127).astype(jnp.int8)
    return qi, q_scale


@pytest.mark.parametrize("block_b", [1, 2, 4])
def test_kernel_matches_jnp_reference(block_b):
    cq, _, _, ck, cv = _mk()
    qi, q_scale = _fold_quantize_q(cq, ck)
    out_k = np.asarray(cross_attend_q8_pallas(
        qi, q_scale, ck["q8"], cv["q8"], cv["scale"], block_b=block_b))
    out_r = np.asarray(cross_attend_q8_reference(
        qi, q_scale, ck["q8"], cv["q8"], cv["scale"]))
    np.testing.assert_allclose(out_k, out_r, rtol=1e-5, atol=1e-5)


def test_block_b_not_dividing_batch_falls_back():
    cq, _, _, ck, cv = _mk(b=3, seed=4)
    qi, q_scale = _fold_quantize_q(cq, ck)
    out_k = np.asarray(cross_attend_q8_pallas(
        qi, q_scale, ck["q8"], cv["q8"], cv["scale"], block_b=2))
    out_r = np.asarray(cross_attend_q8_reference(
        qi, q_scale, ck["q8"], cv["q8"], cv["scale"]))
    np.testing.assert_allclose(out_k, out_r, rtol=1e-5, atol=1e-5)


def test_kernel_matches_einsum_path_and_tracks_bf16():
    """Same int8 recipe as _cross_attend's einsum path → near-identical
    output; both stay within the int8 envelope of raw bf16 attention."""
    cq, k, v, ck, cv = _mk(seed=1)
    raw = np.asarray(_attend(cq, k, v), np.float32)
    einsum_q8 = np.asarray(_cross_attend(cq, ck, cv, capture_probs=False), np.float32)
    qi, q_scale = _fold_quantize_q(cq, ck)
    kern = np.asarray(cross_attend_q8_pallas(
        qi, q_scale, ck["q8"], cv["q8"], cv["scale"]), np.float32)
    np.testing.assert_allclose(kern, einsum_q8, rtol=2e-3, atol=2e-4)
    ref_norm = np.linalg.norm(raw)
    assert np.linalg.norm(kern - raw) / ref_norm < 0.05


def test_gate_routes_cross_attend_through_kernel(monkeypatch):
    """With the env gate on, _cross_attend's T==1 int8 path returns the
    kernel result (bit-identical to calling the kernel directly)."""
    import whisperkit_tpu.models.whisper as wm

    cq, _, _, ck, cv = _mk(seed=2)
    monkeypatch.setenv("WKTPU_PALLAS_CROSS_DECODE", "1")
    gated = np.asarray(wm._cross_attend(cq, ck, cv, capture_probs=False))
    qi, q_scale = _fold_quantize_q(cq, ck)
    direct = np.asarray(cross_attend_q8_pallas(
        qi, q_scale, ck["q8"], cv["q8"], cv["scale"]).astype(cq.dtype))
    np.testing.assert_array_equal(gated, direct)
    # capture path must NOT route through the kernel (needs probs)
    out, probs = wm._cross_attend(cq, ck, cv, capture_probs=True)
    assert probs.shape[-1] == ck["q8"].shape[-2]


def test_gated_decode_loop_end_to_end(monkeypatch):
    """Full decode_loop with the kernel gate on runs and emits finite
    logprobs (the kernel math equals the einsum path's, so behavior is
    unchanged within float tolerance)."""
    monkeypatch.setenv("WKTPU_PALLAS_CROSS_DECODE", "1")
    from whisperkit_tpu.decoding.loop import DecodeScalars, decode_loop, encode_window
    from whisperkit_tpu.models.whisper import WhisperDims, init_params
    from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab

    # UNIQUE dims (vocab 211): the WKTPU_PALLAS_* gates are trace-time, so a
    # jit signature shared with other tests would make kernel coverage
    # order-dependent (cached non-gated trace) and could leak the gated
    # executable to later tests (r6 review finding)
    dims = WhisperDims(80, 211, 1500, 64, 4, 2, 64, 64, 4, 2)
    params = init_params(jax.random.PRNGKey(0), dims)
    sp = special_tokens_for_vocab(dims.n_vocab)
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal((1, 480_000)) * 0.1, jnp.float32)
    from whisperkit_tpu.ops.mel import log_mel_spectrogram

    mel = log_mel_spectrogram(audio, n_mels=dims.n_mels)
    _, ck, cv = encode_window(params, mel, dims)
    ckq, cvq = quantize_cross_kv(ck, cv)
    prompt = jnp.asarray([[sp.sot, sp.transcribe]], jnp.int32)
    suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
    scalars = DecodeScalars(
        temperature=jnp.float32(0.0),
        max_initial_timestamp_index=jnp.int32(50),
        first_token_logprob_threshold=jnp.float32(float("-inf")),
        rng_key=jax.random.PRNGKey(0),
    )
    out = decode_loop(
        params, ckq, cvq, prompt, suppress, scalars,
        dims=dims, special=sp, sample_begin=2, max_new_tokens=8,
        top_k=5, sot_index=0, use_timestamp_rules=False, suppress_blank=False,
    )
    toks = np.asarray(out.tokens)[0]
    assert toks.shape[0] == 10
    assert np.isfinite(np.asarray(out.token_logprobs)).all()


# ---------------------------------------------------------------------------
# T==1 SELF-attention kernels
# ---------------------------------------------------------------------------


def _mk_self(b=4, h=4, s=64, dh=64, pos=10, seed=5):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, 1, dh)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)) * 0.5, jnp.float32)
    # zero out unwritten cache rows like the real cache
    written = (np.arange(s) <= pos)[None, None, :, None]
    k = k * written
    v = v * written
    mask = jnp.where(jnp.arange(s)[None, :] <= pos, 0.0, -jnp.inf).astype(
        jnp.float32
    )
    return q, k, v, mask


def test_self_kernel_matches_attend():
    from whisperkit_tpu.ops.attention_decode import self_attend_pallas

    q, k, v, mask_row = _mk_self()
    dh = q.shape[-1]
    out_k = np.asarray(self_attend_pallas(q * (dh**-0.5), k, v, mask_row))
    out_r = np.asarray(_attend(q, k, v, mask_row[None, None]))
    np.testing.assert_allclose(out_k, out_r, rtol=2e-3, atol=2e-4)


def test_self_q8_kernel_matches_attend_self_q8():
    from whisperkit_tpu.models.whisper import _attend_self_q8, _q8_rows
    from whisperkit_tpu.ops.attention_decode import self_attend_q8_pallas

    q, k, v, mask_row = _mk_self(seed=6)
    k8, ks = _q8_rows(k)
    v8, vs = _q8_rows(v)
    kd = {"q8": k8, "scale": ks}
    vd = {"q8": v8, "scale": vs}
    ref = np.asarray(_attend_self_q8(q, kd, vd, mask_row[None, None]))
    dh = q.shape[-1]
    qs8 = q.astype(jnp.float32) * (dh**-0.5)
    q_sc = jnp.maximum(jnp.abs(qs8).max(axis=-1, keepdims=True) / 127.0, 1e-8)
    qi8 = jnp.clip(jnp.round(qs8 / q_sc), -127, 127).astype(jnp.int8)
    out = np.asarray(
        self_attend_q8_pallas(qi8, q_sc, k8, ks, v8, vs, mask_row)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("quant_self", [False, True])
def test_gated_self_decode_loop_end_to_end(monkeypatch, quant_self):
    """Full decode_loop with the self-kernel gate on (raw and int8 cache
    forms) runs and emits finite logprobs."""
    monkeypatch.setenv("WKTPU_PALLAS_SELF_DECODE", "1")
    from whisperkit_tpu.decoding.loop import DecodeScalars, decode_loop, encode_window
    from whisperkit_tpu.models.whisper import WhisperDims, init_params
    from whisperkit_tpu.ops.mel import log_mel_spectrogram
    from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab

    # UNIQUE dims (vocab 211): the WKTPU_PALLAS_* gates are trace-time, so a
    # jit signature shared with other tests would make kernel coverage
    # order-dependent (cached non-gated trace) and could leak the gated
    # executable to later tests (r6 review finding)
    dims = WhisperDims(80, 211, 1500, 64, 4, 2, 64, 64, 4, 2)
    params = init_params(jax.random.PRNGKey(0), dims)
    sp = special_tokens_for_vocab(dims.n_vocab)
    rng = np.random.default_rng(7)
    audio = jnp.asarray(rng.standard_normal((1, 480_000)) * 0.1, jnp.float32)
    mel = log_mel_spectrogram(audio, n_mels=dims.n_mels)
    _, ck, cv = encode_window(params, mel, dims)
    prompt = jnp.asarray([[sp.sot, sp.transcribe]], jnp.int32)
    suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
    scalars = DecodeScalars(
        temperature=jnp.float32(0.0),
        max_initial_timestamp_index=jnp.int32(50),
        first_token_logprob_threshold=jnp.float32(float("-inf")),
        rng_key=jax.random.PRNGKey(0),
    )
    out = decode_loop(
        params, ck, cv, prompt, suppress, scalars,
        dims=dims, special=sp, sample_begin=2, max_new_tokens=8,
        top_k=5, sot_index=0, use_timestamp_rules=False, suppress_blank=False,
        quantize_self_kv=quant_self,
    )
    toks = np.asarray(out.tokens)[0]
    assert toks.shape[0] == 10
    assert np.isfinite(np.asarray(out.token_logprobs)).all()
