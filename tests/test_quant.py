"""W8A16 weight-only quantization.

Reference capability: the benchmark model matrix's quantized variants
(fastlane/Fastfile:26-55) and Qwen3 W8A16 components.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from whisperkit_tpu.core.configurations import DecodingOptions
from whisperkit_tpu.models.whisper import WhisperDims, dense, init_params
from whisperkit_tpu.ops.quant import (
    dequantize_weight,
    quantize_weight,
    quantize_whisper_params,
    quantized_size_bytes,
)
from whisperkit_tpu.pipelines.whisper import WhisperPipeline

DIMS = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)


def test_quantize_round_trip_error_small():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)) * 0.02, jnp.float32)
    q = quantize_weight(w)
    assert q["w_q"].dtype == jnp.int8
    back = dequantize_weight(q, jnp.float32)
    rel = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # <1% relative error per element


def test_dense_dispatches_on_quantized():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((32, 16)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16) * 0.01, jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    full = dense(x, {"w": w, "b": b})
    q = dict(quantize_weight(w), b=b)
    quant = dense(x, q)
    np.testing.assert_allclose(np.asarray(quant), np.asarray(full), atol=0.02)


def test_quantize_whisper_params_structure():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    qparams = quantize_whisper_params(params, min_size=1)
    blocks = qparams["encoder"]["blocks"]
    assert "w_q" in blocks["fc1"] and "scale" in blocks["fc1"]
    assert blocks["fc1"]["w_q"].dtype == jnp.int8
    # convs and embeddings untouched
    assert "w" in qparams["encoder"]["conv1"]
    assert qparams["decoder"]["token_embed"].dtype == params["decoder"]["token_embed"].dtype
    # roughly halves the linear-weight bytes
    assert quantized_size_bytes(qparams) < quantized_size_bytes(params)


def test_quantized_pipeline_end_to_end():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    qparams = quantize_whisper_params(params, min_size=1)
    pipe_full = WhisperPipeline(dims=DIMS, params=params)
    pipe_q = WhisperPipeline(dims=DIMS, params=qparams)
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    opts = DecodingOptions(sample_length=8, language="en")
    res_q = pipe_q.transcribe(audio, opts)
    res_f = pipe_full.transcribe(audio, opts)
    assert res_q.segments
    # outputs need not be identical, but both must be structurally valid
    assert all(s.end >= s.start for s in res_q.segments)
    assert res_f.segments


def test_tts_quantization_parity_and_pipeline():
    """W8A16 TTS (VERDICT r1 #8): quantized code-decoder logits stay within
    int8 tolerance of bf16, and the quantized pipeline synthesizes finite
    audio end-to-end."""
    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.models.qwen3_tts import (
        TINY_TTS_DIMS,
        code_decoder_forward,
        init_code_kv_cache,
        init_tts_params,
    )
    from whisperkit_tpu.ops.quant import quantize_tts_params, quantized_size_bytes
    from whisperkit_tpu.pipelines.tts import GenerationOptions, TTSPipeline

    dims = TINY_TTS_DIMS
    params = init_tts_params(jax.random.PRNGKey(0), dims, dtype=jnp.float32)
    qparams = quantize_tts_params(params, min_size=1)
    assert quantized_size_bytes(qparams) < quantized_size_bytes(params)

    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 4, dims.d_model)) * 0.1
    kv = init_code_kv_cache(dims, 2, 16)
    ref_logits, _, _ = code_decoder_forward(params, embeds, 0, *kv, dims)
    q_logits, _, _ = code_decoder_forward(qparams, embeds, 0, *kv, dims)
    ref, q = np.asarray(ref_logits), np.asarray(q_logits)
    scale = np.abs(ref).max() or 1.0
    assert np.abs(q - ref).max() / scale < 0.05  # int8 weight tolerance

    pipe = TTSPipeline(quantize=True)
    res = pipe.generate("quantized hello", GenerationOptions(max_new_tokens=6, seed=2))
    assert res.audio.size > 0 and np.isfinite(res.audio).all()


def test_tts_multicode_quantized_heads_match_greedy():
    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.models.qwen3_tts import (
        TINY_TTS_DIMS,
        init_tts_params,
        multicode_forward,
    )
    from whisperkit_tpu.ops.quant import quantize_tts_params

    from whisperkit_tpu.models.qwen3_tts import code_predictor_forward

    params = init_tts_params(jax.random.PRNGKey(0), TINY_TTS_DIMS, dtype=jnp.float32)
    qparams = quantize_tts_params(params, min_size=1)
    hidden = jax.random.normal(jax.random.PRNGKey(3), (2, TINY_TTS_DIMS.d_model))
    code0 = jnp.asarray([5, 9], jnp.int32)
    # at random init logits over 2048 classes are near-uniform, so greedy
    # argmax is not int8-stable (and flips cascade through the fed-back
    # embeds); the meaningful property is LOGITS closeness per head
    d = TINY_TTS_DIMS
    prefill = jnp.stack([hidden, params["code_embed"][code0]], axis=1)
    kv = lambda: (  # noqa: E731
        jnp.zeros((d.cp_layer, 2, d.cp_kv_head, 4, d.cp_head_dim), jnp.float32),
        jnp.zeros((d.cp_layer, 2, d.cp_kv_head, 4, d.cp_head_dim), jnp.float32),
    )
    h_f, _ = code_predictor_forward(params["mc"], prefill, 0, *kv(), d)
    h_q, _ = code_predictor_forward(qparams["mc"], prefill, 0, *kv(), d)
    lg_f = np.asarray(h_f[:, -1] @ params["mc"]["heads"][0])
    w_q = qparams["mc"]["heads"]["w_q"][0].astype(jnp.float32)
    lg_q = np.asarray(h_q[:, -1] @ (w_q * qparams["mc"]["heads"]["scale"][0]))
    scale = np.abs(lg_f).max() or 1.0
    assert np.abs(lg_q - lg_f).max() / scale < 0.05
    # and the quantized sampler still emits structurally valid codes
    b_codes, _ = multicode_forward(
        qparams, hidden, code0, jax.random.PRNGKey(0), jnp.float32(0.0),
        dims=TINY_TTS_DIMS,
    )
    assert ((np.asarray(b_codes) >= 0) & (np.asarray(b_codes) < 2048)).all()


def test_tts_code_predictor_unroll_matches_scan():
    """The W8A16 T==1 layer-unroll (qwen3_tts._qwen3_layers unroll_t1) must be
    numerically equivalent to the scan path — same math, different schedule."""
    import os

    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.models.qwen3_tts import (
        TINY_TTS_DIMS,
        code_predictor_forward,
        init_tts_params,
    )
    from whisperkit_tpu.ops.quant import quantize_tts_params

    d = TINY_TTS_DIMS
    params = init_tts_params(jax.random.PRNGKey(0), d, dtype=jnp.float32)
    qparams = quantize_tts_params(params, min_size=1)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 1, d.d_model)) * 0.1
    kv = lambda: (  # noqa: E731
        jnp.zeros((d.cp_layer, 2, d.cp_kv_head, 8, d.cp_head_dim), jnp.float32),
        jnp.zeros((d.cp_layer, 2, d.cp_kv_head, 8, d.cp_head_dim), jnp.float32),
    )
    outs = {}
    for flag in ("0", "1"):
        os.environ["WKTPU_TTS_UNROLL_T1"] = flag
        try:
            h, (kk, vv) = code_predictor_forward(
                qparams["mc"], x, 3, *kv(), d
            )
            outs[flag] = (np.asarray(h), np.asarray(kk), np.asarray(vv))
        finally:
            del os.environ["WKTPU_TTS_UNROLL_T1"]
    for a, b in zip(outs["0"], outs["1"]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_cross_attend_int8_matches_bf16():
    """int8 cross-attention (serving mode) must track the bf16 path within
    int8 tolerance on controlled inputs."""
    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.models.whisper import _attend, _cross_attend
    from whisperkit_tpu.ops.quant import quantize_cross_kv

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    ck = jax.random.normal(k1, (1, 2, 4, 64, 16), jnp.float32)  # [L,B,H,S,Dh]
    cv = jax.random.normal(k2, (1, 2, 4, 64, 16), jnp.float32)
    cq = jax.random.normal(k3, (2, 4, 1, 16), jnp.float32)

    ref = np.asarray(_attend(cq, ck[0], cv[0]))
    ckq, cvq = quantize_cross_kv(ck, cv)
    got = np.asarray(
        _cross_attend(
            cq,
            {"q8": ckq["q8"][0], "scale": ckq["scale"][0]},
            {"q8": cvq["q8"][0], "scale": cvq["scale"][0]},
            capture_probs=False,
        )
    )
    denom = np.abs(ref).mean()
    assert np.abs(got - ref).mean() / denom < 0.05


def test_fused_cross_kv_quantize_matches_two_step():
    """compute_cross_kv_quantized (per-layer project+quantize, the b=32
    memory-fit path) must produce EXACTLY what quantize_cross_kv(
    compute_cross_kv(...)) produces — same projection, same scale math."""
    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.models.whisper import (
        WhisperDims,
        compute_cross_kv,
        compute_cross_kv_quantized,
        init_params,
    )
    from whisperkit_tpu.ops.quant import quantize_cross_kv

    dims = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)
    params = init_params(jax.random.PRNGKey(0), dims)
    enc_out = jax.random.normal(
        jax.random.PRNGKey(1), (3, 1500, dims.n_audio_state), jnp.float32
    ).astype(jnp.bfloat16)

    ck_ref, cv_ref = quantize_cross_kv(*compute_cross_kv(params, enc_out, dims))
    ck, cv = compute_cross_kv_quantized(params, enc_out, dims)
    for got, ref in ((ck, ck_ref), (cv, cv_ref)):
        np.testing.assert_array_equal(np.asarray(got["q8"]), np.asarray(ref["q8"]))
        np.testing.assert_allclose(
            np.asarray(got["scale"]), np.asarray(ref["scale"]), rtol=1e-6
        )


def test_pipeline_quantized_cross_kv_end_to_end():
    import jax

    from whisperkit_tpu.core.configurations import (
        ComputeOptions,
        DecodingOptions,
        WhisperConfig,
    )
    from whisperkit_tpu.models.whisper import WhisperDims, init_params
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    dims = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)
    params = init_params(jax.random.PRNGKey(0), dims)
    pipe = WhisperPipeline(
        WhisperConfig(compute_options=ComputeOptions(quantize_cross_kv=True)),
        dims=dims,
        params=params,
    )
    audio = np.random.default_rng(0).standard_normal(16000 * 3).astype(np.float32) * 0.1
    res = pipe.transcribe(
        audio,
        DecodingOptions(
            language="en", sample_length=6, temperature_fallback_count=0,
            first_token_log_prob_threshold=None, no_speech_threshold=None,
            logprob_threshold=None, compression_ratio_threshold=None,
        ),
    )
    assert res.segments and np.isfinite(res.segments[0].avg_logprob)


def test_pipeline_quantized_cross_kv_beam_keeps_bf16():
    """quantize_cross_kv + beam_size>1: beam search tiles raw bf16 arrays,
    so _encode must skip the fused int8 path and the transcription still
    succeeds (the greedy fallback rungs then also see bf16)."""
    import jax

    from whisperkit_tpu.core.configurations import (
        ComputeOptions,
        DecodingOptions,
        WhisperConfig,
    )
    from whisperkit_tpu.models.whisper import WhisperDims, init_params
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    dims = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)
    pipe = WhisperPipeline(
        WhisperConfig(compute_options=ComputeOptions(quantize_cross_kv=True)),
        dims=dims,
        params=init_params(jax.random.PRNGKey(0), dims),
    )
    audio = np.random.default_rng(3).standard_normal(16000 * 3).astype(np.float32) * 0.1
    res = pipe.transcribe(
        audio,
        DecodingOptions(
            language="en", sample_length=6, beam_size=2,
            temperature_fallback_count=0,
            first_token_log_prob_threshold=None, no_speech_threshold=None,
            logprob_threshold=None, compression_ratio_threshold=None,
        ),
    )
    assert res.segments


def test_pipeline_int8_self_kv_end_to_end():
    """ComputeOptions(quantize_cross_kv=True, quantize_self_kv=True) — the
    fully-int8-KV serving candidate — must transcribe end to end, including
    the word-timestamp alignment capture riding the unrolled T==1 step with
    a dict self-KV cache."""
    import jax

    from whisperkit_tpu.core.configurations import (
        ComputeOptions,
        DecodingOptions,
        WhisperConfig,
    )
    from whisperkit_tpu.models.whisper import WhisperDims, init_params
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    dims = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)
    params = init_params(jax.random.PRNGKey(0), dims)
    pipe = WhisperPipeline(
        WhisperConfig(
            compute_options=ComputeOptions(
                quantize_cross_kv=True, quantize_self_kv=True
            )
        ),
        dims=dims,
        params=params,
        alignment_heads=np.asarray([[0, 0], [1, 2]], np.int32),
    )
    audio = np.random.default_rng(0).standard_normal(16000 * 3).astype(np.float32) * 0.1
    res = pipe.transcribe(
        audio,
        DecodingOptions(
            language="en", sample_length=6, temperature_fallback_count=0,
            word_timestamps=True,
            first_token_log_prob_threshold=None, no_speech_threshold=None,
            logprob_threshold=None, compression_ratio_threshold=None,
        ),
    )
    assert res.segments and np.isfinite(res.segments[0].avg_logprob)
    for seg in res.segments:
        for w in seg.words:
            assert w.end >= w.start >= 0.0


def test_pipeline_quantized_cross_kv_with_word_timestamps():
    """ADVICE r2 (medium): quantized cross-KV is an int8 dict — the decode
    loop must size the alignment buffer from it instead of reading .shape,
    and the alignment capture path must work end to end."""
    import jax

    from whisperkit_tpu.core.configurations import (
        ComputeOptions,
        DecodingOptions,
        WhisperConfig,
    )
    from whisperkit_tpu.models.whisper import WhisperDims, init_params
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    dims = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)
    params = init_params(jax.random.PRNGKey(0), dims)
    pipe = WhisperPipeline(
        WhisperConfig(compute_options=ComputeOptions(quantize_cross_kv=True)),
        dims=dims,
        params=params,
        alignment_heads=np.asarray([[0, 0], [1, 2]], np.int32),
    )
    audio = np.random.default_rng(0).standard_normal(16000 * 3).astype(np.float32) * 0.1
    res = pipe.transcribe(
        audio,
        DecodingOptions(
            language="en", sample_length=6, temperature_fallback_count=0,
            word_timestamps=True,
            first_token_log_prob_threshold=None, no_speech_threshold=None,
            logprob_threshold=None, compression_ratio_threshold=None,
        ),
    )
    assert res.segments
    for seg in res.segments:
        for w in seg.words:
            assert w.end >= w.start >= 0.0


# ---------------------------------------------------------------------------
# W4A16 (group-wise 4-bit — the reference's 4-bit palettized variant family,
# fastlane/Fastfile:26-55, as nibble-packed uint8: native S4 cannot cross a
# jit boundary on the axon backend, tools/probe_int4_device.py)
# ---------------------------------------------------------------------------


def test_w4_quantize_roundtrip_and_matmul():
    from whisperkit_tpu.ops.quant import (
        dequantize_weight_w4,
        quantize_weight_w4,
        quantized_matmul_w4,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((128, 96)) * 0.02, jnp.float32)
    q = quantize_weight_w4(w)
    assert q["w_q4"].dtype == jnp.uint8  # two nibbles per byte along in
    assert q["w_q4"].shape == (64, 96)
    assert q["scale4"].shape == (2, 96)  # group=64 → 2 groups
    back = np.asarray(dequantize_weight_w4(q, jnp.float32))
    # per-element error is bounded by half a quantization step of its group
    # (+0.4% slack for the bf16 rounding of the stored scale)
    step = np.repeat(np.asarray(q["scale4"], np.float32), 64, axis=0)
    assert (np.abs(back - np.asarray(w)) <= 0.52 * step + 1e-6).all()

    x = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
    y_fused = np.asarray(quantized_matmul_w4(x, q))
    y_ref = np.asarray(x @ dequantize_weight_w4(q, jnp.float32))
    np.testing.assert_allclose(y_fused, y_ref, atol=1e-3)

    # dense() dispatches on the w_q4 form
    b = jnp.zeros((96,), jnp.float32)
    y_dense = np.asarray(dense(x, dict(q, b=b)))
    np.testing.assert_allclose(y_dense, y_ref, atol=1e-3)


def test_w4_non_divisible_input_falls_back_to_one_group():
    from whisperkit_tpu.ops.quant import dequantize_weight_w4, quantize_weight_w4

    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((50, 8)) * 0.1, jnp.float32)
    q = quantize_weight_w4(w)
    assert q["scale4"].shape == (1, 8)
    back = np.asarray(dequantize_weight_w4(q, jnp.float32))
    rel = np.abs(back - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.10  # int4 single-group: coarse but bounded


def test_w4_whisper_params_structure_and_size():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    q4 = quantize_whisper_params(params, min_size=1, bits=4)
    blocks = q4["encoder"]["blocks"]
    assert "w_q4" in blocks["fc1"] and "scale4" in blocks["fc1"]
    assert blocks["fc1"]["w_q4"].dtype == jnp.uint8
    # stacked [L, in/2, out] + stacked scales [L, g, out]
    L = DIMS.n_audio_layer
    assert blocks["fc1"]["w_q4"].shape[0] == L
    assert blocks["fc1"]["scale4"].shape[0] == L
    # convs and embeddings untouched
    assert "w" in q4["encoder"]["conv1"]
    q8 = quantize_whisper_params(params, min_size=1)
    assert quantized_size_bytes(q4) < quantized_size_bytes(q8)


def test_w4_pipeline_end_to_end():
    """The W4A16 tree runs the full pipeline (prefill scan over stacked int4
    weights + the unrolled T==1 step) and produces structurally valid
    output."""
    params = init_params(jax.random.PRNGKey(0), DIMS)
    q4 = quantize_whisper_params(params, min_size=1, bits=4)
    pipe = WhisperPipeline(dims=DIMS, params=q4)
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    res = pipe.transcribe(audio, DecodingOptions(sample_length=8, language="en"))
    assert res.segments
    assert all(s.end >= s.start for s in res.segments)


def test_w4_decoder_logits_track_bf16():
    """Teacher-forced decoder logits from the W4 tree stay within the int4
    round-to-nearest error envelope of the full-precision logits.

    (An autoregressive token-agreement assertion is NOT meaningful here:
    int4 RTN on iid gaussian random-init weights has ~14% per-weight RMS
    error — scale = max/7 ≈ 0.5σ — and random-init logits are near-flat, so
    argmax flips early and the sequences diverge by construction. On real
    weights quality is a WER question — docs/WER_RUNBOOK.md — exactly as
    the reference treats its 4-bit palettized variants.)"""
    from whisperkit_tpu.decoding.loop import encode_window
    from whisperkit_tpu.models.whisper import decoder_forward
    from whisperkit_tpu.ops.mel import log_mel_spectrogram

    params = init_params(jax.random.PRNGKey(0), DIMS)
    q4 = quantize_whisper_params(params, min_size=1, bits=4)
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal((1, 480_000)) * 0.1, jnp.float32)
    mel = log_mel_spectrogram(audio, n_mels=DIMS.n_mels)
    tokens = jnp.asarray(rng.integers(0, DIMS.n_vocab, (1, 8)), jnp.int32)
    dh = DIMS.n_text_state // DIMS.n_text_head
    kv_shape = (DIMS.n_text_layer, 1, DIMS.n_text_head, 16, dh)

    def logits(p):
        _, ck, cv = encode_window(p, mel, DIMS)
        kv_dtype = p["decoder"]["token_embed"].dtype
        out, _, _ = decoder_forward(
            p, tokens, 0, jnp.zeros(kv_shape, kv_dtype),
            jnp.zeros(kv_shape, kv_dtype), ck, cv, DIMS,
        )
        return np.asarray(out, np.float32)

    l_full, l_q4 = logits(params), logits(q4)
    rel = np.linalg.norm(l_q4 - l_full) / np.linalg.norm(l_full)
    assert rel < 0.35, f"w4 logits error too large: {rel}"
    # and the error must be real quantization noise, not a broken path
    assert rel > 1e-4


def test_tts_w4_quantization_pipeline():
    """W4A16 TTS: the int4 tree synthesizes finite audio end-to-end, the
    code-decoder logits stay within the int4 RTN envelope of f32, and the
    device footprint shrinks below the W8A16 tree's."""
    import jax

    from whisperkit_tpu.models.qwen3_tts import (
        TINY_TTS_DIMS,
        code_decoder_forward,
        init_code_kv_cache,
        init_tts_params,
    )
    from whisperkit_tpu.ops.quant import quantize_tts_params, quantized_size_bytes
    from whisperkit_tpu.pipelines.tts import GenerationOptions, TTSPipeline

    dims = TINY_TTS_DIMS
    params = init_tts_params(jax.random.PRNGKey(0), dims, dtype=jnp.float32)
    q4 = quantize_tts_params(params, min_size=1, bits=4)
    q8 = quantize_tts_params(params, min_size=1)
    assert quantized_size_bytes(q4) < quantized_size_bytes(q8)
    assert q4["blocks"]["wq"]["w_q4"].dtype == jnp.uint8

    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 4, dims.d_model)) * 0.1
    kv = init_code_kv_cache(dims, 2, 16)
    ref_logits, _, _ = code_decoder_forward(params, embeds, 0, *kv, dims)
    q_logits, _, _ = code_decoder_forward(q4, embeds, 0, *kv, dims)
    ref, q = np.asarray(ref_logits), np.asarray(q_logits)
    scale = np.abs(ref).max() or 1.0
    # int4 RTN on random-init weights: ~16x the int8 step (docs in
    # test_w4_decoder_logits_track_bf16); bound generously but non-trivially
    assert np.abs(q - ref).max() / scale < 0.60
    assert np.abs(q - ref).max() / scale > 1e-5

    pipe = TTSPipeline(quantize="w4a16")
    res = pipe.generate("four bit hello", GenerationOptions(max_new_tokens=6, seed=2))
    assert res.audio.size > 0 and np.isfinite(res.audio).all()


@pytest.mark.parametrize("bits", [8, 4])
def test_pipeline_fully_quantized_serving_candidate(bits):
    """Weight quantization (W8A16/W4A16) composed with BOTH int8 KV caches
    — the fully-compressed serving candidates bench.py measures — must
    transcribe end to end through the VAD batch path."""
    import jax

    from whisperkit_tpu.core.configurations import (
        ComputeOptions,
        DecodingOptions,
        WhisperConfig,
    )
    from whisperkit_tpu.models.whisper import WhisperDims, init_params
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    dims = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)
    params = quantize_whisper_params(
        init_params(jax.random.PRNGKey(0), dims), min_size=1, bits=bits
    )
    pipe = WhisperPipeline(
        WhisperConfig(
            compute_options=ComputeOptions(
                quantize_cross_kv=True, quantize_self_kv=True
            )
        ),
        dims=dims,
        params=params,
    )
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000 * 35) * 0.1).astype(np.float32)
    res = pipe.transcribe(
        audio,
        DecodingOptions(
            language="en", sample_length=6, chunking_strategy="vad",
            temperature_fallback_count=0, logprob_threshold=None,
            compression_ratio_threshold=None, no_speech_threshold=None,
            first_token_log_prob_threshold=None, concurrent_worker_count=4,
        ),
    )
    assert res.segments and all(s.end >= s.start for s in res.segments)


# --- W8A8 (int8-activation encoder matmuls) ----------------------------------


def test_w8a8_matmul_tracks_full_precision():
    from whisperkit_tpu.ops.quant import quantized_matmul_w8a8

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((64, 48)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(48) * 0.01, jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, 7, 64)), jnp.float32)
    ref = np.asarray(x @ w + b)
    q = dict(quantize_weight(w), b=b)
    got = np.asarray(quantized_matmul_w8a8(x, q) + b)
    # int8 weights AND per-row int8 activations: ~1-2% of output scale
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 0.03
    # dense(a8=True) dispatches to the same path
    via_dense = np.asarray(dense(x, q, a8=True))
    np.testing.assert_allclose(got, via_dense, rtol=1e-6, atol=1e-6)
    # a8 on an UNQUANTIZED param is a no-op (bf16/f32 path)
    np.testing.assert_allclose(
        np.asarray(dense(x, {"w": w, "b": b}, a8=True)), ref, atol=1e-5
    )


def test_w8a8_encoder_tracks_bf16():
    from whisperkit_tpu.models.whisper import encoder_forward

    params = init_params(jax.random.PRNGKey(0), DIMS)
    qparams = quantize_whisper_params(params, min_size=1)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, DIMS.n_mels, 3000), jnp.float32)
    ref = np.asarray(encoder_forward(params, mel, DIMS), np.float32)
    got = np.asarray(encoder_forward(qparams, mel, DIMS, act8=True), np.float32)
    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.15  # per-layer int8 error accumulates over the stack
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.99


def test_w8a8_pipeline_end_to_end():
    """quantization="w8a8" at the pipeline level: the encoder runs the
    int8-activation path, decode output stays structurally valid."""
    from whisperkit_tpu.core.configurations import ComputeOptions, WhisperConfig

    params = init_params(jax.random.PRNGKey(0), DIMS)
    qparams = quantize_whisper_params(params, min_size=1)
    pipe = WhisperPipeline(
        WhisperConfig(compute_options=ComputeOptions(quantization="w8a8")),
        dims=DIMS, params=qparams,
    )
    assert pipe._act8
    rng = np.random.default_rng(6)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    res = pipe.transcribe(audio, DecodingOptions(sample_length=8, language="en"))
    assert res.segments
    assert all(s.end >= s.start for s in res.segments)


def test_quant_divergence_harness_blessed_presets():
    """End-to-end WER-delta/token-divergence harness (VERDICT r4 #3):
    the blessed serving preset (int8 cross-KV) and the W8A16/W8A8 schemes
    stay within bounded divergence of the bf16 pipeline on real decode
    paths at test scale. Random-init weights make this a sensitive probe —
    decode decisions ride on raw logit margins with no language prior."""
    import jax

    from whisperkit_tpu.eval.quant_delta import quant_divergence

    params = init_params(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(5)
    audio_list = [
        (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32),
        (rng.standard_normal(16000 * 5) * 0.1).astype(np.float32),
    ]
    options = DecodingOptions(
        language="en", sample_length=8, temperature_fallback_count=0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, first_token_log_prob_threshold=None,
    )
    schemes = {
        "serving_int8_cross_kv": (None, {"quantize_cross_kv": True}),
        "w8a16_int8kv": (8, {"quantize_cross_kv": True, "quantization": "w8a16"}),
        "w8a8_int8kv": (8, {"quantize_cross_kv": True, "quantization": "w8a8"}),
    }
    reports = {
        r.scheme: r
        for r in quant_divergence(DIMS, params, audio_list, options, schemes)
    }
    assert set(reports) == set(schemes)
    for r in reports.values():
        assert r.n_ref_tokens > 0
        assert 0.0 <= r.token_divergence <= 1.0
        assert r.n_diverged_tokens <= r.n_ref_tokens
    # measured at this scale (CPU, seed 5): ZERO divergence for all three
    # (serving preset decode decisions are bit-stable under int8 cross-KV);
    # weight-quant schemes get a small allowance for math-library drift
    assert reports["serving_int8_cross_kv"].token_divergence == 0.0
    assert reports["serving_int8_cross_kv"].wer_vs_bf16 == 0.0
    assert reports["w8a16_int8kv"].token_divergence <= 0.2
    assert reports["w8a8_int8kv"].token_divergence <= 0.2


def test_teacher_forced_divergence_harness():
    """Teacher-forced per-step agreement (the compounding-free companion
    to the free-run WER-delta table): every scheme scores the same
    bf16-greedy prefix; flips measure per-step decision stability. At this
    scale the blessed serving preset is bit-stable (zero flips) and the
    bf16 logit perturbation stays far below the median decision margin."""
    import math

    from whisperkit_tpu.eval.quant_delta import teacher_forced_divergence

    params = init_params(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    schemes = {
        "serving_int8_cross_kv": (None, {"quantize_cross_kv": True}),
        "int8_self_kv": (None, {"quantize_self_kv": True}),
        "w8a8_int8kv": (8, {"quantize_cross_kv": True, "quantization": "w8a8"}),
    }
    reports = {
        r.scheme: r
        for r in teacher_forced_divergence(
            DIMS, params, audio, schemes=schemes, max_tokens=16
        )
    }
    assert set(reports) == set(schemes)
    for r in reports.values():
        assert r.n_steps > 0
        assert 0.0 <= r.tf_agreement <= 1.0
        assert r.n_flips == round((1.0 - r.tf_agreement) * r.n_steps)
        assert r.margin_bf16_median > 0.0
        assert math.isfinite(r.mean_abs_logit_delta)
        # logit perturbation well under the decision margin at this scale
        assert r.mean_abs_logit_delta < 0.25 * r.margin_bf16_median
    # measured (CPU, seed 5): zero flips for the serving preset
    assert reports["serving_int8_cross_kv"].tf_agreement == 1.0
    assert reports["serving_int8_cross_kv"].flip_margin_median is None
