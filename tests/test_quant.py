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
