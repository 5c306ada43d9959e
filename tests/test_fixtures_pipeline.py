"""Full-pipeline tests on the reference's real audio fixtures.

Reference test model: UnitTests decode tests run against real audio files
(jfk.wav etc., TestUtils.swift:138-167). Weights here are random (no
network), so assertions are structural: segment math, timings, durations.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from whisperkit_tpu.core.configurations import DecodingOptions
from whisperkit_tpu.models.whisper import WhisperDims, init_params
from whisperkit_tpu.pipelines.whisper import WhisperPipeline

DIMS = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)


@pytest.fixture(scope="module")
def pipe():
    return WhisperPipeline(dims=DIMS, params=init_params(jax.random.PRNGKey(0), DIMS))


def test_jfk_wav_full_pipeline(pipe, resources):
    res = pipe.transcribe(
        resources / "jfk.wav", DecodingOptions(sample_length=8, language="en")
    )
    assert res.timings.input_audio_seconds == pytest.approx(11.0, abs=0.1)
    assert res.segments
    assert all(0 <= s.start <= s.end <= 11.5 for s in res.segments)
    assert res.timings.audio_loading > 0


def test_multichannel_m4a(pipe, resources):
    """8_Channel_ID.m4a exercises the native decoder + channel downmix."""
    from whisperkit_tpu.audio.io import load_audio

    path = resources / "8_Channel_ID.m4a"
    if not path.exists():
        pytest.skip("fixture missing")
    audio = load_audio(path)
    assert audio.ndim == 1
    assert audio.dtype == np.float32
    res = pipe.transcribe(audio, DecodingOptions(sample_length=6, language="en"))
    assert res.timings.input_audio_seconds > 1.0


def test_qwen3_loader_round_trip(tmp_path):
    """Save HF-named Qwen3 backbone tensors, load with allow_partial (no
    code-predictor/code2wav tensors present), and check they landed."""
    import json

    from safetensors.numpy import save_file

    from whisperkit_tpu.models.qwen3_loader import load_qwen3_tts

    cfg = dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2, head_dim=8,
               intermediate_size=64, max_position_embeddings=128,
               talker_config=dict(code_predictor_config=dict(
                   num_hidden_layers=2, num_attention_heads=2,
                   num_key_value_heads=1, head_dim=8, intermediate_size=32)),
               code2wav_config=dict(hidden_size=32, num_hidden_layers=2,
                                    num_attention_heads=4,
                                    num_key_value_heads=2,
                                    intermediate_size=64, sliding_window=8,
                                    decoder_dim=32))
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    rng = np.random.default_rng(0)
    tensors = {"model.embed_tokens.weight": rng.standard_normal((128, 32)).astype(np.float32),
               "model.norm.weight": np.ones(32, np.float32)}
    for i in range(2):
        p = f"model.layers.{i}."
        for name, shape in [
            ("self_attn.q_proj.weight", (32, 32)),
            ("self_attn.k_proj.weight", (16, 32)),
            ("self_attn.v_proj.weight", (16, 32)),
            ("self_attn.o_proj.weight", (32, 32)),
            ("mlp.gate_proj.weight", (64, 32)),
            ("mlp.up_proj.weight", (64, 32)),
            ("mlp.down_proj.weight", (32, 64)),
            ("input_layernorm.weight", (32,)),
            ("post_attention_layernorm.weight", (32,)),
            ("self_attn.q_norm.weight", (8,)),
            ("self_attn.k_norm.weight", (8,)),
        ]:
            tensors[p + name] = rng.standard_normal(shape).astype(np.float32)
    save_file(tensors, str(tmp_path / "model.safetensors"))

    # components beyond the backbone are absent: loud by default
    from whisperkit_tpu.core.errors import ModelsUnavailable

    with pytest.raises(ModelsUnavailable, match="missing components"):
        load_qwen3_tts(tmp_path, dtype=np.float32)

    dims, params = load_qwen3_tts(tmp_path, dtype=np.float32, allow_partial=True)
    assert dims.d_model == 32 and dims.n_layer == 2 and dims.head_dim == 8
    np.testing.assert_allclose(
        np.asarray(params["text_embed"], np.float32),
        tensors["model.embed_tokens.weight"], atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["blocks"]["wq"][1], np.float32),
        tensors["model.layers.1.self_attn.q_proj.weight"].T, atol=1e-6,
    )


def test_jfk_441khz_resample_quality(pipe, resources):
    """jfk_441khz.m4a exercises the native decoder's 44.1 kHz → 16 kHz
    resample path (reference: UnitTests.swift resample coverage). The
    resampled audio must align with the 16 kHz wav within resampler + AAC
    tolerance, and the pipeline must produce equivalent structure."""
    from whisperkit_tpu.audio.io import load_audio

    path = resources / "jfk_441khz.m4a"
    if not path.exists():
        pytest.skip("fixture missing")
    hi = load_audio(path)
    lo = load_audio(resources / "jfk.wav")
    # same program: durations match within 50 ms
    assert abs(len(hi) - len(lo)) < 16000 * 0.05
    n = min(len(hi), len(lo))
    # energy envelope correlation (sample-exact match is impossible across
    # AAC + resampler): 0.1 s RMS frames
    def env(x):
        m = (len(x) // 1600) * 1600
        return np.sqrt((x[:m].reshape(-1, 1600) ** 2).mean(1))

    e_hi, e_lo = env(hi[:n]), env(lo[:n])
    corr = np.corrcoef(e_hi, e_lo)[0, 1]
    assert corr > 0.99, corr
    res_hi = pipe.transcribe(hi, DecodingOptions(sample_length=6, language="en"))
    res_lo = pipe.transcribe(lo, DecodingOptions(sample_length=6, language="en"))
    assert len(res_hi.segments) == len(res_lo.segments)


def test_ted_60_multi_window_seek(pipe, resources):
    """ted_60.m4a (60 s) must run ≥2 seek windows with monotonic,
    in-range segment times (reference: UnitTests.swift:295-477 exercises
    the multi-window seek loop on this fixture)."""
    from whisperkit_tpu.audio.io import load_audio

    path = resources / "ted_60.m4a"
    if not path.exists():
        pytest.skip("fixture missing")
    audio = load_audio(path)
    assert len(audio) > 16000 * 55
    res = pipe.transcribe(
        audio,
        DecodingOptions(sample_length=8, language="en", chunking_strategy="none"),
    )
    assert res.timings.total_decoding_windows >= 2
    times = [(s.start, s.end) for s in res.segments]
    assert all(0.0 <= a <= b <= 61.0 for a, b in times)
    # window starts are non-decreasing across the seek loop
    starts = [s.start for s in res.segments]
    assert all(b >= a - 1e-6 for a, b in zip(starts, starts[1:]))
    # VAD-chunked path on the same audio also covers multiple windows
    res_vad = pipe.transcribe(
        audio,
        DecodingOptions(sample_length=8, language="en", chunking_strategy="vad"),
    )
    assert res_vad.timings.total_decoding_windows >= 2
    assert all(0.0 <= s.start <= s.end <= 61.0 for s in res_vad.segments)


def test_es_ja_clips_full_pipeline(pipe, resources):
    """ES/JA fixture clips through the full pipeline (structural checks —
    random weights; the reference's ES/JA decode tests use real models)."""
    from whisperkit_tpu.audio.io import load_audio

    for name in ("es_test_clip.wav", "ja_test_clip.wav"):
        path = resources / name
        if not path.exists():
            pytest.skip(f"{name} missing")
        audio = load_audio(path)
        assert audio.ndim == 1 and len(audio) > 16000
        res = pipe.transcribe(audio, DecodingOptions(sample_length=6, language="en"))
        assert res.timings.input_audio_seconds > 1.0
        assert all(s.end >= s.start for s in res.segments)
