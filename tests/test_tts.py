"""TTSKit: model stack, generation loop, pipeline, chunker, crossfade.

Reference test model: Tests/TTSKitTests — config/chunker/embeds/KVCache/
sampler-determinism unit tests + integration tests.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from whisperkit_tpu.audio.output import PlaybackStrategy, crossfade, required_buffer_seconds
from whisperkit_tpu.decoding.tts_loop import (
    TTSScalars,
    apply_repetition_penalty,
    tts_generate_loop,
)
from whisperkit_tpu.models.qwen3_tts import (
    CODEC_EOS,
    OUTPUT_SAMPLE_RATE,
    SAMPLES_PER_FRAME,
    TINY_TTS_DIMS,
    init_tts_params,
    speech_decoder_forward,
)
from whisperkit_tpu.pipelines.tts import (
    GenerationOptions,
    TextChunker,
    TTSPipeline,
)


@pytest.fixture(scope="module")
def params():
    return init_tts_params(jax.random.PRNGKey(0), TINY_TTS_DIMS)


def _scalars(temp=0.9, seed=0, rep=1.05):
    return TTSScalars(
        temperature=jnp.float32(temp),
        repetition_penalty=jnp.float32(rep),
        rng_key=jax.random.PRNGKey(seed),
    )


def test_repetition_penalty():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    counts = jnp.asarray([[1, 1, 0]])
    out = np.asarray(apply_repetition_penalty(logits, counts, jnp.float32(2.0)))
    assert out[0, 0] == pytest.approx(1.0)  # positive: divided
    assert out[0, 1] == pytest.approx(-4.0)  # negative: multiplied
    assert out[0, 2] == pytest.approx(1.0)  # unseen: untouched


def test_generate_loop_shapes(params):
    embeds = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 5, TINY_TTS_DIMS.d_model)),
        jnp.float32,
    )
    out = tts_generate_loop(
        params, embeds, _scalars(), dims=TINY_TTS_DIMS, max_new_tokens=8, top_k=5
    )
    codes = np.asarray(out.codes)
    assert codes.shape == (2, 8, 16)
    assert (codes >= 0).all()
    nf = np.asarray(out.n_frames)
    assert (nf >= 0).all() and (nf <= 8).all()


def test_generate_loop_deterministic(params):
    embeds = jnp.zeros((1, 4, TINY_TTS_DIMS.d_model))
    kw = dict(dims=TINY_TTS_DIMS, max_new_tokens=6, top_k=5)
    a = tts_generate_loop(params, embeds, _scalars(seed=3), **kw)
    b = tts_generate_loop(params, embeds, _scalars(seed=3), **kw)
    assert (np.asarray(a.codes) == np.asarray(b.codes)).all()


def test_speech_decoder_output(params):
    codes = jnp.zeros((2, 4, 16), jnp.int32)
    wave = np.asarray(speech_decoder_forward(params, codes, TINY_TTS_DIMS))
    assert wave.shape == (2, 4 * SAMPLES_PER_FRAME)
    assert np.abs(wave).max() <= 1.0  # tanh-bounded


def test_dual_track_prompt_layout():
    """Prompt structure mirrors Qwen3GenerateTask.swift:683-744: role text
    tokens, 5 textPADs over the codec control ids, textBOS over codecPAD,
    first text token over codecBOS; trailing text feeds per-frame."""
    from whisperkit_tpu.models.qwen3_tts import (
        CODEC_BOS,
        CODEC_PAD,
        CODEC_THINK,
        CODEC_THINK_BOS,
        CODEC_THINK_EOS,
        SPEAKERS,
        TTS_LANGUAGES,
    )

    pipe = TTSPipeline()
    opts = GenerationOptions(voice="serena", language="japanese")
    text_track, codec_track, trailing, cap = pipe._chunk_tracks("Hello world", opts)
    d = pipe.dims
    role = pipe.tokenizer.encode(pipe._ROLE_PREFIX)
    text_ids = pipe.tokenizer.encode("Hello world")
    assert text_track[: len(role)] == role
    assert codec_track[: len(role)] == [-1] * len(role)
    assert text_track[len(role): len(role) + 5] == [d.text_pad] * 5
    assert codec_track[len(role):] == [
        CODEC_THINK, CODEC_THINK_BOS, TTS_LANGUAGES["japanese"],
        CODEC_THINK_EOS, SPEAKERS["serena"], CODEC_PAD, CODEC_BOS,
    ]
    assert text_track[-2:] == [d.text_bos, text_ids[0]]
    assert trailing == text_ids[1:]
    assert cap == 8 * (len(role) + len(text_ids))


def test_unknown_voice_falls_back_to_default():
    from whisperkit_tpu.models.qwen3_tts import SPEAKERS, DEFAULT_SPEAKER

    pipe = TTSPipeline()
    assert pipe._speaker_id("nonexistent-voice") == SPEAKERS[DEFAULT_SPEAKER]
    assert pipe._speaker_id("uncle-fu") == SPEAKERS["uncle-fu"]


def test_step_cap_limits_generation(params):
    """The 8x-prompt frame budget (Qwen3GenerateTask.swift:358-370) stops
    rows even when EOS never samples."""
    embeds = jnp.zeros((1, 4, TINY_TTS_DIMS.d_model))
    out = tts_generate_loop(
        params, embeds, _scalars(temp=0.0), dims=TINY_TTS_DIMS,
        max_new_tokens=12, top_k=5,
        step_cap=jnp.asarray([3], jnp.int32),
    )
    assert int(np.asarray(out.n_frames)[0]) <= 3


def test_text_chunker():
    c = TextChunker()
    text = "First sentence here. Second one follows! Third is a bit longer? Fourth."
    chunks = c.chunk(text, target=30, minimum=5)
    assert len(chunks) >= 2
    assert "".join(chunks).replace(" ", "") == text.replace(" ", "")
    assert c.chunk("short", target=30) == ["short"]
    assert c.chunk("", target=30) == []


def test_crossfade_length_and_continuity():
    sr = 1000
    a = np.ones(500, np.float32)
    b = -np.ones(500, np.float32)
    out = crossfade([a, b], sr, crossfade_seconds=0.1)
    # 100 samples overlap
    assert len(out) == 900
    # equal-power mid-point is ~0
    assert abs(out[450]) < 0.75
    assert crossfade([a], sr).shape == (500,)


def test_required_buffer():
    assert required_buffer_seconds(PlaybackStrategy.STREAM, 1.0, 0.08) == 0.0
    assert required_buffer_seconds(PlaybackStrategy.GENERATE_FIRST, 0.01, 0.08) == float("inf")
    assert required_buffer_seconds(PlaybackStrategy.AUTO, 0.01, 0.08) == 0.0  # faster than RT
    assert required_buffer_seconds(PlaybackStrategy.AUTO, 0.16, 0.08) > 0.0


def test_tts_pipeline_end_to_end():
    pipe = TTSPipeline()
    res = pipe.generate(
        "Hello world. This is a test of the speech pipeline.",
        GenerationOptions(max_new_tokens=6, voice="ryan", seed=1,
                          target_chunk_size=30, min_chunk_size=5),
    )
    assert res.sample_rate == OUTPUT_SAMPLE_RATE
    assert res.timings.chunks >= 1
    assert res.duration_seconds >= 0.0
    assert res.timings.total_seconds > 0


def test_tts_pipeline_save(tmp_path):
    pipe = TTSPipeline()
    res = pipe.generate("Hi there.", GenerationOptions(max_new_tokens=4))
    out = res.save(tmp_path / "speech.wav")
    import wave as wave_mod

    with wave_mod.open(str(out)) as w:
        assert w.getframerate() == OUTPUT_SAMPLE_RATE
        assert w.getnchannels() == 1


def test_prompt_cache_round_trip(tmp_path):
    pipe = TTSPipeline()
    opts = GenerationOptions(voice="serena", language="english", max_new_tokens=4)
    pipe.build_prompt_cache(opts)
    cached = pipe.prompt_cache.get("serena", "english", None)
    assert cached is not None
    kv, plen = cached
    assert plen >= 2  # speaker + language tokens

    path = tmp_path / "cache.npz"
    pipe.prompt_cache.save(path)
    fresh = TTSPipeline()
    fresh.prompt_cache.load(path)
    again = fresh.prompt_cache.get("serena", "english", None)
    assert again is not None
    assert np.asarray(again[0][0], np.float32) == pytest.approx(
        np.asarray(kv[0], np.float32), abs=1e-2
    )


def test_stream_blocks():
    pipe = TTSPipeline()
    blocks = list(
        pipe.stream_blocks("Testing streaming.", GenerationOptions(max_new_tokens=5),
                           block_frames=2)
    )
    total = sum(len(b) for b in blocks)
    res_frames = total // SAMPLES_PER_FRAME
    assert res_frames <= 5
    if blocks:
        # block_frames clamps up to C2W_CONTEXT_FRAMES (16): smaller blocks
        # would compile a fresh vocoder shape per ramp-up step (ADVICE r2 #4)
        assert all(len(b) <= 16 * SAMPLES_PER_FRAME for b in blocks)


def test_prompt_cache_reused_in_generate():
    """Generation with a restored prefix KV must match generation that
    prefills the same prefix inline (same seed, temperature 0)."""
    pipe = TTSPipeline()
    opts = GenerationOptions(voice="uma", language="english", max_new_tokens=5,
                             temperature=0.0, seed=2, use_prompt_cache=False)
    cold = pipe.generate("Hello there.", opts)

    import dataclasses as dc

    warm_opts = dc.replace(opts, use_prompt_cache=True)
    pipe.build_prompt_cache(warm_opts)
    assert pipe.prompt_cache.get("uma", "english", None) is not None
    warm = pipe.generate("Hello there.", warm_opts)
    assert warm.audio.shape == cold.audio.shape
    np.testing.assert_allclose(warm.audio, cold.audio, atol=2e-2)


def test_left_pad_does_not_change_output(params):
    """A short chunk batched with a long one (left-padded + masked) must
    produce the same codes as decoding it alone (temperature 0)."""
    d = TINY_TTS_DIMS.d_model
    rng = np.random.default_rng(4)
    short = jnp.asarray(rng.standard_normal((3, d)), jnp.float32)
    long_ = jnp.asarray(rng.standard_normal((7, d)), jnp.float32)
    kw = dict(dims=TINY_TTS_DIMS, max_new_tokens=5, top_k=5)

    alone = tts_generate_loop(params, short[None], _scalars(0.0), **kw)
    batched_embeds = jnp.stack(
        [jnp.concatenate([jnp.zeros((4, d)), short]), long_]
    )
    both = tts_generate_loop(
        params, batched_embeds, _scalars(0.0),
        prompt_pad=jnp.asarray([4, 0], jnp.int32), **kw,
    )
    np.testing.assert_array_equal(
        np.asarray(alone.codes)[0], np.asarray(both.codes)[0]
    )


def test_stream_blocks_matches_batch_generation():
    """Segmented streaming with left-context vocoding must match the
    single-shot generate() waveform (same seed, temperature 0)."""
    pipe = TTSPipeline()
    opts = GenerationOptions(max_new_tokens=9, temperature=0.0, seed=6,
                             chunking_strategy="none", use_prompt_cache=False)
    full = pipe.generate("stream equivalence", opts)
    blocks = list(pipe.stream_blocks("stream equivalence", opts, block_frames=3))
    streamed = np.concatenate(blocks) if blocks else np.zeros(0, np.float32)
    n = min(len(streamed), len(full.audio))
    assert n > 0
    np.testing.assert_allclose(streamed[:n], full.audio[:n], atol=2e-2)
