"""Beam-search decoding.

The reference declares BeamSearchTokenSampler but stubs it with fatalError
(TokenSampler.swift:254-290); this implementation is real, so these tests
are new coverage rather than ports.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from whisperkit_tpu.core.configurations import DecodingOptions
from whisperkit_tpu.decoding.beam import beam_decode_loop
from whisperkit_tpu.decoding.loop import DecodeScalars, decode_loop, encode_window
from whisperkit_tpu.models.whisper import WhisperDims, init_params
from whisperkit_tpu.pipelines.whisper import WhisperPipeline
from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab

V = 207
SP = special_tokens_for_vocab(V)
DIMS = WhisperDims(80, V, 1500, 64, 4, 2, 64, 64, 4, 2)


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    mel = jnp.zeros((2, 80, 3000), jnp.float32)
    _, ck, cv = encode_window(params, mel, DIMS)
    prompt = jnp.asarray([[SP.sot, SP.transcribe]] * 2, jnp.int32)
    return params, ck, cv, prompt


def _beam(params, ck, cv, prompt, k, max_new=8, **kw):
    return beam_decode_loop(
        params, ck, cv, prompt, jnp.zeros((V,)), jnp.int32(50),
        dims=DIMS, special=SP, sample_begin=2, max_new_tokens=max_new,
        beam_size=k, sot_index=0, use_timestamp_rules=False,
        suppress_blank=False, **kw,
    )


def test_beam_1_matches_greedy(setup):
    params, ck, cv, prompt = setup
    beam = _beam(params, ck, cv, prompt, k=1)
    scalars = DecodeScalars(
        temperature=jnp.float32(0.0),
        max_initial_timestamp_index=jnp.int32(50),
        first_token_logprob_threshold=jnp.float32(float("-inf")),
        rng_key=jax.random.PRNGKey(0),
    )
    greedy = decode_loop(
        params, ck, cv, prompt, jnp.zeros((V,)), scalars,
        dims=DIMS, special=SP, sample_begin=2, max_new_tokens=8, top_k=5,
        sot_index=0, use_timestamp_rules=False, suppress_blank=False,
    )
    bt, gt = np.asarray(beam.tokens), np.asarray(greedy.tokens)
    # identical as long as neither hit EOT mid-stream
    n = 8
    if (gt[:, 2:] == SP.eot).any():
        n = int(np.argmax((gt[:, 2:] == SP.eot).any(0)))
    assert (bt[:, 2 : 2 + n] == gt[:, 2 : 2 + n]).all()


def test_beam_score_not_worse_than_greedy(setup):
    """A wider beam's chosen hypothesis must score >= the greedy path."""
    params, ck, cv, prompt = setup
    b1 = _beam(params, ck, cv, prompt, k=1, max_new=10)
    b4 = _beam(params, ck, cv, prompt, k=4, max_new=10)
    assert (np.asarray(b4.sum_logprob) >= np.asarray(b1.sum_logprob) - 1e-3).all()


def test_beam_timestamp_rules(setup):
    params, ck, cv, prompt = setup
    out = beam_decode_loop(
        params, ck, cv, prompt, jnp.zeros((V,)), jnp.int32(50),
        dims=DIMS, special=SP, sample_begin=2, max_new_tokens=8,
        beam_size=3, sot_index=0, use_timestamp_rules=True,
        suppress_blank=False,
    )
    tk = np.asarray(out.tokens)
    assert (tk[:, 2] >= SP.timestamp_begin).all()


def test_pipeline_beam_option():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    pipe = WhisperPipeline(dims=DIMS, params=params)
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(16000 * 4) * 0.1).astype(np.float32)
    res = pipe.transcribe(
        audio,
        DecodingOptions(sample_length=8, language="en", beam_size=3),
    )
    assert res.segments


def test_pipeline_beam_rung_then_greedy_fallback():
    """Temperature ladder with beam rung 0: random-init text trips the
    compression-ratio threshold, so rung 0 (beam, t=0) falls back to a
    greedy sampled rung — the lazy prefill must materialize exactly then
    (ADVICE r2: beam-mode rung 0 must not pay for a prefill it can't
    consume) and the pipeline must return a result either way."""
    params = init_params(jax.random.PRNGKey(0), DIMS)
    pipe = WhisperPipeline(dims=DIMS, params=params)
    rng = np.random.default_rng(6)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    res = pipe.transcribe(
        audio,
        DecodingOptions(
            sample_length=8, language="en", beam_size=2,
            temperature_fallback_count=2,
            compression_ratio_threshold=0.1,  # everything "fails" quality
            logprob_threshold=None, no_speech_threshold=None,
            first_token_log_prob_threshold=None,
        ),
    )
    assert res.segments
    # ladder actually ran: at least one fallback re-decode was counted
    assert pipe.timings.total_decoding_fallbacks >= 1


def test_beam_exhaustive_optimality_two_steps():
    """With beam width == vocab and EOT suppressed, two beam steps are an
    exhaustive search: the winner must equal the brute-force argmax over
    all two-token continuations (teacher-forced scores)."""
    from whisperkit_tpu.models.whisper import decoder_forward

    V2 = 33  # micro vocab (synthetic special layout needs >= 19)
    sp2 = special_tokens_for_vocab(V2)
    dims2 = WhisperDims(80, V2, 1500, 32, 2, 1, 32, 32, 2, 1)
    params2 = init_params(jax.random.PRNGKey(7), dims2, dtype=jnp.float32)
    mel = jnp.zeros((1, 80, 3000), jnp.float32)
    _, ck, cv = encode_window(params2, mel, dims2)
    prompt = jnp.asarray([[sp2.sot, sp2.transcribe]], jnp.int32)

    # suppress EOT and all specials so nothing finishes and every candidate
    # is a plain 2-text-token sequence
    suppress = np.zeros(V2, np.float32)
    suppress[sp2.eot :] = -np.inf
    suppress_j = jnp.asarray(suppress)

    out = beam_decode_loop(
        params2, ck, cv, prompt, suppress_j, jnp.int32(50),
        dims=dims2, special=sp2, sample_begin=2, max_new_tokens=2,
        beam_size=V2, sot_index=0, use_timestamp_rules=False,
        suppress_blank=False,
    )
    beam_tokens = np.asarray(out.tokens)[0, 2:4]
    beam_score = float(np.asarray(out.sum_logprob)[0])

    # brute force: teacher-force every (t1, t2) pair of text tokens
    text = np.arange(sp2.eot)  # valid text ids
    pairs = np.stack(np.meshgrid(text, text, indexing="ij"), -1).reshape(-1, 2)
    seqs = np.concatenate(
        [np.tile(np.asarray(prompt[0]), (len(pairs), 1)), pairs], axis=1
    )
    kv_shape = (dims2.n_text_layer, len(pairs), dims2.n_text_head, 4, dims2.head_dim)
    kv = (jnp.zeros(kv_shape, jnp.float32), jnp.zeros(kv_shape, jnp.float32))
    ck_b = jnp.repeat(ck, len(pairs), axis=1)
    cv_b = jnp.repeat(cv, len(pairs), axis=1)
    logits, _, _ = decoder_forward(
        params2, jnp.asarray(seqs, jnp.int32), 0, kv[0], kv[1], ck_b, cv_b, dims2
    )
    logprobs = np.asarray(jax.nn.log_softmax(np.asarray(logits) + suppress[None, None, :], axis=-1))
    # score of token at position 2 comes from logits at position 1, etc.
    s1 = logprobs[np.arange(len(pairs)), 1, pairs[:, 0]]
    s2 = logprobs[np.arange(len(pairs)), 2, pairs[:, 1]]
    total = s1 + s2
    best = int(np.argmax(total))

    assert tuple(beam_tokens) == tuple(pairs[best]), (
        beam_tokens, pairs[best], beam_score, total[best],
    )
    assert beam_score == pytest.approx(float(total[best]), abs=1e-3)


def test_alignment_forward_f32_parity_with_loop_capture():
    """Teacher-forced alignment (beam word-timestamp path) must match the
    greedy loop's captured alignment on an f32 parity path — the KV cache
    dtype follows the params (decoding/loop.py::alignment_forward)."""
    from whisperkit_tpu.decoding.loop import alignment_forward

    params = init_params(jax.random.PRNGKey(3), DIMS, dtype=jnp.float32)
    mel = jax.random.normal(jax.random.PRNGKey(4), (2, 80, 3000)) * 0.1
    _, ck, cv = encode_window(params, mel, DIMS)
    prompt = jnp.asarray([[SP.sot, SP.transcribe]] * 2, jnp.int32)
    heads = ((0, 0), (1, 2))
    scalars = DecodeScalars(
        temperature=jnp.float32(0.0),
        max_initial_timestamp_index=jnp.int32(50),
        first_token_logprob_threshold=jnp.float32(float("-inf")),
        rng_key=jax.random.PRNGKey(0),
    )
    out = decode_loop(
        params, ck, cv, prompt, jnp.zeros((V,)), scalars,
        dims=DIMS, special=SP, sample_begin=2, max_new_tokens=6, top_k=5,
        sot_index=0, use_timestamp_rules=False, suppress_blank=False,
        alignment_heads=heads,
    )
    n = int(out.length)
    align_tf = alignment_forward(
        params, ck, cv, out.tokens[:, :n], dims=DIMS, alignment_heads=heads
    )
    got = np.asarray(align_tf)
    want = np.asarray(out.alignment)[:n]
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, atol=1e-5)
