"""Speculative decoding — lossless draft-verify (decoding/speculative.py).

The core property: for ANY draft model sharing the vocab, the committed
sequence is EXACTLY decode_loop's greedy output (the draft only changes
how many target passes it takes to produce it). New TPU-only feature —
no reference equivalent (the reference decodes one token per ANE call).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from whisperkit_tpu.decoding.loop import (  # noqa: E402
    DecodeScalars,
    decode_loop,
    encode_window,
)
from whisperkit_tpu.decoding.speculative import speculative_decode_loop  # noqa: E402
from whisperkit_tpu.models.whisper import WhisperDims, init_params  # noqa: E402
from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab  # noqa: E402

DIMS = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)
DRAFT_DIMS = WhisperDims(80, 207, 1500, 32, 4, 1, 64, 32, 4, 1)


@pytest.fixture(scope="module")
def setup():
    # f32 params: the verify pass (T=k+1 layer scan) and the greedy loop
    # (T=1 unrolled) are different XLA programs — in bf16 their rounding
    # differs at ~1e-2, in f32 (HIGHEST precision) they agree to ~1e-5,
    # which is what makes the logprob equality assertion meaningful
    target = init_params(jax.random.PRNGKey(0), DIMS, jnp.float32)
    draft = init_params(jax.random.PRNGKey(7), DRAFT_DIMS, jnp.float32)
    sp = special_tokens_for_vocab(DIMS.n_vocab)
    mel = (
        jax.random.normal(jax.random.PRNGKey(1), (1, 80, 3000)) * 0.5
    ).astype(jnp.float32)
    _, ck, cv = encode_window(target, mel, DIMS)
    _, dck, dcv = encode_window(draft, mel, DRAFT_DIMS)
    return target, draft, sp, (ck, cv), (dck, dcv)


def _scalars(first_thresh=float("-inf")):
    return DecodeScalars(
        temperature=jnp.float32(0.0),
        max_initial_timestamp_index=jnp.int32(50),
        first_token_logprob_threshold=jnp.float32(first_thresh),
        rng_key=jax.random.PRNGKey(0),
    )


def _greedy_reference(target, ck, cv, prompt, sp, suppress, max_new, **kw):
    return decode_loop(
        target, ck, cv, prompt, suppress, _scalars(kw.pop("first_thresh", float("-inf"))),
        dims=DIMS, special=sp, sample_begin=prompt.shape[1],
        max_new_tokens=max_new, top_k=5, sot_index=0,
        use_timestamp_rules=kw.pop("rules", True),
        suppress_blank=kw.pop("blank", False),
    )


@pytest.mark.parametrize("draft_kind", ["independent", "self"])
@pytest.mark.parametrize("draft_k", [1, 3, 4])
def test_speculative_equals_greedy(setup, draft_kind, draft_k):
    """Lossless vs decode_loop for an INDEPENDENT random draft (worst-case
    acceptance) and for draft==target (always-accept fast path)."""
    target, draft, sp, (ck, cv), (dck, dcv) = setup
    if draft_kind == "self":
        draft, draft_dims, dkv = target, DIMS, (ck, cv)
    else:
        draft_dims, dkv = DRAFT_DIMS, (dck, dcv)
    prompt = jnp.asarray([[sp.sot, sp.transcribe]], jnp.int32)
    suppress = jnp.zeros((DIMS.n_vocab,), jnp.float32)
    max_new = 24

    ref = _greedy_reference(target, ck, cv, prompt, sp, suppress, max_new)
    out = speculative_decode_loop(
        target, draft, ck, cv, dkv[0], dkv[1], prompt, suppress, _scalars(),
        dims=DIMS, draft_dims=draft_dims, special=sp, sample_begin=2,
        max_new_tokens=max_new, draft_k=draft_k,
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    np.testing.assert_allclose(
        np.asarray(out.token_logprobs), np.asarray(ref.token_logprobs),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out.no_speech_prob), np.asarray(ref.no_speech_prob),
        rtol=1e-4,
    )


def test_speculative_first_token_threshold(setup):
    """An impossible first-token logprob floor must produce the same
    immediate stop as the greedy loop."""
    target, draft, sp, (ck, cv), (dck, dcv) = setup
    prompt = jnp.asarray([[sp.sot, sp.transcribe]], jnp.int32)
    suppress = jnp.zeros((DIMS.n_vocab,), jnp.float32)

    ref = _greedy_reference(
        target, ck, cv, prompt, sp, suppress, 12, first_thresh=1e9
    )
    out = speculative_decode_loop(
        target, draft, ck, cv, dck, dcv, prompt, suppress, _scalars(1e9),
        dims=DIMS, draft_dims=DRAFT_DIMS, special=sp, sample_begin=2,
        max_new_tokens=12, draft_k=3,
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    # every sampled slot is EOT padding on both sides
    assert (np.asarray(out.tokens)[0, 2:] == sp.eot).all()


def test_speculative_eot_stop(setup):
    """Bias EOT so the target hits it mid-stream: both loops must stop at
    the same position with the same committed EOT."""
    target, draft, sp, (ck, cv), (dck, dcv) = setup
    prompt = jnp.asarray([[sp.sot, sp.transcribe]], jnp.int32)
    # nudge eot upward so the greedy path reaches it after a few steps
    suppress = jnp.zeros((DIMS.n_vocab,), jnp.float32).at[sp.eot].set(2.0)

    ref = _greedy_reference(
        target, ck, cv, prompt, sp, suppress, 16, rules=False
    )
    out = speculative_decode_loop(
        target, draft, ck, cv, dck, dcv, prompt, suppress, _scalars(),
        dims=DIMS, draft_dims=DRAFT_DIMS, special=sp, sample_begin=2,
        max_new_tokens=16, draft_k=4, use_timestamp_rules=False,
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))


def test_speculative_with_serving_preset(setup):
    """Speculative + int8 cross-KV serving preset compose: the target
    verifies against its quantized cross-KV, the draft stays bf16 —
    output must equal the serving pipeline without a draft."""
    from whisperkit_tpu.core.configurations import (
        ComputeOptions,
        DecodingOptions,
        WhisperConfig,
    )
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    target, draft, sp, _, _ = setup
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    opts = DecodingOptions(
        language="en", sample_length=10, temperature_fallback_count=0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, first_token_log_prob_threshold=None,
    )
    cfg = WhisperConfig(compute_options=ComputeOptions.serving())
    plain = WhisperPipeline(cfg, dims=DIMS, params=target).transcribe(audio, opts)
    spec = WhisperPipeline(
        cfg, dims=DIMS, params=target,
        draft_dims=DRAFT_DIMS, draft_params=draft,
    ).transcribe(audio, opts)
    assert [s.tokens for s in spec.segments] == [
        s.tokens for s in plain.segments
    ]


def test_speculative_pipeline_integration(setup):
    """WhisperPipeline(draft_dims/draft_params): batch-1 greedy decodes
    route through the speculative loop and produce the same transcription
    as the plain pipeline."""
    from whisperkit_tpu.core.configurations import DecodingOptions
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    target, draft, sp, _, _ = setup
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(16000 * 4) * 0.1).astype(np.float32)
    opts = DecodingOptions(
        language="en", sample_length=12, temperature_fallback_count=0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, first_token_log_prob_threshold=None,
    )
    plain = WhisperPipeline(dims=DIMS, params=target)
    spec = WhisperPipeline(
        dims=DIMS, params=target, draft_dims=DRAFT_DIMS, draft_params=draft
    )
    r_plain = plain.transcribe(audio, opts)
    r_spec = spec.transcribe(audio, opts)
    assert [s.tokens for s in r_spec.segments] == [
        s.tokens for s in r_plain.segments
    ]
    assert r_spec.text == r_plain.text


def test_draft_kv_matches_target_kv(setup):
    """Draft-KV soundness (r5 review finding): with draft == target, every
    round fully accepts, pos advances k+1 per round — the regime where the
    pre-fix loop left a permanent zero hole at slot pos+k-1 of the DRAFT
    cache (never queried by the target, so outputs stayed lossless, but
    every later draft proposal attended a zero key and real-world
    acceptance would silently collapse). The draft cache must now match
    the target cache at every committed position."""
    target, _, sp, (ck, cv), _ = setup
    prompt = jnp.asarray([[sp.sot, sp.transcribe]], jnp.int32)
    suppress = jnp.zeros((DIMS.n_vocab,), jnp.float32).at[sp.eot].set(-1e9)
    k = 3
    out, st = speculative_decode_loop(
        target, target, ck, cv, ck, cv, prompt, suppress, _scalars(),
        dims=DIMS, draft_dims=DIMS, special=sp, sample_begin=2,
        max_new_tokens=3 * (k + 1) + 1,  # >3 full-accept rounds
        draft_k=k, sot_index=0, use_timestamp_rules=True,
        suppress_blank=False, return_state=True,
    )
    pos = int(np.asarray(out.length).reshape(-1)[0])
    assert pos >= 2 + 3 * (k + 1)  # full acceptance actually happened
    kv_t = np.asarray(st.kv_t_k), np.asarray(st.kv_t_v)
    kv_d = np.asarray(st.kv_d_k), np.asarray(st.kv_d_v)
    for t_arr, d_arr in zip(kv_t, kv_d):
        # committed positions (incl. the would-be hole slots) must agree;
        # f32 params: T=1 draft steps vs T=k+1 verify passes agree ~1e-5
        np.testing.assert_allclose(
            d_arr[:, :, :, : pos - 1], t_arr[:, :, :, : pos - 1],
            rtol=1e-4, atol=1e-4,
        )
        # and no committed slot is a zero hole
        norms = np.linalg.norm(
            d_arr[:, :, :, : pos - 1].reshape(-1, d_arr.shape[-1]), axis=-1
        )
        assert (norms > 1e-6).all()


def test_speculative_under_serving_preset_matches_plain_greedy():
    """The serving preset's fused int8 cross-KV feeds the draft-verify loop
    (the latency serving class runs exactly this combination): output must
    match the plain bf16 greedy pipeline token-exactly at test scale (the
    same exactness bar as the non-speculative int8 cross-KV tests)."""
    import jax

    from whisperkit_tpu.core.configurations import (
        ComputeOptions,
        DecodingOptions,
        WhisperConfig,
    )
    from whisperkit_tpu.decoding import speculative as spec_mod
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    params = init_params(jax.random.PRNGKey(0), DIMS)
    draft = init_params(jax.random.PRNGKey(9), DIMS)
    serving_spec = WhisperPipeline(
        WhisperConfig(compute_options=ComputeOptions.serving()),
        dims=DIMS, params=params, draft_dims=DIMS, draft_params=draft,
    )
    plain = WhisperPipeline(dims=DIMS, params=params)
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    opts = DecodingOptions(
        sample_length=8, language="en", temperature_fallback_count=0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, first_token_log_prob_threshold=None,
    )
    calls = []
    orig = spec_mod.speculative_decode_loop

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    import whisperkit_tpu.pipelines.whisper  # noqa: F401

    spec_mod_orig = spec_mod.speculative_decode_loop
    spec_mod.speculative_decode_loop = spy
    try:
        r1 = serving_spec.transcribe(audio, opts)
    finally:
        spec_mod.speculative_decode_loop = spec_mod_orig
    r2 = plain.transcribe(audio, opts)
    assert calls, "serving preset b=1 did not take the speculative path"
    assert [s.tokens for s in r1.segments] == [s.tokens for s in r2.segments]
