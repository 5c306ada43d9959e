"""Cross-implementation parity vs torch `transformers` generation machinery.

VERDICT r2 #6: greedy decode was already pinned to torch
(tests/test_whisper_model.py); beam search and the timestamp-rules filter
were only self-validated. Here both are checked against the independent HF
implementations on shared random weights:

  * beam search — `WhisperForConditionalGeneration.generate(num_beams=k)`
    (HF scores sum_logprob / len^1.0, which equals our
    `length_penalty=None` average-logprob objective)
  * timestamp rules — `WhisperTimeStampLogitsProcessor` on the same
    logits + token histories (reference behavior:
    LogitsFilter.swift:54-243, itself mirroring openai/whisper)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from whisperkit_tpu.decoding.filters import apply_timestamp_rules  # noqa: E402
from whisperkit_tpu.models.loader import load_whisper  # noqa: E402
from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab  # noqa: E402

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
    max_source_positions=150,
    max_target_positions=64,
    pad_token_id=0,
    bos_token_id=1,
    eos_token_id=2,
    decoder_start_token_id=3,
    suppress_tokens=[],
    begin_suppress_tokens=[],
)


@pytest.fixture(scope="module")
def torch_whisper(tmp_path_factory):
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(WhisperConfig(**TINY_CFG)).eval()
    folder = tmp_path_factory.mktemp("hf_whisper_gen")
    model.save_pretrained(folder, safe_serialization=True)
    return model, folder


@pytest.fixture(scope="module")
def ours(torch_whisper):
    _, folder = torch_whisper
    dims, params, _ = load_whisper(folder, dtype=jnp.float32)
    return dims, params


@pytest.mark.parametrize("beam_size", [2, 4])
def test_beam_search_matches_hf_generate(torch_whisper, ours, beam_size):
    """Our on-device beam loop must pick the same best hypothesis as HF
    `generate(num_beams=k, length_penalty=1.0)` on shared weights. Filters
    are off on both sides; EOS is effectively unreachable at random init,
    so both searches run the full budget and the comparison is the pure
    beam bookkeeping (expansion, reordering, scoring)."""
    from transformers.modeling_outputs import BaseModelOutput

    from whisperkit_tpu.decoding.beam import beam_decode_loop
    from whisperkit_tpu.decoding.loop import encode_window

    model, _ = torch_whisper
    dims, params = ours
    sp = special_tokens_for_vocab(dims.n_vocab)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)
    prompt = [[3, 5], [3, 9]]
    max_new = 8

    # suppress BOTH stacks' EOS ids (HF: 2 from the config; ours: the
    # whisper-layout eot 189) so neither search terminates early and the
    # comparison is length-homogeneous pure beam bookkeeping
    eos_ids = [2, int(sp.eot)]
    with torch.no_grad():
        enc = model.model.encoder(torch.from_numpy(mel)).last_hidden_state
        hf = model.generate(
            encoder_outputs=BaseModelOutput(last_hidden_state=enc),
            decoder_input_ids=torch.tensor(prompt),
            num_beams=beam_size,
            do_sample=False,
            max_new_tokens=max_new,
            length_penalty=1.0,
            early_stopping=False,
            suppress_tokens=eos_ids,
        ).numpy()

    suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
    suppress = suppress.at[jnp.asarray(eos_ids)].set(-jnp.inf)
    _, ck, cv = encode_window(params, jnp.asarray(mel), dims)
    out = beam_decode_loop(
        params, ck, cv, jnp.asarray(prompt, jnp.int32),
        suppress, jnp.int32(1500),
        dims=dims, special=sp, sample_begin=2, max_new_tokens=max_new,
        beam_size=beam_size, sot_index=0, use_timestamp_rules=False,
        suppress_blank=False, length_penalty=None,
    )
    ours_tokens = np.asarray(out.tokens)
    for row in range(2):
        # Whisper's generate returns ONLY the sampled tokens (prompt stripped)
        hf_row = hf[row, :max_new]
        our_row = ours_tokens[row, 2 : 2 + max_new]
        assert (hf_row == our_row).all(), (beam_size, row, hf_row, our_row)


def _hf_timestamp_processor(sp, max_initial, begin_index):
    from transformers import GenerationConfig
    from transformers.generation.logits_process import (
        WhisperTimeStampLogitsProcessor,
    )

    cfg = GenerationConfig(
        eos_token_id=sp.eot,
        no_timestamps_token_id=sp.notimestamps,
        max_initial_timestamp_index=max_initial,
    )
    return WhisperTimeStampLogitsProcessor(
        cfg, begin_index=begin_index, _detect_timestamp_from_logprob=True
    )


@pytest.mark.parametrize(
    "history",
    [
        [],  # at sample begin: must force an initial timestamp <= cap
        ["ts", 0],  # lone timestamp -> text masked
        ["ts", 0, 17],  # text after pair start
        ["ts", 0, 17, "ts", 3],  # completed pair -> timestamps masked
        ["ts", 0, 17, "ts", 3, "ts", 3],  # lone ts after pair, monotonic floor
        [17, 21, 30],  # no timestamps yet
    ],
)
def test_timestamp_rules_match_hf_processor(history):
    """apply_timestamp_rules must equal HF's WhisperTimeStampLogitsProcessor
    (pairing, monotonicity, initial cap, notimestamps suppression, and the
    sum-probability rule) on random logits for representative histories."""
    sp = special_tokens_for_vocab(207)
    max_initial = 5
    prompt = [sp.sot, sp.transcribe]
    begin = len(prompt)

    # decode the compact history spec: "ts" marks the next int as a
    # timestamp OFFSET from timestamp_begin
    toks = list(prompt)
    it = iter(history)
    for h in it:
        if h == "ts":
            toks.append(sp.timestamp_begin + next(it))
        else:
            toks.append(h)

    rng = np.random.default_rng(len(toks))
    logits = rng.standard_normal((3, sp.n_vocab)).astype(np.float32) * 2.0

    proc = _hf_timestamp_processor(sp, max_initial, begin)
    want = proc(
        torch.tensor([toks] * 3), torch.from_numpy(logits.copy())
    ).numpy()

    buf = np.full((3, 32), sp.eot, np.int64)
    buf[:, : len(toks)] = toks
    got = np.asarray(
        apply_timestamp_rules(
            jnp.asarray(logits), jnp.asarray(buf), jnp.asarray(len(toks)),
            begin, sp, jnp.int32(max_initial),
        )
    )
    finite = np.isfinite(want)
    np.testing.assert_array_equal(np.isfinite(got), finite)
    np.testing.assert_allclose(got[finite], want[finite], atol=1e-5)
