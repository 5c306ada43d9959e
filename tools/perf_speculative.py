"""Speculative-decode mechanics on the chip (batch-1 latency mode).

Honesty note for random weights: an independent random draft accepts ~0%
(every verify commits exactly 1 token) and draft==target accepts 100%
(every verify commits k+1) — the two ENDPOINTS of the acceptance range.
Real turbo-drafting-large-v3 sits at alpha ~= 0.7-0.9 on speech. So this
tool measures:

  * t_plain      — greedy loop ms/token (the baseline b=1 step cost)
  * t_worst      — speculative with an independent draft (alpha=0):
                   per-token cost = draft k steps + verify, all wasted
  * t_best       — speculative with draft==dims-of-turbo sharing weights?
                   no — draft IS the same model (alpha=1): per-token cost
                   = (k draft steps + 1 verify) / (k+1)

and prints the projected speedup curve: with acceptance alpha, expected
committed tokens per round E = (1-alpha^(k+1))/(1-alpha); speedup =
E * t_plain / t_round.

Run: python tools/perf_speculative.py [--k 4] [--steps 96]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from whisperkit_tpu.decoding.loop import (
        DecodeScalars,
        decode_loop,
        encode_window,
    )
    from whisperkit_tpu.decoding.speculative import speculative_decode_loop
    from whisperkit_tpu.models.whisper import VARIANT_DIMS, init_params
    from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab

    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--target", default="large-v3")
    ap.add_argument("--draft", default="large-v3-turbo")
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        args.target, args.draft, args.steps = "tiny", "tiny", 16
    dims = VARIANT_DIMS[args.target]
    ddims = VARIANT_DIMS[args.draft]
    sp = special_tokens_for_vocab(dims.n_vocab)
    target = init_params(jax.random.PRNGKey(0), dims)
    draft = init_params(jax.random.PRNGKey(7), ddims)

    mel = (jax.random.normal(jax.random.PRNGKey(1), (1, dims.n_mels, 3000)) * 0.5).astype(jnp.float32)
    _, ck, cv = encode_window(target, mel, dims)
    _, dck, dcv = encode_window(draft, mel, ddims)
    prompt = jnp.asarray([[sp.sot, sp.transcribe]], jnp.int32)
    suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
    scalars = DecodeScalars(
        temperature=jnp.float32(0.0),
        max_initial_timestamp_index=jnp.int32(50),
        first_token_logprob_threshold=jnp.float32(float("-inf")),
        rng_key=jax.random.PRNGKey(0),
    )

    def timed(fn, n=3):
        fn()  # compile/warm
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out.tokens[0, :4])  # scalar-ish settle
            best = min(best, time.perf_counter() - t0)
        return best

    def run_plain():
        return decode_loop(
            target, ck, cv, prompt, suppress, scalars,
            dims=dims, special=sp, sample_begin=2, max_new_tokens=args.steps,
            top_k=5, sot_index=0, use_timestamp_rules=True, suppress_blank=False,
        )

    def run_spec(dparams, dd, dk, dv_):
        return speculative_decode_loop(
            target, dparams, ck, cv, dk, dv_, prompt, suppress, scalars,
            dims=dims, draft_dims=dd, special=sp, sample_begin=2,
            max_new_tokens=args.steps, draft_k=args.k,
        )

    t_plain = timed(run_plain)
    t_worst = timed(lambda: run_spec(draft, ddims, dck, dcv))
    t_best = timed(lambda: run_spec(target, dims, ck, cv))

    ms_tok_plain = t_plain / args.steps * 1e3
    # A round's cost is acceptance-INDEPENDENT (always k draft steps + one
    # verify), so the alpha=0 run — where every round commits exactly 1
    # token, i.e. rounds == steps — measures the true per-round cost with
    # the REAL draft model:
    round_ms = t_worst / args.steps * 1e3
    # the self-draft run (alpha=1 by construction) only sanity-checks the
    # always-accept path; its draft steps cost target-model prices, so it
    # is NOT the projected-throughput round cost
    ms_tok_selfdraft = t_best / args.steps * 1e3

    curve = {}
    for alpha in (0.5, 0.7, 0.8, 0.9, 1.0):
        a = min(alpha, 1 - 1e-9)
        e_commit = (1 - a ** (args.k + 1)) / (1 - a)
        curve[f"alpha_{alpha}"] = round(e_commit * ms_tok_plain / round_ms, 2)
    print(json.dumps({
        "metric": "speculative_b1_mechanics",
        "target": args.target, "draft": args.draft, "k": args.k,
        "plain_ms_per_token": round(ms_tok_plain, 3),
        "round_ms_with_draft": round(round_ms, 3),
        "ms_per_token_at_alpha1": round(round_ms / (args.k + 1), 3),
        "selfdraft_sanity_ms_per_token": round(ms_tok_selfdraft, 3),
        "projected_speedup_vs_alpha": curve,
    }))


if __name__ == "__main__":
    main()
