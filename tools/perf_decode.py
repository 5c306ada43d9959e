"""Decode per-step cost attribution (VERDICT r2 weak #1 / next #3).

Measures the MARGINAL per-step cost of the jitted decode while_loop at
b=32 large-v3-turbo shapes via the (N_long - N_short) / (steps) delta, for
a ladder of static-flag ablation variants that all compile the SAME
while_loop structure (no scan-of-forwards — the relay compiler hangs on
that, git 89a8551):

  base          greedy sampler, timestamp rules ON (production config)
  rules_off     timestamp rules + suppress-blank off
  argmax        sampler reduced to bare argmax ("sampler")
  vocab_small   51866-row vocab projection -> 1024 rows ("vocab")
  no_cross      cross-attention removed ("cross")
  no_kv_update  self-attention reads a stale cache, no dynamic_update_slice
  no_self       self-attention removed entirely
  skeleton      cross+self+vocab+sampler+rules all off -> loop floor

Attribution of component X = step(base) - step(base minus X). Run on the
real chip: python tools/perf_decode.py [--batch 32] [--variant large-v3-turbo]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--variant", default=None)
    ap.add_argument("--short", type=int, default=32)
    ap.add_argument("--long", dest="long_", type=int, default=160)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--int8", action="store_true", help="measure the int8 cross-KV variant too")
    ap.add_argument(
        "--only", default=None,
        help="comma-separated variant names to run (skips the rest of the "
        "ladder; attribution table suppressed unless base is included)",
    )
    ap.add_argument(
        "--pallas-cross", action="store_true",
        help="route T==1 int8 cross-attention through the Pallas one-pass "
        "kernel (sets WKTPU_PALLAS_CROSS_DECODE=1 before tracing; "
        "ops/attention_decode.py) — A/B against a separate run without it",
    )
    ap.add_argument(
        "--pallas-self", action="store_true",
        help="route T==1 self-attention through the Pallas one-pass "
        "kernels (sets WKTPU_PALLAS_SELF_DECODE=1 before tracing)",
    )
    ap.add_argument(
        "--quant", choices=["w8a16", "w4a16"], default=None,
        help="weight-quantize the model before measuring (composes with "
        "--serving / the int8 KV rows — e.g. --quant w4a16 --serving "
        "--only base is the fully-compressed serving candidate)",
    )
    ap.add_argument(
        "--serving", action="store_true",
        help="serving-preset mode: int8 cross-KV ONLY via the fused "
        "per-layer encode (whole-batch bf16 K/V never materializes — the "
        "only way large-v3 b=32 fits); measures the int8 ladder",
    )
    args = ap.parse_args()
    if args.pallas_cross or args.pallas_self:
        import os

        if args.pallas_cross:
            os.environ["WKTPU_PALLAS_CROSS_DECODE"] = "1"
            if not args.serving:
                # the cross kernel only exists on the int8 cross-KV path:
                # without --serving only the int8_cross_kv row uses a dict
                # ck, so a base-row A/B would compare two identical runs
                print(
                    "WARNING: --pallas-cross without --serving only affects "
                    "the int8_cross_kv row (bf16 rows never hit the kernel)",
                    file=sys.stderr,
                )
        if args.pallas_self:
            os.environ["WKTPU_PALLAS_SELF_DECODE"] = "1"

    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from whisperkit_tpu.decoding.loop import DecodeScalars, decode_loop, encode_window
    from whisperkit_tpu.models.whisper import VARIANT_DIMS, init_params
    from whisperkit_tpu.ops.mel import log_mel_spectrogram
    from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab

    on_tpu = jax.devices()[0].platform != "cpu"
    variant = args.variant or ("large-v3-turbo" if on_tpu else "tiny")
    batch = args.batch if on_tpu else 2
    dims = VARIANT_DIMS[variant]
    sp = special_tokens_for_vocab(dims.n_vocab)
    params = init_params(jax.random.PRNGKey(0), dims)
    if args.quant:
        from whisperkit_tpu.ops.quant import quantize_whisper_params

        params = quantize_whisper_params(
            params, bits=4 if args.quant == "w4a16" else 8
        )

    audio = jax.random.normal(jax.random.PRNGKey(1), (batch, 480_000)) * 0.1
    mel = log_mel_spectrogram(audio, n_mels=dims.n_mels)
    ck_q = cv_q = None
    if args.serving:
        # fused per-layer project+quantize: bf16 whole-batch K/V never
        # exists (large-v3 b=32 bf16 alone is 7.9 GB — materializing it
        # here RESOURCE_EXHAUSTs the worker before any measurement)
        _, ck, cv = encode_window(params, mel, dims, quantize_kv=True)
        ck, cv = jax.block_until_ready((ck, cv))
        ck_q, cv_q = ck, cv
        with_int8 = False
    else:
        _, ck, cv = encode_window(params, mel, dims)
        ck, cv = jax.block_until_ready((ck, cv))
        # int8 copies double the cross-KV residency (OOM at large-v3
        # b=16); only materialize them when the variant will run
        with_int8 = variant == "large-v3-turbo" or args.int8
        if with_int8:
            from whisperkit_tpu.ops.quant import quantize_cross_kv

            ck_q, cv_q = jax.block_until_ready(quantize_cross_kv(ck, cv))
    prompt = jnp.asarray([[sp.sot, sp.transcribe]] * batch, jnp.int32)
    # EOT suppressed so every variant runs its full budget (random weights
    # would otherwise stop at data-dependent steps and skew the delta)
    suppress = jnp.zeros((dims.n_vocab,), np.float32).at[sp.eot].set(-np.inf)

    def run(
        n_steps: int, rules: bool, ablate: tuple, seed: int, quant=False,
        quant_self=False,
    ) -> float:
        scalars = DecodeScalars(
            temperature=jnp.float32(0.0),
            max_initial_timestamp_index=jnp.int32(50),
            first_token_logprob_threshold=jnp.float32(float("-inf")),
            rng_key=jax.random.PRNGKey(seed),
        )
        out = decode_loop(
            params, ck_q if quant else ck, cv_q if quant else cv,
            prompt, suppress, scalars,
            dims=dims, special=sp, sample_begin=2, max_new_tokens=n_steps,
            top_k=5, sot_index=0, use_timestamp_rules=rules,
            suppress_blank=False, ablate=ablate, quantize_self_kv=quant_self,
        )
        t0 = time.perf_counter()
        np.asarray(out.tokens)  # forced host transfer (CLAUDE.md timing note)
        return time.perf_counter() - t0

    variants = [
        ("base", True, ()),
        ("fuse_qkv", True, ("fuse_qkv",)),  # experiment: 3 self-proj matvecs → 1
        ("rules_off", False, ()),
        ("argmax", True, ("sampler",)),
        ("vocab_small", True, ("vocab",)),
        ("no_cross", True, ("cross",)),
        ("no_kv_update", True, ("kv_update",)),
        ("no_self", True, ("self",)),
        ("skeleton", False, ("cross", "self", "vocab", "sampler")),
    ]

    if with_int8:
        variants.append(("int8_cross_kv", True, ()))
    # int8 SELF-KV (per-token scales, quantize-on-write): composes with
    # whatever cross-KV mode is active — in --serving mode this row is the
    # serving preset + int8 self-KV, the candidate fully-int8-KV config
    variants.append(("int8_self_kv", True, ()))

    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]

    results = {}
    for name, rules, ablate in variants:
        quant = name == "int8_cross_kv"
        quant_self = name == "int8_self_kv"
        per_step = []
        run(args.short, rules, ablate, 0, quant, quant_self)  # compile both shapes
        run(args.long_, rules, ablate, 0, quant, quant_self)
        for i in range(args.iters):
            ts = run(args.short, rules, ablate, i + 1, quant, quant_self)
            tl = run(args.long_, rules, ablate, i + 1, quant, quant_self)
            per_step.append((tl - ts) / (args.long_ - args.short))
        ms = float(np.median(per_step) * 1000)
        results[name] = ms
        print(f"{name:14s} {ms:7.3f} ms/step", flush=True)

    if "base" not in results or args.only:
        print(json.dumps({
            "batch": batch, "variant": variant,
            "serving_int8_kv": args.serving,
            **{k: round(v, 3) for k, v in results.items()},
        }))
        return
    base = results["base"]
    print("\n| component | ms/step | share of base |")
    print("|---|---|---|")
    rows = [
        ("timestamp rules", base - results["rules_off"]),
        ("sampler (top-k machinery)", base - results["argmax"]),
        ("vocab projection (51866 vs 1024)", base - results["vocab_small"]),
        ("cross-attention", base - results["no_cross"]),
        ("self-attn KV write", base - results["no_kv_update"]),
        ("self-attention (all)", base - results["no_self"]),
        ("loop skeleton (residual)", results["skeleton"]),
    ]
    for name, ms in rows:
        print(f"| {name} | {ms:.3f} | {100 * ms / base:.0f}% |")
    accounted = (
        (base - results["rules_off"]) + (base - results["argmax"])
        + (base - results["vocab_small"]) + (base - results["no_cross"])
        + (base - results["no_self"]) + results["skeleton"]
    )
    print(f"| TOTAL attributed | {accounted:.3f} | {100 * accounted / base:.0f}% |")
    print(json.dumps({
        "batch": batch, "variant": variant, "serving_int8_kv": args.serving,
        **{k: round(v, 3) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
