"""Benchmark: batched Whisper decode throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.md): decode tokens/sec/chip on the flagship
config. The reference's CI floor is 4 tok/s on-device
(RegressionTests.swift:270-274); `vs_baseline` is measured against that
floor since the reference publishes no absolute numbers in-tree
(BASELINE.md "published: {}").

No network access → random-init weights (throughput is weight-value
independent). Model: Whisper large-v3 turbo shapes when a TPU is present,
`tiny` on CPU (so the script stays runnable anywhere).
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from whisperkit_tpu.decoding.loop import DecodeScalars, decode_loop, encode_window
    from whisperkit_tpu.models.whisper import VARIANT_DIMS, init_params
    from whisperkit_tpu.ops.mel import log_mel_spectrogram
    from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    variant = "large-v3-turbo" if on_tpu else "tiny"
    batch = 64 if on_tpu else 2  # B=64 measured best RTF/chip on v5e
    max_new = 32
    dims = VARIANT_DIMS[variant]
    sp = special_tokens_for_vocab(dims.n_vocab)

    params = init_params(jax.random.PRNGKey(0), dims)
    audio = jax.random.normal(jax.random.PRNGKey(1), (batch, 480_000)) * 0.1
    prompt = jnp.asarray([[sp.sot, sp.transcribe]] * batch, jnp.int32)
    suppress = jnp.zeros((dims.n_vocab,), jnp.float32)

    import numpy as np

    def run(seed: int):
        """Full window pipeline: mel → encoder → KV-cached decode loop.
        np.asarray forces device→host completion (block_until_ready alone is
        unreliable over remoted transports)."""
        mel = log_mel_spectrogram(audio, n_mels=dims.n_mels)
        _, ck, cv = encode_window(params, mel, dims)
        scalars = DecodeScalars(
            temperature=jnp.float32(0.0),
            max_initial_timestamp_index=jnp.int32(50),
            first_token_logprob_threshold=jnp.float32(float("-inf")),
            rng_key=jax.random.PRNGKey(seed),
        )
        out = decode_loop(
            params, ck, cv, prompt, suppress, scalars,
            dims=dims, special=sp, sample_begin=2, max_new_tokens=max_new,
            top_k=5, sot_index=0, use_timestamp_rules=False,
            suppress_blank=False,
        )
        return np.asarray(out.tokens)

    run(0)  # compile
    n_iter = 3
    t0 = time.perf_counter()
    for i in range(n_iter):
        run(i + 1)
    dt = (time.perf_counter() - t0) / n_iter

    audio_seconds = batch * 30.0
    rtf = dt / audio_seconds  # reference: Models.swift:770-772 (lower better)
    baseline_rtf = 0.01  # BASELINE.md north-star target for TPU
    print(
        json.dumps(
            {
                "metric": f"rtf_{variant}_b{batch}",
                "value": round(rtf, 5),
                "unit": "rtf (pipeline_s / audio_s, lower is better)",
                "vs_baseline": round(baseline_rtf / rtf, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
