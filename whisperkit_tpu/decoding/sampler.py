"""Token sampling inside the jitted decode loop.

Reference: Sources/WhisperKit/Core/Text/TokenSampler.swift —
`GreedyTokenSampler` (:29-252): temperature 0 → argmax; temperature > 0 →
softmax over top-k then multinomial (the reference's cumsum trick :42-83 is
exactly `jax.random.categorical` over the top-k logits). The reference's
`BeamSearchTokenSampler` is a `fatalError` stub (:254-290); beam search here
is implemented for real in `decoding/beam.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_token(
    logits: jnp.ndarray,  # [B, V] f32, already filtered
    temperature: jnp.ndarray,  # traced scalar f32
    key: jnp.ndarray,  # PRNG key
    top_k: int = 5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B] i32, logprob-of-token [B] f32).

    The stochastic branch (sort-based top_k over the 51k vocab — the
    single most expensive non-matmul op in the loop) runs under a
    `lax.cond`, so greedy decoding (temperature 0, the production ladder's
    first rung) pays only an argmax per step.
    """

    def greedy_branch(_key):
        return jnp.argmax(logits, axis=-1)

    def stochastic_branch(key):
        top_vals, top_idx = jax.lax.top_k(logits, top_k)  # [B, K]
        safe_t = jnp.maximum(temperature, 1e-4)
        choice = jax.random.categorical(key, top_vals / safe_t, axis=-1)  # [B]
        return jnp.take_along_axis(top_idx, choice[:, None], axis=1)[:, 0]

    token = jax.lax.cond(
        temperature > 0, stochastic_branch, greedy_branch, key
    ).astype(jnp.int32)
    # logprob of the chosen token without materializing full log_softmax
    norm = jax.scipy.special.logsumexp(logits, axis=-1)
    logprob = jnp.take_along_axis(logits, token[:, None], axis=1)[:, 0] - norm
    return token, logprob
