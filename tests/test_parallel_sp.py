"""Sequence-parallel encoder (activation sharding over `tp`).

TPU-native small-batch latency mode (SURVEY.md §2.6 headroom; no reference
equivalent — the reference is single-device): the encoder's 1500-token
axis shards over the mesh while params stay replicated, and GSPMD inserts
the per-layer K/V all-gathers. Validated on the virtual 8-device CPU mesh:
sharded output == replicated output, and the activation sharding actually
lands on the seq axis.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
jnp = jax.numpy

from jax.sharding import PartitionSpec as P

from whisperkit_tpu.models.whisper import WhisperDims, encoder_forward, init_params
from whisperkit_tpu.parallel.mesh import make_mesh
from whisperkit_tpu.parallel.sharding import encoder_seq_sharding

# n_audio_ctx must divide by tp=8 shards: 1500 ctx would need pad; the tiny
# test dims use ctx 64 (mel T=128) which splits 8 ways evenly
DIMS = WhisperDims(80, 207, 64, 64, 4, 2, 64, 64, 4, 2)


@pytest.fixture(scope="module")
def plan():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=1, tp=8)


def test_seq_parallel_encode_matches_replicated(plan):
    params = init_params(jax.random.PRNGKey(0), DIMS)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, DIMS.n_mels, 128), jnp.float32)

    ref = np.asarray(jax.jit(lambda p, m: encoder_forward(p, m, DIMS))(params, mel))

    sp = encoder_seq_sharding(plan)
    assert sp.spec == P(None, "tp", None)
    sp_fn = jax.jit(lambda p, m: encoder_forward(p, m, DIMS, seq_sharding=sp))
    out = sp_fn(params, mel)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_seq_parallel_activations_are_sharded(plan):
    """The constraint must survive into the compiled module (not be
    optimized to full replication): check the jitted fn's output sharding
    when we return the constrained activation directly."""
    sp = encoder_seq_sharding(plan)

    @jax.jit
    def constrained(x):
        return jax.lax.with_sharding_constraint(x, sp)

    x = jnp.zeros((1, 64, 32))
    y = constrained(x)
    # jax canonicalizes trailing Nones away
    assert tuple(y.sharding.spec) in ((None, "tp"), (None, "tp", None))
    # 8-way split of the 64-token axis → each shard holds 8 tokens
    shard_shapes = {s.data.shape for s in y.addressable_shards}
    assert shard_shapes == {(1, 8, 32)}
