"""Multi-host (multi-slice) mesh: the outer `dcn` axis.

New TPU-native coverage (no reference equivalent — the reference is a
single-device framework; SURVEY.md §2.6 maps its concurrency to mesh
parallelism). Validates on the virtual 8-device CPU mesh that:

  * a dcn=2 × dp=2 × tp=2 plan builds, batches shard dcn-major, and the
    TP param rules apply unchanged on the 3-axis mesh;
  * `dcn_shard` (manual-dcn `jax.shard_map`) runs the encode and decode
    steps with results EQUAL to the single-mesh auto path — proving the
    hot path needs no cross-slice collective (with dcn manual, GSPMD
    cannot insert one).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
jnp = jax.numpy

from whisperkit_tpu.decoding.loop import encode_window
from whisperkit_tpu.models.whisper import WhisperDims, init_params
from whisperkit_tpu.parallel.mesh import dcn_shard, make_mesh, shard_batch
from whisperkit_tpu.parallel.sharding import shard_whisper_params

DIMS = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)


@pytest.fixture(scope="module")
def plan():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=2, tp=2, dcn=2)


def test_dcn_mesh_shape_and_padding(plan):
    assert plan.mesh.axis_names == ("dcn", "dp", "tp")
    assert (plan.dcn, plan.dp, plan.tp) == (2, 2, 2)
    assert plan.pad_batch(5) == 8  # multiples of dcn*dp
    # slice-major batch placement: row blocks land per (dcn, dp) group
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sharded = shard_batch(plan, x)
    assert sharded.sharding.spec == jax.sharding.PartitionSpec(("dcn", "dp"))


def test_dcn_single_slice_plan_unchanged():
    plan = make_mesh(dp=4, tp=2)
    assert plan.mesh.axis_names == ("dp", "tp")
    assert plan.dcn == 1
    # dcn_shard is a no-op without a dcn axis
    f = dcn_shard(plan, lambda x: x + 1, batch_argnums=(0,))
    assert f(jnp.ones(3)).tolist() == [2.0, 2.0, 2.0]


def test_dcn_manual_encode_matches_auto(plan):
    """Encode through manual-dcn shard_map == plain jit: numerics prove the
    wrapper computes the same function; the manual axis proves no
    collective can ride DCN."""
    params = init_params(jax.random.PRNGKey(0), DIMS)
    params = shard_whisper_params(plan, params)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((8, DIMS.n_mels, 3000)).astype(np.float32)
    )

    # cross-KV layout is [L, B, H, T, D]: batch is axis 1, so the wrapper
    # runs a batch-major variant (shard_map shards the LEADING axis)
    def encode(p, m):
        return _batch_major(encode_window(p, m, DIMS))

    ref = [np.asarray(a, np.float32) for a in encode(params, mel)]
    mel_sharded = shard_batch(plan, mel)
    out = dcn_shard(plan, encode, batch_argnums=(1,))(params, mel_sharded)
    # bf16 activations: partitioning changes reduction order, so compare at
    # bf16 resolution (~2 decimal digits), not exactness
    for o, r in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), r, rtol=3e-2, atol=6e-2
        )


def _batch_major(out):
    """encode_window returns (x[B,...], k[L,B,...], v[L,B,...]); shard_map
    out_specs=P('dcn') shard the LEADING axis, so swap KV to batch-major."""
    x, k, v = out
    return x, jnp.swapaxes(k, 0, 1), jnp.swapaxes(v, 0, 1)


def test_dcn_manual_decode_step_matches_auto(plan):
    """One masked decode step (language logits) through manual-dcn
    shard_map equals the auto path — the decoder, like the encoder, is
    slice-local."""
    from whisperkit_tpu.decoding.loop import detect_language_logits
    from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab

    params = init_params(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(
        rng.standard_normal((8, DIMS.n_mels, 3000)).astype(np.float32)
    )
    _, ck, cv = encode_window(params, mel, DIMS)
    special = special_tokens_for_vocab(DIMS.n_vocab)

    def step(p, k, v):
        return detect_language_logits(p, k, v, dims=DIMS, special=special)

    ref = np.asarray(step(params, ck, cv))
    params_s = shard_whisper_params(plan, params)
    k_s = shard_batch(plan, jnp.swapaxes(ck, 0, 1))
    v_s = shard_batch(plan, jnp.swapaxes(cv, 0, 1))

    def step_batch_major(p, k, v):
        return step(p, jnp.swapaxes(k, 0, 1), jnp.swapaxes(v, 0, 1))

    out = dcn_shard(plan, step_batch_major, batch_argnums=(1, 2))(
        params_s, k_s, v_s
    )
    # f32 softmax over bf16 logits: bf16-resolution comparison
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-2, atol=3e-2)


def test_tp_sharded_w8a8_encoder_matches_unsharded(plan):
    """The int8-ACTIVATION encoder ("w8a8") under Megatron TP: the
    quantized {w_q, scale} tree shards with the same rules as w8a16, the
    per-row activation quantize replicates, and the GSPMD-partitioned
    int8×int8 dots reproduce the single-device numbers."""
    from whisperkit_tpu.models.whisper import encoder_forward
    from whisperkit_tpu.ops.quant import quantize_whisper_params

    params = quantize_whisper_params(
        init_params(jax.random.PRNGKey(0), DIMS), min_size=1
    )
    rng = np.random.default_rng(2)
    mel = jnp.asarray(
        rng.standard_normal((8, DIMS.n_mels, 3000)).astype(np.float32)
    )
    ref = np.asarray(
        jax.jit(lambda p, m: encoder_forward(p, m, DIMS, act8=True))(params, mel),
        np.float32,
    )
    params_s = shard_whisper_params(plan, params)
    mel_s = shard_batch(plan, mel)
    out = jax.jit(lambda p, m: encoder_forward(p, m, DIMS, act8=True))(
        params_s, mel_s
    )
    # int8 dots accumulate in int32 (order-invariant) but the rescale and
    # residual stream are bf16: compare at bf16 resolution
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, rtol=3e-2, atol=6e-2
    )
