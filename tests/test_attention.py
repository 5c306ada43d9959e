"""One-pass Pallas encoder MHA (ops/attention.py) vs the XLA `_attend` path.

Interpret mode on CPU (same pattern as the Pallas mel kernel tests); the
compiled kernel is exercised on the chip by tools/perf_encoder.py v14/v15.
"""

import jax
import jax.numpy as jnp
import numpy as np

from whisperkit_tpu.models.whisper import _attend
from whisperkit_tpu.ops.attention import mha_encoder_pallas


def _rand_qkv(key, b, h, s, dh, dtype):
    kq, kk, kv = jax.random.split(key, 3)
    shape = (b, h, s, dh)
    return (
        jax.random.normal(kq, shape).astype(dtype),
        jax.random.normal(kk, shape).astype(dtype),
        jax.random.normal(kv, shape).astype(dtype),
    )


def test_onepass_mha_matches_attend_f32():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, 3, 100, 64, jnp.float32)
    ref = np.asarray(_attend(q, k, v))
    out = np.asarray(mha_encoder_pallas(q, k, v, block_q=512))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_onepass_mha_padding_is_masked():
    """s=100 pads to 512 in-kernel; padded keys must not leak into softmax
    (compare against an unpadded reference), and q-padding rows are sliced."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 2, 100, 64, jnp.float32)
    ref = np.asarray(_attend(q, k, v))
    out = np.asarray(mha_encoder_pallas(q, k, v, block_q=512))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    assert np.isfinite(out).all()


def test_onepass_mha_bf16_close_to_f32_reference():
    """bf16 operands (the production encoder dtype): the kernel's f32
    softmax should sit within the same ~1% envelope as the XLA bf16 path."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 2, 160, 64, jnp.float32)
    ref = np.asarray(_attend(q, k, v))
    out = np.asarray(
        mha_encoder_pallas(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            block_q=512,
        )
    ).astype(np.float32)
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.02, rel


def test_onepass_mha_multiblock_q():
    """s > block_q exercises the k/v-resident sweep across q blocks."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 1, 1024, 64, jnp.float32)
    ref = np.asarray(_attend(q, k, v))
    out = np.asarray(mha_encoder_pallas(q, k, v, block_q=512))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
