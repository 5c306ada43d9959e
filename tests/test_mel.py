"""Log-mel spectrogram parity tests.

Reference coverage model: UnitTests.swift:674-815 validates mel/encoder outputs
against the real tiny model; here we validate our from-scratch mel against the
independent `transformers` WhisperFeatureExtractor implementation (same math
as openai/whisper's mel_filters.npz + torch STFT).
"""

import numpy as np
import pytest

from whisperkit_tpu.audio.io import load_audio, pad_or_trim
from whisperkit_tpu.ops.mel import (
    N_FRAMES,
    log_mel_spectrogram,
    mel_filters,
)


@pytest.fixture(scope="module")
def padded_jfk(jfk_audio):
    return pad_or_trim(jfk_audio)


def test_mel_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    for n_mels in (80, 128):
        ref = mel_filter_bank(
            num_frequency_bins=201,
            num_mel_filters=n_mels,
            min_frequency=0.0,
            max_frequency=8000.0,
            sampling_rate=16000,
            norm="slaney",
            mel_scale="slaney",
        )
        ours = mel_filters(n_mels)
        assert np.abs(ref.T - ours).max() < 1e-6


def test_log_mel_matches_transformers(padded_jfk):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=80)
    ref = fe(padded_jfk, sampling_rate=16000, return_tensors="np", padding=False)[
        "input_features"
    ][0]
    ours = np.asarray(log_mel_spectrogram(padded_jfk))
    assert ours.shape == (80, N_FRAMES)
    assert np.abs(ref - ours).max() < 5e-4


def test_log_mel_128_shape(padded_jfk):
    ours = np.asarray(log_mel_spectrogram(padded_jfk, n_mels=128))
    assert ours.shape == (128, N_FRAMES)
    assert np.isfinite(ours).all()


def test_log_mel_batched(padded_jfk):
    batch = np.stack([padded_jfk, np.zeros_like(padded_jfk)])
    out = np.asarray(log_mel_spectrogram(batch))
    assert out.shape == (2, 80, N_FRAMES)
    single = np.asarray(log_mel_spectrogram(padded_jfk))
    assert np.abs(out[0] - single).max() < 1e-4


def test_log_mel_pallas_matches_xla(padded_jfk):
    """The fused Pallas kernel (framing + DFT + mel + log in one VMEM
    chain; band-split partial dots instead of an in-kernel concat) must
    match the XLA path. Runs in interpret mode on CPU; compiled on TPU."""
    import jax.numpy as jnp

    from whisperkit_tpu.ops.mel import log_mel_spectrogram_pallas

    batch = jnp.stack([jnp.asarray(padded_jfk), jnp.asarray(padded_jfk) * 0.3])
    a = np.asarray(log_mel_spectrogram(batch, n_mels=80))
    b = np.asarray(log_mel_spectrogram_pallas(batch, n_mels=80))
    # band-split partial dots accumulate in a different order: ~3e-5 noise
    np.testing.assert_allclose(a, b, atol=5e-5)


def test_log_mel_value_range(padded_jfk):
    # Whisper normalization (x+4)/4 with 8-decade clamp keeps values in a
    # known band: floor = (max_log - 8 + 4)/4, values above floor
    ours = np.asarray(log_mel_spectrogram(padded_jfk))
    assert ours.max() < 4.0
    assert ours.min() >= ours.max() - 2.0 - 1e-5
