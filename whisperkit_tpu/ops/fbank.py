"""Kaldi-style log-mel filterbank features (WeSpeaker front end).

Reference: the reference's SpeakerPreEmbedderModel.swift is a CoreML
"fbank-style preprocessor" feeding the WeSpeaker embedder
(SpeakerEmbedderModel.swift). WeSpeaker trains on kaldi fbank
(torchaudio.compliance.kaldi.fbank: 25 ms frames / 10 ms hop, 0.97
pre-emphasis, povey window, 512-point power spectrum, 80 mel bins spanning
20 Hz..Nyquist, natural log, per-utterance mean subtraction), which differs
from Whisper's mel (no pre-emphasis, Hann, log10, max-normalized). This is
a from-scratch JAX implementation of that published recipe; the whole
transform is one matmul chain, MXU-friendly and batchable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
FRAME_LEN = 400  # 25 ms
FRAME_HOP = 160  # 10 ms
N_FFT = 512  # next_pow2(400)
PREEMPH = 0.97


def _mel_scale(hz):
    return 1127.0 * np.log(1.0 + hz / 700.0)


def _mel_banks(n_mels: int, low_hz: float = 20.0, high_hz: float = 0.0) -> np.ndarray:
    """Kaldi mel banks [n_mels, N_FFT//2+1] (triangular in mel space)."""
    nyquist = SAMPLE_RATE / 2.0
    high = nyquist + high_hz if high_hz <= 0 else high_hz
    low_mel, high_mel = _mel_scale(low_hz), _mel_scale(high)
    # kaldi computes bins on the full fft grid in mel space
    mel_points = np.linspace(low_mel, high_mel, n_mels + 2)
    bins = N_FFT // 2 + 1
    fft_hz = np.arange(bins) * SAMPLE_RATE / N_FFT
    fft_mel = _mel_scale(fft_hz)
    banks = np.zeros((n_mels, bins), np.float32)
    for m in range(n_mels):
        left, center, right = mel_points[m], mel_points[m + 1], mel_points[m + 2]
        up = (fft_mel - left) / (center - left)
        down = (right - fft_mel) / (right - center)
        banks[m] = np.clip(np.minimum(up, down), 0.0, None)
    return banks


def _povey_window(n: int) -> np.ndarray:
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
    return (hann**0.85).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_mels", "mean_norm"))
def kaldi_fbank(
    audio: jnp.ndarray,  # [B, T] float32 in [-1, 1]
    n_mels: int = 80,
    mean_norm: bool = True,
) -> jnp.ndarray:
    """[B, T] → log-mel fbank [B, F, n_mels] (frames, kaldi conventions).

    snip_edges=True framing (kaldi default): F = 1 + (T - 400) // 160.
    Waveform is scaled to int16 range like torchaudio/kaldi before the
    power spectrum so absolute log energies line up with WeSpeaker
    training features.
    """
    b, t = audio.shape
    n_frames = 1 + (t - FRAME_LEN) // FRAME_HOP
    audio = audio * 32768.0

    idx = (
        np.arange(n_frames)[:, None] * FRAME_HOP + np.arange(FRAME_LEN)[None, :]
    )  # [F, 400]
    frames = audio[:, idx]  # [B, F, 400]
    # per-frame DC offset removal (kaldi remove_dc_offset=True)
    frames = frames - frames.mean(-1, keepdims=True)
    # pre-emphasis: x[n] - 0.97 * x[n-1] (kaldi replicates the first sample)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - PREEMPH * prev
    frames = frames * jnp.asarray(_povey_window(FRAME_LEN))

    # 512-point power spectrum as one real-DFT matmul pair (MXU path; the
    # same matmul-STFT trick ops/mel.py uses for Whisper)
    n = np.arange(FRAME_LEN)
    k = np.arange(N_FFT // 2 + 1)
    angle = 2.0 * np.pi * np.outer(n, k) / N_FFT
    cos_m = jnp.asarray(np.cos(angle), jnp.float32)  # [400, 257]
    sin_m = jnp.asarray(np.sin(angle), jnp.float32)
    re = frames @ cos_m
    im = -(frames @ sin_m)
    power = re * re + im * im  # [B, F, 257]

    mel = power @ jnp.asarray(_mel_banks(n_mels).T)  # [B, F, n_mels]
    fb = jnp.log(jnp.maximum(mel, 1.1920929e-07))  # kaldi epsilon (f32 eps)
    if mean_norm:
        fb = fb - fb.mean(axis=1, keepdims=True)
    return fb
