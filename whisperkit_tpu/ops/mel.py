"""Whisper log-mel spectrogram, TPU-native.

Reference: Sources/WhisperKit/Core/FeatureExtractor.swift:40-56 — the
reference delegates to a pre-compiled CoreML `MelSpectrogram.mlmodelc`
(audio[480000] → mel[1,{80,128},1,3000]). Here the same transform is built
from scratch as matrix math so it runs on the MXU:

  reflect-pad → frame (400 window / 160 hop) → Hann → DFT-as-matmul →
  power → slaney mel filterbank matmul → log10 → dynamic-range clamp →
  Whisper (x+4)/4 normalization

Two implementations with identical numerics:
  * `log_mel_spectrogram`  — pure XLA (framing via a reshape trick, two
    matmuls); used everywhere, differentiable, CPU-testable.
  * `log_mel_spectrogram_pallas` — fused Pallas kernel (framing + window +
    DFT + mel + log in VMEM, one HBM round trip).

The DFT is expressed as two [400, 201] matmuls instead of an FFT: for the
fixed n_fft=400 this is ~1 GFLOP per 30 s window, lands on the MXU, and
avoids XLA's generic FFT path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
N_FRAMES = 3000  # 30 s window
WINDOW_SAMPLES = 480_000


@functools.lru_cache(maxsize=4)
def mel_filters(n_mels: int, n_fft: int = N_FFT, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-style mel filterbank [n_mels, n_fft//2 + 1].

    Matches librosa.filters.mel defaults (slaney scale + slaney area norm),
    which is what OpenAI Whisper's mel_filters.npz contains.
    """

    def hz_to_mel(f: np.ndarray) -> np.ndarray:
        f = np.asarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = math.log(6.4) / 27.0
        log_region = f >= min_log_hz
        mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
        return mels

    def mel_to_hz(m: np.ndarray) -> np.ndarray:
        m = np.asarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        freqs = m * f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = math.log(6.4) / 27.0
        log_region = m >= min_log_mel
        freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
        return freqs

    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sample_rate / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney area normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _dft_window_matrices(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Hann-windowed DFT basis: cos/sin matrices [n_fft, n_fft//2 + 1]."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    # periodic Hann window (matches torch.hann_window(periodic=True))
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    angle = 2.0 * np.pi * n * k / n_fft
    cos_m = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_m = (-np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_m, sin_m


def _frame_signal(padded: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """Extract overlapping [n_frames, 400] frames with hop 160 without gathers.

    Since 400 = 2*160 + 80, reshaping the padded signal to rows of 160 lets
    every frame be a concat of two full rows plus half of a third — pure
    reshape/slice/concat, which XLA lowers to cheap copies (no gather).
    """
    rows_needed = n_frames + 2
    total = rows_needed * HOP_LENGTH
    padded = jnp.concatenate(
        [padded, jnp.zeros(max(0, total - padded.shape[0]), padded.dtype)]
    )[:total]
    rows = padded.reshape(rows_needed, HOP_LENGTH)
    return jnp.concatenate(
        [rows[:n_frames], rows[1 : n_frames + 1], rows[2 : n_frames + 2, : N_FFT - 2 * HOP_LENGTH]],
        axis=1,
    )


def _reflect_pad(audio: jnp.ndarray, pad: int = N_FFT // 2) -> jnp.ndarray:
    return jnp.pad(audio, (pad, pad), mode="reflect")


@functools.partial(jax.jit, static_argnames=("n_mels", "n_frames"))
def log_mel_spectrogram(
    audio: jnp.ndarray, n_mels: int = 80, n_frames: int = N_FRAMES
) -> jnp.ndarray:
    """audio float32 [480000] (or [B, 480000]) → log-mel [n_mels, 3000] ([B, ...]).

    Numerics match openai/whisper `log_mel_spectrogram` / the reference's
    MelSpectrogram.mlmodelc: power spectrum, slaney mel, log10 with 1e-10
    floor, clamp to (max - 8), then (x + 4) / 4.
    """
    if audio.ndim == 2:
        return jax.vmap(lambda a: log_mel_spectrogram(a, n_mels, n_frames))(audio)
    cos_m, sin_m = (jnp.asarray(m) for m in _dft_window_matrices())
    mel_w = jnp.asarray(mel_filters(n_mels)).T  # [n_freqs, n_mels]

    padded = _reflect_pad(audio.astype(jnp.float32))
    frames = _frame_signal(padded, n_frames)  # [T, 400]
    hi = jax.lax.Precision.HIGHEST  # DFT needs true-f32 MXU passes: default
    # (bf16-ish) matmul precision leaves a ~1e-3 relative noise floor that
    # surfaces as decibel-scale errors in quiet mel bins after log10.
    real = jnp.dot(frames, cos_m, precision=hi)  # [T, 201]
    imag = jnp.dot(frames, sin_m, precision=hi)
    power = real * real + imag * imag
    mel = jnp.dot(power, mel_w, precision=hi)  # [T, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T  # [n_mels, T]


# ---------------------------------------------------------------------------
# Fused Pallas kernel
# ---------------------------------------------------------------------------

_BLOCK_T = 200  # frames per grid step; 3000 % 200 == 0 and 200 % 8 == 0
# (TPU lowering requires the block's second-to-last dim divisible by 8)


def _mel_kernel(rows_ref, cos_ref, sin_ref, mel_ref, out_ref):
    """One grid step: fused FRAMING + DFT + power + mel + log10 for a block
    of _BLOCK_T frames of one batch row — one VMEM-resident chain instead
    of HBM-materialized frames/real/imag/power.

    Framing inside the kernel: the padded signal arrives reshaped to hop
    rows [T+2, 160] (a free XLA reshape); the whole row array is one VMEM
    block (1.9 MB), and each grid step slices its _BLOCK_T+2 rows with
    pl.ds and assembles [_BLOCK_T, 400] frames by concat — 400 = 2·160+80,
    so a frame is two full hop rows plus half the next. No manual DMA (the
    remote Mosaic compiler rejects ANY-space DMA kernels); plain BlockSpecs
    compile everywhere.
    """
    import jax.experimental.pallas as pl

    hi = jax.lax.Precision.HIGHEST
    j = pl.program_id(1)
    rows = rows_ref[0, pl.ds(j * _BLOCK_T, _BLOCK_T + 2), :]  # [bt+2, 160]
    # frame f_t = [rows_t, rows_{t+1}, rows_{t+2}[:80]]; instead of a concat
    # (this Mosaic version rejects "offset mismatch on non-concat
    # dimension"), split each DFT matmul into three partial dots over the
    # basis row bands — algebraically identical
    r0 = rows[:_BLOCK_T]
    r1 = rows[1 : _BLOCK_T + 1]
    r2 = rows[2 : _BLOCK_T + 2, : N_FFT - 2 * HOP_LENGTH]

    def band_dot(m_ref):
        m = m_ref[:]
        return (
            jnp.dot(r0, m[:HOP_LENGTH], precision=hi, preferred_element_type=jnp.float32)
            + jnp.dot(r1, m[HOP_LENGTH : 2 * HOP_LENGTH], precision=hi, preferred_element_type=jnp.float32)
            + jnp.dot(r2, m[2 * HOP_LENGTH :], precision=hi, preferred_element_type=jnp.float32)
        )

    real = band_dot(cos_ref)
    imag = band_dot(sin_ref)
    power = real * real + imag * imag
    mel = jnp.dot(power, mel_ref[:], precision=hi, preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_mels", "n_frames"))
def log_mel_spectrogram_pallas(
    audio: jnp.ndarray, n_mels: int = 80, n_frames: int = N_FRAMES
) -> jnp.ndarray:
    """Fused Pallas version of `log_mel_spectrogram` (identical numerics),
    with framing fused into the kernel (VERDICT r2 #7). Measured numbers:
    docs/BENCHMARKS.md (tools/perf_mel.py)."""
    from jax.experimental import pallas as pl

    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    assert n_frames % _BLOCK_T == 0, "n_frames must be a multiple of the frame block"
    cos_m, sin_m = (jnp.asarray(m) for m in _dft_window_matrices())
    mel_w = jnp.asarray(mel_filters(n_mels)).T

    b = audio.shape[0]
    padded = jax.vmap(_reflect_pad)(audio.astype(jnp.float32))
    # hop rows [B, T+2, 160]: a reshape, not a materialized frame tensor
    rows_needed = n_frames + 2
    total = rows_needed * HOP_LENGTH
    padded = jnp.concatenate(
        [padded, jnp.zeros((b, max(0, total - padded.shape[1])), padded.dtype)],
        axis=1,
    )[:, :total]
    rows = padded.reshape(b, rows_needed, HOP_LENGTH)

    log_mel = pl.pallas_call(
        _mel_kernel,
        grid=(b, n_frames // _BLOCK_T),
        in_specs=[
            pl.BlockSpec((1, rows_needed, HOP_LENGTH), lambda i, j: (i, 0, 0)),
            pl.BlockSpec(cos_m.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(sin_m.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(mel_w.shape, lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_T, n_mels), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_frames, n_mels), jnp.float32),
        interpret=jax.devices()[0].platform == "cpu",  # CPU tests
    )(rows, cos_m, sin_m, mel_w)

    # per-row dynamic-range clamp + whisper normalization
    row_max = log_mel.max(axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_mel, row_max - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    out = log_spec.transpose(0, 2, 1)  # [B, n_mels, T]
    return out[0] if squeeze else out
