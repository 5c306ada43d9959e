"""DiarizePipeline — speaker diarization façade + engine.

Reference: Sources/SpeakerKit/SpeakerKit.swift (façade :21-108) and
Pyannote/PyannoteDiarizer.swift (`PyannoteDiarizerActor`: producer-consumer
segmenter→embedder pipeline :145-231, clustering :233-269, post-processing
:271-364, `diarize` :366-403), PyannoteConfig.swift (config/options/timings
:122-210).

TPU-native restructuring (SURVEY.md §2.6): the reference overlaps 4
segmenter workers with N embedder workers over an AsyncStream; here both
models are *batched* — all 30 s chunks run through the segmenter in one
call, and all (chunk, speaker-slot) embeddings in one call — so the TPU
sees two large dispatches instead of hundreds of small ones. Clustering
stays on host (NumPy/scipy).
"""

from __future__ import annotations

import dataclasses
import math
import time
from pathlib import Path
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from whisperkit_tpu.audio.io import SAMPLE_RATE, load_audio
from whisperkit_tpu.core.logging import logging
from whisperkit_tpu.models.pyannote import (
    CHUNK_SAMPLES,
    EmbedderDims,
    SegmenterDims,
    embedder_forward,
    init_embedder,
    init_segmenter,
    segmenter_forward,
)
from whisperkit_tpu.ops.mel import log_mel_spectrogram
from whisperkit_tpu.speaker.clustering import VBxClusterer, VBxClusteringConfig
from whisperkit_tpu.speaker.results import DiarizationResult, SpeakerMergeStrategy


@dataclasses.dataclass
class DiarizationOptions:
    """Reference: PyannoteDiarizationOptions (PyannoteConfig.swift:122-146)."""

    number_of_speakers: Optional[int] = None
    min_active_offset: float = 1.0
    cluster_distance_threshold: Optional[float] = None
    min_cluster_size: int = 1
    use_exclusive_reconciliation: bool = True
    clip_timestamps: Sequence[float] = ()
    min_activity_threshold: float = 0.5


@dataclasses.dataclass
class DiarizationTimings:
    """Reference: PyannoteDiarizationTimings (PyannoteConfig.swift:150-210)."""

    segmenter_seconds: float = 0.0
    embedder_seconds: float = 0.0
    clustering_seconds: float = 0.0
    post_process_seconds: float = 0.0
    total_seconds: float = 0.0
    chunk_count: int = 0
    embedding_count: int = 0


@dataclasses.dataclass
class PyannoteConfig:
    """Reference: PyannoteConfig (PyannoteConfig.swift:11-41)."""

    stride_seconds: float = 15.0  # chunk overlap stride (fullRedundancy)
    pyannet_stride_seconds: float = 5.0  # real PyanNet uses 10 s windows
    segmenter_dims: SegmenterDims = dataclasses.field(default_factory=SegmenterDims)
    embedder_dims: EmbedderDims = dataclasses.field(default_factory=EmbedderDims)
    clustering: VBxClusteringConfig = dataclasses.field(default_factory=VBxClusteringConfig)
    seed: int = 0


PYANNET_CHUNK_SAMPLES = 160_000  # 10 s windows (pyannote/segmentation-3.0)


def _pyannet_frames(samples: int) -> int:
    """PyanNet frame count: sinc conv (k=251, stride 10) then 3× (pool 3 +
    valid k=5 conv after the first block)."""
    t = (samples - 251) // 10 + 1
    t //= 3
    t = t - 4
    t //= 3
    t = t - 4
    return t // 3


class DiarizePipeline:
    """Reference: SpeakerKit + PyannoteDiarizerActor."""

    def __init__(
        self,
        config: Optional[PyannoteConfig] = None,
        *,
        segmenter_params=None,
        embedder_params=None,
    ):
        self.config = config or PyannoteConfig()
        key = jax.random.PRNGKey(self.config.seed)
        k1, k2 = jax.random.split(key)
        self.segmenter_params = (
            segmenter_params
            if segmenter_params is not None
            else init_segmenter(k1, self.config.segmenter_dims)
        )
        self.embedder_params = (
            embedder_params
            if embedder_params is not None
            else init_embedder(k2, self.config.embedder_dims)
        )
        # real converted checkpoints (models/pyannet.py) are detected by
        # their structure; the fast conv architectures stay the random-init
        # default (docs/PARITY.md "shipped-weights story")
        self.segmenter_backend = (
            "pyannet" if "sinc" in self.segmenter_params else "conv"
        )
        self.embedder_backend = (
            "resnet" if "layer1" in self.embedder_params else "conv"
        )
        self.timings = DiarizationTimings()
        self._mesh_plan = None  # lazily built when >1 device is visible

    def _mesh(self):
        """Data-parallel mesh over visible devices: the chunk batch and the
        (chunk, slot) embedding batch shard over ICI, params replicate
        (SURVEY.md §2.6 — the reference's segmenter/embedder worker pools
        become sharded batch dims)."""
        if self._mesh_plan is None:
            n = len(jax.devices())
            if n <= 1:
                self._mesh_plan = False
            else:
                from whisperkit_tpu.parallel.mesh import (
                    make_mesh,
                    shard_params_replicated,
                )

                self._mesh_plan = make_mesh(dp=n)
                self.segmenter_params = shard_params_replicated(
                    self._mesh_plan, self.segmenter_params
                )
                self.embedder_params = shard_params_replicated(
                    self._mesh_plan, self.embedder_params
                )
        return self._mesh_plan or None

    def _shard_rows(self, plan, rows: np.ndarray):
        """Pad a host batch to a dp multiple and shard it; returns
        (device_array, n_real)."""
        from whisperkit_tpu.parallel.mesh import shard_batch

        n_real = len(rows)
        padded = plan.pad_batch(n_real)
        if padded > n_real:
            pad = np.zeros((padded - n_real, *rows.shape[1:]), rows.dtype)
            rows = np.concatenate([rows, pad])
        return shard_batch(plan, jnp.asarray(rows)), n_real

    # Variant matrix (reference: PyannoteConfig.swift:11-41 — per-platform
    # W8A16 / W32A32 ModelInfos). w8a16 quantizes LSTM kernels, linears, and
    # BN-folded convs via ops/quant.quantize_speaker_params; the sinc
    # filterbank, norms and biases stay float.
    VARIANTS = ("w32a32", "w16a16", "w8a16")

    @classmethod
    def from_pretrained(
        cls,
        model_folder: Optional[str] = None,
        variant: str = "w32a32",
        **kwargs,
    ):
        """Load checkpoint params when available; random init otherwise.

        Recognized layouts inside `model_folder` (docs/PARITY.md
        "shipped-weights story"):
          * real torch checkpoints — `segmentation*.{ckpt,bin,safetensors}`
            (pyannote/segmentation-3.0 PyanNet) and
            `*wespeaker*/embedder*.{bin,safetensors,ckpt}` (ResNet34),
            converted via models/pyannet.py; or
          * pre-converted npz pairs `segmenter.npz` / `embedder.npz`.

        `variant` selects the precision recipe (VARIANTS), mirroring the
        reference's per-platform variant resolution.
        """
        if variant not in cls.VARIANTS:
            raise ValueError(f"unknown pyannote variant {variant!r}; one of {cls.VARIANTS}")

        def apply_variant(params):
            import jax.numpy as jnp

            if variant == "w16a16":
                return jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2
                    else x,
                    params,
                )
            if variant == "w8a16":
                from whisperkit_tpu.ops.quant import quantize_speaker_params

                return quantize_speaker_params(params)
            return params

        if model_folder:
            folder = Path(model_folder)

            def find(*globs):
                for g in globs:
                    hits = sorted(folder.glob(g))
                    if hits:
                        return hits[0]
                return None

            seg_ckpt = find(
                "segmentation*.ckpt", "segmentation*.bin", "segmentation*.safetensors",
                "pyannet*.ckpt", "pyannet*.bin",
            )
            emb_ckpt = find(
                "*wespeaker*.bin", "*wespeaker*.safetensors", "*wespeaker*.ckpt",
                "embedder*.bin", "embedder*.safetensors", "embedder*.ckpt",
            )
            if seg_ckpt is not None and emb_ckpt is not None:
                from whisperkit_tpu.models.pyannet import (
                    load_pyannote_segmentation,
                    load_wespeaker_resnet34,
                )

                return cls(
                    segmenter_params=apply_variant(
                        load_pyannote_segmentation(seg_ckpt)
                    ),
                    embedder_params=apply_variant(
                        load_wespeaker_resnet34(emb_ckpt)
                    ),
                    **kwargs,
                )
            seg = folder / "segmenter.npz"
            emb = folder / "embedder.npz"
            if seg.exists() and emb.exists():
                def load_npz(p):
                    data = np.load(p, allow_pickle=True)
                    return data["params"].item()

                return cls(
                    segmenter_params=apply_variant(load_npz(seg)),
                    embedder_params=apply_variant(load_npz(emb)),
                    **kwargs,
                )
            logging.error(f"no pyannote params in {model_folder}; using random init")
        return cls(**kwargs)

    # -- engine -------------------------------------------------------------

    def diarize(
        self,
        audio: Union[str, Path, np.ndarray],
        options: Optional[DiarizationOptions] = None,
        progress=None,
    ) -> DiarizationResult:
        options = options or DiarizationOptions()
        t_start = time.perf_counter()
        if isinstance(audio, (str, Path)):
            audio = load_audio(audio)
        audio = np.asarray(audio, np.float32)
        if options.clip_timestamps:
            s = int(options.clip_timestamps[0] * SAMPLE_RATE)
            e = (
                int(options.clip_timestamps[1] * SAMPLE_RATE)
                if len(options.clip_timestamps) > 1
                else len(audio)
            )
            audio = audio[s:e]

        sdims = self.config.segmenter_dims
        pyannet = self.segmenter_backend == "pyannet"
        chunk_samples = PYANNET_CHUNK_SAMPLES if pyannet else CHUNK_SAMPLES
        stride_s = (
            self.config.pyannet_stride_seconds if pyannet else self.config.stride_seconds
        )
        stride = int(stride_s * SAMPLE_RATE)
        chunk_starts = list(range(0, max(len(audio) - 1, 1), stride))
        # drop trailing strided chunks whose audio span is fully covered by
        # the previous chunk (they'd contribute only zero padding)
        chunk_starts = [
            c
            for c in chunk_starts
            if c == 0 or c - stride + chunk_samples < len(audio)
        ]

        chunks = np.stack(
            [
                _pad_to(audio[c : c + chunk_samples], chunk_samples)
                for c in chunk_starts
            ]
        )
        n_chunks = len(chunk_starts)
        self.timings.chunk_count = n_chunks

        # ---- segmenter (one batched call, dp-sharded when >1 device) ------
        t0 = time.perf_counter()
        plan = self._mesh()
        if plan is not None:
            chunks_dev, _ = self._shard_rows(plan, chunks)
        else:
            chunks_dev = jnp.asarray(chunks)
        if pyannet:
            from whisperkit_tpu.models.pyannet import (
                powerset_to_activity,
                pyannet_forward,
            )

            log_probs = pyannet_forward(self.segmenter_params, chunks_dev)
            activity = np.asarray(powerset_to_activity(log_probs))[:n_chunks]
            frames = activity.shape[1]
            n_slots = activity.shape[2]
        else:
            seg_out = segmenter_forward(self.segmenter_params, chunks_dev, sdims)
            activity = np.asarray(seg_out["speaker_activity"])[:n_chunks]
            frames = sdims.frames_per_chunk
            n_slots = sdims.n_local_speakers
        frame_sec = chunk_samples / SAMPLE_RATE / frames
        self.timings.segmenter_seconds = time.perf_counter() - t0
        if progress:
            progress(0.4)

        # ---- embedder (one batched call over (chunk, slot) pairs) ---------
        t0 = time.perf_counter()
        active = activity > options.min_activity_threshold  # [C, F, S]

        pairs = [
            (c, s)
            for c in range(n_chunks)
            for s in range(n_slots)
            if active[c, :, s].any()
        ]
        embeddings = np.zeros((0, self.config.embedder_dims.embedding_dim), np.float32)
        ratios: list[float] = []
        if pairs and self.embedder_backend == "resnet":
            from whisperkit_tpu.models.pyannet import wespeaker_embed_masked
            from whisperkit_tpu.ops.fbank import kaldi_fbank

            fbanks = np.asarray(
                kaldi_fbank(chunks_dev, mean_norm=False)
            )[:n_chunks]  # [C, F_fb, 80]; CMN over active frames in the embedder
            f_fb = fbanks.shape[1]
            fb = np.stack([fbanks[c] for c, _ in pairs])
            # map each 10 ms fbank frame onto the segmenter frame grid
            seg_idx = np.minimum(
                (np.arange(f_fb) * frames // f_fb), frames - 1
            )
            masks = np.stack(
                [activity[c, seg_idx, s] for c, s in pairs]
            ).astype(np.float32)
            if plan is not None:
                fb_dev, n_pairs = self._shard_rows(plan, fb)
                masks_dev, _ = self._shard_rows(plan, masks)
            else:
                fb_dev, masks_dev, n_pairs = jnp.asarray(fb), jnp.asarray(masks), len(pairs)
            emb = np.asarray(
                wespeaker_embed_masked(self.embedder_params, fb_dev, masks_dev)
            )[:n_pairs]
            embeddings = emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
            ratios = [float(active[c, :, s].mean()) for c, s in pairs]
        elif pairs:
            mel_frames = 3000  # 30 s of 10 ms mel frames
            fbanks = np.asarray(
                log_mel_spectrogram(
                    chunks_dev, n_mels=self.config.embedder_dims.n_mels
                )
            )[:n_chunks]  # [C, M, 3000]
            fb = np.stack([fbanks[c] for c, _ in pairs])
            # upsample activity to the mel frame grid for masking
            masks = np.stack(
                [
                    np.repeat(activity[c, :, s], mel_frames // frames)[:mel_frames]
                    for c, s in pairs
                ]
            ).astype(np.float32)
            if plan is not None:
                fb_dev, n_pairs = self._shard_rows(plan, fb)
                masks_dev, _ = self._shard_rows(plan, masks)
            else:
                fb_dev, masks_dev, n_pairs = jnp.asarray(fb), jnp.asarray(masks), len(pairs)
            embeddings = np.asarray(
                embedder_forward(
                    self.embedder_params,
                    fb_dev,
                    masks_dev,
                    self.config.embedder_dims,
                )
            )[:n_pairs]
            ratios = [float(active[c, :, s].mean()) for c, s in pairs]
        self.timings.embedder_seconds = time.perf_counter() - t0
        self.timings.embedding_count = len(pairs)
        if progress:
            progress(0.7)

        # ---- clustering ---------------------------------------------------
        t0 = time.perf_counter()
        cconf = dataclasses.replace(
            self.config.clustering,
            cluster_distance_threshold=(
                options.cluster_distance_threshold
                if options.cluster_distance_threshold is not None
                else self.config.clustering.cluster_distance_threshold
            ),
            min_cluster_size=options.min_cluster_size,
        )
        clusterer = VBxClusterer(cconf)
        for emb, ratio in zip(embeddings, ratios):
            clusterer.add(emb, ratio)
        labels = clusterer.cluster(options.number_of_speakers)
        self.timings.clustering_seconds = time.perf_counter() - t0
        if progress:
            progress(0.85)

        # ---- post-process: aggregate overlapped windows -------------------
        t0 = time.perf_counter()
        n_speakers = int(labels.max()) + 1 if len(labels) else 0
        total_frames = math.ceil(len(audio) / SAMPLE_RATE / frame_sec)
        counts = np.zeros((max(n_speakers, 1), total_frames), np.float32)
        weights = np.zeros(total_frames, np.float32)
        for (c, s), label in zip(pairs, labels):
            f0 = int(round(chunk_starts[c] / SAMPLE_RATE / frame_sec))
            span = min(frames, total_frames - f0)
            if span <= 0:
                continue
            counts[label, f0 : f0 + span] += activity[c, :span, s]
            weights[f0 : f0 + span] += 1.0
        weights = np.maximum(weights, 1.0)
        avg = counts / weights  # [K, total_frames]

        if options.use_exclusive_reconciliation:
            # exclusive top-1: a frame belongs to its strongest speaker only
            binary = np.zeros_like(avg, dtype=bool)
            any_active = avg.max(0) > options.min_activity_threshold
            top = avg.argmax(0)
            binary[top[any_active], np.nonzero(any_active)[0]] = True
        else:
            binary = avg > options.min_activity_threshold
        self.timings.post_process_seconds = time.perf_counter() - t0

        result = DiarizationResult.from_activity_matrix(
            binary, frame_sec, options.min_active_offset
        )
        self.timings.total_seconds = time.perf_counter() - t_start
        result.timings = dataclasses.asdict(self.timings)
        if progress:
            progress(1.0)
        return result

    # -- transcript merge (reference: SpeakerKit.generateRTTM + merge) ------

    @staticmethod
    def merge_with_transcript(
        diarization: DiarizationResult,
        transcription,
        strategy: SpeakerMergeStrategy = SpeakerMergeStrategy.SEGMENT,
    ):
        return diarization.add_speaker_info(transcription, strategy)


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if len(x) >= n:
        return x[:n]
    return np.concatenate([x, np.zeros(n - len(x), x.dtype)])
