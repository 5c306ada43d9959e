"""SpeakerKit: clustering math, result types, diarization pipeline.

Reference test model: Tests/SpeakerKitTests — ClusterAlgorithmsTests (21),
MathOps (18), DiarizationResult segment building (16), RTTM (10),
post-processing & exclusive reconciliation, embedder context math.
"""

import numpy as np
import pytest

from whisperkit_tpu.speaker.clustering import (
    SplitMix64,
    VBxClusterer,
    VBxClusteringConfig,
    cosine_distance_matrix,
    fast_linkage_cluster,
    kmeans,
    vbx_refine,
)
from whisperkit_tpu.speaker.results import (
    DiarizationResult,
    RTTMLine,
    SpeakerMergeStrategy,
    SpeakerSegment,
)


def _blobs(k=3, per=20, d=16, seed=0, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.concatenate(
        [c + spread * rng.standard_normal((per, d)) for c in centers]
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    labels = np.repeat(np.arange(k), per)
    return pts.astype(np.float32), labels


def _clustering_accuracy(pred, true):
    """Best-permutation agreement (label-invariant)."""
    from itertools import permutations

    k = int(max(pred.max(), true.max())) + 1
    best = 0.0
    for perm in permutations(range(k)):
        mapped = np.asarray([perm[p] for p in pred])
        best = max(best, (mapped == true).mean())
    return best


def test_cosine_distance_matrix():
    a = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    d = cosine_distance_matrix(a)
    assert d[0, 0] == pytest.approx(0.0, abs=1e-6)
    assert d[0, 1] == pytest.approx(1.0, abs=1e-6)


def test_splitmix64_deterministic():
    a = SplitMix64(42)
    b = SplitMix64(42)
    assert [a.next() for _ in range(5)] == [b.next() for _ in range(5)]
    assert 0.0 <= SplitMix64(7).uniform() < 1.0


def test_fast_linkage_separates_blobs():
    pts, true = _blobs()
    labels = fast_linkage_cluster(pts, threshold=0.5)
    assert labels.max() + 1 == 3
    assert _clustering_accuracy(labels, true) == 1.0


def test_kmeans_fixed_k():
    pts, true = _blobs()
    labels = kmeans(pts, 3, seed=1)
    assert set(labels.tolist()) == {0, 1, 2}
    assert _clustering_accuracy(labels, true) > 0.95


def test_kmeans_deterministic_with_seed():
    pts, _ = _blobs()
    assert (kmeans(pts, 3, seed=5) == kmeans(pts, 3, seed=5)).all()


def test_vbx_refine_improves_noisy_init():
    pts, true = _blobs(spread=0.08)
    rng = np.random.default_rng(3)
    noisy = true.copy()
    flip = rng.choice(len(noisy), size=8, replace=False)
    noisy[flip] = rng.integers(0, 3, size=8)
    refined = vbx_refine(pts, noisy, VBxClusteringConfig(max_iterations=10))
    assert _clustering_accuracy(refined, true) >= _clustering_accuracy(noisy, true)


def test_vbx_clusterer_end_to_end():
    pts, true = _blobs()
    c = VBxClusterer()
    for p in pts:
        c.add(p)
    labels = c.cluster()
    assert labels.shape == true.shape
    assert labels.max() + 1 == 3


def test_vbx_clusterer_fixed_speakers_uses_kmeans():
    pts, _ = _blobs()
    c = VBxClusterer()
    for p in pts:
        c.add(p)
    labels = c.cluster(num_speakers=2)
    assert labels.max() + 1 == 2


# -- results ----------------------------------------------------------------


def test_activity_matrix_to_segments_with_gap_merge():
    act = np.zeros((2, 100), bool)
    act[0, 10:20] = True
    act[0, 22:30] = True  # small gap -> merged (gap 0.2s < 1.0s)
    act[1, 50:80] = True
    res = DiarizationResult.from_activity_matrix(act, frame_seconds=0.1)
    spk0 = [s for s in res.segments if s.speaker_id == 0]
    assert len(spk0) == 1
    assert spk0[0].start == pytest.approx(1.0)
    assert spk0[0].end == pytest.approx(3.0)
    assert res.speaker_at(5.5, 6.0) == 1


def test_rttm_output():
    res = DiarizationResult(
        segments=[SpeakerSegment(0, 0.0, 2.0), SpeakerSegment(1, 2.0, 4.5)],
        num_speakers=2,
    )
    rttm = res.to_rttm("meeting")
    lines = rttm.strip().splitlines()
    assert lines[0] == "SPEAKER meeting 1 0.000 2.000 <NA> <NA> SPEAKER_00 <NA> <NA>"
    assert "SPEAKER_01" in lines[1]


def test_add_speaker_info_segment_strategy():
    from whisperkit_tpu.core.results import TranscriptionResult, TranscriptionSegment

    dia = DiarizationResult(
        segments=[SpeakerSegment(0, 0.0, 5.0), SpeakerSegment(1, 5.0, 10.0)],
        num_speakers=2,
    )
    tr = TranscriptionResult(
        segments=[
            TranscriptionSegment(id=0, start=1.0, end=4.0, text=" hi"),
            TranscriptionSegment(id=1, start=6.0, end=9.0, text=" yo"),
        ]
    )
    merged = dia.add_speaker_info(tr, SpeakerMergeStrategy.SEGMENT)
    assert merged.segments[0].speaker == "SPEAKER_00"
    assert merged.segments[1].speaker == "SPEAKER_01"


# -- pipeline ---------------------------------------------------------------


def test_diarize_pipeline_end_to_end():
    jax = pytest.importorskip("jax")
    from whisperkit_tpu.models.pyannote import EmbedderDims, SegmenterDims
    from whisperkit_tpu.pipelines.diarize import (
        DiarizationOptions,
        DiarizePipeline,
        PyannoteConfig,
    )

    cfg = PyannoteConfig(
        segmenter_dims=SegmenterDims(conv_channels=8, lstm_hidden=8),
        embedder_dims=EmbedderDims(channels=(4, 8), embedding_dim=16),
    )
    pipe = DiarizePipeline(cfg)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 45) * 0.3).astype(np.float32)
    progress_values = []
    res = pipe.diarize(
        audio,
        DiarizationOptions(min_activity_threshold=0.3),
        progress=progress_values.append,
    )
    assert res.num_speakers >= 1
    assert all(s.end > s.start for s in res.segments)
    assert progress_values[-1] == 1.0
    assert pipe.timings.chunk_count >= 2  # 45 s -> at least 2 strided chunks
    rttm = res.to_rttm()
    assert rttm == "" or rttm.startswith("SPEAKER")


def test_diarizer_hears_the_audio():
    """Content-sensitivity guard (sibling of test_windows_hear_the_audio
    after the r4 silent-mel bug): the segmenter's activity output must
    differ between noise and silence — no windowing helper may silently
    feed the model empty audio."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from whisperkit_tpu.models.pyannote import (
        SegmenterDims,
        init_segmenter,
        segmenter_forward,
    )

    dims = SegmenterDims(conv_channels=8, lstm_hidden=8)
    params = init_segmenter(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(3)
    noise = (rng.standard_normal((1, 480_000)) * 0.3).astype(np.float32)
    silence = np.zeros((1, 480_000), np.float32)
    a = segmenter_forward(params, jnp.asarray(noise), dims)["speaker_activity"]
    b = segmenter_forward(params, jnp.asarray(silence), dims)["speaker_activity"]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_kmeans_empty_cluster_repair():
    """k larger than the natural cluster count must not yield NaN centroids
    or phantom assignments."""
    pts, _ = _blobs(k=2, per=15)
    labels = kmeans(pts, 3, seed=9)
    assert not np.isnan(pts[labels].sum())
    assert labels.min() >= 0 and labels.max() <= 2
    # every returned label id is non-empty
    for j in np.unique(labels):
        assert (labels == j).sum() >= 1


def test_clusterer_fixed_k_exceeds_natural_clusters():
    pts, _ = _blobs(k=2, per=15)
    c = VBxClusterer()
    for i, p in enumerate(pts):
        # mark a few embeddings low-activity to exercise re-assignment
        c.add(p, active_ratio=0.01 if i % 7 == 0 else 1.0)
    labels = c.cluster(num_speakers=3)
    assert len(labels) == len(pts)
    assert not np.isnan(labels).any()
