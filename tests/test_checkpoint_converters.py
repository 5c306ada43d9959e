"""Torch-parity tests for the pyannote/WeSpeaker checkpoint converters.

Model: the reference loads real pre-trained segmenter/embedder checkpoints
(PyannoteModelManager.swift:63-147). No network here, so the tests build
torch modules with EXACTLY the published state-dict naming/shapes
(pyannote/segmentation-3.0 PyanNet; wespeaker ResNet34), randomly
initialize them, and require the converted JAX forward to match torch
layer-for-layer — same technique tests/test_whisper_model.py uses for
Whisper.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from whisperkit_tpu.models.pyannet import (  # noqa: E402
    convert_pyannote_segmentation,
    convert_wespeaker_resnet34,
    powerset_to_activity,
    pyannet_forward,
    sinc_filters,
    wespeaker_resnet_forward,
)


# ---------------------------------------------------------------------------
# PyanNet (pyannote/segmentation-3.0 layout)
# ---------------------------------------------------------------------------


class _TorchSincNet(nn.Module):
    """SincNet block with the published parameter names; the sinc conv runs
    with filters materialized by our `sinc_filters` (the torch side has no
    independent published implementation available offline, and the filter
    math itself is property-tested separately)."""

    def __init__(self):
        super().__init__()
        self.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
        self.conv1d = nn.ModuleList(
            [
                _ParamSinc(),
                nn.Conv1d(80, 60, 5),
                nn.Conv1d(60, 60, 5),
            ]
        )
        self.pool1d = nn.ModuleList([nn.MaxPool1d(3) for _ in range(3)])
        self.norm1d = nn.ModuleList(
            [
                nn.InstanceNorm1d(80, affine=True),
                nn.InstanceNorm1d(60, affine=True),
                nn.InstanceNorm1d(60, affine=True),
            ]
        )

    def forward(self, x):
        x = self.wav_norm1d(x)
        for c, (conv, pool, norm) in enumerate(
            zip(self.conv1d, self.pool1d, self.norm1d)
        ):
            x = conv(x)
            if c == 0:
                x = torch.abs(x)
            x = F.leaky_relu(norm(pool(x)))
        return x


class _ParamSinc(nn.Module):
    def __init__(self, n_filters=80, kernel_size=251, stride=10):
        super().__init__()
        self.stride = stride
        self.filterbank = nn.Module()
        self.filterbank.low_hz_ = nn.Parameter(
            torch.rand(n_filters, 1) * 3000 + 30
        )
        self.filterbank.band_hz_ = nn.Parameter(
            torch.rand(n_filters, 1) * 400 + 30
        )

    def forward(self, x):
        filt = torch.from_numpy(
            sinc_filters(
                self.filterbank.low_hz_.detach().numpy(),
                self.filterbank.band_hz_.detach().numpy(),
            )
        )
        return F.conv1d(x, filt, stride=self.stride)


class _TorchPyanNet(nn.Module):
    def __init__(self, n_lstm=4, hidden=128):
        super().__init__()
        self.sincnet = _TorchSincNet()
        self.lstm = nn.LSTM(
            60, hidden, num_layers=n_lstm, bidirectional=True, batch_first=True
        )
        self.linear = nn.ModuleList(
            [nn.Linear(2 * hidden, 128), nn.Linear(128, 128)]
        )
        self.classifier = nn.Linear(128, 7)

    def forward(self, x):
        x = self.sincnet(x[:, None, :])
        x, _ = self.lstm(x.permute(0, 2, 1))
        for lin in self.linear:
            x = F.leaky_relu(lin(x))
        return F.log_softmax(self.classifier(x), dim=-1)


def test_pyannet_converter_torch_parity():
    torch.manual_seed(0)
    model = _TorchPyanNet().eval()
    audio = np.random.RandomState(0).randn(2, 16000 * 2).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(audio)).numpy()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # the converter expects the published "linear.{i}" (not ModuleList-with-
    # dots mismatch): nn.ModuleList already yields linear.0.weight etc.
    params = convert_pyannote_segmentation(sd)
    got = np.asarray(pyannet_forward(params, jnp.asarray(audio)))
    assert got.shape == want.shape  # [2, F, 7]
    np.testing.assert_allclose(got, want, atol=2e-4)
    # the pipeline's closed-form frame count must match the real forward
    from whisperkit_tpu.pipelines.diarize import _pyannet_frames

    assert got.shape[1] == _pyannet_frames(audio.shape[1])


def test_pyannet_linear_layer_width_follows_checkpoint():
    torch.manual_seed(1)
    model = _TorchPyanNet(n_lstm=2).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_pyannote_segmentation(sd)
    assert len(params["lstms"]) == 2
    assert len(params["linears"]) == 2


def test_sinc_filters_are_bandpass():
    rng = np.random.RandomState(0)
    low = rng.rand(8, 1) * 2000 + 100
    band = rng.rand(8, 1) * 500 + 100
    filt = sinc_filters(low, band)[:, 0, :]  # [8, 251]
    assert filt.shape == (8, 251)
    # symmetric (linear phase)
    np.testing.assert_allclose(filt, filt[:, ::-1], atol=1e-6)
    # near-zero DC response (band-pass, doesn't pass constants)
    dc = np.abs(filt.sum(1))
    peak = np.abs(np.fft.rfft(filt, axis=1)).max(1)
    assert (dc < 0.05 * peak).all()
    # frequency response peaks inside the designed band
    freqs = np.fft.rfftfreq(251, d=1 / 16000)
    resp = np.abs(np.fft.rfft(filt, axis=1))
    peak_hz = freqs[resp.argmax(1)]
    lo = 50 + np.abs(low[:, 0])
    hi = np.clip(lo + 50 + np.abs(band[:, 0]), 50, 8000)
    assert ((peak_hz >= lo - 200) & (peak_hz <= hi + 200)).all()


def test_powerset_to_activity():
    lp = np.full((1, 3, 7), -10.0, np.float32)
    lp[0, 0, 0] = 0.0  # silence
    lp[0, 1, 2] = 0.0  # speaker 1
    lp[0, 2, 4] = 0.0  # speakers 0+1
    act = np.asarray(powerset_to_activity(jnp.asarray(lp)))
    np.testing.assert_array_equal(
        act[0], [[0, 0, 0], [0, 1, 0], [1, 1, 0]]
    )


# ---------------------------------------------------------------------------
# WeSpeaker ResNet34
# ---------------------------------------------------------------------------


class _TorchBasicBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or in_planes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(out + sc)


class _TorchWeSpeakerResNet(nn.Module):
    """wespeaker resnet.py naming (conv1/bn1, layer1..4, seg_1)."""

    def __init__(self, m_channels=8, blocks=(2, 2, 2, 2), n_mels=24, emb=32):
        super().__init__()
        self.conv1 = nn.Conv2d(1, m_channels, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)
        chans = [m_channels, 2 * m_channels, 4 * m_channels, 8 * m_channels]
        layers = []
        in_c = m_channels
        for li, (c, n) in enumerate(zip(chans, blocks)):
            stride = 1 if li == 0 else 2
            seq = [_TorchBasicBlock(in_c, c, stride)]
            seq += [_TorchBasicBlock(c, c) for _ in range(n - 1)]
            layers.append(nn.Sequential(*seq))
            in_c = c
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        freq_out = n_mels // 8
        self.seg_1 = nn.Linear(chans[-1] * freq_out * 2, emb)

    def forward(self, x):  # x [B, T, n_mels]
        x = x.permute(0, 2, 1).unsqueeze(1)
        x = F.relu(self.bn1(self.conv1(x)))
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        b, c, h, t = x.shape
        feat = x.reshape(b, c * h, t)
        mean = feat.mean(-1)
        std = torch.sqrt(torch.clamp(feat.var(-1, unbiased=False), min=1e-7))
        return self.seg_1(torch.cat([mean, std], dim=-1))


def _randomize_bn_stats(model, seed):
    rng = np.random.RandomState(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.from_numpy(rng.randn(m.num_features).astype(np.float32))
            )
            m.running_var.copy_(
                torch.from_numpy(
                    (rng.rand(m.num_features) * 2 + 0.5).astype(np.float32)
                )
            )
            m.weight.data.copy_(
                torch.from_numpy(rng.randn(m.num_features).astype(np.float32))
            )
            m.bias.data.copy_(
                torch.from_numpy(rng.randn(m.num_features).astype(np.float32))
            )


def test_wespeaker_converter_torch_parity():
    """Small-config ResNet (same topology, BN folding exercised with
    non-trivial running stats) must match torch eval-mode output."""
    torch.manual_seed(0)
    model = _TorchWeSpeakerResNet().eval()
    with torch.no_grad():
        _randomize_bn_stats(model, 7)
    fbank = np.random.RandomState(1).randn(3, 64, 24).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(fbank)).numpy()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    from whisperkit_tpu.models import pyannet as pn

    blocks = {"layer1": 2, "layer2": 2, "layer3": 2, "layer4": 2}
    orig = pn.RESNET34_BLOCKS
    pn.RESNET34_BLOCKS = blocks
    try:
        params = convert_wespeaker_resnet34(sd)
    finally:
        pn.RESNET34_BLOCKS = orig
    got = np.asarray(wespeaker_resnet_forward(params, jnp.asarray(fbank)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_wespeaker_converter_full_resnet34_shapes():
    """Full-size ResNet34 state dict converts and runs with the published
    80-mel/256-dim geometry."""
    torch.manual_seed(0)
    model = _TorchWeSpeakerResNet(
        m_channels=32, blocks=(3, 4, 6, 3), n_mels=80, emb=256
    ).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_wespeaker_resnet34(sd)
    fbank = jnp.zeros((1, 200, 80), jnp.float32)
    emb = wespeaker_resnet_forward(params, fbank)
    assert emb.shape == (1, 256)


# ---------------------------------------------------------------------------
# Kaldi fbank + masked embedding + full pyannet-backend pipeline
# ---------------------------------------------------------------------------


def test_kaldi_fbank_properties():
    from whisperkit_tpu.ops.fbank import kaldi_fbank

    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t)[None, :] * 0.5
    fb = np.asarray(kaldi_fbank(jnp.asarray(tone), mean_norm=False))
    assert fb.shape == (1, 1 + (sr - 400) // 160, 80)
    assert np.isfinite(fb).all()
    # energy concentrates at the mel bin of 1 kHz: compare against a 3 kHz tone
    tone3 = np.sin(2 * np.pi * 3000.0 * t)[None, :] * 0.5
    fb3 = np.asarray(kaldi_fbank(jnp.asarray(tone3), mean_norm=False))
    assert fb.mean(1).argmax() < fb3.mean(1).argmax()  # higher freq → higher bin
    # mean_norm subtracts the per-utterance mean
    fbn = np.asarray(kaldi_fbank(jnp.asarray(tone), mean_norm=True))
    np.testing.assert_allclose(fbn.mean(1), 0.0, atol=1e-4)


def test_wespeaker_masked_embedding_selects_frames():
    """Masked embedding must depend only on the ACTIVE frames: compacted
    masking ≈ cropping (same frames, same stats)."""
    from whisperkit_tpu.models.pyannet import (
        convert_wespeaker_resnet34,
        wespeaker_embed_masked,
    )
    from whisperkit_tpu.models import pyannet as pn

    torch.manual_seed(0)
    model = _TorchWeSpeakerResNet().eval()
    with torch.no_grad():
        _randomize_bn_stats(model, 3)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    orig = pn.RESNET34_BLOCKS
    pn.RESNET34_BLOCKS = {"layer1": 2, "layer2": 2, "layer3": 2, "layer4": 2}
    try:
        params = convert_wespeaker_resnet34(sd)
    finally:
        pn.RESNET34_BLOCKS = orig

    rng = np.random.RandomState(0)
    fb = rng.randn(1, 64, 24).astype(np.float32)
    # speaker active only in the first 32 frames
    mask = np.zeros((1, 64), np.float32)
    mask[0, :32] = 1.0
    e_masked = np.asarray(wespeaker_embed_masked(params, jnp.asarray(fb), jnp.asarray(mask)))
    # corrupt the INACTIVE frames: embedding must not change
    fb2 = fb.copy()
    fb2[0, 32:] += 100.0
    e_masked2 = np.asarray(wespeaker_embed_masked(params, jnp.asarray(fb2), jnp.asarray(mask)))
    np.testing.assert_allclose(e_masked, e_masked2, atol=1e-4)


def test_pyannote_variant_matrix(tmp_path):
    """Variant resolution (reference: PyannoteConfig.swift:11-41 W8A16/
    W32A32 ModelInfos): w8a16 quantizes the converted checkpoints and the
    quantized segmenter tracks fp32 within int8 tolerance."""
    from whisperkit_tpu.pipelines.diarize import DiarizePipeline

    torch.manual_seed(2)
    seg_model = _TorchPyanNet().eval()
    torch.save(
        {"state_dict": {"model." + k: v for k, v in seg_model.state_dict().items()}},
        tmp_path / "segmentation-3.0.ckpt",
    )
    emb_model = _TorchWeSpeakerResNet(
        m_channels=8, blocks=(2, 2, 2, 2), n_mels=80, emb=64
    ).eval()
    torch.save(emb_model.state_dict(), tmp_path / "wespeaker-resnet34.bin")

    from whisperkit_tpu.models import pyannet as pn

    orig = pn.RESNET34_BLOCKS
    pn.RESNET34_BLOCKS = {"layer1": 2, "layer2": 2, "layer3": 2, "layer4": 2}
    try:
        with pytest.raises(ValueError, match="unknown pyannote variant"):
            DiarizePipeline.from_pretrained(str(tmp_path), variant="w4a4")
        full = DiarizePipeline.from_pretrained(str(tmp_path), variant="w32a32")
        q = DiarizePipeline.from_pretrained(str(tmp_path), variant="w8a16")
        # quantization actually happened on the big weights
        assert "w_q" in q.segmenter_params["lstms"][0]["fwd"]["wx"]
        assert "w_q" in q.embedder_params["seg_1"]["w"]
        audio = jnp.asarray(
            np.random.RandomState(0).randn(1, 16000).astype(np.float32) * 0.1
        )
        lp_full = np.asarray(pn.pyannet_forward(full.segmenter_params, audio))
        lp_q = np.asarray(pn.pyannet_forward(q.segmenter_params, audio))
        assert lp_full.shape == lp_q.shape
        # int8 weights shift log-probs slightly; the argmax class map must
        # agree on the overwhelming majority of frames
        agree = (lp_full.argmax(-1) == lp_q.argmax(-1)).mean()
        assert agree > 0.95, agree
    finally:
        pn.RESNET34_BLOCKS = orig


def test_diarize_pipeline_pyannet_backend_end_to_end(tmp_path):
    """Real converted checkpoints drive the full diarization pipeline:
    torch PyanNet + WeSpeaker ResNet saved to disk → from_pretrained
    detects/converts them → diarize() produces sane segments."""
    from whisperkit_tpu.pipelines.diarize import DiarizationOptions, DiarizePipeline

    torch.manual_seed(1)
    seg_model = _TorchPyanNet().eval()
    torch.save(
        {"state_dict": {"model." + k: v for k, v in seg_model.state_dict().items()}},
        tmp_path / "segmentation-3.0.ckpt",
    )
    emb_model = _TorchWeSpeakerResNet(
        m_channels=8, blocks=(2, 2, 2, 2), n_mels=80, emb=64
    ).eval()
    with torch.no_grad():
        _randomize_bn_stats(emb_model, 5)
    torch.save(emb_model.state_dict(), tmp_path / "wespeaker-resnet34.bin")

    from whisperkit_tpu.models import pyannet as pn

    orig = pn.RESNET34_BLOCKS
    pn.RESNET34_BLOCKS = {"layer1": 2, "layer2": 2, "layer3": 2, "layer4": 2}
    try:
        pipe = DiarizePipeline.from_pretrained(str(tmp_path))
        assert pipe.segmenter_backend == "pyannet"
        assert pipe.embedder_backend == "resnet"
        rng = np.random.RandomState(0)
        audio = (rng.randn(16000 * 12) * 0.1).astype(np.float32)
        result = pipe.diarize(audio, DiarizationOptions(min_active_offset=0.2))
        assert pipe.timings.chunk_count >= 1
        for seg in result.segments:
            assert 0.0 <= seg.start <= seg.end <= 12.5
    finally:
        pn.RESNET34_BLOCKS = orig
