"""Real PyanNet segmenter + WeSpeaker ResNet34 embedder with checkpoint
converters (VERDICT r1 #4).

Reference: Sources/SpeakerKit/Pyannote/PyannoteModelManager.swift:63-147
loads real pre-compiled segmenter/embedder models (variants
PyannoteConfig.swift:11-41). The TPU build's fast conv1d architectures
(models/pyannote.py) remain the default for random-init runs; THESE modules
re-implement the published architectures exactly so public torch
checkpoints convert and produce identical outputs:

  * PyanNet (pyannote/segmentation-3.0): SincNet frontend (ParamSincFB
    251-tap filterbank materialized to a plain conv at conversion time,
    stride 10, 3×(pool3 + InstanceNorm + leaky_relu)), 4-layer monolithic
    BiLSTM(128), 2×Linear(128)+leaky_relu, classifier → log-softmax over
    the 7 powerset classes (≤3 speakers, ≤2 simultaneous).
  * WeSpeaker ResNet34 (wespeaker-voxceleb-resnet34-LM): fbank [B,T,80] →
    1-channel 2D ResNet34 (BatchNorm folded into convs at conversion —
    inference-only), temporal statistics pooling, linear → 256-d embedding.

Converters take torch-style state dicts (name → numpy array) keyed by the
published checkpoint names (`sincnet.conv1d.0.filterbank.low_hz_`,
`lstm.weight_ih_l0`, `layer1.0.conv1.weight`, ...).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any

SAMPLE_RATE = 16_000

# powerset classes of pyannote/segmentation-3.0: ≤3 speakers, ≤2 active
POWERSET_CLASSES: tuple[tuple[int, ...], ...] = (
    (), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2),
)


# ---------------------------------------------------------------------------
# SincNet filterbank materialization
# ---------------------------------------------------------------------------


def sinc_filters(
    low_hz: np.ndarray,  # [F, 1] learned
    band_hz: np.ndarray,  # [F, 1] learned
    kernel_size: int = 251,
    sample_rate: int = SAMPLE_RATE,
    min_low_hz: float = 50.0,
    min_band_hz: float = 50.0,
) -> np.ndarray:
    """Materialize the parametric sinc band-pass filterbank → [F, 1, K].

    Published SincNet/ParamSincFB construction (Ravanelli & Bengio 2018;
    asteroid_filterbanks ParamSincFB, used by pyannote's SincNet block):
    Hamming-windowed difference of sincs with per-filter learned (low, band).
    Computed once at conversion time, so the TPU runtime sees a plain conv.
    """
    low = min_low_hz + np.abs(low_hz)  # [F, 1]
    high = np.clip(
        low + min_band_hz + np.abs(band_hz), min_low_hz, sample_rate / 2
    )
    band = (high - low)[:, 0]  # [F]

    half = kernel_size // 2
    # published construction: linspace(0, K/2 - 1, K//2) — for odd K the
    # endpoint is fractional (124.5 for K=251), NOT half-1. The torch-parity
    # test shares this function on both sides, so it can't cross-check this
    # constant; it is pinned against asteroid_filterbanks ParamSincFB here.
    n_lin = np.linspace(0, kernel_size / 2 - 1, half)
    window = 0.54 - 0.46 * np.cos(2 * np.pi * n_lin / kernel_size)  # [K//2]
    n_ = 2 * np.pi * np.arange(-half, 0)[None, :] / sample_rate  # [1, K//2]

    f_low = low * n_  # [F, K//2]
    f_high = high * n_
    left = ((np.sin(f_high) - np.sin(f_low)) / (n_ / 2)) * window[None, :]
    center = 2 * band[:, None]
    right = left[:, ::-1]
    filters = np.concatenate([left, center, right], axis=1)  # [F, K]
    filters = filters / (2 * band[:, None])
    return filters[:, None, :].astype(np.float32)  # [F, 1, K]


# ---------------------------------------------------------------------------
# PyanNet forward
# ---------------------------------------------------------------------------


def _instance_norm(x: jnp.ndarray, g, b, eps=1e-5):
    """x [B, C, T]: normalize per (instance, channel) over time."""
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * g[None, :, None] + b[None, :, None]


def _max_pool1d(x: jnp.ndarray, k: int):
    """x [B, C, T] → [B, C, T//k] (torch MaxPool1d(k): floor, no padding)."""
    t = (x.shape[-1] // k) * k
    return x[..., :t].reshape(*x.shape[:-1], t // k, k).max(-1)


def _w(w, dtype=None):
    """Resolve a weight leaf, dequantizing W8A16 dicts ({"w_q" int8,
    "scale"}) — the reference ships W8A16/W32A32 pyannote variants
    (PyannoteConfig.swift:11-41); ours come from
    ops/quant.quantize_speaker_params."""
    if isinstance(w, dict) and "w_q" in w:
        d = dtype or w["scale"].dtype
        return w["w_q"].astype(d) * w["scale"].astype(d)
    return w if dtype is None else w.astype(dtype)


def _conv1d_valid(x, w, b=None, stride=1):
    """x [B, C, T], w [O, I, K], VALID padding (torch default padding=0)."""
    y = jax.lax.conv_general_dilated(
        x, _w(w, x.dtype), (stride,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def _lstm_dir(x, wx, wh, b):
    """Single-direction LSTM, torch gate order (i, f, g, o).

    x [B, T, D] → [B, T, H]. wx [D, 4H] (pre-transposed), wh [H, 4H], b [4H].
    """
    bsz, _, _ = x.shape
    wx, wh = _w(wx, x.dtype), _w(wh, x.dtype)  # dequant once, outside the scan
    h = wh.shape[0]
    xw = jnp.einsum("btd,dg->btg", x, wx) + b

    def cell(carry, xt):
        hprev, cprev = carry
        gates = xt + hprev @ wh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * cprev + jax.nn.sigmoid(i) * jnp.tanh(g)
        hnew = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (hnew, c), hnew

    init = (jnp.zeros((bsz, h), x.dtype), jnp.zeros((bsz, h), x.dtype))
    _, ys = jax.lax.scan(cell, init, xw.transpose(1, 0, 2))
    return ys.transpose(1, 0, 2)


def _bilstm_layer(x, lp):
    fwd = _lstm_dir(x, lp["fwd"]["wx"], lp["fwd"]["wh"], lp["fwd"]["b"])
    bwd = _lstm_dir(
        x[:, ::-1], lp["bwd"]["wx"], lp["bwd"]["wh"], lp["bwd"]["b"]
    )[:, ::-1]
    return jnp.concatenate([fwd, bwd], axis=-1)


@jax.jit
def pyannet_forward(params: PyTree, audio: jnp.ndarray) -> jnp.ndarray:
    """audio [B, T] (10 s windows in the published model) → log-softmax
    powerset probabilities [B, F, 7].

    Frame grid: conv stride 10 then 3× pool 3 → 270 samples/frame
    (~589 frames per 10 s window).
    """
    x = audio[:, None, :]  # [B, 1, T]
    x = _instance_norm(x, params["wav_norm"]["g"], params["wav_norm"]["b"])

    # block 0: materialized sinc filterbank (no bias) + |.| + pool + IN
    x = _conv1d_valid(x, params["sinc"]["w"], stride=10)
    x = jnp.abs(x)
    x = _max_pool1d(x, 3)
    x = jax.nn.leaky_relu(
        _instance_norm(x, params["norm0"]["g"], params["norm0"]["b"]), 0.01
    )
    for conv, norm in (("conv1", "norm1"), ("conv2", "norm2")):
        x = _conv1d_valid(x, params[conv]["w"], params[conv]["b"])
        x = _max_pool1d(x, 3)
        x = jax.nn.leaky_relu(
            _instance_norm(x, params[norm]["g"], params[norm]["b"]), 0.01
        )

    x = x.transpose(0, 2, 1)  # [B, F, 60]
    for lp in params["lstms"]:
        x = _bilstm_layer(x, lp)
    for lin in params["linears"]:
        x = jax.nn.leaky_relu(x @ _w(lin["w"], x.dtype) + lin["b"], 0.01)
    logits = x @ _w(params["cls"]["w"], x.dtype) + params["cls"]["b"]  # [B, F, 7]
    return jax.nn.log_softmax(logits, axis=-1)


def powerset_to_activity(log_probs: jnp.ndarray) -> jnp.ndarray:
    """[B, F, 7] powerset log-probs → [B, F, 3] hard per-speaker activity."""
    mapping = np.zeros((len(POWERSET_CLASSES), 3), np.float32)
    for ci, members in enumerate(POWERSET_CLASSES):
        for m in members:
            mapping[ci, m] = 1.0
    best = jnp.argmax(log_probs, axis=-1)  # [B, F]
    return jnp.asarray(mapping)[best]


def convert_pyannote_segmentation(state_dict: Mapping[str, np.ndarray]) -> PyTree:
    """Name-map a pyannote/segmentation-3.0 PyanNet state dict.

    Published key layout (pyannote.audio PyanNet + SincNet blocks):
      sincnet.wav_norm1d.{weight,bias}
      sincnet.conv1d.0.filterbank.{low_hz_,band_hz_}
      sincnet.conv1d.{1,2}.{weight,bias}
      sincnet.norm1d.{0,1,2}.{weight,bias}
      lstm.{weight_ih_l{k},weight_hh_l{k},bias_ih_l{k},bias_hh_l{k}}[ _reverse]
      linear.{0,1}.{weight,bias}
      classifier.{weight,bias}
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def lstm_dir(layer: int, reverse: bool):
        sfx = f"l{layer}" + ("_reverse" if reverse else "")
        return {
            "wx": jnp.asarray(sd[f"lstm.weight_ih_{sfx}"].T),
            "wh": jnp.asarray(sd[f"lstm.weight_hh_{sfx}"].T),
            "b": jnp.asarray(
                sd[f"lstm.bias_ih_{sfx}"] + sd[f"lstm.bias_hh_{sfx}"]
            ),
        }

    n_lstm = max(
        int(k.split("_l")[-1].replace("_reverse", ""))
        for k in sd
        if k.startswith("lstm.weight_ih_l")
    ) + 1
    n_linear = len({k for k in sd if k.startswith("linear.")}) // 2

    return {
        "wav_norm": {
            "g": jnp.asarray(sd["sincnet.wav_norm1d.weight"]),
            "b": jnp.asarray(sd["sincnet.wav_norm1d.bias"]),
        },
        "sinc": {
            "w": jnp.asarray(
                sinc_filters(
                    sd["sincnet.conv1d.0.filterbank.low_hz_"],
                    sd["sincnet.conv1d.0.filterbank.band_hz_"],
                )
            )
        },
        "norm0": {
            "g": jnp.asarray(sd["sincnet.norm1d.0.weight"]),
            "b": jnp.asarray(sd["sincnet.norm1d.0.bias"]),
        },
        "conv1": {
            "w": jnp.asarray(sd["sincnet.conv1d.1.weight"]),
            "b": jnp.asarray(sd["sincnet.conv1d.1.bias"]),
        },
        "norm1": {
            "g": jnp.asarray(sd["sincnet.norm1d.1.weight"]),
            "b": jnp.asarray(sd["sincnet.norm1d.1.bias"]),
        },
        "conv2": {
            "w": jnp.asarray(sd["sincnet.conv1d.2.weight"]),
            "b": jnp.asarray(sd["sincnet.conv1d.2.bias"]),
        },
        "norm2": {
            "g": jnp.asarray(sd["sincnet.norm1d.2.weight"]),
            "b": jnp.asarray(sd["sincnet.norm1d.2.bias"]),
        },
        "lstms": [
            {"fwd": lstm_dir(i, False), "bwd": lstm_dir(i, True)}
            for i in range(n_lstm)
        ],
        "linears": [
            {
                "w": jnp.asarray(sd[f"linear.{i}.weight"].T),
                "b": jnp.asarray(sd[f"linear.{i}.bias"]),
            }
            for i in range(n_linear)
        ],
        "cls": {
            "w": jnp.asarray(sd["classifier.weight"].T),
            "b": jnp.asarray(sd["classifier.bias"]),
        },
    }


# ---------------------------------------------------------------------------
# WeSpeaker ResNet34 embedder
# ---------------------------------------------------------------------------


def _conv2d_same(x, w, b=None, stride=1):
    """x [B, C, H, W], w [O, I, kh, kw], torch padding=1 for 3×3 / 0 for 1×1."""
    w = _w(w, x.dtype)
    kh, kw = w.shape[2], w.shape[3]
    pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def _basic_block(x, bp):
    # ResNet34 structure: a downsample branch exists exactly on the stride-2
    # blocks, so the (static) stride is derivable from the pytree shape.
    stride = 2 if "down" in bp else 1
    out = jax.nn.relu(_conv2d_same(x, bp["conv1"]["w"], bp["conv1"]["b"], stride))
    out = _conv2d_same(out, bp["conv2"]["w"], bp["conv2"]["b"], 1)
    sc = x
    if "down" in bp:
        sc = _conv2d_same(x, bp["down"]["w"], bp["down"]["b"], stride)
    return jax.nn.relu(out + sc)


@jax.jit
def wespeaker_resnet_forward(params: PyTree, fbank: jnp.ndarray) -> jnp.ndarray:
    """fbank [B, T, n_mels] (mean-normalized, per WeSpeaker convention) →
    L2-normalizable embedding [B, 256].

    BatchNorms are folded into the convs at conversion (inference-only), so
    each block is conv→relu→conv→(+shortcut)→relu.
    """
    x = fbank.transpose(0, 2, 1)[:, None]  # [B, 1, n_mels, T]
    x = jax.nn.relu(_conv2d_same(x, params["conv1"]["w"], params["conv1"]["b"], 1))
    for layer in ("layer1", "layer2", "layer3", "layer4"):
        for bp in params[layer]:
            x = _basic_block(x, bp)
    b, c, h, t = x.shape
    feat = x.reshape(b, c * h, t)
    mean = feat.mean(-1)
    std = jnp.sqrt(jnp.clip(((feat - mean[..., None]) ** 2).mean(-1), 1e-7))
    stats = jnp.concatenate([mean, std], axis=-1)  # [B, 2*C*H]
    return stats @ _w(params["seg_1"]["w"], stats.dtype) + params["seg_1"]["b"]


def _fold_bn(conv_w, conv_b, bn_w, bn_b, bn_mean, bn_var, eps=1e-5):
    """Fold an eval-mode BatchNorm into the preceding conv (inference-only)."""
    scale = bn_w / np.sqrt(bn_var + eps)  # [O]
    w = conv_w * scale[:, None, None, None]
    b = (0.0 if conv_b is None else conv_b) * scale + bn_b - bn_mean * scale
    return jnp.asarray(w), jnp.asarray(b)


RESNET34_BLOCKS = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}


def convert_wespeaker_resnet34(
    state_dict: Mapping[str, np.ndarray], prefix: str = ""
) -> PyTree:
    """Name-map a WeSpeaker ResNet34 state dict (wespeaker resnet.py naming:
    conv1/bn1, layer{1..4}.{i}.{conv1,bn1,conv2,bn2,downsample.{0,1}},
    seg_1), folding eval-mode BatchNorms into the convs."""
    sd = {
        k[len(prefix):]: np.asarray(v)
        for k, v in state_dict.items()
        if k.startswith(prefix)
    }

    def fold(conv_key, bn_key):
        return _fold_bn(
            sd[f"{conv_key}.weight"],
            sd.get(f"{conv_key}.bias"),
            sd[f"{bn_key}.weight"],
            sd[f"{bn_key}.bias"],
            sd[f"{bn_key}.running_mean"],
            sd[f"{bn_key}.running_var"],
        )

    w, b = fold("conv1", "bn1")
    params: dict[str, Any] = {"conv1": {"w": w, "b": b}}
    for layer, n_blocks in RESNET34_BLOCKS.items():
        blocks = []
        for i in range(n_blocks):
            base = f"{layer}.{i}"
            w1, b1 = fold(f"{base}.conv1", f"{base}.bn1")
            w2, b2 = fold(f"{base}.conv2", f"{base}.bn2")
            bp: dict[str, Any] = {
                "conv1": {"w": w1, "b": b1},
                "conv2": {"w": w2, "b": b2},
            }
            if f"{base}.downsample.0.weight" in sd:
                wd, bd = fold(f"{base}.downsample.0", f"{base}.downsample.1")
                bp["down"] = {"w": wd, "b": bd}
            blocks.append(bp)
        params[layer] = blocks
    params["seg_1"] = {
        "w": jnp.asarray(sd["seg_1.weight"].T),
        "b": jnp.asarray(sd["seg_1.bias"]),
    }
    return params


# ---------------------------------------------------------------------------
# Checkpoint file loading
# ---------------------------------------------------------------------------


def _read_state_dict(path) -> dict[str, np.ndarray]:
    """Read a torch .bin/.ckpt (CPU map) or .safetensors file into numpy."""
    from pathlib import Path

    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def load_pyannote_segmentation(path) -> PyTree:
    """Load + convert a pyannote/segmentation-3.0 checkpoint file.

    Lightning checkpoints prefix the module ('model.'); plain state dicts
    don't — both are accepted.
    """
    sd = _read_state_dict(path)
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    return convert_pyannote_segmentation(sd)


def load_wespeaker_resnet34(path) -> PyTree:
    """Load + convert a WeSpeaker ResNet34 checkpoint file (optionally
    wrapped with a 'speaker_extractor.'/'resnet.' prefix)."""
    sd = _read_state_dict(path)
    for prefix in ("speaker_extractor.", "resnet.", "model."):
        if any(k.startswith(prefix) for k in sd):
            sd = {
                k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
            }
            break
    return convert_wespeaker_resnet34(sd)


# ---------------------------------------------------------------------------
# Masked embedding (speaker-selective, fixed shapes)
# ---------------------------------------------------------------------------


@jax.jit
def wespeaker_embed_masked(
    params: PyTree,
    fbank: jnp.ndarray,  # [B, T, n_mels]
    frame_mask: jnp.ndarray,  # [B, T] 1.0 at the target speaker's frames
) -> jnp.ndarray:
    """Per-speaker embedding with fixed shapes: active frames are compacted
    to the front (a stable argsort — the jit-safe analogue of pyannote's
    per-speaker cropping), CMN is computed over active frames only, and the
    statistics pooling masks out the padded tail. Returns [B, E],
    unnormalized (cluster code L2-normalizes).
    """
    b, t, m = fbank.shape
    active = frame_mask > 0.5
    order = jnp.argsort(~active, axis=1, stable=True)  # active first
    fb = jnp.take_along_axis(fbank, order[..., None], axis=1)
    n_active = active.sum(axis=1)  # [B]

    # cepstral mean over ACTIVE frames only (kaldi_fbank skips mean_norm
    # when masks are in play)
    pos = jnp.arange(t)[None, :]
    valid = pos < n_active[:, None]  # [B, T] (post-compaction)
    denom = jnp.maximum(n_active, 1)[:, None, None]
    mean = (fb * valid[..., None]).sum(axis=1, keepdims=True) / denom
    fb = jnp.where(valid[..., None], fb - mean, 0.0)

    # ResNet trunk (stride 8 in time) then masked TSTP
    x = fb.transpose(0, 2, 1)[:, None]  # [B, 1, n_mels, T]
    x = jax.nn.relu(_conv2d_same(x, params["conv1"]["w"], params["conv1"]["b"], 1))
    for layer in ("layer1", "layer2", "layer3", "layer4"):
        for bp in params[layer]:
            x = _basic_block(x, bp)
    b_, c, h, t8 = x.shape
    feat = x.reshape(b_, c * h, t8)
    t_valid = jnp.maximum(jnp.ceil(n_active / 8).astype(jnp.int32), 1)  # [B]
    pool_mask = jnp.arange(t8)[None, :] < t_valid[:, None]  # [B, T8]
    w = pool_mask[:, None, :].astype(feat.dtype)
    denom8 = jnp.maximum(t_valid, 1)[:, None].astype(feat.dtype)
    mean8 = (feat * w).sum(-1) / denom8
    var8 = ((feat - mean8[..., None]) ** 2 * w).sum(-1) / denom8
    stats = jnp.concatenate([mean8, jnp.sqrt(jnp.clip(var8, 1e-7))], axis=-1)
    return stats @ _w(params["seg_1"]["w"], stats.dtype) + params["seg_1"]["b"]
