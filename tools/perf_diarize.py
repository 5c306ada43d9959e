"""Diarization benchmark on the REAL architectures (VERDICT r2 #5).

The shipped 3.2 s / 10 min figure used the fast conv1d pair (random-init
default). This measures end-to-end diarization with the published
PyanNet (sinc + 4-layer BiLSTM-128) + WeSpeaker ResNet34 architectures at
full size — weights are randomly initialized through the torch modules and
run through the real converters, exactly the path converted public
checkpoints take (tests/test_checkpoint_converters.py).

Run on the chip: python tools/perf_diarize.py [--minutes 10] [--variant w32a32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_checkpoints(tmp: Path) -> None:
    import torch
    import torch.nn as nn

    class ParamSinc(nn.Module):
        def __init__(self):
            super().__init__()
            self.filterbank = nn.Module()
            self.filterbank.low_hz_ = nn.Parameter(torch.rand(80, 1) * 3000 + 30)
            self.filterbank.band_hz_ = nn.Parameter(torch.rand(80, 1) * 400 + 30)

    class SincNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
            self.conv1d = nn.ModuleList(
                [ParamSinc(), nn.Conv1d(80, 60, 5), nn.Conv1d(60, 60, 5)]
            )
            self.pool1d = nn.ModuleList([nn.MaxPool1d(3) for _ in range(3)])
            self.norm1d = nn.ModuleList(
                [nn.InstanceNorm1d(c, affine=True) for c in (80, 60, 60)]
            )

    class PyanNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.sincnet = SincNet()
            self.lstm = nn.LSTM(60, 128, num_layers=4, bidirectional=True, batch_first=True)
            self.linear = nn.ModuleList([nn.Linear(256, 128), nn.Linear(128, 128)])
            self.classifier = nn.Linear(128, 7)

    class Block(nn.Module):
        def __init__(self, cin, c, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, c, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(c)
            self.conv2 = nn.Conv2d(c, c, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(c)
            if stride != 1 or cin != c:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, c, 1, stride, bias=False), nn.BatchNorm2d(c)
                )

    class ResNet34(nn.Module):
        def __init__(self, m=32, blocks=(3, 4, 6, 3), n_mels=80, emb=256):
            super().__init__()
            self.conv1 = nn.Conv2d(1, m, 3, 1, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(m)
            cin = m
            for li, (mult, n) in enumerate(zip((1, 2, 4, 8), blocks)):
                c = m * mult
                stride = 1 if li == 0 else 2
                seq = [Block(cin, c, stride)] + [Block(c, c) for _ in range(n - 1)]
                setattr(self, f"layer{li + 1}", nn.Sequential(*seq))
                cin = c
            self.seg_1 = nn.Linear(8 * m * (n_mels // 8) * 2, emb)

    torch.manual_seed(0)
    seg = PyanNet()
    torch.save(
        {"state_dict": {"model." + k: v for k, v in seg.state_dict().items()}},
        tmp / "segmentation-3.0.ckpt",
    )
    emb = ResNet34()
    torch.save(emb.state_dict(), tmp / "wespeaker-resnet34.bin")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--variant", default="w32a32")
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import tempfile

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from whisperkit_tpu.pipelines.diarize import DiarizationOptions, DiarizePipeline

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        build_checkpoints(tmp)
        pipe = DiarizePipeline.from_pretrained(str(tmp), variant=args.variant)
    assert pipe.segmenter_backend == "pyannet", pipe.segmenter_backend
    assert pipe.embedder_backend == "resnet", pipe.embedder_backend

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import synth_speechlike_audio

    audio = synth_speechlike_audio(args.minutes * 60.0)
    opts = DiarizationOptions()
    pipe.diarize(audio, opts)  # warmup/compile at the REAL chunk-batch shape
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        result = pipe.diarize(audio, opts)
        times.append(time.perf_counter() - t0)
    dt = float(np.min(times))
    t = pipe.timings
    print(
        json.dumps(
            {
                "metric": f"diarize_real_arch_{args.variant}_{int(args.minutes)}min",
                "seconds": round(dt, 2),
                "rtf": round(dt / (args.minutes * 60), 5),
                "segmenter_s": round(t.segmenter_seconds, 2),
                "embedder_s": round(t.embedder_seconds, 2),
                "clustering_s": round(t.clustering_seconds, 3),
                "chunks": t.chunk_count,
                "embeddings": t.embedding_count,
                "segments": len(result.segments),
            }
        )
    )


if __name__ == "__main__":
    main()
