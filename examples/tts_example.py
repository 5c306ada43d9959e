#!/usr/bin/env python3
"""Text-to-speech demo (reference: Examples/TTSKitExample).

Synthesizes speech with the Qwen3-TTS stack and streams it through the
pre-buffer-gated playback engine; on headless hosts the streamed audio is
collected by a simulated sink and written to a WAV instead.

  python examples/tts_example.py "Hello from the TPU" --out /tmp/hello.wav
  python examples/tts_example.py "Hola" --voice serena --language spanish
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

# allow running straight from a repo checkout (python examples/...)
try:  # noqa: SIM105
    import whisperkit_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("text")
    ap.add_argument("--out", type=Path, default=None, help="write WAV here")
    ap.add_argument("--voice", default="ryan")
    ap.add_argument("--language", default="english")
    ap.add_argument("--variant", default="tiny-test", help="tiny-test | 0.6b | 1.7b")
    ap.add_argument("--model-folder", default=None)
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quantize", action="store_true", help="W8A16 weights")
    args = ap.parse_args()

    from whisperkit_tpu.audio.output import PlaybackStrategy
    from whisperkit_tpu.pipelines.tts import (
        TTS_VARIANTS,
        GenerationOptions,
        TTSPipeline,
    )

    if args.model_folder:
        pipe = TTSPipeline.from_pretrained(args.model_folder)
    else:
        pipe = TTSPipeline(TTS_VARIANTS[args.variant], quantize=args.quantize)
    options = GenerationOptions(
        voice=args.voice,
        language=args.language,
        max_new_tokens=args.max_new_tokens,
        seed=args.seed,
    )

    try:
        import sounddevice  # noqa: F401

        has_audio = True
    except Exception:
        has_audio = False

    if has_audio and args.out is None:
        print("streaming to the default output device…")
        pipe.play(args.text, options, strategy=PlaybackStrategy.AUTO)
        print(f"done ({pipe.timings.ms_per_step:.2f} ms/step)")
        return 0

    # headless: drain the streaming engine with a simulated sink
    engine, thread = pipe.play_streaming(
        args.text, options, PlaybackStrategy.STREAM
    )
    thread.join()
    blocks = []
    while not engine.drained:
        blocks.append(engine.pull(4096))
    audio = np.concatenate(blocks) if blocks else np.zeros(0, np.float32)
    out = args.out or Path("tts_output.wav")
    from whisperkit_tpu.audio.output import save_audio

    save_audio(audio, out, engine.sample_rate)
    print(
        f"wrote {out} ({len(audio) / engine.sample_rate:.2f} s, "
        f"{pipe.timings.ms_per_step:.2f} ms/step, "
        f"{pipe.timings.real_time_ratio:.1f}x real time)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
