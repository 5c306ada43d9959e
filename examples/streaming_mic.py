#!/usr/bin/env python3
"""Live streaming transcription demo (reference: WhisperAX live view /
`argmax-cli transcribe --stream`).

Captures the microphone when PortAudio hardware exists; otherwise
simulates a mic by replaying a WAV in 100 ms buffers (the reference's
stream-simulated mode). Confirmed text is printed once and stays; the
hypothesis tail rewrites in place.

  python examples/streaming_mic.py --wav jfk.wav
  python examples/streaming_mic.py              # real microphone
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

# allow running straight from a repo checkout (python examples/...)
try:  # noqa: SIM105
    import whisperkit_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def simulated_mic(path: Path, chunk_seconds: float = 0.1, realtime: bool = False):
    """Yield 100 ms buffers from a file, like AudioProcessor's mic tap."""
    from whisperkit_tpu.audio.io import SAMPLE_RATE, load_audio

    audio = load_audio(path)
    n = int(chunk_seconds * SAMPLE_RATE)
    for i in range(0, len(audio), n):
        if realtime:
            time.sleep(chunk_seconds)
        yield audio[i : i + n]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--wav", type=Path, default=None, help="simulate a mic from this file")
    ap.add_argument("--model-folder", default=None, help="converted checkpoint folder")
    ap.add_argument("--language", default="en")
    ap.add_argument("--eager", action="store_true", help="word-level eager confirmation")
    ap.add_argument("--realtime", action="store_true", help="pace the simulated mic")
    args = ap.parse_args()

    from whisperkit_tpu.core.configurations import DecodingOptions, WhisperConfig
    from whisperkit_tpu.core.errors import ModelsUnavailable
    from whisperkit_tpu.pipelines.streaming import AudioStreamTranscriber
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline

    random_init = False
    try:
        pipe = WhisperPipeline(WhisperConfig(model_folder=args.model_folder))
    except ModelsUnavailable:
        random_init = True
        print(
            "no weights available (offline) — demoing the streaming loop "
            "with a random-init tiny model; expect gibberish text"
        )
        import jax

        from whisperkit_tpu.models.whisper import VARIANT_DIMS, init_params

        dims = VARIANT_DIMS["tiny"]
        pipe = WhisperPipeline(
            dims=dims, params=init_params(jax.random.PRNGKey(0), dims)
        )
    options = DecodingOptions(language=args.language, temperature_fallback_count=0)
    if random_init:
        # random weights never pass the quality thresholds; disable them so
        # the demo visibly streams (gibberish) hypotheses
        import dataclasses

        options = dataclasses.replace(
            options,
            sample_length=24,
            logprob_threshold=None,
            no_speech_threshold=None,
            compression_ratio_threshold=None,
            first_token_log_prob_threshold=None,
        )
    transcriber = AudioStreamTranscriber(pipe, options, eager=args.eager)

    if args.wav is not None:
        source = simulated_mic(args.wav, realtime=args.realtime)
        print(f"simulating microphone from {args.wav}")
    else:
        from whisperkit_tpu.audio.capture import MicrophoneSource, capture_available

        if not capture_available():
            print("no capture hardware; pass --wav <file> to simulate", file=sys.stderr)
            return 1
        source = iter(MicrophoneSource().start())
        print("listening... (ctrl-c to stop)")

    printed_confirmed = 0
    try:
        for state in transcriber.stream(source):
            new_confirmed = state.confirmed_segments[printed_confirmed:]
            for seg in new_confirmed:
                sys.stdout.write("\r\x1b[K")  # clear hypothesis line
                print(f"[{seg.start:7.2f}-{seg.end:7.2f}] {seg.text.strip()}")
            printed_confirmed = len(state.confirmed_segments)
            tail = " ".join(s.text.strip() for s in state.unconfirmed_segments)
            sys.stdout.write(f"\r\x1b[K… {tail[:110]}")
            sys.stdout.flush()
    except KeyboardInterrupt:
        pass
    print()
    final = None
    text = (
        final.text
        if final is not None
        else " ".join(
            s.text.strip()
            for s in (
                transcriber.state.confirmed_segments
                + transcriber.state.unconfirmed_segments
            )
        )
    )
    print(f"\nfull transcript: {text.strip()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
