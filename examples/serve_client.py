#!/usr/bin/env python3
"""OpenAI-compatible server client (reference: Examples/ServeCLIClient).

Uploads an audio file to the local whisperkit_tpu server and prints the
result; `--stream` consumes the SSE delta stream like an OpenAI client.

  python -m whisperkit_tpu.cli serve --port 50060   # in another shell
  python examples/serve_client.py jfk.wav --stream
"""

from __future__ import annotations

import argparse
import json
import sys
import uuid
from pathlib import Path
from urllib import request
from urllib.error import URLError

# allow running straight from a repo checkout (python examples/...)
try:  # noqa: SIM105
    import whisperkit_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _multipart(fields: dict[str, str], file_field: str, path: Path):
    boundary = uuid.uuid4().hex
    body = b""
    for k, v in fields.items():
        body += (
            f"--{boundary}\r\nContent-Disposition: form-data; name=\"{k}\"\r\n\r\n{v}\r\n"
        ).encode()
    body += (
        f"--{boundary}\r\nContent-Disposition: form-data; name=\"{file_field}\"; "
        f"filename=\"{path.name}\"\r\nContent-Type: application/octet-stream\r\n\r\n"
    ).encode() + path.read_bytes() + b"\r\n"
    body += f"--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("audio", type=Path)
    ap.add_argument("--url", default="http://127.0.0.1:50060")
    ap.add_argument("--model", default="whisper-1")
    ap.add_argument("--language", default=None)
    ap.add_argument("--translate", action="store_true")
    ap.add_argument("--stream", action="store_true", help="consume SSE deltas")
    ap.add_argument(
        "--response-format", default="verbose_json",
        choices=["json", "verbose_json", "text", "srt", "vtt"],
    )
    args = ap.parse_args()

    endpoint = "translations" if args.translate else "transcriptions"
    fields = {"model": args.model, "response_format": args.response_format}
    if args.language:
        fields["language"] = args.language
    if args.stream:
        fields["stream"] = "true"
    body, ctype = _multipart(fields, "file", args.audio)
    req = request.Request(
        f"{args.url}/v1/audio/{endpoint}",
        data=body,
        headers={"Content-Type": ctype},
    )
    try:
        resp = request.urlopen(req, timeout=600)
    except URLError as e:
        print(
            f"server not reachable at {args.url} — start it with\n"
            f"  python -m whisperkit_tpu.cli serve --port 50060\n({e})",
            file=sys.stderr,
        )
        return 1

    if args.stream:
        # SSE: "data: {json}\n\n" events, final event carries the result
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data:"):
                continue
            payload = line[len("data:"):].strip()
            if payload == "[DONE]":
                break
            event = json.loads(payload)
            if "delta" in event:
                print(event["delta"], end="", flush=True)
            else:
                print("\n--- final ---")
                print(json.dumps(event, indent=2)[:2000])
        print()
    else:
        out = resp.read().decode()
        try:
            print(json.dumps(json.loads(out), indent=2)[:4000])
        except json.JSONDecodeError:
            print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
