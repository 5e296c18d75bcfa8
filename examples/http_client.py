#!/usr/bin/env python3
"""Minimal OpenAI-compatible API client (stdlib-only).

Talks to the whisper_tpu HTTP server (serve/http_server.py):

    # terminal 1
    python -m whisper_tpu.serve.http_server --model-dir DIR --port 8000
    # terminal 2
    python examples/http_client.py FILE.wav [--url http://127.0.0.1:8000]
        [--format json|text|srt|vtt|verbose_json] [--language en|auto]
        [--translate] [--stream] [--vad] [--prompt "domain words"]

--stream prints transcript.text.delta events as the server decodes
(SSE); the other formats print the finished payload.  Any OpenAI SDK
pointed at the same base URL works too — this example just shows the
wire format without dependencies.
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request
import uuid


def multipart(fields: dict, file_path: str) -> tuple[bytes, str]:
    boundary = uuid.uuid4().hex
    parts = []
    for k, v in fields.items():
        parts.append(
            (f"--{boundary}\r\nContent-Disposition: form-data; "
             f'name="{k}"\r\n\r\n{v}\r\n').encode())
    with open(file_path, "rb") as f:
        blob = f.read()
    parts.append(
        (f"--{boundary}\r\nContent-Disposition: form-data; "
         f'name="file"; filename="{file_path}"\r\n'
         f"Content-Type: application/octet-stream\r\n\r\n").encode()
        + blob + b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    return b"".join(parts), f"multipart/form-data; boundary={boundary}"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("file")
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--format", default="json",
                    choices=["json", "text", "srt", "vtt", "verbose_json"])
    ap.add_argument("--language", default="")
    ap.add_argument("--translate", action="store_true")
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--vad", action="store_true")
    ap.add_argument("--prompt", default="")
    args = ap.parse_args()

    fields = {"model": "whisper-1", "response_format": args.format}
    if args.language:
        fields["language"] = args.language
    if args.stream:
        fields["stream"] = "true"
    if args.vad:
        fields["vad_filter"] = "true"
    if args.prompt:
        fields["prompt"] = args.prompt

    body, ctype = multipart(fields, args.file)
    endpoint = ("/v1/audio/translations" if args.translate
                else "/v1/audio/transcriptions")
    req = urllib.request.Request(
        args.url + endpoint, data=body,
        headers={"Content-Type": ctype}, method="POST")
    with urllib.request.urlopen(req) as resp:
        if args.stream:
            for raw in resp:                      # SSE: data: {...}\n\n
                line = raw.decode().strip()
                if line.startswith("data: "):
                    ev = json.loads(line[6:])
                    if ev["type"] == "transcript.text.delta":
                        print(f"[{ev.get('start', 0):7.2f}s] "
                              f"{ev['delta']}", flush=True)
                    elif ev["type"] == "transcript.text.done":
                        print(f"--- done: {ev['text']}")
                    else:
                        print(f"error: {ev}", file=sys.stderr)
                        return 1
        else:
            sys.stdout.write(resp.read().decode())
            sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
