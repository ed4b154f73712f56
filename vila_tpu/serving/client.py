"""Minimal OpenAI-compatible client for the vila_tpu server.

Capability parity: `serving/query_nvila.py` — send text+image requests to
the chat/completions endpoint (stdlib only; also usable with the `openai`
package pointed at the same base_url).
"""

from __future__ import annotations

import argparse
import base64
import json
import mimetypes
import os
import sys
import urllib.request
from typing import Any, Dict, List, Optional


def encode_media_part(path: str) -> Dict[str, Any]:
    mime = mimetypes.guess_type(path)[0] or "application/octet-stream"
    with open(path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    url = f"data:{mime};base64,{b64}"
    if mime.startswith("video"):
        return {"type": "video_url", "video_url": {"url": url}}
    return {"type": "image_url", "image_url": {"url": url}}


def chat(
    base_url: str,
    text: str,
    media: Optional[List[str]] = None,
    *,
    stream: bool = False,
    max_tokens: int = 256,
    temperature: float = 0.0,
    response_format: Optional[Dict[str, Any]] = None,
):
    content: List[Dict[str, Any]] = [
        encode_media_part(p) for p in (media or [])
    ]
    content.append({"type": "text", "text": text})
    body = {
        "messages": [{"role": "user", "content": content}],
        "max_tokens": max_tokens,
        "temperature": temperature,
        "stream": stream,
    }
    if response_format:
        body["response_format"] = response_format
    req = urllib.request.Request(
        base_url.rstrip("/") + "/v1/chat/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    resp = urllib.request.urlopen(req)
    if not stream:
        data = json.loads(resp.read())
        return data["choices"][0]["message"]["content"]

    def deltas():
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data: ") or "[DONE]" in line:
                continue
            chunk = json.loads(line[len("data: "):])
            d = chunk["choices"][0]["delta"].get("content")
            if d:
                yield d

    return deltas()


def main(argv=None) -> int:
    p = argparse.ArgumentParser("vila_tpu.serving.client")
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--text", "-t", required=True)
    p.add_argument("--media", "-i", nargs="*", default=[])
    p.add_argument("--stream", action="store_true")
    p.add_argument("--max-tokens", type=int, default=256)
    args = p.parse_args(argv)

    out = chat(
        args.url, args.text, args.media,
        stream=args.stream, max_tokens=args.max_tokens,
    )
    if args.stream:
        for d in out:
            print(d, end="", flush=True)
        print()
    else:
        print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
