"""OpenAI-compatible chat server.

Capability parity: reference `server.py:156-307` (FastAPI
`/chat/completions` with image/video URL + base64 inputs, SSE streaming).
Implemented on the Python stdlib (`http.server`) — no fastapi dependency —
with the same request/response schema.

Run: `python -m vila_tpu.serving.server --model-path PATH [--port 8000]`
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

from vila_tpu.inference.generate import GenerationConfig
from vila_tpu.media import Image as MediaImage
from vila_tpu.media import Video as MediaVideo

ENGINE = None  # set by serve()
MODEL_NAME = "vila-tpu"


def _load_image_part(url: str):
    from PIL import Image as PILImage

    if url.startswith("data:"):
        header, payload = url.split(",", 1)
        data = base64.b64decode(payload)
        return MediaImage(PILImage.open(io.BytesIO(data)).convert("RGB"))
    return MediaImage(url)


def _load_video_part(url: str):
    if url.startswith("data:"):
        import tempfile

        header, payload = url.split(",", 1)
        data = base64.b64decode(payload)
        f = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False)
        f.write(data)
        f.close()
        return MediaVideo(f.name)
    return MediaVideo(url)


def parse_messages(messages: List[Dict[str, Any]]) -> List[Any]:
    """OpenAI messages -> vila prompt part list (server.py:171-240)."""
    prompt: List[Any] = []
    for message in messages:
        content = message.get("content")
        if isinstance(content, str):
            prompt.append(content)
            continue
        for part in content or []:
            ptype = part.get("type")
            if ptype == "text":
                prompt.append(part["text"])
            elif ptype == "image_url":
                prompt.append(_load_image_part(part["image_url"]["url"]))
            elif ptype == "video_url":
                prompt.append(_load_video_part(part["video_url"]["url"]))
            else:
                raise ValueError(f"unsupported content part: {ptype}")
    return prompt


def _gen_config(body: Dict[str, Any]) -> GenerationConfig:
    temperature = float(body.get("temperature", 1.0) or 0.0)
    return GenerationConfig(
        max_new_tokens=int(
            body.get("max_tokens") or body.get("max_completion_tokens") or 256
        ),
        do_sample=temperature > 0 and body.get("do_sample", True),
        temperature=max(temperature, 1e-4),
        top_p=float(body.get("top_p", 1.0) or 1.0),
        seed=int(body.get("seed") or 0),
        # OpenAI structured output -> JSON-constrained decoding
        response_format=body.get("response_format"),
    )


class Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet
        pass

    def _json(self, code: int, obj: Dict[str, Any]) -> None:
        payload = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_GET(self):
        if self.path in ("/health", "/v1/models", "/models"):
            self._json(
                200,
                {"object": "list", "data": [{"id": MODEL_NAME, "object": "model"}]},
            )
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):
        if self.path not in ("/chat/completions", "/v1/chat/completions"):
            self._json(404, {"error": "not found"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            prompt = parse_messages(body.get("messages", []))
            gc = _gen_config(body)
            rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"

            if body.get("stream"):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def send_chunk(obj):
                    data = f"data: {json.dumps(obj)}\n\n".encode()
                    self.wfile.write(hex(len(data))[2:].encode() + b"\r\n")
                    self.wfile.write(data + b"\r\n")
                    self.wfile.flush()

                for delta in ENGINE.generate_content_stream(prompt, gc):
                    send_chunk(
                        {
                            "id": rid,
                            "object": "chat.completion.chunk",
                            "created": int(time.time()),
                            "model": MODEL_NAME,
                            "choices": [
                                {
                                    "index": 0,
                                    "delta": {"content": delta},
                                    "finish_reason": None,
                                }
                            ],
                        }
                    )
                send_chunk(
                    {
                        "id": rid,
                        "object": "chat.completion.chunk",
                        "created": int(time.time()),
                        "model": MODEL_NAME,
                        "choices": [
                            {"index": 0, "delta": {}, "finish_reason": "stop"}
                        ],
                    }
                )
                data = b"data: [DONE]\n\n"
                self.wfile.write(hex(len(data))[2:].encode() + b"\r\n")
                self.wfile.write(data + b"\r\n")
                self.wfile.write(b"0\r\n\r\n")
                self.wfile.flush()
                return

            text = ENGINE.generate_content(prompt, gc)
            self._json(
                200,
                {
                    "id": rid,
                    "object": "chat.completion",
                    "created": int(time.time()),
                    "model": body.get("model", MODEL_NAME),
                    "choices": [
                        {
                            "index": 0,
                            "message": {"role": "assistant", "content": text},
                            "finish_reason": "stop",
                        }
                    ],
                },
            )
        except Exception as e:  # noqa: BLE001
            self._json(500, {"error": str(e)})


def serve(engine, host: str = "0.0.0.0", port: int = 8000):
    global ENGINE
    ENGINE = engine
    server = ThreadingHTTPServer((host, port), Handler)
    print(f"vila_tpu server listening on {host}:{port}")
    server.serve_forever()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument(
        "--max-batch", type=int, default=0,
        help="enable continuous batching with this many decode slots "
        "(0 = bs=1 serial serving)",
    )
    parser.add_argument("--max-len", type=int, default=2048,
                        help="per-request context cap under batching")
    args = parser.parse_args()

    import vila_tpu

    engine = vila_tpu.load(args.model_path)
    if args.max_batch > 0:
        from vila_tpu.serving.batcher import ContinuousBatcher

        engine = ContinuousBatcher(
            engine, max_batch=args.max_batch, max_len=args.max_len
        )
    serve(engine, args.host, args.port)


if __name__ == "__main__":
    main()
