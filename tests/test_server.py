"""OpenAI-compatible server: request/response schema + streaming."""

import base64
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from helpers import save_tiny_checkpoint

    import vila_tpu
    from vila_tpu.serving import server as srv
    from http.server import ThreadingHTTPServer

    path = str(tmp_path_factory.mktemp("ckpt"))
    with torch.no_grad():
        save_tiny_checkpoint(path)
    engine = vila_tpu.load(path)

    srv.ENGINE = engine
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=300)


def test_models_endpoint(server):
    with urllib.request.urlopen(server + "/v1/models", timeout=30) as r:
        data = json.loads(r.read())
    assert data["data"][0]["object"] == "model"


def test_chat_completion_text(server):
    body = {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 4,
    }
    with _post(server + "/v1/chat/completions", body) as r:
        data = json.loads(r.read())
    assert data["object"] == "chat.completion"
    assert data["choices"][0]["message"]["role"] == "assistant"
    assert isinstance(data["choices"][0]["message"]["content"], str)


def test_chat_completion_with_base64_image(server):
    from PIL import Image as PILImage

    img = PILImage.fromarray(
        np.random.default_rng(0).integers(0, 255, (48, 48, 3), np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    body = {
        "messages": [
            {
                "role": "user",
                "content": [
                    {
                        "type": "image_url",
                        "image_url": {"url": f"data:image/png;base64,{b64}"},
                    },
                    {"type": "text", "text": "what is this?"},
                ],
            }
        ],
        "max_tokens": 4,
    }
    with _post(server + "/v1/chat/completions", body) as r:
        data = json.loads(r.read())
    assert data["choices"][0]["finish_reason"] == "stop"


def test_streaming(server):
    body = {
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4,
        "stream": True,
    }
    with _post(server + "/v1/chat/completions", body) as r:
        raw = r.read().decode()
    events = [
        json.loads(line[len("data: "):])
        for line in raw.splitlines()
        if line.startswith("data: ") and "[DONE]" not in line
    ]
    assert events, raw
    assert events[-1]["choices"][0]["finish_reason"] == "stop"
    assert any(
        e["choices"][0]["delta"].get("content") for e in events[:-1]
    ) or len(events) >= 1
    assert raw.strip().endswith("[DONE]") or "[DONE]" in raw


def test_client_module(server, tmp_path):
    """serving/client.py drives the real server: blocking + streaming,
    file->data-URL media."""
    import numpy as np
    from PIL import Image

    from vila_tpu.serving import client as C

    img = tmp_path / "x.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (28, 28, 3), np.uint8)
    ).save(img)

    msgs = C.build_messages("what is this", image=str(img))
    assert msgs[0]["content"][0]["type"] == "image_url"
    assert msgs[0]["content"][0]["image_url"]["url"].startswith(
        "data:image/png;base64,")

    out = "".join(C.chat(server, msgs, max_tokens=4))
    assert isinstance(out, str)

    stream_out = "".join(
        C.chat(server, C.build_messages("hello"), max_tokens=4, stream=True)
    )
    blocking_out = "".join(
        C.chat(server, C.build_messages("hello"), max_tokens=4)
    )
    assert stream_out == blocking_out
