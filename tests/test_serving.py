"""Serving layer test: HTTP server + worker over the tiny pipeline."""

import base64
import http.client
import json
import threading

import pytest

from reptext_tpu.configs import (
    CLIPConfig, ControlNetConfig, FluxConfig, PipelineConfig, T5Config, VAEConfig,
)
from reptext_tpu.pipelines import FluxRepTextPipeline
from reptext_tpu.serving import GenerationServer

H = W = 64


@pytest.fixture(scope="module")
def server():
    pipe = FluxRepTextPipeline.create(
        flux_cfg=FluxConfig().tiny(), cn_cfg=ControlNetConfig().tiny(),
        vae_cfg=VAEConfig().tiny(),
        pipe_cfg=PipelineConfig(height=H, width=W, num_inference_steps=2,
                                controlnet_conditioning_step=1),
        clip_cfg=CLIPConfig().tiny(), t5_cfg=T5Config().tiny(),
    )
    srv = GenerationServer(pipe, host="127.0.0.1", port=0, request_timeout_s=1200)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _request(server, method, path, payload=None):
    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=1200)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body,
                 headers={"Content-Type": "application/json"} if body else {})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


def test_healthz(server):
    status, data = _request(server, "GET", "/healthz")
    assert status == 200 and data["ok"] is True


def test_generate_roundtrip(server):
    status, data = _request(server, "POST", "/generate", {
        "prompt": "a neon sign",
        "lines": [{"text": "Hi", "position": [8, 16], "font_size": 24}],
        "seed": 7,
    })
    assert status == 200, data
    png = base64.b64decode(data["image_png_base64"])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert data["shape"] == [H, W, 3]


def test_bad_request(server):
    status, data = _request(server, "POST", "/generate", {"lines": []})
    assert status == 400
    status, _ = _request(server, "POST", "/nope", {})
    assert status == 404
