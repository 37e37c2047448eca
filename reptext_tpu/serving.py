"""Minimal production serving layer: request queue + worker + HTTP JSON API.

The reference is a notebook/script-driven stack with no serving path
(SURVEY.md §1 L4). This module provides the deployment-shaped surface:

- :class:`GenerationWorker`: a background thread draining a request queue
  through one resident pipeline (one compiled graph set, no per-request
  recompilation — requests with the same (size, steps) signature reuse the
  jitted sampler).
- :class:`GenerationServer`: a stdlib HTTP server exposing
  ``POST /generate`` (JSON: prompt, text lines, seed, steps) returning a
  base64 PNG, plus ``GET /healthz``.

Single-host scope; multi-host serving rides the same pipeline over a
`jax.sharding.Mesh` (parallel/) and a fleet fronting this API.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np


@dataclass
class GenerationRequest:
    prompt: str
    lines: List[Dict[str, Any]]            # [{text, position, color?, font_size?}]
    seed: int = 42
    num_steps: Optional[int] = None
    guidance_scale: Optional[float] = None
    _done: threading.Event = field(default_factory=threading.Event)
    _result: Optional[np.ndarray] = None
    _error: Optional[str] = None


class GenerationWorker:
    """Drains a queue through a resident pipeline on a worker thread."""

    def __init__(self, pipeline, tokenizer=None, max_queue: int = 64):
        self.pipeline = pipeline
        self.tokenizer = tokenizer  # callable(prompt) -> (clip_ids, t5_ids)
        self.requests: "queue.Queue[GenerationRequest]" = queue.Queue(max_queue)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self.completed = 0
        self.failed = 0

    def start(self):
        self._thread.start()
        return self

    def warmup(self, text: str = "Hi", position=(16, 16)) -> float:
        """Compile all generation graphs with a dummy request; returns seconds.

        Call before accepting traffic so the first real request doesn't pay
        multi-minute XLA compiles.
        """
        req = GenerationRequest(
            prompt="warmup", lines=[{"text": text, "position": list(position)}]
        )
        t0 = time.time()
        self.submit(req)
        req._done.wait()
        if req._error:
            raise RuntimeError(f"warmup failed: {req._error}")
        return time.time() - t0

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=30)

    def submit(self, req: GenerationRequest) -> GenerationRequest:
        self.requests.put(req, block=False)
        return req

    def _tokenize(self, prompt: str):
        if self.tokenizer is not None:
            return self.tokenizer(prompt)
        from reptext_tpu.cli import _tokenize

        return _tokenize(prompt, self.pipeline.clip.config, self.pipeline.t5.config, None)

    def _loop(self):
        from reptext_tpu.conditioning import TextLine, build_conditions

        while not self._stop.is_set():
            try:
                req = self.requests.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                cfg = self.pipeline.pipe_cfg
                lines = [
                    TextLine(
                        l["text"], tuple(l["position"]),
                        tuple(l.get("color", (255, 255, 255))),
                        font_size=l.get("font_size"),
                    )
                    for l in req.lines
                ]
                conds = build_conditions(lines, cfg.width, cfg.height)
                clip_ids, t5_ids = self._tokenize(req.prompt)
                images = self.pipeline(
                    conds, clip_ids=clip_ids, t5_ids=t5_ids, seed=req.seed,
                    num_inference_steps=req.num_steps,
                    guidance_scale=req.guidance_scale,
                )
                req._result = images[0]
                self.completed += 1
            except Exception as e:  # noqa: BLE001 — report to client
                req._error = f"{type(e).__name__}: {e}"
                self.failed += 1
            finally:
                req._done.set()


def _make_handler(worker: GenerationWorker, timeout_s: float):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "ok": True,
                    "completed": worker.completed,
                    "failed": worker.failed,
                    "queued": worker.requests.qsize(),
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
                req = GenerationRequest(
                    prompt=payload["prompt"],
                    lines=payload.get("lines", []),
                    seed=int(payload.get("seed", 42)),
                    num_steps=payload.get("num_steps"),
                    guidance_scale=payload.get("guidance_scale"),
                )
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            try:
                worker.submit(req)
            except queue.Full:
                self._json(503, {"error": "queue full"})
                return
            if not req._done.wait(timeout=timeout_s):
                self._json(504, {"error": "generation timed out"})
                return
            if req._error:
                self._json(500, {"error": req._error})
                return
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(req._result).save(buf, format="PNG")
            self._json(200, {
                "image_png_base64": base64.b64encode(buf.getvalue()).decode(),
                "shape": list(req._result.shape),
            })

    return Handler


class GenerationServer:
    """HTTP front over a GenerationWorker. ``serve_forever`` blocks."""

    def __init__(self, pipeline, host: str = "127.0.0.1", port: int = 8470,
                 tokenizer=None, request_timeout_s: float = 600.0,
                 warmup: bool = False):
        self.worker = GenerationWorker(pipeline, tokenizer).start()
        if warmup:
            self.worker.warmup()
        self.httpd = ThreadingHTTPServer(
            (host, port), _make_handler(self.worker, request_timeout_s)
        )

    @property
    def address(self):
        return self.httpd.server_address

    def serve_forever(self):
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        self.worker.stop()
