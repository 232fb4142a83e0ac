"""HTTP serving for μ² report generation (L5 demo/serving layer).

Counterpart of src/demo/online_demo.py (gradio web demo) and
src/preprocess/start_vllm_server.py (OpenAI-protocol server): a
dependency-free HTTP server exposing

  POST /v1/report        {"image_path": ..., "question": ...}
                          -> {"report": ...}
  POST /v1/chat/completions  (OpenAI-protocol text-only; the judge/demo path)
  GET  /health

Volumes are referenced by server-visible path (NIfTI or preprocessed .npy)
and ingested through the native C++ loader when built. Requests are served
sequentially per process — batching across requests rides the generate
function's fixed batch; multi-chip serving shards the model over the mesh
exactly like training.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class U2Server:
    def __init__(self, inference_model, transform=None):
        """inference_model: eval.inference.U2InferenceModel (or compatible
        .inference(image, question) object). transform: path -> (T, D, H, W)
        volume; defaults to the u2 validation transform."""
        self.model = inference_model
        if transform is None:
            from .data.transforms import U2VolumeTransform

            cfg = inference_model.cfg
            transform = U2VolumeTransform(
                data_type="validation",
                target_size=cfg.vision.input_spatial[1],
                chunk_depth=cfg.vision.input_spatial[0],
                num_chunks=cfg.num_chunks)
        self.transform = transform
        self._lock = threading.Lock()

    def load_volume(self, path: str) -> np.ndarray:
        if path.endswith(".npy"):
            return np.load(path).astype(np.float32)
        return self.transform(path)

    def report(self, image_path: str, question: str) -> str:
        volume = self.load_volume(image_path)
        with self._lock:  # generation is single-stream per chip
            return self.model.inference(volume, question)

    def chat(self, messages) -> str:
        prompt = "\n".join(m.get("content", "") for m in messages)
        with self._lock:
            return self.model.text_completion(prompt) if hasattr(
                self.model, "text_completion") else self.model.inference(
                    None, prompt)


def make_handler(server: U2Server):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid JSON"})
                return
            t0 = time.time()
            try:
                if self.path == "/v1/report":
                    if "image_path" not in req or "question" not in req:
                        self._send(400, {"error":
                                         "image_path and question required"})
                        return
                    text = server.report(req["image_path"], req["question"])
                    self._send(200, {"report": text,
                                     "latency_s": round(time.time() - t0, 3)})
                elif self.path == "/v1/chat/completions":
                    text = server.chat(req.get("messages", []))
                    self._send(200, {
                        "choices": [{"message": {"role": "assistant",
                                                 "content": text},
                                     "finish_reason": "stop"}],
                    })
                else:
                    self._send(404, {"error": "not found"})
            except FileNotFoundError as e:
                self._send(404, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — surface to client
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(inference_model, host: str = "0.0.0.0", port: int = 8088,
          transform=None) -> ThreadingHTTPServer:
    """Start the server (blocking). Returns the server object when used via
    serve_background."""
    srv = U2Server(inference_model, transform)
    httpd = ThreadingHTTPServer((host, port), make_handler(srv))
    httpd.serve_forever()
    return httpd


def serve_background(inference_model, host: str = "127.0.0.1",
                     port: int = 8088, transform=None) -> ThreadingHTTPServer:
    srv = U2Server(inference_model, transform)
    httpd = ThreadingHTTPServer((host, port), make_handler(srv))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd
