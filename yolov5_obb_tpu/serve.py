"""REST serving: POST an image, get OBB detections as JSON.

Counterpart of the reference Flask endpoint
(utils/flask_rest_api/restapi.py:14-37) with two upgrades: the OBB NMS path
is actually wired (the reference serves HBB only), and the server is
stdlib ``http.server`` based with a worker thread owning the TPU — no web
framework dependency (flask is not in this image; stub pattern per repo
policy).

Run:  python -m yolov5_obb_tpu.serve --weights runs/train/exp/best \
          --cfg yolov5m.yaml --port 5000
Test: curl -X POST --data-binary @img.png http://localhost:5000/v1/obb-detection
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Worker(threading.Thread):
    """Single thread owning the model; requests serialized through a queue."""

    def __init__(self, model, max_batch: int = 8):
        super().__init__(daemon=True)
        self.model = model
        self.max_batch = max_batch
        self.q: queue.Queue = queue.Queue()

    def run(self):
        while True:
            # dynamic batching: take one request, then drain whatever else is
            # already queued (up to max_batch) into a single device call —
            # concurrent clients share the fixed-shape batched inference
            batch = [self.q.get()]
            while len(batch) < self.max_batch:
                try:
                    batch.append(self.q.get_nowait())
                except queue.Empty:
                    break
            try:
                dets = self.model([img for img, _ in batch])
                dfs = dets.pandas()
                for (_, reply), df in zip(batch, dfs):
                    reply.put(("ok", df.to_dict(orient="records")))
            except Exception as e:  # noqa: BLE001 — report any failure to client
                for _, reply in batch:
                    reply.put(("error", str(e)))

    def infer(self, img, timeout=600.0):
        # generous default: the first request at each padded batch shape
        # pays an XLA compile, which can take minutes on some runtimes
        reply: queue.Queue = queue.Queue()
        self.q.put((img, reply))
        try:
            return reply.get(timeout=timeout)
        except queue.Empty:
            return "error", f"inference timed out after {timeout:.0f}s"


def make_handler(worker: _Worker):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            import cv2

            if not self.path.startswith("/v1/obb-detection"):
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            blob = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                self.send_error(400, "not a decodable image")
                return
            status, payload = worker.infer(img)
            body = json.dumps(payload).encode()
            self.send_response(200 if status == "ok" else 500)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def main():
    from .api import OBBModel
    from .utils.general import load_dataset_config

    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="")
    p.add_argument("--cfg", default="yolov5m.yaml")
    p.add_argument("--data", default=None)
    p.add_argument("--imgsz", type=int, default=1024)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--port", type=int, default=5000)
    a = p.parse_args()

    names = load_dataset_config(a.data)["names"] if a.data else None
    model = OBBModel(
        cfg=a.cfg, weights=a.weights or None, names=names, imgsz=a.imgsz,
        conf_thres=a.conf_thres,
    )
    worker = _Worker(model)
    worker.start()
    server = ThreadingHTTPServer(("0.0.0.0", a.port), make_handler(worker))
    print(f"serving OBB detection on :{a.port}/v1/obb-detection")
    server.serve_forever()


if __name__ == "__main__":
    main()
