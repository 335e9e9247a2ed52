"""Request batching + HTTP serving on top of exported artifacts.

The reference has no server; its closest analog is the infer stage's
batch loop (mdir/stages/infer.py:17-84, batch_size 1). For serving, the
throughput lever on TPU is batching concurrent requests into one dispatch:
`BatchingService` is a micro-batcher (collect up to `max_batch` requests or
`max_wait_ms`, run ONE forward, fan results back out), and `serve_http` is a
stdlib ThreadingHTTPServer speaking JPEG/PNG/npy in and JSON descriptors or
PNG images out, decoding via the native C++ pipeline when available.
"""
import io
import json
import os
import queue
import tempfile
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_STOP = object()


class BatchingService:
    """Micro-batches concurrent `submit` calls into single `fn` invocations.

    `fn` takes one or more stacked (N, ...) arrays (one per element of the
    submitted tuple) and returns an (N, ...) array; each submit returns a
    Future of the corresponding output row. Items must share per-item shape
    (the caller resizes/pads to the artifact shape first)."""

    def __init__(self, fn, max_batch=8, max_wait_ms=5.0):
        self.fn = fn
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self._q = queue.Queue()
        self._closed = False
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, *arrays):
        fut = Future()
        # lock so no item can land behind the _STOP sentinel (a submit that
        # raced close() would otherwise hang its waiter forever)
        with self._lock:
            if self._closed:
                raise RuntimeError("service closed")
            self._q.put((tuple(np.asarray(a) for a in arrays), fut))
        return fut

    def __call__(self, *arrays):
        return self.submit(*arrays).result()

    def _loop(self):
        stop = False
        while not stop:
            item = self._q.get()
            if item is _STOP:
                return
            batch = [item]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is _STOP:
                    stop = True
                    break
                batch.append(nxt)
            self._run(batch)

    @staticmethod
    def _resolve(fut, value=None, error=None):
        """Set a future's outcome, tolerating waiters that cancelled or
        timed out — a stray InvalidStateError here would kill the batcher
        thread and hang the whole service."""
        try:
            if error is not None:
                fut.set_exception(error)
            else:
                fut.set_result(value)
        except Exception:
            pass

    def _run(self, batch):
        futs = [f for _, f in batch]
        try:
            nargs = len(batch[0][0])
            stacked = [np.stack([item[0][j] for item in batch])
                       for j in range(nargs)]
            outs = np.asarray(self.fn(*stacked))
            assert outs.shape[0] == len(batch)
        except Exception as e:  # fan the failure out to every waiter
            for f in futs:
                self._resolve(f, error=e)
            return
        for i, f in enumerate(futs):
            self._resolve(f, value=outs[i])

    def close(self):
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(_STOP)
        self._thread.join(timeout=10)
        # the worker exits at the sentinel; fail any stragglers it skipped.
        # If join timed out (e.g. a first-compile still running, 10-130 s on
        # the TPU tunnel) the drain below may consume the sentinel — re-put
        # it so the worker still terminates when it finishes the batch.
        drained_stop = False
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is _STOP:
                drained_stop = True
            else:
                self._resolve(item[1], error=RuntimeError("service closed"))
        if drained_stop and self._thread.is_alive():
            self._q.put(_STOP)


def _decode_image_bytes(body, content_type):
    """bytes -> uint8 (H, W, 3) RGB. npy passes through; jpeg/png go through
    the native decoder (tempfile — loader.cc reads paths) with PIL fallback."""
    if content_type == "application/octet-stream" or body[:6] == b"\x93NUMPY":
        arr = np.load(io.BytesIO(body), allow_pickle=False)
        # request validation must survive python -O: no bare asserts
        if not (arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3):
            raise ValueError("npy body must be uint8 (H, W, 3) RGB, got %s %s"
                             % (arr.dtype, arr.shape))
        return arr
    from gandtr_tpu import native
    if native.available():
        fd, tmp = tempfile.mkstemp(suffix=".img")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(body)
            arr = native.decode(tmp)
            if arr is not None:
                return arr
        finally:
            os.unlink(tmp)
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))


def _fit_to_artifact(img, meta):
    """Resize a decoded uint8 image to the artifact's fixed (H, W).

    Masked artifacts keep the aspect ratio: scale longest-fitting side, pad
    bottom/right with edge pixels, mask marks valid rows/cols (masked GeM
    ignores the padding). Unmasked artifacts resize to exactly (H, W)."""
    from PIL import Image
    h, w = meta["image_hw"]
    if not meta["with_mask"]:
        if img.shape[:2] == (h, w):
            return img, None
        pil = Image.fromarray(img)
        return np.asarray(pil.resize((w, h), Image.BILINEAR)), None
    pil = Image.fromarray(img)
    scale = min(h / pil.height, w / pil.width)
    nh = max(1, min(h, round(pil.height * scale)))
    nw = max(1, min(w, round(pil.width * scale)))
    small = np.asarray(pil.resize((nw, nh), Image.BILINEAR))
    out = np.pad(small, [(0, h - nh), (0, w - nw), (0, 0)], mode="edge")
    mask = np.zeros((h, w), np.float32)
    mask[:nh, :nw] = 1.0
    return out, mask


class _Handler(BaseHTTPRequestHandler):
    server_version = "gandtr-tpu-serving"

    def log_message(self, fmt, *args):  # quiet; the service layer logs
        pass

    def _send(self, code, payload, ctype="application/json"):
        body = (json.dumps(payload).encode()
                if ctype == "application/json" else payload)
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            import jax
            self._send(200, {"status": "ok",
                             "backend": jax.default_backend(),
                             "devices": len(jax.devices())})
        elif self.path == "/v1/models":
            self._send(200, {name: svc.meta for name, svc
                             in self.server.models.items()})
        else:
            self._send(404, {"error": "not found"})

    def do_POST(self):
        path, _, qs = self.path.partition("?")
        action = next((a for a in (":predict", ":search")
                       if path.startswith("/v1/models/")
                       and path.endswith(a)), None)
        if action is None:
            return self._send(404, {"error": "not found"})
        name = path[len("/v1/models/"):-len(action)]
        entry = self.server.models.get(name)
        if entry is None:
            return self._send(404, {"error": "unknown model %r" % name})
        if action == ":search" and entry.index is None:
            return self._send(404, {"error": "model %r has no search index"
                                    % name})
        try:  # client-side problems: undecodable/malformed request body
            if action == ":search":
                from urllib.parse import parse_qs
                k = int(parse_qs(qs).get("k", ["10"])[0])
                if k < 1:
                    raise ValueError("k must be >= 1, got %d" % k)
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            img = _decode_image_bytes(
                body, self.headers.get("Content-Type", ""))
            x, mask = _fit_to_artifact(img, entry.meta)
            x = entry.prepare(x)
        except Exception as e:
            return self._send(400, {"error": "%s: %s" % (type(e).__name__, e)})
        try:  # server-side problems: backend/batcher failures are 5xx
            args = (x,) if mask is None else (x, mask)
            out = entry.batcher.submit(*args).result(timeout=600)
            if action == ":search":
                results = entry.index.query(np.asarray(out)[None], k=k)[0]
        except Exception as e:
            return self._send(500, {"error": "%s: %s" % (type(e).__name__, e)})
        if action == ":search":
            self._send(200, {"results": [{"name": n, "score": s}
                                         for n, s in results]})
        elif entry.meta["kind"] == "embedding":
            self._send(200, {"descriptor": [float(v) for v in out]})
        else:
            from PIL import Image
            out = np.asarray(out)
            if out.dtype != np.uint8:
                # f32 artifact (from_uint8=False): output is still normalized
                # — apply the host equivalent of device_quantize_rgb
                mean = np.asarray(entry.meta["mean_std"][0], np.float32)
                std = np.asarray(entry.meta["mean_std"][1], np.float32)
                rgb = np.clip(out * std + mean, 0, 1)
                out = np.floor(rgb * 255.0).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(out).save(buf, format="PNG")
            self._send(200, buf.getvalue(), ctype="image/png")


class _ModelEntry:
    def __init__(self, servable, max_batch, max_wait_ms, index=None):
        self.meta = servable.meta
        self.index = index
        self.batcher = BatchingService(
            servable, max_batch=max_batch, max_wait_ms=max_wait_ms)
        # artifacts exported with from_uint8=False expect the normalized f32
        # tensor: rebuild the host transform pipeline from the artifact's
        # own provenance (meta records the transform DSL + mean_std)
        self._host_tf = None
        if self.meta["input_dtype"] == "float32":
            from gandtr_tpu.data.transforms import initialize_transforms
            self._host_tf = initialize_transforms(
                self.meta["transforms"], self.meta["mean_std"])

    def prepare(self, img_u8):
        """Decoded+fitted uint8 (H, W, 3) -> the artifact's input dtype."""
        if self._host_tf is None:
            return img_u8
        from PIL import Image
        return np.asarray(self._host_tf(Image.fromarray(img_u8)),
                          np.float32)


def serve_http(models, host="127.0.0.1", port=0, max_batch=None,
               max_wait_ms=5.0, block=True, indices=None):
    """Serve `models` ({name: Servable-or-artifact-path}) over HTTP.

    Endpoints: GET /healthz, GET /v1/models, POST /v1/models/<name>:predict
    (body = JPEG/PNG/npy image; response = descriptor JSON or PNG), and —
    for embedding models with a RetrievalIndex in `indices[name]` —
    POST /v1/models/<name>:search?k=10 (image body → top-k {name, score}).
    With block=False returns the started server (`.server_address`,
    `.shutdown()`); its batchers are in `.models`."""
    from gandtr_tpu.serving.export import Servable, load_artifact

    entries = {}
    for name, m in models.items():
        servable = m if isinstance(m, Servable) else load_artifact(m)
        cap = max_batch or servable.buckets[-1]
        entries[name] = _ModelEntry(servable, cap, max_wait_ms,
                                    index=(indices or {}).get(name))

    server = ThreadingHTTPServer((host, port), _Handler)
    server.models = entries
    if not block:
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server
    try:
        server.serve_forever()
    finally:
        for e in entries.values():
            e.batcher.close()
