"""Dependency-free HTTP server for the /t2v API.

FastAPI is not available in every serving image; this stdlib
ThreadingHTTPServer implements the same endpoint surface as
t2v.api.app.create_app (which mirrors reference api_t2v.py):

  GET  /t2v/api_version   GET  /t2v/version   GET  /t2v/progress
  POST /t2v/interrupt     POST /t2v/skip
  POST /t2v/run?prompt=...&steps=...   (query params; multipart file
       uploads for vid2vid_input / inpainting_image)

Responses and status codes (422 validation / 500 processing error with the
reference's detail string) match the FastAPI app.
"""

from __future__ import annotations

import json
import os
import threading
import traceback
import uuid
from email.parser import BytesParser
from email.policy import default as email_policy
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import t2v
from t2v.api.app import API_VERSION
from t2v.core.config import T2VArgs, T2VOutputArgs, sanity_check_args
from t2v.core.state import state

_INT_FIELDS = {
    "steps", "frames", "seed", "width", "height", "batch_count",
    "vid2vid_startFrame", "inpainting_frames", "fps",
}
_FLOAT_FIELDS = {"cfg_scale", "eta", "strength"}
_BOOL_FIELDS = {"do_vid2vid"}


def _coerce(name: str, value: str):
    if name in _INT_FIELDS:
        return int(value)
    if name in _FLOAT_FIELDS:
        return float(value)
    if name in _BOOL_FIELDS:
        return value.lower() in ("1", "true", "yes", "on")
    return value


class T2VRequestHandler(BaseHTTPRequestHandler):
    pipe = None  # class attribute set by serve()

    def _json(self, content: dict, status: int = 200):
        body = json.dumps(content).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quieter default logging
        pass

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/":
            from t2v.api.webui import INDEX_HTML

            body = INDEX_HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if path == "/t2v/api_version":
            return self._json({"version": API_VERSION})
        if path == "/t2v/version":
            return self._json({"version": t2v.__version__})
        if path == "/t2v/progress":
            return self._json(
                {
                    "job": state.job,
                    "job_no": state.job_no,
                    "job_count": state.job_count,
                    "sampling_step": state.sampling_step,
                    "sampling_steps": state.sampling_steps,
                    "interrupted": state.interrupted,
                }
            )
        self._json({"detail": "Not Found"}, 404)

    def do_POST(self):
        parsed = urlparse(self.path)
        if parsed.path == "/t2v/interrupt":
            state.interrupt()
            return self._json({"interrupted": True})
        if parsed.path == "/t2v/skip":
            state.skip()
            return self._json({"skipped": True})
        if parsed.path == "/t2v/metadata":
            import tempfile

            from t2v.media.video import read_mp4_metadata_comment

            uploads = self._read_uploads()
            blob = next(iter(uploads.values()), None)
            if blob is None:
                return self._json({"detail": "no file uploaded"}, 422)
            with tempfile.NamedTemporaryFile(suffix=".mp4") as tmp:
                tmp.write(blob)
                tmp.flush()
                comment = read_mp4_metadata_comment(tmp.name)
            return self._json({"comment": comment})
        if parsed.path != "/t2v/run":
            return self._json({"detail": "Not Found"}, 404)

        query = {k: v[-1] for k, v in parse_qs(parsed.query).items()}
        uploads = self._read_uploads()
        self._run(query, uploads)

    def _read_uploads(self) -> dict[str, bytes]:
        length = int(self.headers.get("Content-Length") or 0)
        ctype = self.headers.get("Content-Type", "")
        if length == 0 or "multipart/form-data" not in ctype:
            if length:
                self.rfile.read(length)
            return {}
        raw = self.rfile.read(length)
        msg = BytesParser(policy=email_policy).parsebytes(
            b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + raw
        )
        out = {}
        for part in msg.iter_parts():
            name = part.get_param("name", header="content-disposition")
            if name:
                out[name] = part.get_payload(decode=True)
        return out

    def _run(self, query: dict[str, str], uploads: dict[str, bytes]):
        from t2v.pipeline.run import run

        if "prompt" not in query:
            return self._json(
                {"detail": [{"loc": ["query", "prompt"], "msg": "field required"}]},
                422,
            )
        try:
            overrides = {}
            for k, v in query.items():
                if hasattr(T2VArgs(), k):
                    overrides[k] = _coerce(k, v)
            args = T2VArgs(**overrides)
            out_overrides = {
                k: _coerce(k, v)
                for k, v in query.items()
                if k in ("fps", "add_soundtrack", "soundtrack_path")
            }
            out_args = T2VOutputArgs(**out_overrides)

            tmp_dir = os.path.join("outputs", "t2v_temp")
            os.makedirs(tmp_dir, exist_ok=True)
            tmp_files = []
            try:
                if args.inpainting_frames > 0 and "inpainting_image" in uploads:
                    p = os.path.join(tmp_dir, f"{uuid.uuid4()}.png")
                    with open(p, "wb") as f:
                        f.write(uploads["inpainting_image"])
                    tmp_files.append(p)
                    args = args.replace(inpainting_image=p)
                if args.do_vid2vid and "vid2vid_input" in uploads:
                    p = os.path.join(tmp_dir, f"{uuid.uuid4()}.mp4")
                    with open(p, "wb") as f:
                        f.write(uploads["vid2vid_input"])
                    tmp_files.append(p)
                    args = args.replace(vid2vid_input=p)

                sanity_check_args(args)
                result = run(args, out_args, pipe=self.pipe)
                return self._json({"mp4s": result.data_urls})
            finally:
                for p in tmp_files:
                    try:
                        os.remove(p)
                    except OSError:
                        pass
        except ValueError as e:
            return self._json({"detail": str(e)}, 422)
        except Exception as e:
            traceback.print_exc()
            return self._json(
                {"detail": "An error occurred while processing the video."}, 500
            )


def serve(host: str = "127.0.0.1", port: int = 7860, pipe=None, *, block: bool = True):
    """Start the API server. Returns the server object (non-blocking mode
    runs it on a daemon thread — used by tests)."""
    from t2v.core.compile_cache import enable_compile_cache

    enable_compile_cache()
    handler = type("Handler", (T2VRequestHandler,), {"pipe": pipe})
    server = ThreadingHTTPServer((host, port), handler)
    if block:
        print(f"t2v API listening on http://{host}:{port}")
        server.serve_forever()
    else:
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
    return server
