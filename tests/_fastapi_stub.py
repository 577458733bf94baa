"""Minimal FastAPI-surface stub for executing ``t2v/api/app.py`` when the
real fastapi isn't installed (this image). Implements exactly the names
app.py imports — FastAPI (route registration), UploadFile, Request,
JSONResponse/HTMLResponse, jsonable_encoder, RequestValidationError — so
the module's own route coroutines run end-to-end in tests.

Not a web server: ``drive(app, method, path, **kwargs)`` awaits the
registered coroutine directly, which is the point — every line of
app.py's handlers executes, while transport concerns (uvicorn, query
parsing) stay with the real fastapi in production.
"""

from __future__ import annotations

import asyncio
import sys
import types
from typing import Any, Optional


class JSONResponse:
    def __init__(self, content=None, status_code: int = 200):
        self.status_code = status_code
        self.content = content

    def json(self):
        return self.content


class HTMLResponse:
    def __init__(self, content=""):
        self.status_code = 200
        self.content = content


def jsonable_encoder(obj):
    if isinstance(obj, dict):
        return {k: jsonable_encoder(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [jsonable_encoder(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


class RequestValidationError(Exception):
    def __init__(self, errors, body=None):
        super().__init__(str(errors))
        self._errors = errors
        self.body = body

    def errors(self):
        return self._errors


class Request:
    pass


class UploadFile:
    """Wraps raw bytes with the async read(n) surface app.py uses."""

    def __init__(self, blob: bytes, filename: str = "upload.bin"):
        self._blob = blob
        self.filename = filename

    async def read(self, n: Optional[int] = None) -> bytes:
        return self._blob if n is None else self._blob[:n]


class FastAPI:
    def __init__(self, **kw):
        self.routes: dict[tuple[str, str], Any] = {}
        self.exception_handlers: dict[type, Any] = {}

    def _register(self, method, path):
        def deco(fn):
            self.routes[(method, path)] = fn
            return fn

        return deco

    def get(self, path):
        return self._register("GET", path)

    def post(self, path):
        return self._register("POST", path)

    def exception_handler(self, exc_type):
        def deco(fn):
            self.exception_handlers[exc_type] = fn
            return fn

        return deco


def install(monkeypatch) -> None:
    """Inject the stub as ``fastapi`` (+submodules) into sys.modules for
    the duration of a test (monkeypatch restores the real state)."""
    fastapi = types.ModuleType("fastapi")
    fastapi.FastAPI = FastAPI
    fastapi.Request = Request
    fastapi.UploadFile = UploadFile

    encoders = types.ModuleType("fastapi.encoders")
    encoders.jsonable_encoder = jsonable_encoder
    exceptions = types.ModuleType("fastapi.exceptions")
    exceptions.RequestValidationError = RequestValidationError
    responses = types.ModuleType("fastapi.responses")
    responses.JSONResponse = JSONResponse
    responses.HTMLResponse = HTMLResponse

    fastapi.encoders = encoders
    fastapi.exceptions = exceptions
    fastapi.responses = responses
    for name, mod in (
        ("fastapi", fastapi),
        ("fastapi.encoders", encoders),
        ("fastapi.exceptions", exceptions),
        ("fastapi.responses", responses),
    ):
        monkeypatch.setitem(sys.modules, name, mod)


def drive(app: FastAPI, method: str, path: str, **kwargs):
    """Await the registered route coroutine; returns its response object.
    A RequestValidationError is routed through the app's registered
    handler, like starlette would."""
    fn = app.routes[(method, path)]
    try:
        return asyncio.run(fn(**kwargs))
    except RequestValidationError as e:
        handler = app.exception_handlers[RequestValidationError]
        return asyncio.run(handler(Request(), e))
