"""API + orchestrator integration tests (tiny random-weight pipeline).

Exercises the stdlib HTTP server implementation of the /t2v surface
(schema per reference api_t2v.py) end-to-end over a real socket.
"""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from t2v.core.config import T2VArgs, T2VOutputArgs
from t2v.pipeline.pipeline import ModelScopePipeline
from t2v.pipeline.run import run


@pytest.fixture(scope="module")
def tiny_pipe():
    return ModelScopePipeline.random_init()


class TestSharedHandlers:
    """Both servers delegate to t2v.api.handlers; these pin the shared
    semantics (status codes + payload shapes) at the handler boundary, so
    the FastAPI transport — not importable in this image — and the stdlib
    transport cannot drift (round-1 review: their 422s differed subtly)."""

    def test_missing_prompt_is_fastapi_shaped_422(self):
        from t2v.api import handlers

        resp = handlers.run_response({}, {})
        assert resp.status == 422
        assert resp.payload["detail"][0]["loc"] == ["query", "prompt"]
        assert resp.payload["detail"][0]["msg"] == "field required"

    def test_bad_numeric_is_422_detail_string(self):
        from t2v.api import handlers

        resp = handlers.run_response({"prompt": "x", "steps": "abc"}, {})
        assert resp.status == 422
        assert isinstance(resp.payload["detail"], str)
        assert "steps" in resp.payload["detail"]

    def test_sanity_violation_is_422(self):
        from t2v.api import handlers

        resp = handlers.run_response({"prompt": "x", "steps": "0"}, {})
        assert resp.status == 422

    def test_model_omitted_requests_warm_pipe_reuse(self):
        from t2v.api import handlers

        args, _ = handlers.build_args({"prompt": "x"})
        assert args.model is None  # run() resolves: warm pipe else default
        args, _ = handlers.build_args({"prompt": "x", "model": "<modelscope>"})
        assert args.model == "<modelscope>"

    def test_upload_over_cap_is_413(self, monkeypatch):
        from t2v.api import handlers

        monkeypatch.setattr(handlers, "MAX_UPLOAD_BYTES", 16)
        resp = handlers.run_response(
            {"prompt": "x", "do_vid2vid": True},
            {"vid2vid_input": b"0" * 17},
        )
        assert resp.status == 413
        resp = handlers.metadata_response(b"0" * 17)
        assert resp.status == 413

    def test_typed_values_pass_coercion_unchanged(self):
        from t2v.api import handlers

        # the FastAPI transport hands over already-typed params
        args, out = handlers.build_args(
            {"prompt": "x", "steps": 7, "cfg_scale": 9.5, "fps": 30}
        )
        assert args.steps == 7 and args.cfg_scale == 9.5 and out.fps == 30


class TestRunOrchestrator:
    def test_txt2vid_end_to_end(self, tiny_pipe, tmp_path):
        args = T2VArgs(
            prompt="a cat", steps=3, frames=3, width=64, height=64, seed=5,
            batch_count=2,
        )
        result = run(
            args, T2VOutputArgs(fps=4), pipe=tiny_pipe, outdir=str(tmp_path)
        )
        assert len(result.videos) == 2
        assert len(result.data_urls) == 2
        assert result.data_urls[0].startswith("data:video/mp4;base64,")
        import os

        for d in result.frame_dirs:
            assert os.path.exists(os.path.join(d, "args.txt"))
            pngs = [f for f in os.listdir(d) if f.endswith(".png")]
            assert len(pngs) == 3

    def test_progressive_inpaint_through_run(self, tmp_path):
        """inpaint_mode='progressive' must actually change the output when
        requested through the public run() path (round-1 review: the
        parameter was silently inert — image_latents never reached
        sample_loop), and the windowed (interrupt-capable) execution must
        match the monolithic jit bit-for-bit."""
        import cv2
        import jax

        pipe = ModelScopePipeline.random_init()
        # random init zero-inits the head conv (checkpoint-parity gates);
        # perturb so eps carries signal and the blend has an effect
        pipe.unet_params = jax.tree.map(
            lambda a: a + 0.01 if a.size and not np.asarray(a).any() else a,
            pipe.unet_params,
        )
        img_path = str(tmp_path / "src.png")
        rng = np.random.default_rng(0)
        cv2.imwrite(img_path, rng.integers(0, 255, (64, 64, 3), np.uint8))

        args = T2VArgs(
            prompt="x", steps=4, frames=4, width=64, height=64, seed=3,
            inpainting_image=img_path, inpainting_frames=3,
        )
        out = T2VOutputArgs(fps=4, skip_video_creation=True)

        import os

        def frames_of(inpaint_mode, callback_interval, sub):
            r = run(
                args, out, pipe=pipe, outdir=str(tmp_path / sub),
                inpaint_mode=inpaint_mode, callback_interval=callback_interval,
            )
            d = r.frame_dirs[0]
            pngs = sorted(f for f in os.listdir(d) if f.endswith(".png"))
            return np.stack([cv2.imread(os.path.join(d, f)) for f in pngs])

        base = frames_of("initial_only", None, "a")
        prog = frames_of("progressive", None, "b")
        assert not np.array_equal(base, prog), "progressive mode is inert"
        prog_win = frames_of("progressive", 2, "c")
        np.testing.assert_array_equal(
            prog, prog_win, "windowed progressive diverges from monolithic"
        )

    def test_gif_delete_imgs_and_path_templates(self, tiny_pipe, tmp_path):
        import os

        args = T2VArgs(prompt="x", steps=2, frames=3, width=64, height=64, seed=7)
        out = T2VOutputArgs(
            fps=4,
            make_gif=True,
            delete_imgs=True,
            image_path="f_%03d.png",
            mp4_path=str(tmp_path / "custom" / "out.mp4"),
        )
        result = run(args, out, pipe=tiny_pipe, outdir=str(tmp_path))
        assert result.videos == [str(tmp_path / "custom" / "out.mp4")]
        assert os.path.exists(tmp_path / "custom" / "out.gif")
        d = result.frame_dirs[0]
        # PNGs deleted after the stitch; args.txt stays
        assert [f for f in os.listdir(d) if f.endswith(".png")] == []
        assert os.path.exists(os.path.join(d, "args.txt"))
        from PIL import Image

        gif = Image.open(tmp_path / "custom" / "out.gif")
        assert getattr(gif, "n_frames", 1) == 3

    def test_gif_without_video_creation(self, tiny_pipe, tmp_path):
        import os

        args = T2VArgs(prompt="x", steps=2, frames=2, width=64, height=64, seed=8)
        out = T2VOutputArgs(fps=4, make_gif=True, skip_video_creation=True)
        result = run(args, out, pipe=tiny_pipe, outdir=str(tmp_path))
        assert result.videos == []
        d = result.frame_dirs[0]
        assert os.path.exists(os.path.join(d, "vid.gif"))

    def test_interrupt_stops_batches(self, tiny_pipe, tmp_path):
        from t2v.core.state import JobState

        st = JobState()
        calls = []

        orig = st.step_callback

        def cb(step):
            calls.append(step)
            if len(calls) >= 1:
                st.interrupt()
            orig(step)

        st.step_callback = cb
        args = T2VArgs(prompt="x", steps=4, frames=2, width=64, height=64, seed=1, batch_count=3)
        result = run(args, pipe=tiny_pipe, outdir=str(tmp_path), job_state=st, callback_interval=1)
        assert result.interrupted
        assert len(result.videos) == 0


@pytest.fixture(scope="module")
def server(tiny_pipe):
    from t2v.api.stdlib_server import serve

    srv = serve(port=0, pipe=tiny_pipe, block=False)
    host, port = srv.server_address
    yield f"http://{host}:{port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.status, json.loads(r.read())


def _post(url, data=b""):
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestAPI:
    def test_api_version(self, server):
        status, body = _get(f"{server}/t2v/api_version")
        assert status == 200 and body == {"version": "1.0"}

    def test_index_webui(self, server):
        with urllib.request.urlopen(f"{server}/", timeout=60) as r:
            assert r.status == 200
            assert "text/html" in r.headers["Content-Type"]
            html = r.read().decode()
        # the UI must wire the same endpoints it is served beside
        for needle in ("/t2v/run", "/t2v/progress", "/t2v/interrupt", "/t2v/skip"):
            assert needle in html

    def test_version(self, server):
        status, body = _get(f"{server}/t2v/version")
        assert status == 200 and "version" in body

    def test_run_minimal(self, server, tmp_path, monkeypatch):
        import os

        os.chdir(tmp_path)  # outputs land in tmp
        status, body = _post(
            f"{server}/t2v/run?prompt=a+cat&steps=3&frames=3&width=64&height=64&seed=3"
        )
        assert status == 200, body
        assert body["mp4s"][0].startswith("data:video/mp4;base64,")

    def test_run_missing_prompt_422(self, server):
        status, body = _post(f"{server}/t2v/run?steps=3")
        assert status == 422

    def test_run_bad_args_422(self, server):
        status, body = _post(f"{server}/t2v/run?prompt=x&cfg_scale=0")
        assert status == 422
        assert "CFG scale" in str(body["detail"])

    def test_run_bad_sampler_422(self, server):
        status, body = _post(f"{server}/t2v/run?prompt=x&sampler=PLMS")
        assert status == 422

    def test_progress_and_interrupt_endpoints(self, server):
        status, body = _get(f"{server}/t2v/progress")
        assert status == 200 and "sampling_step" in body
        status, body = _post(f"{server}/t2v/interrupt")
        assert status == 200 and body["interrupted"]
        from t2v.core.state import state

        state.reset()


class TestJobSerialization:
    """Concurrent /t2v/run requests must queue like the reference's
    wrap_gradio_gpu_call GPU queue (text2vid.py:82): one generate job at a
    time, interrupt/skip targeting the RUNNING job (handlers._run_lock)."""

    def test_concurrent_requests_serialize(self, server, tiny_pipe, monkeypatch, tmp_path):
        import os
        import threading
        import time as time_mod

        from t2v.pipeline.pipeline import InferResult

        os.chdir(tmp_path)
        gauge = {"active": 0, "max": 0}
        glock = threading.Lock()
        frame = np.zeros((16, 16, 3), np.uint8)

        real_infer = type(tiny_pipe).infer

        def slow_infer(self, args, **kw):
            with glock:
                gauge["active"] += 1
                gauge["max"] = max(gauge["max"], gauge["active"])
            time_mod.sleep(0.25)
            with glock:
                gauge["active"] -= 1
            import jax.numpy as jnp

            return InferResult(
                frames=[frame] * args.frames,
                latents=jnp.zeros((1, args.frames, 8, 8, 4)),
                infotext=f"test {args.prompt}",
            )

        monkeypatch.setattr(type(tiny_pipe), "infer", slow_infer)
        try:
            results = []

            def post(tag):
                results.append(
                    _post(f"{server}/t2v/run?prompt={tag}&steps=2&frames=2"
                          f"&width=64&height=64&seed=1")
                )

            threads = [threading.Thread(target=post, args=(t,)) for t in ("a", "b")]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert all(status == 200 for status, _ in results), results
            assert gauge["max"] == 1, "two generate jobs overlapped"
        finally:
            monkeypatch.setattr(type(tiny_pipe), "infer", real_infer)

    def test_interrupt_targets_running_job(self, server, tiny_pipe, monkeypatch, tmp_path):
        """Job A runs (polling its callback), job B queues. An interrupt
        stops A; B then runs to completion because run() resets the shared
        JobState only once it holds the run lock."""
        import os
        import threading
        import time as time_mod

        from t2v.core.state import state
        from t2v.pipeline.pipeline import InferResult

        os.chdir(tmp_path)
        state.reset()
        frame = np.zeros((16, 16, 3), np.uint8)
        a_started = threading.Event()
        order = []

        real_infer = type(tiny_pipe).infer

        def fake_infer(self, args, callback=None, **kw):
            import jax.numpy as jnp

            if args.prompt == "jobA":
                a_started.set()
                for i in range(400):  # poll until interrupted (raises)
                    time_mod.sleep(0.02)
                    if callback is not None:
                        callback(i)
            order.append(args.prompt)
            return InferResult(
                frames=[frame] * args.frames,
                latents=jnp.zeros((1, args.frames, 8, 8, 4)),
                infotext=f"test {args.prompt}",
            )

        monkeypatch.setattr(type(tiny_pipe), "infer", fake_infer)
        try:
            results = {}

            def post(tag):
                results[tag] = _post(
                    f"{server}/t2v/run?prompt={tag}&steps=2&frames=2"
                    f"&width=64&height=64&seed=1"
                )

            ta = threading.Thread(target=post, args=("jobA",))
            ta.start()
            assert a_started.wait(timeout=60), "job A never started"
            tb = threading.Thread(target=post, args=("jobB",))
            tb.start()
            time_mod.sleep(0.2)  # let B queue on the run lock
            status, body = _post(f"{server}/t2v/interrupt")
            assert status == 200
            ta.join(timeout=120)
            tb.join(timeout=120)

            # A was interrupted -> 200 with no videos (reference returns
            # the batch-loop early-exit, not an error)
            assert results["jobA"][0] == 200
            assert results["jobA"][1]["mp4s"] == []
            # B ran AFTER the interrupt and completed with a video
            assert results["jobB"][0] == 200
            assert len(results["jobB"][1]["mp4s"]) == 1
            assert order == ["jobB"], "job B's infer should be the only completion"
        finally:
            monkeypatch.setattr(type(tiny_pipe), "infer", real_infer)
            state.reset()


class TestFastAPIAppExecuted:
    """Execute t2v/api/app.py's route coroutines (fastapi isn't installed
    in this image, so the minimal stub surface in tests/_fastapi_stub.py
    stands in for the transport — app.py's own lines run)."""

    def _app(self, monkeypatch, pipe=None):
        import _fastapi_stub as stub

        stub.install(monkeypatch)
        from t2v.api.app import create_app

        return stub, create_app(pipe=pipe)

    def test_meta_routes(self, monkeypatch):
        import t2v

        stub, app = self._app(monkeypatch)
        assert stub.drive(app, "GET", "/t2v/api_version").json() == {
            "version": "1.0"
        }
        assert stub.drive(app, "GET", "/t2v/version").json() == {
            "version": t2v.__version__
        }
        prog = stub.drive(app, "GET", "/t2v/progress").json()
        assert {"job", "job_no", "sampling_step"} <= set(prog)
        html = stub.drive(app, "GET", "/")
        assert "<html" in html.content.lower()

    def test_interrupt_and_skip(self, monkeypatch):
        stub, app = self._app(monkeypatch)
        assert stub.drive(app, "POST", "/t2v/interrupt").status_code == 200
        assert stub.drive(app, "POST", "/t2v/skip").status_code == 200

    def test_run_route_end_to_end(self, tiny_pipe, monkeypatch, tmp_path):
        monkeypatch.chdir(tmp_path)
        stub, app = self._app(monkeypatch, pipe=tiny_pipe)
        r = stub.drive(
            app, "POST", "/t2v/run",
            prompt="a fish", steps=2, frames=2, width=32, height=32,
            seed=3, model=None,
        )
        assert r.status_code == 200, r.json()
        assert r.json()["mp4s"][0].startswith("data:video/mp4;base64,")

    def test_run_route_forwards_keep_in_vram(self, tiny_pipe, monkeypatch, tmp_path):
        """Round-4 review: the FastAPI route dropped keep_in_vram, so the
        3-state retention option was dead on this transport (the stdlib
        server honored it) — the two transports must stay equivalent."""
        import t2v.pipeline.run as run_mod

        monkeypatch.chdir(tmp_path)
        stub, app = self._app(monkeypatch, pipe=tiny_pipe)
        saved_warm = run_mod._warm_pipe
        try:
            r = stub.drive(
                app, "POST", "/t2v/run",
                prompt="a fish", steps=2, frames=2, width=32, height=32,
                seed=3, model=None, keep_in_vram="None",
            )
            assert r.status_code == 200, r.json()
            assert run_mod._warm_pipe is None

            r = stub.drive(
                app, "POST", "/t2v/run",
                prompt="a fish", steps=2, frames=2, width=32, height=32,
                seed=3, model=None, keep_in_vram="Sometimes",
            )
            assert r.status_code == 422
        finally:
            run_mod._warm_pipe = saved_warm

    def test_run_route_422_shape(self, monkeypatch):
        stub, app = self._app(monkeypatch, pipe=None)
        r = stub.drive(app, "POST", "/t2v/run", prompt="x", steps="NaN")
        assert r.status_code == 422
        assert "detail" in r.json()
