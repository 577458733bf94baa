"""FastAPI WebAPI — the reference's /t2v endpoints, schema-compatible.

Mirrors api_t2v.py:
  * ``GET /t2v/api_version`` → {"version": "1.0"} (:62-64)
  * ``GET /t2v/version``     → framework version (:66-68; the reference
    reports its git commit via A1111)
  * ``POST /t2v/run``        → same query parameters (:70-74), multipart
    uploads for ``vid2vid_input`` / ``inpainting_image`` (:99-120),
    response ``{"mp4s": ["data:video/mp4;base64,..."]}`` (:169),
    422 on validation error (:54-59), 500 JSON with the same detail string
    on processing error (:170-177), temp-file cleanup in finally (:178-193).

Additional endpoints (new surface, additive only):
  * ``POST /t2v/interrupt`` / ``POST /t2v/skip`` — cooperative cancel,
    the API-shaped equivalent of the reference UI's buttons;
  * ``GET /t2v/progress`` — sampling progress (A1111 progress API role).
"""

from __future__ import annotations

import logging
import os
import traceback
import uuid
from typing import Optional, Union

logger = logging.getLogger("t2v.api")

API_VERSION = "1.0"


def create_app(pipe=None, models_root: Optional[str] = None):
    from t2v.core.compile_cache import enable_compile_cache

    enable_compile_cache()
    from fastapi import FastAPI, Request, UploadFile
    from fastapi.encoders import jsonable_encoder
    from fastapi.exceptions import RequestValidationError
    from fastapi.responses import JSONResponse

    import t2v
    from t2v.core.config import T2VArgs, T2VOutputArgs, sanity_check_args
    from t2v.core.state import state
    from t2v.pipeline.run import run

    if models_root:
        os.environ["T2V_MODELS_ROOT"] = models_root

    app = FastAPI(title="t2v", version=t2v.__version__)

    @app.exception_handler(RequestValidationError)
    async def validation_exception_handler(request: Request, exc: RequestValidationError):
        return JSONResponse(
            status_code=422,
            content=jsonable_encoder({"detail": exc.errors(), "body": exc.body}),
        )

    @app.get("/")
    async def index():
        from fastapi.responses import HTMLResponse

        from t2v.api.webui import INDEX_HTML

        return HTMLResponse(content=INDEX_HTML)

    @app.get("/t2v/api_version")
    async def t2v_api_version():
        return JSONResponse(content={"version": API_VERSION})

    @app.get("/t2v/version")
    async def t2v_version():
        return JSONResponse(content={"version": t2v.__version__})

    @app.get("/t2v/progress")
    async def t2v_progress():
        return JSONResponse(
            content={
                "job": state.job,
                "job_no": state.job_no,
                "job_count": state.job_count,
                "sampling_step": state.sampling_step,
                "sampling_steps": state.sampling_steps,
                "interrupted": state.interrupted,
            }
        )

    @app.post("/t2v/interrupt")
    async def t2v_interrupt():
        state.interrupt()
        return JSONResponse(content={"interrupted": True})

    @app.post("/t2v/skip")
    async def t2v_skip():
        state.skip()
        return JSONResponse(content={"skipped": True})

    @app.post("/t2v/metadata")
    async def t2v_metadata(file: UploadFile):
        """MP4 ©cmt metadata viewer (reference UI accordion,
        args.py:160-175): returns the infotext comment atom."""
        import tempfile

        from t2v.media.video import read_mp4_metadata_comment

        with tempfile.NamedTemporaryFile(suffix=".mp4") as tmp:
            tmp.write(await file.read())
            tmp.flush()
            comment = read_mp4_metadata_comment(tmp.name)
        return JSONResponse(content={"comment": comment})

    @app.post("/t2v/run")
    async def t2v_run(
        prompt: str,
        n_prompt: Union[str, None] = None,
        model: Union[str, None] = None,
        model_type: Union[str, None] = None,
        sampler: Union[str, None] = None,
        steps: Union[int, None] = None,
        frames: Union[int, None] = None,
        seed: Union[int, None] = None,
        cfg_scale: Union[float, None] = None,
        width: Union[int, None] = None,
        height: Union[int, None] = None,
        eta: Union[float, None] = None,
        batch_count: Union[int, None] = None,
        do_vid2vid: bool = False,
        vid2vid_input: Union[UploadFile, None] = None,
        strength: Union[float, None] = None,
        vid2vid_startFrame: Union[int, None] = None,
        inpainting_image: Union[UploadFile, None] = None,
        inpainting_frames: Union[int, None] = None,
        inpainting_weights: Union[str, None] = None,
        fps: Union[int, None] = None,
        add_soundtrack: Union[str, None] = None,
        soundtrack_path: Union[str, None] = None,
    ):
        # defaults + non-None overrides (api_t2v.py:82-90)
        overrides = {
            k: v
            for k, v in dict(
                prompt=prompt, n_prompt=n_prompt, model=model,
                model_type=model_type, sampler=sampler,
                steps=steps, frames=frames, seed=seed, cfg_scale=cfg_scale,
                width=width, height=height, eta=eta, batch_count=batch_count,
                do_vid2vid=do_vid2vid, strength=strength,
                vid2vid_startFrame=vid2vid_startFrame,
                inpainting_frames=inpainting_frames,
                inpainting_weights=inpainting_weights,
            ).items()
            if v is not None
        }
        args = T2VArgs(**overrides)
        out_overrides = {
            k: v
            for k, v in dict(
                fps=fps, add_soundtrack=add_soundtrack, soundtrack_path=soundtrack_path
            ).items()
            if v is not None
        }
        out_args = T2VOutputArgs(**out_overrides)

        tmp_dir = os.path.join("outputs", "t2v_temp")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp_files: list[str] = []
        try:
            sanity_check_args(args)

            if args.inpainting_frames > 0 and inpainting_image is not None:
                p = os.path.join(tmp_dir, f"{uuid.uuid4()}.png")
                with open(p, "wb") as f:
                    f.write(await inpainting_image.read())
                tmp_files.append(p)
                args = args.replace(inpainting_image=p)

            if do_vid2vid and vid2vid_input is not None:
                p = os.path.join(tmp_dir, f"{uuid.uuid4()}.mp4")
                with open(p, "wb") as f:
                    f.write(await vid2vid_input.read())
                tmp_files.append(p)
                args = args.replace(vid2vid_input=p)

            # off the event loop: generation takes minutes, and /t2v/progress
            # + /t2v/interrupt must stay responsive while it runs
            import anyio

            result = await anyio.to_thread.run_sync(
                lambda: run(args, out_args, pipe=pipe)
            )
            return JSONResponse(content={"mp4s": result.data_urls})
        except ValueError as e:
            return JSONResponse(status_code=422, content={"detail": str(e)})
        except Exception as e:
            logger.error(f"Error processing the video: {e}")
            traceback.print_exc()
            return JSONResponse(
                status_code=500,
                content={"detail": "An error occurred while processing the video."},
            )
        finally:
            for p in tmp_files:
                try:
                    os.remove(p)
                except OSError:
                    pass

    return app
