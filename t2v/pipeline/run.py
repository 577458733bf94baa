"""Job runner — the reference's ``render.run`` + ``process_modelscope``
orchestration (render.py:15-44, process_modelscope.py:34-266) rebuilt:

  * dispatches on ``model_type`` (ModelScope | VideoCrafter);
  * model hot-switch by directory (process_modelscope.py:62-66);
  * vid2vid frame extraction → latent encode → ``skip_steps =
    floor(steps*(1-strength))`` (:80-147);
  * img2vid keyframed inpainting mask (:170-219, strength forced to 1);
  * per-batch loop with cooperative interrupt/skip via
    ``t2v.core.state.JobState`` and seed+batch policy (:160-226);
  * PNG frame dump + ``args.txt`` infotext + mp4 stitch with metadata +
    base64 data-URLs (:229-266).

Where the reference renders a hardcoded error video on failure
(render.py:35-37, error_hardcode.py), we return a structured error — the
API layer converts it to the same observable behaviour.
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from t2v.core.config import T2VArgs, T2VOutputArgs, sanity_check_args
from t2v.core.state import InterruptedException, JobState, SkippedException, state as default_state
from t2v.media.video import ffmpeg_stitch_video, vid2frames, video_to_data_url
from t2v.pipeline.pipeline import ModelScopePipeline, load_pipeline


@dataclass
class RunResult:
    videos: list[str] = field(default_factory=list)  # mp4 paths
    data_urls: list[str] = field(default_factory=list)
    frame_dirs: list[str] = field(default_factory=list)
    infotexts: list[str] = field(default_factory=list)
    interrupted: bool = False


def _default_outdir() -> str:
    return os.path.join(os.getcwd(), "outputs", "text2video")


# the reference's module-global warm pipe (process_modelscope.py:29): reused
# when a request omits the model; cleared when keep_in_vram is off
_warm_pipe = None


def _retention(keep_in_vram) -> str:
    """Normalise the reference's 3-state keep-in-VRAM option
    (t2v_pipeline.py:74; render.py:40-43; UI strings text2vid.py:93):
    'All'/True -> "all", 'Main Model Only' -> "model" (retain UNet, drop
    VAE/CLIP + their jit caches between runs), 'None'/False/None ->
    "none" (nothing retained)."""
    if keep_in_vram in (True, "All", "all"):
        return "all"
    if keep_in_vram in ("Main Model Only", "model", "main model only"):
        return "model"
    if keep_in_vram in (False, None, "None", "none"):
        return "none"
    raise ValueError(f"invalid keep_in_vram value {keep_in_vram!r}")


def _prepare_vid2vid(pipe: ModelScopePipeline, args: T2VArgs):
    """vid2vid inputs (process_modelscope.py:80-147)."""
    import math

    frames = vid2frames(
        args.vid2vid_input,
        start_frame=args.vid2vid_startFrame,
        end_frame=args.vid2vid_startFrame + args.frames,
    )
    if len(frames) < args.frames:
        raise ValueError(
            f"source video supplied {len(frames)} frames, need {args.frames}"
        )
    import cv2

    resized = [
        cv2.resize(f, (args.width, args.height), interpolation=cv2.INTER_LANCZOS4)
        for f in frames
    ]
    arr = np.stack(resized).astype(np.float32) / 255.0 * 2.0 - 1.0
    latents = pipe.compute_latents(arr)
    skip_steps = int(
        math.floor(args.steps * max(0.0, min(1.0 - args.strength, 1.0)))
    )
    return latents, skip_steps


def run(
    args: T2VArgs,
    out_args: T2VOutputArgs | None = None,
    *,
    pipe: Optional[ModelScopePipeline] = None,
    outdir: Optional[str] = None,
    job_state: Optional[JobState] = None,
    save_frames: bool = True,
    callback_interval: Optional[int] = 5,
    error_video_on_failure: bool = False,
    adapter_ckpt: Optional[str] = None,
    adapter_video: Optional[str] = None,
    depth_ckpt: Optional[str] = None,
    depth_estimator=None,  # injectable (N,384,384,3)->(N,h,w) callable
    dp_shards: int = 1,
    tp_shards: int = 1,
    sp_shards: int = 1,
    deep_cache_interval: int = 1,
    keep_in_vram: bool | str | None = True,
    inpaint_mode: str = "initial_only",
    vc_sample_type: str = "ddim",
    vc_uc_type: Optional[str] = None,
) -> RunResult:
    """error_video_on_failure=True reproduces the reference UI behaviour:
    any generation exception yields the error-placeholder data-URL instead
    of propagating (render.py:15-44, error_hardcode.py). The API layer uses
    the exception path (api_t2v.py 500 handling).

    keep_in_vram mirrors the reference's 3-state webui option
    (render.py:40-43, t2v_pipeline.py:74): 'All'/True retains the whole
    pipeline; 'Main Model Only' retains the UNet but drops VAE/CLIP and
    their jit caches after the run (they reload from the model dir on the
    next request); 'None'/False retains nothing."""
    if error_video_on_failure:
        try:
            return run(
                args, out_args, pipe=pipe, outdir=outdir, job_state=job_state,
                save_frames=save_frames, callback_interval=callback_interval,
                error_video_on_failure=False,
                adapter_ckpt=adapter_ckpt, adapter_video=adapter_video,
                dp_shards=dp_shards, tp_shards=tp_shards, sp_shards=sp_shards,
                deep_cache_interval=deep_cache_interval,
                keep_in_vram=keep_in_vram, inpaint_mode=inpaint_mode,
                vc_sample_type=vc_sample_type, vc_uc_type=vc_uc_type,
            )
        except Exception:
            import traceback

            traceback.print_exc()
            from t2v.media.error_video import get_error_video_data_url

            return RunResult(data_urls=[get_error_video_data_url()])

    out_args = out_args or T2VOutputArgs()
    job_state = job_state or default_state
    sanity_check_args(args)
    retention = _retention(keep_in_vram)

    global _warm_pipe
    if pipe is None:
        if args.model is None and _warm_pipe is not None:
            # warm-pipe quirk: an omitted model with a loaded pipe reuses
            # the previous model instead of the default
            # (process_modelscope.py:62-66)
            pipe = _warm_pipe
        # '<videocrafter>' implies the family even when model_type was not
        # set explicitly (the UI/API may pass only the model selector)
        elif args.model_type == "VideoCrafter" or args.model == "<videocrafter>":
            from t2v.pipeline.videocrafter import load_vc_pipeline

            model = args.model or "<videocrafter>"
            model_dir = _resolve_model_dir(
                model if model != "<modelscope>" else "<videocrafter>"
            )
            pipe = load_vc_pipeline(model_dir, keep_in_vram=retention != "none")
        else:
            pipe = load_pipeline(
                _resolve_model_dir(args.model or "<modelscope>"),
                keep_in_vram=retention != "none",
            )
    _warm_pipe = pipe if retention != "none" else None
    # a warm pipe retained under 'Main Model Only' comes back without its
    # VAE/CLIP — restore them from the model dir before use
    # (t2v_pipeline.py:253,297: the reference re-moves them onto the GPU);
    # reload_aux no-ops when the components are resident
    if hasattr(pipe, "reload_aux"):
        pipe.reload_aux()

    job_state.reset()
    result = RunResult()
    timestring = time.strftime("%Y%m%d%H%M%S")
    outdir = outdir or _default_outdir()

    # vid2vid / img2vid preparation (outside the batch loop, like the
    # reference's latent prep)
    latents = None
    mask = None
    skip_steps = 0
    is_vid2vid = False
    if args.do_vid2vid and args.vid2vid_input:
        latents, skip_steps = _prepare_vid2vid(pipe, args)
        is_vid2vid = True

    # depth-adapter conditioning (VideoCrafter; the reference's separate
    # sample_text2video_adapter.py CLI). With depth_ckpt/depth_estimator
    # the video is ORDINARY RGB and depth is computed in-pipeline —
    # reference behaviour (get_batch_depth, sample_text2video_adapter.py:
    # 113, ddpm3d.py:1443-1466). Without one, the video is treated as
    # precomputed depth maps (grayscale or RGB — first channel used).
    features_adapter = None
    if adapter_ckpt and not isinstance(pipe, ModelScopePipeline):
        adapter, adapter_params = pipe.load_adapter(adapter_ckpt)
        if not adapter_video:
            raise ValueError(
                "adapter_ckpt requires adapter_video (an RGB video when "
                "depth_ckpt is set, else precomputed depth maps)"
            )
        import cv2

        dframes = vid2frames(adapter_video, start_frame=0, end_frame=args.frames)
        if len(dframes) < args.frames:
            raise ValueError(
                f"adapter video supplied {len(dframes)} frames, need {args.frames}"
            )
        if depth_ckpt or depth_estimator is not None:
            from t2v.models.depth import DepthStage

            stage = (
                DepthStage(estimator=depth_estimator)
                if depth_estimator is not None
                else DepthStage.from_checkpoint(depth_ckpt)
            )
            d = stage.video_depth(
                np.stack(dframes), (args.height, args.width)
            ).astype(np.float32)
        else:
            d = np.stack(
                [cv2.resize(f, (args.width, args.height)) for f in dframes]
            ).astype(np.float32)[..., :1]
            # per-frame min/max → [-1, 1] (get_batch_depth, ddpm3d.py:1462-1464)
            dmin = d.min(axis=(1, 2, 3), keepdims=True)
            dmax = d.max(axis=(1, 2, 3), keepdims=True)
            d = 2.0 * (d - dmin) / (dmax - dmin + 1e-7) - 1.0
        features_adapter = pipe.adapter_features(adapter, adapter_params, d[None])

    from t2v.core import rng as rng_lib

    resolved_seed = rng_lib.resolve_seed(args.seed)

    # Mesh-sharded sampling (beyond the reference's DDP, §5.8 + SURVEY §7):
    # all batch_count samples in one computation over a dp×sp×tp mesh.
    #   dp — sample/batch parallel (the reference's DDP semantics);
    #   sp — the FRAME axis sharded (long-context videos, §5.7);
    #   tp — Megatron tensor parallelism over attention/MLP features
    #        (t2v/parallel/sharding.py) so ONE video can use many chips.
    # vid2vid and inpainting ride the mesh too (the reference's DDP had no
    # mode restriction, sample_text2video.py:174-188): the vid2vid source
    # latents broadcast against per-sample noise, and the inpaint init is
    # built per-sample below. eta > 0 / progressive re-blends are allowed:
    # each sample draws distinct per-step noise inside the batched scan,
    # but the draws use a shared stream rather than the serial path's
    # per-batch keys — DP==serial bit-parity holds only where no step
    # noise is drawn (eta == 0, initial_only inpainting).
    # VC 'ddpm' chains keep the serial loop (ancestral chain over all 1000
    # timesteps — not a registry sampler).
    try:
        if (dp_shards > 1 or tp_shards > 1 or sp_shards > 1) and (
            isinstance(pipe, ModelScopePipeline) or vc_sample_type != "ddpm"
        ):
            result = _run_dp(
                pipe, args, out_args, outdir, resolved_seed, timestring,
                save_frames, dp_shards, tp_shards, sp_shards, features_adapter,
                job_state,
                latents=latents, skip_steps=skip_steps, is_vid2vid=is_vid2vid,
                inpaint_mode=inpaint_mode, vc_sample_type=vc_sample_type,
                vc_uc_type=vc_uc_type,
            )
            return result

        for batch in range(args.batch_count):
            if job_state.interrupted:
                result.interrupted = True
                break
            job_state.begin_job(batch, args.batch_count, args.steps - skip_steps)

            batch_args = args.replace(seed=resolved_seed)

            image_latents = None
            vc_mask = vc_source = None
            if args.inpainting_frames > 0 and args.inpainting_image:
                import cv2

                img = cv2.cvtColor(cv2.imread(args.inpainting_image), cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (args.width, args.height))
                if isinstance(pipe, ModelScopePipeline):
                    key = rng_lib.key_for_seed(resolved_seed + batch)
                    latents, mask, image_latents = pipe.build_inpainting_inputs(
                        img, batch_args, key
                    )
                    batch_args = batch_args.replace(strength=1.0)
                else:
                    # LVDM static mask blend (lvdm ddim.py:188-195)
                    vc_mask, vc_source = pipe.build_inpainting_inputs(img, batch_args)

            try:
                if isinstance(pipe, ModelScopePipeline):
                    res = pipe.infer(
                        batch_args,
                        latents=latents,
                        mask=mask,
                        image_latents=image_latents,
                        skip_steps=skip_steps,
                        is_vid2vid=is_vid2vid,
                        batch_index=batch,
                        callback=job_state.step_callback,
                        callback_interval=callback_interval,
                        deep_cache_interval=deep_cache_interval,
                        inpaint_mode=inpaint_mode,
                    )
                else:
                    # VideoCrafter: txt2vid (+ optional depth adapter, mask
                    # inpaint, ddpm chain, uc_type CFG variants)
                    # (process_videocrafter.py:12-98, sample_text2video_adapter.py,
                    # lvdm ddim.py:188-241, sample_utils.py:56-87)
                    res = pipe.infer(
                        batch_args,
                        batch_index=batch,
                        callback=job_state.step_callback,
                        callback_interval=callback_interval,
                        features_adapter=features_adapter,
                        sample_type=vc_sample_type,
                        mask=vc_mask,
                        source_latents=vc_source,
                        uc_type=vc_uc_type,
                    )
            except SkippedException:
                continue
            except InterruptedException:
                result.interrupted = True
                break

            _emit_batch(
                result, res.frames, res.infotext, args, out_args, outdir,
                timestring, batch, resolved_seed + batch, save_frames,
            )

        return result
    finally:
        # 'Main Model Only': retain the warm UNet, drop VAE/CLIP until the
        # next request (render.py:40-43, t2v_pipeline.py:367-373). Runs in a
        # finally so the retention contract holds even when infer/save
        # raises mid-run (round-4 advisor finding).
        if retention == "model" and hasattr(pipe, "release_aux"):
            pipe.release_aux()


def _emit_batch(
    result: RunResult, frames, infotext, args, out_args, outdir, timestring,
    batch: int, seed: int, save_frames: bool,
) -> None:
    """PNG dump + args.txt + manifest + mp4 stitch + data-URL for one batch
    (process_modelscope.py:229-266)."""
    batch_dir = os.path.join(
        outdir, timestring if batch == 0 else f"{timestring}_{batch}"
    )
    os.makedirs(batch_dir, exist_ok=True)

    def _img_path(i: int) -> str:
        # image_path template (args.py:268, e.g. ".../%09d.png"); relative
        # templates resolve inside the batch dir. Substitute ONLY the first
        # %d spec — templates with stray '%' or extra conversions (e.g.
        # 'f_%03d_%s.png', '50%_%d.png') must not blow up at emit time,
        # after the expensive sampling already ran
        tpl = out_args.image_path
        if tpl:
            spec = re.search(r"%0?\d*d", tpl)
            if spec:
                p = tpl[: spec.start()] + (spec.group() % i) + tpl[spec.end():]
            else:
                p = os.path.join(tpl, f"{i:09d}.png")
            return p if os.path.isabs(p) else os.path.join(batch_dir, p)
        return os.path.join(batch_dir, f"{i:09d}.png")

    written_pngs: list[str] = []
    if save_frames:
        import cv2

        for i, frame in enumerate(frames):
            p = _img_path(i)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            cv2.imwrite(p, cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            written_pngs.append(p)
        with open(os.path.join(batch_dir, "args.txt"), "w") as f:
            f.write(infotext)
        from t2v.core.profiling import RunManifest

        RunManifest.from_args(args, seed=seed).write(batch_dir)

    # functional upscale / frame interpolation (the reference carries these
    # fields but never implements them — args.py:277-290 stubs)
    fps = out_args.fps
    if out_args.r_upscale_video or (
        (out_args.frame_interpolation_engine or "None") != "None"
    ):
        from t2v.media.postprocess import postprocess_frames

        frames, fps = postprocess_frames(frames, out_args)
        keep = (
            out_args.r_upscale_video and out_args.r_upscale_keep_imgs
        ) or (
            (out_args.frame_interpolation_engine or "None") != "None"
            and out_args.frame_interpolation_keep_imgs
        )
        if save_frames and keep:
            import cv2

            post_dir = os.path.join(batch_dir, "post")
            os.makedirs(post_dir, exist_ok=True)
            for i, frame in enumerate(frames):
                cv2.imwrite(
                    os.path.join(post_dir, f"{i:09d}.png"),
                    cv2.cvtColor(frame, cv2.COLOR_RGB2BGR),
                )

    if out_args.mp4_path:
        stem, ext = os.path.splitext(out_args.mp4_path)
        mp4_path = out_args.mp4_path if batch == 0 else f"{stem}_{batch}{ext}"
        if not os.path.isabs(mp4_path):
            mp4_path = os.path.join(batch_dir, mp4_path)
    else:
        mp4_path = os.path.join(batch_dir, "vid.mp4")
    if not out_args.skip_video_creation:
        os.makedirs(os.path.dirname(mp4_path), exist_ok=True)
        # "Init Video" soundtrack mode muxes the vid2vid source's audio
        # track (process_modelscope.py:253-254); "File" uses soundtrack_path
        audio_path = out_args.soundtrack_path or None
        if out_args.add_soundtrack == "Init Video":
            audio_path = args.vid2vid_input or None
        ffmpeg_stitch_video(
            frames=frames,
            out_path=mp4_path,
            fps=fps,
            crf=out_args.ffmpeg_crf,
            preset=out_args.ffmpeg_preset,
            metadata_comment=infotext,
            add_soundtrack=out_args.add_soundtrack,
            audio_path=audio_path,
            ffmpeg_location=out_args.ffmpeg_location,
        )
        result.videos.append(mp4_path)
        result.data_urls.append(video_to_data_url(mp4_path))
        if out_args.delete_imgs:
            # reference semantics: drop the PNG dump once the mp4 exists
            # (args.py:267); args.txt and the manifest are kept
            for p in written_pngs:
                try:
                    os.remove(p)
                except OSError:
                    pass
    if out_args.make_gif:
        # the GIF consumes only the in-memory frames — written even with
        # skip_video_creation set
        from t2v.media.video import save_gif

        os.makedirs(os.path.dirname(mp4_path), exist_ok=True)
        save_gif(frames, os.path.splitext(mp4_path)[0] + ".gif", fps)
    result.frame_dirs.append(batch_dir)
    result.infotexts.append(infotext)


def _run_dp(
    pipe, args, out_args, outdir, resolved_seed, timestring, save_frames,
    dp_shards, tp_shards, sp_shards, features_adapter, job_state=None,
    latents=None, skip_steps=0, is_vid2vid=False,
    inpaint_mode="initial_only", vc_sample_type="ddim", vc_uc_type=None,
) -> RunResult:
    """All batch_count samples in one mesh-sharded computation
    (t2v/parallel/dp_sample.py; dp = reference DDP semantics, sp = frame
    sharding, tp = Megatron feature sharding of the UNet transformers via
    t2v/parallel/sharding.py — XLA inserts the per-block all-reduce). The
    sampling is ONE device computation, so interrupt granularity is
    coarser than the serial loop: progress updates on completion, and
    interrupt/skip is honoured between the per-sample decodes.

    vid2vid / inpainting run here too (reference DDP had no mode
    restriction): the vid2vid source broadcasts against per-sample noise;
    the ModelScope masked-inpaint init is built per-sample with the same
    seed+i keys as the serial loop."""
    from t2v.core import rng as rng_lib
    from t2v.parallel.dp_sample import dp_sample
    from t2v.parallel.mesh import MeshConfig, make_mesh

    import jax
    import jax.numpy as jnp

    n = args.batch_count
    steps = args.steps - skip_steps
    if job_state is not None:
        job_state.begin_job(0, n, steps)
    mesh = None
    total = dp_shards * tp_shards * sp_shards
    if total > 1 and len(jax.devices()) >= total:
        mesh = make_mesh(
            MeshConfig(dp=dp_shards, sp=sp_shards, tp=tp_shards),
            jax.devices()[:total],
        )

    is_ms = isinstance(pipe, ModelScopePipeline)
    ss_host = args.height // _latent_scale(pipe)
    lat_c = 4 if is_ms else pipe.cfg.in_channels
    sample_shape = (args.frames, ss_host, args.width // _latent_scale(pipe), lat_c)

    # per-sample inpaint init (serial parity: build_inpainting_inputs with
    # key seed+i per batch, run() serial loop above)
    mask = image_latents = None
    strength = float(args.strength)
    if args.inpainting_frames > 0 and args.inpainting_image:
        import cv2

        img = cv2.cvtColor(cv2.imread(args.inpainting_image), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (args.width, args.height))
        # the serial loop builds these from batch_args with the resolved
        # seed (keyframe DSL may reference it)
        args_seeded = args.replace(seed=resolved_seed)
        if is_ms:
            rows = []
            for i in range(n):
                key_i = rng_lib.key_for_seed(resolved_seed + i)
                masked_i, mask, image_latents = pipe.build_inpainting_inputs(
                    img, args_seeded, key_i
                )
                rows.append(masked_i)
            latents = jnp.concatenate(rows, axis=0) if n > 1 else rows[0]
            strength = 1.0
            is_vid2vid = False
        else:
            # LVDM static mask blend — deterministic inputs, broadcast
            mask, image_latents = pipe.build_inpainting_inputs(img, args_seeded)
            inpaint_mode = "lvdm_static"

    if is_ms:
        conditioning = pipe.text_encoder.encode_request(
            args.prompt, args.n_prompt, steps
        )
        cond, uncond = conditioning.cond, conditioning.uncond
        sampler = args.sampler
        cfg_combine_mode = None
        tc = None
    else:
        cond = pipe.encode_text([args.prompt])
        uncond = pipe.encode_text([args.n_prompt])
        tc = pipe._resolve_temporal_context(args)
        # respect the requested VC chain (sample_utils.py:56-87); 'ddpm'
        # was filtered to the serial loop by the caller
        sampler = {"ddim": "DDIM", "dpm++ 2m": "DPM++ 2M"}[vc_sample_type]
        cfg_combine_mode = vc_uc_type
        if vc_sample_type == "dpm++ 2m" and (mask is not None or vc_uc_type):
            raise ValueError(
                "sample_type='dpm++ 2m' does not support mask inpainting "
                "or uc_type CFG variants — use 'ddim'"
            )

    static = ("dp", n, steps, sample_shape, sampler,
              float(args.cfg_scale), float(args.eta),
              dp_shards, tp_shards, sp_shards,
              latents is not None, is_vid2vid, strength if is_vid2vid else None,
              mask is not None, inpaint_mode, cfg_combine_mode,
              tc is not None)
    dp_only_mesh = mesh is not None and tp_shards == 1 and sp_shards == 1
    fn = pipe._sample_cache.get(static)
    if fn is None:
        unet = pipe.unet
        if mesh is not None and not dp_only_mesh and jax.default_backend() != "gpu":
            # (gpu excluded: spmd.py's kernels run interpret mode off-TPU —
            # fine on the virtual-CPU test meshes, orders of magnitude too
            # slow on a real GPU mesh, which keeps the default XLA path.)
            # tp/sp meshes rely on GSPMD partitioning inside the model
            # (Megatron all-reduce, frame all-gather). The Pallas kernels
            # stay live there via the custom_partitioning rules in
            # t2v/kernels/spmd.py (batch/head-group parallel, interpret
            # mode off-TPU). dp-only meshes run each shard's full loop
            # under jax.shard_map instead (dp_sample.py).
            import dataclasses as _dc

            unet = unet.clone(
                policy=_dc.replace(
                    unet.policy,
                    attention_backend="fused_spmd",
                    # fused temporal-conv chain via its custom_partitioning
                    # rule (kernels/spmd.py::spmd_temporal_conv_chain):
                    # batch-parallel, frame all-gather under sp inserted by
                    # the partitioner — tp/sp meshes keep the fused chain
                    temporal_conv_backend="fused_spmd",
                )
            )

        def f(params, cond, uncond, noise, latents, mask, image_latents, tcond):
            if is_ms:
                def apply_fn(x, t, c):
                    return unet.apply(params, x, t, c)
            else:
                from t2v.pipeline.videocrafter import _routed_apply

                apply_fn = _routed_apply(
                    unet, pipe.cfg.conditioning_key, params,
                    features_adapter, tcond,
                )

            return dp_sample(
                apply_fn, pipe.schedule, steps=steps,
                sample_shape=sample_shape, n_samples=n, cond=cond,
                uncond=uncond, guidance_scale=args.cfg_scale, eta=args.eta,
                sampler_name=sampler, mesh=mesh, noise=noise,
                shard_frames=sp_shards > 1,
                latents=latents, is_vid2vid=is_vid2vid, strength=strength,
                mask=mask, image_latents=image_latents,
                inpaint_mode=inpaint_mode, cfg_combine_mode=cfg_combine_mode,
                use_shard_map=dp_only_mesh,
                parameterization=(
                    pipe.unet_cfg if is_ms else pipe.cfg
                ).parameterization,
            )

        fn = jax.jit(f)
        pipe._sample_cache[static] = fn
    from t2v.parallel.dp_sample import batched_noise, dp_spec

    noise = batched_noise(resolved_seed, n, sample_shape)
    unet_params = pipe.unet_params
    if mesh is not None:
        from jax.sharding import NamedSharding

        spec = NamedSharding(
            mesh, dp_spec(mesh, n, sample_shape, shard_frames=sp_shards > 1)
        )
        noise = jax.device_put(noise, spec)
        if latents is not None and latents.shape[0] == n:
            # per-sample start latents shard like the noise
            latents = jax.device_put(latents, spec)
        if tp_shards > 1:
            from t2v.parallel.sharding import shard_params

            unet_params = shard_params(unet_params, mesh)
    x0 = fn(unet_params, cond, uncond, noise, latents, mask, image_latents, tc)
    x0.block_until_ready()
    if job_state is not None:
        job_state.sampling_step = steps

    result = RunResult()
    for batch in range(n):
        if job_state is not None and job_state.interrupted:
            result.interrupted = True
            break
        if job_state is not None and job_state.skipped:
            job_state.skipped = False
            continue
        frames = pipe.decode_latents(x0[batch])
        infotext = pipe.create_infotext(args, resolved_seed + batch)
        _emit_batch(
            result, list(frames), infotext, args, out_args, outdir,
            timestring, batch, resolved_seed + batch, save_frames,
        )
    return result


def _latent_scale(pipe) -> int:
    from t2v.pipeline.pipeline import _spatial_scale

    return _spatial_scale(pipe.vae_cfg)


def _resolve_model_dir(model: str) -> str:
    """Model-name → directory mapping (general_utils.py:17-25):
    '<modelscope>' → models/ModelScope/t2v, '<videocrafter>' →
    models/VideoCrafter, else models/text2video/<name>."""
    root = os.environ.get("T2V_MODELS_ROOT", os.path.join(os.getcwd(), "models"))
    if model == "<modelscope>":
        return os.path.join(root, "ModelScope", "t2v")
    if model == "<videocrafter>":
        return os.path.join(root, "VideoCrafter")
    return os.path.join(root, "text2video", model)
