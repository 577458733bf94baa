"""End-to-end ModelScope text2video pipeline.

The TPU-native replacement for ``TextToVideoSynthesis`` (t2v_pipeline.py)
plus the job-runner logic of ``process_modelscope.py``:

  * ``load_pipeline(model_dir)`` reads ``configuration.json`` and the three
    checkpoints (``text2video_pytorch_model.pth``, ``VQGAN_autoencoder.pth``,
    ``open_clip_pytorch_model.bin`` — t2v_pipeline.py:67-146) through the
    torch-free readers, converts to flax trees, and builds the text encoder;
  * ``infer(args)`` runs text encode → fused-CFG ``lax.scan`` denoise →
    frame-chunked VAE decode → uint8 RGB frames, entirely on-device — the
    reference's CLIP/UNet/VAE CPU↔GPU offload dance (t2v_pipeline.py:249-383)
    is deleted by design (SURVEY.md §2.9);
  * vid2vid (``compute_latents`` + strength skip, process_modelscope.py:80-147)
    and img2vid keyframed inpainting masks (:170-219) are supported;
  * seed policy: per-batch ``seed + batch`` with -1 → random
    (process_modelscope.py:221, t2v_pipeline.py:223).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from t2v.core import rng as rng_lib
from t2v.core.config import (
    CLIPTextConfig,
    ModelScopeUNetConfig,
    T2VArgs,
    VAEConfig,
    sanity_check_args,
)
from t2v.core.dtypes import Policy
from t2v.diffusion.sampling import sample_loop
from t2v.diffusion.schedules import DiffusionSchedule
from t2v.models.modelscope_unet import UNetSD
from t2v.models.vae import AutoencoderKL
from t2v.pipeline.keyframes import KeyFrameSeries
from t2v.text.clip import CLIPTextTransformer, convert_open_clip_text
from t2v.text.encoder import TextEncoder
from t2v.text.tokenizer import CLIPTokenizer

SCALE_FACTOR = 0.18215  # latent scaling (t2v_pipeline.py:153,185,300)
DECODE_CHUNK = 8  # frames per VAE encode call (bounds peak HBM)
# decode frames-per-call adapts to the output pixel volume: each extra call
# pays a dispatch round-trip, so small resolutions decode in ONE call while
# hi-res configs stay chunked (with spatial tiling on top). 8M pixels/call
# keeps decoder activations a few GB in bf16 and cuts 1024x576x24f decode
# from 8 device calls to 2 (measured 11.8 s vs 18.4 s warm on one chip).
DECODE_PIXEL_BUDGET = 8_000_000


def _decode_chunk_frames(h_img: int, w_img: int) -> int:
    return max(1, DECODE_PIXEL_BUDGET // max(1, h_img * w_img))


def _spatial_scale(vae_cfg: VAEConfig) -> int:
    """Pixel→latent downsampling factor (8 for the SD VAE; derived from
    ch_mult so tiny test configs stay consistent)."""
    return 2 ** (len(vae_cfg.ch_mult) - 1)


@dataclass
class InferResult:
    frames: list[np.ndarray]  # RGB uint8 (H, W, 3)
    latents: jax.Array  # final denoised latents (B, F, h, w, 4)
    infotext: str


@dataclass
class ModelScopePipeline:
    unet_cfg: ModelScopeUNetConfig
    vae_cfg: VAEConfig
    clip_cfg: CLIPTextConfig
    policy: Policy
    unet: UNetSD
    vae: AutoencoderKL
    unet_params: Any
    vae_params: Any
    text_encoder: Optional[TextEncoder]
    schedule: DiffusionSchedule
    model_dir: Optional[str] = None
    # spatial tiling for hi-res decode (latent pixels per tile; None = off)
    decode_tile: Optional[int] = None
    decode_tile_overlap: int = 16
    # jit caches keyed by static shapes
    _decode_fn: Any = field(default=None, repr=False)
    _decode_float_fn: Any = field(default=None, repr=False)
    _encode_fn: Any = field(default=None, repr=False)
    _sample_cache: dict = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------

    @classmethod
    def random_init(
        cls,
        unet_cfg: ModelScopeUNetConfig | None = None,
        policy: Policy = Policy(),
        frames: int = 2,
        seed: int = 0,
    ) -> "ModelScopePipeline":
        """Random-weight pipeline (tests / benchmarks; no checkpoints on
        disk needed)."""
        unet_cfg = unet_cfg or ModelScopeUNetConfig().tiny()
        vae_cfg = VAEConfig().tiny() if unet_cfg.dim < 128 else VAEConfig()
        clip_cfg = CLIPTextConfig.vit_h_14().tiny() if unet_cfg.dim < 128 else CLIPTextConfig.vit_h_14()
        clip_cfg = dataclasses.replace(clip_cfg, width=unet_cfg.context_dim)

        unet = UNetSD(cfg=unet_cfg, policy=policy)
        x = jnp.zeros((1, frames, 8, 8, unet_cfg.in_dim))
        unet_params = jax.jit(unet.init)(
            jax.random.key(seed), x, jnp.zeros((1,)),
            jnp.zeros((1, 77, unet_cfg.context_dim)),
        )
        vae = AutoencoderKL(cfg=vae_cfg, policy=policy)
        vae_params = jax.jit(vae.init)(
            jax.random.key(seed + 1), jnp.zeros((1, 32, 32, 3))
        )
        tokenizer = CLIPTokenizer.for_tests()
        clip_cfg = dataclasses.replace(clip_cfg, vocab_size=tokenizer.vocab_size)
        clip = CLIPTextTransformer(cfg=clip_cfg, policy=policy)
        clip_params = jax.jit(clip.init)(
            jax.random.key(seed + 2), jnp.zeros((1, 77), jnp.int32)
        )
        text_encoder = TextEncoder(clip, clip_params, tokenizer)
        return cls(
            unet_cfg=unet_cfg, vae_cfg=vae_cfg, clip_cfg=clip_cfg,
            policy=policy, unet=unet, vae=vae,
            unet_params=unet_params, vae_params=vae_params,
            text_encoder=text_encoder,
            schedule=DiffusionSchedule.linear_sd(unet_cfg.num_timesteps),
        )

    @classmethod
    def from_native(
        cls, model_dir: str, policy: Policy = Policy.bf16()
    ) -> "ModelScopePipeline":
        """Load a t2v-native (orbax) checkpoint dir — what the training CLI
        saves. Restores straight into device arrays, skipping the torch
        pickle parse + layout conversion entirely."""
        from t2v.io.orbax_io import config_from_dict, load_native

        data = load_native(model_dir)
        meta = data["meta"]
        if meta.get("model_family", "modelscope") != "modelscope":
            raise ValueError(
                f"{model_dir} holds a {meta['model_family']} checkpoint; "
                "load it with VideoCrafterPipeline.from_native"
            )
        unet_cfg = config_from_dict(ModelScopeUNetConfig, meta["unet_cfg"])
        vae_cfg = config_from_dict(VAEConfig, meta["vae_cfg"])
        clip_cfg = config_from_dict(CLIPTextConfig, meta["clip_cfg"])
        unet_params = _cast_tree(data["unet_params"], policy.param_dtype)
        vae_params = _cast_tree(data["vae_params"], policy.param_dtype)
        clip_params = _cast_tree(data["clip_params"], policy.param_dtype)
        unet = UNetSD(cfg=unet_cfg, policy=policy)
        vae = AutoencoderKL(cfg=vae_cfg, policy=policy)
        clip = CLIPTextTransformer(cfg=clip_cfg, policy=policy)
        tokenizer = CLIPTokenizer.find_and_load(model_dir, os.path.dirname(model_dir))
        text_encoder = TextEncoder(clip, clip_params, tokenizer)
        return cls(
            unet_cfg=unet_cfg, vae_cfg=vae_cfg, clip_cfg=clip_cfg,
            policy=policy, unet=unet, vae=vae,
            unet_params=unet_params, vae_params=vae_params,
            text_encoder=text_encoder,
            schedule=DiffusionSchedule.linear_sd(unet_cfg.num_timesteps),
            model_dir=model_dir,
        )

    @classmethod
    def from_model_dir(
        cls,
        model_dir: str,
        policy: Policy = Policy.bf16(),
        *,
        vae_cfg: VAEConfig | None = None,
        clip_cfg: CLIPTextConfig | None = None,
    ) -> "ModelScopePipeline":
        """Load the reference checkpoint layout (t2v_pipeline.py:67-146),
        or a t2v-native (orbax) dir — detected by its manifest.

        ``vae_cfg``/``clip_cfg`` default to the real ModelScope components
        (the reference hardcodes both, t2v_pipeline.py:117-141); overrides
        support reduced-scale checkpoints (e.g. the parity harness)."""
        from t2v.io.orbax_io import is_native_checkpoint

        if is_native_checkpoint(model_dir):
            return cls.from_native(model_dir, policy)
        from t2v.io.convert import convert_unet, convert_vae
        from t2v.io.pickle_reader import load_torch_checkpoint

        unet_cfg = ModelScopeUNetConfig.from_configuration_json(model_dir)
        with open(os.path.join(model_dir, "configuration.json")) as f:
            model_args = json.load(f)["model"].get("model_args", {})
        ckpt_unet = model_args.get("ckpt_unet", "text2video_pytorch_model.pth")
        ckpt_ae = model_args.get("ckpt_autoencoder", "VQGAN_autoencoder.pth")
        ckpt_clip = model_args.get("ckpt_clip", "open_clip_pytorch_model.bin")

        sd_unet = load_torch_checkpoint(os.path.join(model_dir, ckpt_unet))
        unet_params = _cast_tree(convert_unet(sd_unet, unet_cfg), policy.param_dtype)
        del sd_unet
        unet = UNetSD(cfg=unet_cfg, policy=policy)

        vae_cfg = vae_cfg or VAEConfig()
        sd_vae = load_torch_checkpoint(os.path.join(model_dir, ckpt_ae))
        vae_params = _cast_tree(convert_vae(sd_vae, vae_cfg), policy.param_dtype)
        del sd_vae
        vae = AutoencoderKL(cfg=vae_cfg, policy=policy)

        clip_cfg = clip_cfg or CLIPTextConfig.vit_h_14()
        sd_clip = load_torch_checkpoint(os.path.join(model_dir, ckpt_clip))
        clip_params = _cast_tree(
            convert_open_clip_text(sd_clip, clip_cfg), policy.param_dtype
        )
        del sd_clip
        clip = CLIPTextTransformer(cfg=clip_cfg, policy=policy)
        tokenizer = CLIPTokenizer.find_and_load(model_dir, os.path.dirname(model_dir))
        text_encoder = TextEncoder(clip, clip_params, tokenizer)

        return cls(
            unet_cfg=unet_cfg, vae_cfg=vae_cfg, clip_cfg=clip_cfg,
            policy=policy, unet=unet, vae=vae,
            unet_params=unet_params, vae_params=vae_params,
            text_encoder=text_encoder,
            schedule=DiffusionSchedule.linear_sd(unet_cfg.num_timesteps),
            model_dir=model_dir,
        )

    # ------------------------------------------------------------------
    # keep-in-VRAM 'Main Model Only' retention (reference 3-state option:
    # t2v_pipeline.py:74,253,297,367-373; render.py:40-43 — retain the
    # main UNet, drop VAE/CLIP between runs)

    def release_aux(self) -> None:
        """Drop the VAE and CLIP weights AND their jit executables; the
        UNet params and sampler caches stay resident. ``reload_aux``
        restores the dropped components from the model dir."""
        self.vae_params = None
        self.text_encoder = None
        self._decode_fn = None
        self._decode_float_fn = None
        self._encode_fn = None

    def reload_aux(self) -> None:
        """Re-read only the VAE and CLIP checkpoints after release_aux().
        No-op when both components are resident."""
        if self.vae_params is not None and self.text_encoder is not None:
            return
        if self.model_dir is None:
            raise ValueError(
                "cannot reload VAE/CLIP: pipeline has no model_dir "
                "(random-init pipelines cannot use 'Main Model Only')"
            )
        from t2v.io.orbax_io import is_native_checkpoint, load_native

        if is_native_checkpoint(self.model_dir):
            # component trees live in separate orbax dirs — restore only
            # the aux ones (a full from_native would re-materialise the
            # 1.4B UNet just to discard it)
            data = load_native(self.model_dir, only=("vae", "clip"))
            self.vae_params = _cast_tree(
                data["vae_params"], self.policy.param_dtype
            )
            clip_params = _cast_tree(
                data["clip_params"], self.policy.param_dtype
            )
            clip = CLIPTextTransformer(cfg=self.clip_cfg, policy=self.policy)
            tokenizer = CLIPTokenizer.find_and_load(
                self.model_dir, os.path.dirname(self.model_dir)
            )
            self.text_encoder = TextEncoder(clip, clip_params, tokenizer)
            return
        from t2v.io.convert import convert_vae
        from t2v.io.pickle_reader import load_torch_checkpoint

        with open(os.path.join(self.model_dir, "configuration.json")) as f:
            model_args = json.load(f)["model"].get("model_args", {})
        ckpt_ae = model_args.get("ckpt_autoencoder", "VQGAN_autoencoder.pth")
        ckpt_clip = model_args.get("ckpt_clip", "open_clip_pytorch_model.bin")
        sd_vae = load_torch_checkpoint(os.path.join(self.model_dir, ckpt_ae))
        self.vae_params = _cast_tree(
            convert_vae(sd_vae, self.vae_cfg), self.policy.param_dtype
        )
        del sd_vae
        sd_clip = load_torch_checkpoint(os.path.join(self.model_dir, ckpt_clip))
        clip_params = _cast_tree(
            convert_open_clip_text(sd_clip, self.clip_cfg),
            self.policy.param_dtype,
        )
        del sd_clip
        clip = CLIPTextTransformer(cfg=self.clip_cfg, policy=self.policy)
        tokenizer = CLIPTokenizer.find_and_load(
            self.model_dir, os.path.dirname(self.model_dir)
        )
        self.text_encoder = TextEncoder(clip, clip_params, tokenizer)

    # ------------------------------------------------------------------

    def apply_stable_lora(
        self, lora_sd, alpha: float = 1.0, *, undo: bool = False
    ) -> dict[str, list[str]]:
        """Merge a stable-lora state_dict into BOTH the UNet and the CLIP
        text tower, matching the reference which iterates
        ``[p.sd_model, p.clip_encoder.model.transformer]``
        (lora_webui.py:186-187). ``undo=True`` reverses a prior merge of the
        same file/alpha (the reference's unload bookkeeping,
        lora_webui.py:163-203).

        Returns {"unet": skipped, "clip": skipped} module-name lists.
        """
        from t2v.pipeline.lora import merge_stable_lora, text_module_index, unet_module_index

        merged, skipped_unet = merge_stable_lora(
            self.unet_params, lora_sd, alpha, unet_module_index(self.unet_cfg),
            undo=undo,
        )
        self.unet_params = merged
        skipped_clip: list[str] = []
        if self.text_encoder is not None:
            merged_clip, skipped_clip = merge_stable_lora(
                self.text_encoder.params, lora_sd, alpha,
                text_module_index(self.clip_cfg), undo=undo,
            )
            self.text_encoder.params = merged_clip
            self.text_encoder.invalidate_cache()
        return {"unet": skipped_unet, "clip": skipped_clip}

    def _vae_apply(self, method):
        vae, params = self.vae, self.vae_params

        @jax.jit
        def fn(p, z):
            return vae.apply(p, z, method=method)

        return lambda z: fn(params, z)

    def _make_encode_fn(self):
        from t2v.models.vae import make_encode_latents_fn

        fn = make_encode_latents_fn(self.vae, SCALE_FACTOR)
        params = self.vae_params
        return lambda x: fn(params, x)

    def _make_decode_uint8_fn(self):
        """tensor2vid normalisation per t2v_pipeline.py:447-460, fused into
        the decode program (see models.vae.make_decode_uint8_fn)."""
        from t2v.models.vae import make_decode_uint8_fn

        fn = make_decode_uint8_fn(self.vae, SCALE_FACTOR)
        params = self.vae_params
        return lambda z: fn(params, z)

    def compute_latents(self, frames_rgb: np.ndarray) -> jax.Array:
        """(F, H, W, 3) float in [-1,1] → (1, F, h, w, 4) scaled latents
        (deterministic posterior mean × 0.18215, t2v_pipeline.py:148-194)."""
        if self._encode_fn is None:
            self._encode_fn = self._make_encode_fn()
        x = jnp.asarray(frames_rgb, jnp.float32)
        chunks = []
        for i in range(0, x.shape[0], DECODE_CHUNK):
            chunks.append(self._encode_fn(x[i : i + DECODE_CHUNK]))
        return jnp.concatenate(chunks, axis=0)[None]

    def decode_latents(self, latents: jax.Array) -> np.ndarray:
        """(F, h, w, 4) scaled latents → (F, H, W, 3) uint8 RGB
        (frame-chunked decode; chunking bounds HBM, not device hops)."""
        tile = self.decode_tile
        tiled = tile and (latents.shape[1] > tile or latents.shape[2] > tile)
        if tiled:
            # tiled path blends overlapping float tiles on the host, so it
            # keeps the float decode program + host normalisation
            from t2v.models.vae_tiled import decode_spatial_tiled

            if self._decode_float_fn is None:
                self._decode_float_fn = self._vae_apply(AutoencoderKL.decode)
            base = self._decode_float_fn
            decode_fn = lambda zz: decode_spatial_tiled(
                base, zz / SCALE_FACTOR, tile=tile,
                overlap=self.decode_tile_overlap,
                upscale=_spatial_scale(self.vae_cfg),
            )
        else:
            if self._decode_fn is None:
                self._decode_fn = self._make_decode_uint8_fn()
            decode_fn = self._decode_fn
        up = _spatial_scale(self.vae_cfg)
        step_f = _decode_chunk_frames(latents.shape[1] * up, latents.shape[2] * up)
        n_total = latents.shape[0]
        if n_total > step_f:
            # balance chunks so the zero-padded tail stays small (125f at an
            # 8M budget would otherwise split 122+3 and pad the 3 to 122 —
            # near-2x decode work); same chunk count, one compile shape
            n_chunks = -(-n_total // step_f)
            step_f = -(-n_total // n_chunks)
        outs = []
        n = latents.shape[0]
        for i in range(0, n, step_f):
            chunk = latents[i : i + step_f]
            pad = 0
            if chunk.shape[0] < step_f and n > step_f:
                pad = step_f - chunk.shape[0]
                chunk = jnp.pad(chunk, ((0, pad), (0, 0), (0, 0), (0, 0)))
            img = decode_fn(chunk)
            if pad:
                img = img[: step_f - pad]
            outs.append(np.asarray(img))
        imgs = np.concatenate(outs, axis=0)
        if tiled:
            # tensor2vid normalisation: mean/std 0.5 (t2v_pipeline.py:447-460)
            imgs = np.clip(imgs.astype(np.float32) * 0.5 + 0.5, 0.0, 1.0)
            return (imgs * 255).round().astype(np.uint8)
        return imgs

    # ------------------------------------------------------------------

    def build_inpainting_inputs(
        self,
        image_rgb: np.ndarray,
        args: T2VArgs,
        key: jax.Array,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """img2vid: (masked_latents, mask, image_latents)
        (process_modelscope.py:170-219). ``image_latents`` — the clean
        source-image latents — feed the progressive per-step re-blend
        (``inpaint_mode='progressive'``)."""
        ss = _spatial_scale(self.vae_cfg)
        lat_h, lat_w = args.height // ss, args.width // ss
        keys = KeyFrameSeries(args.frames, args.seed, max(args.inpainting_frames, 1))
        weights = keys.inpainting_weights(args.inpainting_weights)

        img = np.asarray(image_rgb, np.float32) / 255.0 * 2.0 - 1.0
        frames = np.repeat(img[None], args.frames, axis=0)
        image_latents = np.asarray(self.compute_latents(frames))  # (1,F,h,w,4)

        mask = np.ones((1, args.frames, lat_h, lat_w, 4), np.float32)
        for i in range(args.frames):
            mask[:, i] = weights[i]
        noise = np.asarray(
            jax.random.normal(rng_lib.stream(key, "inpaint_init"), mask.shape)
        )
        masked = image_latents * (1 - mask) + noise * mask
        return jnp.asarray(masked), jnp.asarray(mask), jnp.asarray(image_latents)

    # ------------------------------------------------------------------

    def make_apply_fn(self):
        unet, params = self.unet, self.unet_params

        def apply_fn(x, t, ctx):
            return unet.apply(params, x, t, ctx)

        return apply_fn

    def infer(
        self,
        args: T2VArgs,
        *,
        latents: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        image_latents: Optional[jax.Array] = None,
        skip_steps: int = 0,
        is_vid2vid: bool = False,
        callback: Optional[Callable[[int], None]] = None,
        callback_interval: Optional[int] = None,
        batch_index: int = 0,
        inpaint_mode: str = "initial_only",
        deep_cache_interval: int = 1,
    ) -> InferResult:
        sanity_check_args(args)
        seed = rng_lib.resolve_seed(args.seed)
        batch_seed = seed + batch_index if args.seed != -1 else seed
        key = rng_lib.key_for_seed(batch_seed)

        steps = args.steps - skip_steps
        ss = _spatial_scale(self.vae_cfg)
        lat_h, lat_w = args.height // ss, args.width // ss
        shape = (1, args.frames, lat_h, lat_w, 4)

        if self.text_encoder is None:
            raise ValueError(
                "pipeline has no text encoder loaded (constructed with "
                "text_encoder=None) — reload the model dir before infer()"
            )
        t0 = time.perf_counter()
        # request-level prompt settings (A1111 opts parity; the encoder's
        # line cache keys on both, so switching is safe)
        self.text_encoder.comma_backtrack = args.comma_padding_backtrack
        self.text_encoder.enable_emphasis = args.enable_emphasis
        conditioning = self.text_encoder.encode_request(
            args.prompt, args.n_prompt, steps
        )
        t_text = time.perf_counter() - t0

        unet = self.unet

        t0 = time.perf_counter()
        if (
            deep_cache_interval > 1
            and latents is None
            and mask is None
            and args.sampler in ("DDIM_Gaussian", "DDIM", "Euler", "Euler a")
        ):
            x0 = self._infer_deepcache(
                steps, shape, args, key, conditioning, deep_cache_interval,
                callback, callback_interval,
            )
            x0.block_until_ready()
            t_sample = time.perf_counter() - t0
            t0 = time.perf_counter()
            frames = self.decode_latents(x0[0])
            t_decode = time.perf_counter() - t0
            infotext = self.create_infotext(args, batch_seed)
            print(
                f"t2v timings (deepcache x{deep_cache_interval}): "
                f"text={t_text:.2f}s sample={t_sample:.2f}s decode={t_decode:.2f}s"
            )
            return InferResult(frames=list(frames), latents=x0, infotext=infotext)

        if callback is None or callback_interval is None:
            # whole-loop jit with params as a REAL argument: embedding the
            # 1.7B-param tree as jaxpr constants overflows the compile
            # transport and re-uploads weights per executable
            static = (
                steps, shape, args.sampler, float(args.cfg_scale),
                float(args.eta), float(args.strength), is_vid2vid,
                inpaint_mode, latents is not None, mask is not None,
                image_latents is not None,
            )

            def build():
                def f(params, key, cond, uncond, latents, mask, image_latents):
                    def apply_fn(x, t, ctx):
                        return unet.apply(params, x, t, ctx)

                    return sample_loop(
                        apply_fn, self.schedule, steps=steps, shape=shape,
                        cond=cond, uncond=uncond,
                        guidance_scale=args.cfg_scale, eta=args.eta,
                        sampler_name=args.sampler, key=key, latents=latents,
                        is_vid2vid=is_vid2vid, strength=args.strength,
                        mask=mask, image_latents=image_latents,
                        inpaint_mode=inpaint_mode,
                        parameterization=self.unet_cfg.parameterization,
                    )

                return jax.jit(f)

            x0 = self._sampler_fn(static, build)(
                self.unet_params, key, conditioning.cond, conditioning.uncond,
                latents, mask, image_latents,
            )
            if callback is not None:
                callback(steps)
        elif args.sampler == "UniPC":
            x0 = self._infer_unipc(
                steps, shape, args, key, conditioning, latents, mask,
                is_vid2vid, inpaint_mode, callback, callback_interval,
            )
        elif args.sampler.startswith("DPM++"):
            x0 = self._infer_dpmpp(
                steps, shape, args, key, conditioning, latents, mask,
                is_vid2vid, inpaint_mode, callback, callback_interval,
            )
        else:
            # cooperative-interrupt windowed path: each window is a jitted
            # executable taking params as a REAL argument; the host polls
            # the interrupt between windows. Windowing also keeps each
            # device execution short (long single executions can hit
            # runtime execution limits at hi-res configs).
            from t2v.diffusion.sampling import (
                make_step_body,
                plan_and_start,
                run_window,
            )

            mod, p, x = plan_and_start(
                self.schedule, steps=steps, shape=shape, eta=args.eta,
                sampler_name=args.sampler, key=key, latents=latents,
                is_vid2vid=is_vid2vid, strength=args.strength,
            )
            base_static = (
                "window", steps, shape, args.sampler, float(args.cfg_scale),
                float(args.eta), float(args.strength), is_vid2vid,
                inpaint_mode, latents is not None, mask is not None,
                image_latents is not None,
            )

            def build_window(n):
                def build():
                    def f(params, x, start, cond, uncond, mask, img_lat, wkey):
                        def apply_fn(xx, tt, cc):
                            return unet.apply(params, xx, tt, cc)

                        body = make_step_body(
                            mod, p, apply_fn, cond, uncond, args.cfg_scale,
                            wkey, args.eta, mask, img_lat, inpaint_mode,
                            self.schedule,
                            parameterization=self.unet_cfg.parameterization,
                        )
                        return run_window(body, x, start, n)

                    return jax.jit(f)

                return build

            done = 0
            total = p.steps
            while done < total:
                n = min(callback_interval, total - done)
                fn = self._sampler_fn(base_static + (n,), build_window(n))
                x = fn(
                    self.unet_params, x, done, conditioning.cond,
                    conditioning.uncond, mask, image_latents, key,
                )
                x.block_until_ready()
                done += n
                callback(done)  # raises to interrupt/skip
            x0 = x
        x0.block_until_ready()
        t_sample = time.perf_counter() - t0

        t0 = time.perf_counter()
        frames = self.decode_latents(x0[0])
        t_decode = time.perf_counter() - t0

        infotext = self.create_infotext(args, batch_seed)
        print(
            f"t2v timings: text={t_text:.2f}s sample={t_sample:.2f}s "
            f"decode={t_decode:.2f}s"
        )
        return InferResult(frames=list(frames), latents=x0, infotext=infotext)

    def _infer_unipc(
        self, steps, shape, args, key, conditioning, latents, mask,
        is_vid2vid, inpaint_mode, callback, callback_interval,
    ):
        """UniPC sampling. txt2vid with a callback runs windowed (warmup /
        homo windows / tail — jitted with params as argument, interrupt
        polled between segments); other variants run the whole jitted loop
        with a terminal callback."""
        from t2v.diffusion import unipc

        unet = self.unet
        cond, uncond = conditioning.cond, conditioning.uncond
        # vid2vid IS windowable: the plan just starts at t=strength and the
        # start state is the encoded source (the multistep model history
        # already crosses windows). Masked inpainting falls back to the
        # monolithic jit (UniPC has no frame-inpaint support, reference
        # samplers_common.py:90-93).
        windowable = (
            callback is not None
            and callback_interval is not None
            and (latents is None or is_vid2vid)
            and mask is None
            and steps >= 2 * unipc.ORDER
        )
        if not windowable:
            static = (
                "unipc", steps, shape, float(args.cfg_scale),
                float(args.eta), float(args.strength), is_vid2vid,
                inpaint_mode, latents is not None, mask is not None,
            )

            def build():
                def f(params, key, cond, uncond, latents, mask):
                    def apply_fn(x, t, ctx):
                        return unet.apply(params, x, t, ctx)

                    return sample_loop(
                        apply_fn, self.schedule, steps=steps, shape=shape,
                        cond=cond, uncond=uncond,
                        guidance_scale=args.cfg_scale, eta=args.eta,
                        sampler_name=args.sampler, key=key, latents=latents,
                        is_vid2vid=is_vid2vid, strength=args.strength,
                        mask=mask, inpaint_mode=inpaint_mode,
                        parameterization=self.unet_cfg.parameterization,
                    )

                return jax.jit(f)

            x0 = self._sampler_fn(static, build)(
                self.unet_params, key, cond, uncond, latents, mask
            )
            if callback is not None:
                callback(steps)
            return x0

        from t2v.diffusion.sampling import _unipc_model_fn

        vid2vid = latents is not None and is_vid2vid
        t_start = float(args.strength) if vid2vid else None
        p = unipc.plan(self.schedule, steps, t_start=t_start)

        def make_model_fn(params):
            def apply_fn(x, t, ctx):
                return unet.apply(params, x, t, ctx)

            return _unipc_model_fn(
                apply_fn, cond, uncond, args.cfg_scale, p,
                parameterization=self.unet_cfg.parameterization,
            )

        base = (
            "unipc-win", steps, shape, float(args.cfg_scale),
            vid2vid, float(args.strength) if vid2vid else None,
        )

        def build_warm():
            def f(params, x):
                return unipc.warmup(x, make_model_fn(params), p)

            return jax.jit(f)

        def build_homo(n):
            def build():
                def f(params, x, m0, m1, m2, off):
                    return unipc.homo_window(
                        x, (m0, m1, m2), make_model_fn(params), p, off, n
                    )

                return jax.jit(f)

            return build

        def build_tail():
            def f(params, x, m0, m1, m2):
                return unipc.tail(x, (m0, m1, m2), make_model_fn(params), p)

            return jax.jit(f)

        if vid2vid:
            noise = rng_lib.latent_noise(key, shape)
            x = unipc.encode_vid2vid(
                self.schedule, latents, noise, args.strength, steps
            ).astype(jnp.float32)
        else:
            x = rng_lib.latent_noise(key, shape).astype(jnp.float32)
        x, models = self._sampler_fn(base + ("warm",), build_warm)(
            self.unet_params, x
        )
        jax.block_until_ready(x)
        callback(unipc.ORDER)

        L = len(unipc.homo_range(p))
        done = 0
        while done < L:
            n = min(callback_interval, L - done)
            fn = self._sampler_fn(base + ("homo", n), build_homo(n))
            x, models = fn(self.unet_params, x, *models, done)
            jax.block_until_ready(x)
            done += n
            callback(unipc.ORDER + done)

        x = self._sampler_fn(base + ("tail",), build_tail)(
            self.unet_params, x, *models
        )
        jax.block_until_ready(x)
        callback(steps)
        return x

    def _infer_dpmpp(
        self, steps, shape, args, key, conditioning, latents, mask,
        is_vid2vid, inpaint_mode, callback, callback_interval,
    ):
        """DPM++ 2M (uniform or Karras nodes) with windowed execution: the
        multistep carry is just ``(x, previous x0-prediction)``, so it
        crosses jitted windows like UniPC's model history does, and the
        host polls the interrupt between windows (reference cancellation
        semantics, samplers_common.py:48-52). Masked inpainting falls back
        to the monolithic jit (no frame-inpaint support, mirroring UniPC)."""
        from t2v.diffusion.sampling import _unipc_model_fn, get_sampler

        unet = self.unet
        cond, uncond = conditioning.cond, conditioning.uncond
        windowable = (latents is None or is_vid2vid) and mask is None
        if not windowable:
            static = (
                "dpmpp", steps, shape, args.sampler, float(args.cfg_scale),
                float(args.strength), is_vid2vid, inpaint_mode,
                latents is not None, mask is not None,
            )

            def build():
                def f(params, key, cond, uncond, latents, mask):
                    def apply_fn(x, t, ctx):
                        return unet.apply(params, x, t, ctx)

                    return sample_loop(
                        apply_fn, self.schedule, steps=steps, shape=shape,
                        cond=cond, uncond=uncond,
                        guidance_scale=args.cfg_scale, eta=args.eta,
                        sampler_name=args.sampler, key=key, latents=latents,
                        is_vid2vid=is_vid2vid, strength=args.strength,
                        mask=mask, inpaint_mode=inpaint_mode,
                        parameterization=self.unet_cfg.parameterization,
                    )

                return jax.jit(f)

            x0 = self._sampler_fn(static, build)(
                self.unet_params, key, cond, uncond, latents, mask
            )
            callback(steps)
            return x0

        mod = get_sampler(args.sampler).module
        vid2vid = latents is not None and is_vid2vid
        t_start = float(args.strength) if vid2vid else None
        p = mod.plan(self.schedule, steps, t_start=t_start)

        base = (
            "dpmpp-win", steps, shape, args.sampler, float(args.cfg_scale),
            vid2vid, float(args.strength) if vid2vid else None,
        )

        def build_window(n):
            def build():
                def f(params, x, d_prev, off, cond, uncond):
                    def apply_fn(xx, tt, cc):
                        return unet.apply(params, xx, tt, cc)

                    model_fn = _unipc_model_fn(
                        apply_fn, cond, uncond, args.cfg_scale, p,
                        parameterization=self.unet_cfg.parameterization,
                    )
                    return mod.window(x, d_prev, model_fn, p, off, n)

                return jax.jit(f)

            return build

        if vid2vid:
            noise = rng_lib.latent_noise(key, shape)
            x = mod.encode_vid2vid(
                self.schedule, latents, noise, args.strength, steps
            ).astype(jnp.float32)
        else:
            x = rng_lib.latent_noise(key, shape).astype(jnp.float32)
        d_prev = jnp.zeros_like(x)

        done = 0
        while done < p.steps:
            n = min(callback_interval, p.steps - done)
            fn = self._sampler_fn(base + (n,), build_window(n))
            x, d_prev = fn(self.unet_params, x, d_prev, done, cond, uncond)
            jax.block_until_ready(x)
            done += n
            callback(done)  # raises to interrupt/skip
        return x

    def _sampler_fn(self, static_key, build):
        """Per-pipeline cache of jitted sampler executables, keyed by the
        static sampling configuration."""
        fn = self._sample_cache.get(static_key)
        if fn is None:
            fn = build()
            self._sample_cache[static_key] = fn
        return fn

    def _infer_deepcache(
        self, steps, shape, args, key, conditioning, interval,
        callback, callback_interval,
    ):
        """DeepCache sampling; with a callback, runs in jitted windows
        (params as a real argument) polling interrupt between windows."""
        from t2v.diffusion import deepcache as dc

        unet, schedule = self.unet, self.schedule
        cond, uncond = conditioning.cond, conditioning.uncond
        base_static = (
            "deepcache", steps, shape, args.sampler, float(args.cfg_scale),
            float(args.eta), interval,
        )

        def make_applies(params):
            def apply_full(x, t, ctx):
                return unet.apply(params, x, t, ctx, return_deep=True)

            def apply_cached(x, t, ctx, feat):
                return unet.apply(params, x, t, ctx, deep_feature=feat)

            return apply_full, apply_cached

        if callback is None or callback_interval is None:
            def build():
                def f(params, key, cond, uncond):
                    apply_full, apply_cached = make_applies(params)
                    return dc.sample_loop_deepcache(
                        apply_full, apply_cached, schedule, steps=steps,
                        shape=shape, cond=cond, uncond=uncond,
                        guidance_scale=args.cfg_scale, eta=args.eta,
                        sampler_name=args.sampler, key=key, interval=interval,
                        parameterization=self.unet_cfg.parameterization,
                    )

                return jax.jit(f)

            return self._sampler_fn(base_static, build)(
                self.unet_params, key, cond, uncond
            )

        # windowed, interrupt-capable
        mod, p = dc.deepcache_plan(args.sampler, schedule, steps, args.eta)
        from t2v.core import rng as rng_lib

        x = rng_lib.latent_noise(key, shape).astype(jnp.float32)
        apply_full_host, _ = make_applies(self.unet_params)
        feat = dc.deepcache_feat0(
            apply_full_host, x, cond, uncond, args.cfg_scale
        )

        def build_window(n):
            def build():
                def f(params, x, feat, start, cond, uncond, wkey):
                    apply_full, apply_cached = make_applies(params)
                    body = dc.make_deepcache_body(
                        mod, p, apply_full, apply_cached, cond, uncond,
                        args.cfg_scale, args.eta, wkey, interval,
                        self.unet_cfg.parameterization, schedule,
                    )
                    return dc.run_deepcache_window(body, x, feat, start, n)

                return jax.jit(f)

            return build

        done = 0
        while done < p.steps:
            n = min(callback_interval, p.steps - done)
            fn = self._sampler_fn(base_static + ("win", n), build_window(n))
            x, feat = fn(self.unet_params, x, feat, done, cond, uncond, key)
            x.block_until_ready()
            done += n
            callback(done)
        return x

    def create_infotext(self, args: T2VArgs, seed: int) -> str:
        """Generation-parameter provenance string
        (t2v_pipeline.py:462-469 fields)."""
        return (
            f"{args.prompt}\n"
            f"Negative prompt: {args.n_prompt}\n"
            f"Steps: {args.steps}, Sampler: {args.sampler}, "
            f"CFG scale: {args.cfg_scale}, Seed: {seed}, "
            f"Size: {args.width}x{args.height}, Frames: {args.frames}, "
            f"Model: {args.model or 'ModelScope'}"
        )


def _cast_tree(tree, dtype):
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)


_PIPELINE_CACHE: dict[tuple, ModelScopePipeline] = {}


def load_pipeline(
    model_dir: str, policy: Policy = Policy.bf16(), keep_in_vram: bool = True
) -> ModelScopePipeline:
    """Cached loader with model hot-switch semantics: a new dir tears down
    the previous pipeline (process_modelscope.py:62-66).

    keep_in_vram=False skips caching entirely (the reference's keep-in-VRAM
    'None' setting, t2v_pipeline.py:74): the pipeline lives only for the
    caller's run and the next load re-reads checkpoints."""
    from t2v.core.compile_cache import enable_compile_cache

    enable_compile_cache()
    key = (os.path.abspath(model_dir), policy.param_dtype)
    if key in _PIPELINE_CACHE:
        return _PIPELINE_CACHE[key]
    _PIPELINE_CACHE.clear()
    pipe = ModelScopePipeline.from_model_dir(model_dir, policy)
    if keep_in_vram:
        _PIPELINE_CACHE[key] = pipe
    return pipe
