"""VideoCrafter (LVDM) inference pipeline.

Covers the reference's second model family (SURVEY.md §2.8):
  * ``from_checkpoint`` loads the single Lightning ``model.ckpt`` + the
    OmegaConf-style ``model_config.yaml`` (process_videocrafter.py:23-31,
    sample_utils.py:10-40) through the torch-free reader — UNet, SD VAE and
    the CLIP-L text tower all come out of one file;
  * text conditioning via plain CLIP-L last-hidden-state, 77 tokens,
    no prompt weighting (condition_modules.py:15-40);
  * sampling via the shared DDIM (the LVDM DDIM, lvdm/samplers/ddim.py, is
    the same SD-style schedule; uc_type=None full-channel CFG) with the
    LVDM linear schedule (linear_start 0.00085 → linear_end 0.012);
  * the standalone CLI's DDP sampling (sample_text2video.py:123-186,
    NCCL all_gather) maps to dp over the jax mesh — each sample is an
    independent batch element, gathered implicitly.
"""

from __future__ import annotations

import dataclasses
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from t2v.core import rng as rng_lib
from t2v.core.config import CLIPTextConfig, T2VArgs, VAEConfig, sanity_check_args
from t2v.core.dtypes import Policy
from t2v.diffusion.sampling import sample_loop
from t2v.diffusion.schedules import DiffusionSchedule, beta_schedule
from t2v.models.vae import AutoencoderKL
from t2v.models.videocrafter_unet import VideoCrafterUNet, VideoCrafterUNetConfig
from t2v.pipeline.pipeline import InferResult, _spatial_scale
from t2v.text.clip import CLIPTextTransformer, convert_hf_clip_text
from t2v.text.tokenizer import CLIPTokenizer

DECODE_CHUNK = 8


def _routed_apply(unet, ck, params, feats, tc):
    """(x, t, ctx) -> model output, routing ctx through the conditioning
    key (DiffusionWrapper semantics, ddpm3d.py:1362-1433). ``tc`` is the
    FPS ``temporal_context`` embedding carried by the cond dict
    (sample_utils.py:71)."""
    from t2v.models.conditioning import normalize_cond, route_conditioning

    def apply_fn(x, t, ctx):
        cond = normalize_cond(ck, ctx)
        if tc is not None:
            cond["temporal_context"] = tc
        x2, kw = route_conditioning(ck, x, cond)
        return unet.apply(
            params, x2, t, kw["context"], features_adapter=feats,
            y=kw["y"], temporal_context=kw["temporal_context"],
        )

    return apply_fn


@dataclass
class VideoCrafterPipeline:
    cfg: VideoCrafterUNetConfig
    vae_cfg: VAEConfig
    clip_cfg: CLIPTextConfig
    policy: Policy
    unet: VideoCrafterUNet
    vae: AutoencoderKL
    clip: Optional[CLIPTextTransformer]
    unet_params: Any
    vae_params: Any
    clip_params: Any
    tokenizer: Optional[CLIPTokenizer]
    schedule: DiffusionSchedule
    # cond_stage2 (FPS embedder) params when cfg.cond_stage2_key is set
    cond_stage2_params: Any = None
    # provenance for 'Main Model Only' aux reload: the native dir or the
    # Lightning model.ckpt this pipeline was loaded from (None = random init)
    model_dir: Optional[str] = None
    ckpt_path: Optional[str] = None
    _decode_fn: Any = field(default=None, repr=False)
    _encode_fn: Any = field(default=None, repr=False)
    _encode_text_fn: Any = field(default=None, repr=False)
    _sample_cache: dict = field(default_factory=dict, repr=False)

    @classmethod
    def random_init(cls, cfg: VideoCrafterUNetConfig | None = None, policy: Policy = Policy(), seed: int = 0):
        cfg = cfg or VideoCrafterUNetConfig().tiny()
        vae_cfg = VAEConfig().tiny() if cfg.model_channels < 128 else VAEConfig()
        tokenizer = CLIPTokenizer.for_tests()
        clip_cfg = dataclasses.replace(
            CLIPTextConfig.clip_l_14(),
            width=cfg.context_dim,
            layers=2,
            heads=2,
            vocab_size=tokenizer.vocab_size,
        )
        unet = VideoCrafterUNet(cfg=cfg, policy=policy)
        x = jnp.zeros((1, 2, 8, 8, cfg.in_channels))
        unet_params = jax.jit(unet.init)(
            jax.random.key(seed), x, jnp.zeros((1,)), jnp.zeros((1, 77, cfg.context_dim))
        )
        vae = AutoencoderKL(cfg=vae_cfg, policy=policy)
        vae_params = jax.jit(vae.init)(jax.random.key(seed + 1), jnp.zeros((1, 32, 32, 3)))
        clip = CLIPTextTransformer(cfg=clip_cfg, policy=policy)
        clip_params = jax.jit(clip.init)(jax.random.key(seed + 2), jnp.zeros((1, 77), jnp.int32))
        cs2_params = None
        if cfg.cond_stage2_key == "temporal_context":
            from t2v.models.videocrafter_unet import FPSEmbedder

            cs2_params = jax.jit(
                FPSEmbedder(model_channels=cfg.model_channels, policy=policy).init
            )(jax.random.key(seed + 3), jnp.zeros((1,)))
        return cls(
            cfg=cfg, vae_cfg=vae_cfg, clip_cfg=clip_cfg, policy=policy,
            unet=unet, vae=vae, clip=clip,
            unet_params=unet_params, vae_params=vae_params, clip_params=clip_params,
            tokenizer=tokenizer,
            schedule=DiffusionSchedule.from_betas(
                beta_schedule("linear", cfg.num_timesteps, cfg.linear_start, cfg.linear_end)
            ),
            cond_stage2_params=cs2_params,
        )

    def load_lora(self, lora_path: str, scale: float = 1.0) -> list[str]:
        """Merge a cloneofsimo-format LoRA (``lora_up/lora_down`` torch file
        or safetensors) into the UNet — the reference's ``net_load_lora`` at
        model load (sample_utils.py:30-31, lvdm lora.py:620-672). Returns
        skipped module names."""
        from t2v.io.convert_vc import vc_module_index
        from t2v.pipeline.lora import merge_lvdm_lora

        if lora_path.endswith(".safetensors"):
            from t2v.io.safetensors_io import load_safetensors

            sd = load_safetensors(lora_path)
            if isinstance(sd, tuple):
                sd = sd[0]
        else:
            from t2v.io.pickle_reader import load_torch_checkpoint

            sd = load_torch_checkpoint(lora_path)
            if "state_dict" in sd:
                sd = sd["state_dict"]
        merged, skipped = merge_lvdm_lora(
            self.unet_params, sd, vc_module_index(self.cfg), scale
        )
        # cached sampler executables take params as arguments, so the merge
        # takes effect immediately without invalidation
        self.unet_params = merged
        return skipped

    @classmethod
    def from_native(
        cls, model_dir: str, policy: Policy = Policy.bf16()
    ) -> "VideoCrafterPipeline":
        """Load a t2v-native (orbax) checkpoint dir — what the training CLI
        saves for the VideoCrafter family."""
        from t2v.io.orbax_io import config_from_dict, load_native
        from t2v.models.videocrafter_unet import VideoCrafterUNetConfig

        data = load_native(model_dir)
        meta = data["meta"]
        if meta.get("model_family") != "videocrafter":
            raise ValueError(
                f"{model_dir} holds a {meta.get('model_family')} checkpoint; "
                "load it with ModelScopePipeline.from_native"
            )
        cfg = config_from_dict(VideoCrafterUNetConfig, meta["unet_cfg"])
        vae_cfg = config_from_dict(VAEConfig, meta["vae_cfg"])
        clip_cfg = config_from_dict(CLIPTextConfig, meta["clip_cfg"])
        unet = VideoCrafterUNet(cfg=cfg, policy=policy)
        vae = AutoencoderKL(cfg=vae_cfg, policy=policy)
        clip = CLIPTextTransformer(cfg=clip_cfg, policy=policy)
        tokenizer = CLIPTokenizer.find_and_load(
            model_dir, os.path.dirname(model_dir)
        )
        cs2 = data.get("cond_stage2_params")
        if cs2 is None and cfg.cond_stage2_key == "temporal_context":
            from t2v.models.videocrafter_unet import FPSEmbedder

            cs2 = jax.jit(
                FPSEmbedder(model_channels=cfg.model_channels, policy=policy).init
            )(jax.random.key(0), jnp.zeros((1,)))
        return cls(
            cfg=cfg, vae_cfg=vae_cfg, clip_cfg=clip_cfg, policy=policy,
            unet=unet, vae=vae, clip=clip,
            unet_params=_cast(data["unet_params"], policy.param_dtype),
            vae_params=_cast(data["vae_params"], policy.param_dtype),
            clip_params=_cast(data["clip_params"], policy.param_dtype),
            tokenizer=tokenizer,
            schedule=DiffusionSchedule.from_betas(
                beta_schedule("linear", cfg.num_timesteps, cfg.linear_start, cfg.linear_end)
            ),
            cond_stage2_params=(
                _cast(cs2, policy.param_dtype) if cs2 is not None else None
            ),
            model_dir=model_dir,
        )

    @classmethod
    def from_model_dir(
        cls, model_dir: str, policy: Policy = Policy.bf16(), **kw
    ) -> "VideoCrafterPipeline":
        """Load either layout from a directory: a t2v-native (orbax) dir —
        detected by its manifest — or the reference's ``model.ckpt``
        Lightning layout. The single dispatch point for every entry
        (CLI, API, orchestrator)."""
        from t2v.io.orbax_io import is_native_checkpoint

        if is_native_checkpoint(model_dir):
            return cls.from_native(model_dir, policy=policy)
        return cls.from_checkpoint(
            os.path.join(model_dir, "model.ckpt"), policy=policy, **kw
        )

    @classmethod
    def from_checkpoint(
        cls,
        ckpt_path: str,
        config_path: Optional[str] = None,
        policy: Policy = Policy.bf16(),
        lora_path: Optional[str] = None,
        lora_scale: float = 1.0,
    ) -> "VideoCrafterPipeline":
        import yaml

        from t2v.io.convert import convert_vae
        from t2v.io.convert_vc import convert_vc_unet, split_lightning_state_dict
        from t2v.io.pickle_reader import load_torch_checkpoint

        if config_path is None:
            # fallback config discovery (process_videocrafter.py:23-29)
            for cand in (
                os.path.join(os.path.dirname(ckpt_path), "model_config.yaml"),
                os.path.join(os.path.dirname(ckpt_path), "base_t2v", "model_config.yaml"),
            ):
                if os.path.exists(cand):
                    config_path = cand
                    break
        if config_path is None:
            raise FileNotFoundError("model_config.yaml not found near checkpoint")
        with open(config_path) as f:
            yaml_cfg = yaml.safe_load(f)
        cfg = VideoCrafterUNetConfig.from_yaml_dict(yaml_cfg)

        ckpt = load_torch_checkpoint(ckpt_path)
        parts = split_lightning_state_dict(ckpt)
        del ckpt

        unet = VideoCrafterUNet(cfg=cfg, policy=policy)
        unet_params = _cast(convert_vc_unet(parts["unet"], cfg), policy.param_dtype)
        # first_stage ddconfig rides in the yaml (model_config.yaml:49-68);
        # defaults match the published checkpoints
        dd = (
            yaml_cfg.get("model", {}).get("params", {})
            .get("first_stage_config", {}).get("params", {}).get("ddconfig", {})
        )
        vae_cfg = VAEConfig(
            z_channels=dd.get("z_channels", 4),
            in_channels=dd.get("in_channels", 3),
            out_channels=dd.get("out_ch", 3),
            ch=dd.get("ch", 128),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            resolution=dd.get("resolution", 256),
            scale_factor=yaml_cfg.get("model", {}).get("params", {}).get(
                "scale_factor", 0.18215
            ),
        )
        vae = AutoencoderKL(cfg=vae_cfg, policy=policy)
        vae_params = _cast(convert_vae(parts["vae"], vae_cfg), policy.param_dtype)
        n_clip_layers = 1 + max(
            int(k.split("encoder.layers.")[1].split(".")[0])
            for k in parts["clip"]
            if "encoder.layers." in k
        )
        clip_cfg = dataclasses.replace(CLIPTextConfig.clip_l_14(), layers=n_clip_layers)
        clip = CLIPTextTransformer(cfg=clip_cfg, policy=policy)
        clip_params = _cast(
            convert_hf_clip_text(
                {f"text_model.{k.split('text_model.')[-1]}": v for k, v in parts["clip"].items()},
                clip_cfg,
            ),
            policy.param_dtype,
        )
        tokenizer = CLIPTokenizer.find_and_load(
            os.path.dirname(ckpt_path), os.path.dirname(os.path.dirname(ckpt_path))
        )
        cs2_params = None
        if cfg.cond_stage2_key == "temporal_context":
            from t2v.io.convert_vc import convert_fps_embedder

            cs2_params = convert_fps_embedder(
                parts["other"], cfg, policy=policy
            )
        pipe = cls(
            cfg=cfg, vae_cfg=vae_cfg, clip_cfg=clip_cfg, policy=policy,
            unet=unet, vae=vae, clip=clip,
            unet_params=unet_params, vae_params=vae_params, clip_params=clip_params,
            tokenizer=tokenizer,
            schedule=DiffusionSchedule.from_betas(
                beta_schedule("linear", cfg.num_timesteps, cfg.linear_start, cfg.linear_end)
            ),
            cond_stage2_params=cs2_params,
            ckpt_path=ckpt_path,
        )
        if lora_path:
            skipped = pipe.load_lora(lora_path, lora_scale)
            print(f"t2v: merged LVDM LoRA ({len(skipped)} modules skipped)")
        return pipe

    # ------------------------------------------------------------------
    # keep-in-VRAM 'Main Model Only' retention, same 3-state semantics as
    # ModelScopePipeline.release_aux/reload_aux (render.py:40-43,
    # t2v_pipeline.py:367-373 — the reference applies the option per-run
    # regardless of model family)

    def release_aux(self) -> None:
        """Drop the VAE and CLIP weights AND their jit executables; the
        UNet params and the jitted-sampler cache stay resident."""
        self.vae_params = None
        self.clip_params = None
        self._decode_fn = None
        self._encode_fn = None
        self._encode_text_fn = None

    def reload_aux(self) -> None:
        """Re-read only the VAE and CLIP weights after ``release_aux``.
        No-op when both components are resident."""
        if self.vae_params is not None and self.clip_params is not None:
            return
        if self.model_dir is None and self.ckpt_path is None:
            raise ValueError(
                "cannot reload VAE/CLIP: pipeline has no checkpoint "
                "provenance (random-init pipelines cannot use "
                "'Main Model Only')"
            )
        if self.model_dir is not None:
            from t2v.io.orbax_io import load_native

            data = load_native(self.model_dir, only=("vae", "clip"))
            self.vae_params = _cast(data["vae_params"], self.policy.param_dtype)
            self.clip_params = _cast(
                data["clip_params"], self.policy.param_dtype
            )
            return
        # Lightning layout: one model.ckpt holds every component — re-read
        # it and keep only the aux trees (configs are already on self)
        from t2v.io.convert import convert_vae
        from t2v.io.convert_vc import split_lightning_state_dict
        from t2v.io.pickle_reader import load_torch_checkpoint

        parts = split_lightning_state_dict(load_torch_checkpoint(self.ckpt_path))
        self.vae_params = _cast(
            convert_vae(parts["vae"], self.vae_cfg), self.policy.param_dtype
        )
        self.clip_params = _cast(
            convert_hf_clip_text(
                {
                    f"text_model.{k.split('text_model.')[-1]}": v
                    for k, v in parts["clip"].items()
                },
                self.clip_cfg,
            ),
            self.policy.param_dtype,
        )

    # ------------------------------------------------------------------

    def encode_text(self, prompts: list[str]) -> jax.Array:
        """Plain CLIP-L encoding: 77 tokens, BOS/EOS, EOS-padded, last
        hidden state — no emphasis weighting (condition_modules.py:15-40)."""
        assert self.tokenizer is not None and self.clip is not None
        L = self.clip_cfg.context_length
        rows = []
        for p in prompts:
            ids = self.tokenizer.encode(p)[: L - 2]
            row = [self.tokenizer.bos_id] + ids + [self.tokenizer.eos_id]
            row = row + [self.tokenizer.eos_id] * (L - len(row))
            rows.append(row)
        tokens = jnp.asarray(np.asarray(rows, np.int32))
        if self._encode_text_fn is None:
            # jitted once: an eager tower apply runs op-by-op through the
            # device transport, ~100x slower than the compiled program
            self._encode_text_fn = jax.jit(self.clip.apply)
        return self._encode_text_fn(self.clip_params, tokens)

    def load_adapter(self, adapter_path: str, adapter_cfg=None):
        """Load a T2I-Adapter torch checkpoint
        (sample_text2video_adapter.py:20-41; 'adapter.' key prefix from the
        Lightning wrapper is stripped). Returns (Adapter, params)."""
        from t2v.models.adapter import Adapter, AdapterConfig, convert_adapter

        if adapter_path.endswith(".safetensors"):
            from t2v.io.safetensors_io import load_safetensors

            sd = load_safetensors(adapter_path)
        else:
            from t2v.io.pickle_reader import load_torch_checkpoint

            sd = load_torch_checkpoint(adapter_path)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {
            (k[len("adapter."):] if k.startswith("adapter.") else k): v
            for k, v in sd.items()
        }
        if adapter_cfg is None:
            from t2v.models.adapter import infer_adapter_config

            adapter_cfg = infer_adapter_config(sd)
        params = convert_adapter(sd, adapter_cfg)
        return Adapter(cfg=adapter_cfg, policy=self.policy), params

    def adapter_features(self, adapter, adapter_params, depth_video: "np.ndarray"):
        """Per-frame adapter feature pyramid (ddpm3d.py:1470-1484 'process
        in 2D manner'). depth_video: (B, T, H, W, C) in [-1, 1] — depth maps
        normalised per frame like get_batch_depth (ddpm3d.py:1449-1466);
        depth *estimation* from RGB lives in t2v.models.depth (MidasSmall /
        DepthStage — run() wires it via depth_ckpt/depth_estimator).

        Frames fold into the batch axis for one vectorised adapter pass —
        the TPU replacement for the reference's encode_bs=1 chunk loop."""
        b, t = depth_video.shape[:2]
        merged = jnp.asarray(depth_video).reshape((b * t,) + depth_video.shape[2:])
        # keyed by config, not object identity: load_adapter returns a
        # fresh Adapter per request, and params arrive as an argument, so
        # same-config adapters share one compiled program (bounded cache)
        key = ("adapter_feats", repr(adapter.cfg))
        fn = self._sample_cache.get(key)
        if fn is None:
            # jitted once per adapter config: an eager apply runs op-by-op
            fn = jax.jit(adapter.apply)
            self._sample_cache[key] = fn
        feats = fn(adapter_params, merged)
        return tuple(
            f.reshape((b, t) + f.shape[1:]) for f in feats
        )

    def embed_fps(self, fps) -> jax.Array:
        """Run the cond_stage2 FPS embedder (sample_utils.py:69-70) —
        returns the (1, 4·model_channels) ``temporal_context`` embedding."""
        from t2v.models.videocrafter_unet import FPSEmbedder

        if self.cond_stage2_params is None:
            raise ValueError(
                "this model has no cond_stage2 FPS embedder "
                "(cfg.cond_stage2_key is unset)"
            )
        fn = self._sample_cache.get("fps_embed")
        if fn is None:
            emb = FPSEmbedder(
                model_channels=self.cfg.model_channels, policy=self.policy
            )
            fn = jax.jit(emb.apply)
            self._sample_cache["fps_embed"] = fn
        return fn(self.cond_stage2_params, jnp.asarray([float(fps)]))

    def _resolve_temporal_context(self, args: T2VArgs):
        """cond_fps → fps embedding when the model is FPS-conditioned
        (get_conditions asserts cond_fps is given, sample_utils.py:66-71)."""
        if self.cfg.cond_stage2_key != "temporal_context":
            return None
        if args.cond_fps is None:
            raise ValueError(
                "this VideoCrafter model is FPS-conditioned: set cond_fps "
                "(reference sample_utils.py:68 asserts it)"
            )
        return self.embed_fps(args.cond_fps)

    def make_apply_fn(self, features_adapter=None, temporal_context=None):
        """(x, t, ctx) -> eps, routing ctx through the model's
        conditioning_key (DiffusionWrapper semantics, ddpm3d.py:1362-1433)
        with optional T2I-Adapter feature injection and FPS embedding."""
        unet, params, ck = self.unet, self.unet_params, self.cfg.conditioning_key
        return _routed_apply(unet, ck, params, features_adapter, temporal_context)

    def apply_model(self, x, t, cond, features_adapter=None):
        """Reference ``LatentDiffusion.apply_model`` equivalent
        (ddpm3d.py:849-865): cond may be a bare context array, a list, or a
        conditioning dict with c_concat/c_crossattn/c_adm/s/
        temporal_context keys."""
        from t2v.models.conditioning import normalize_cond, route_conditioning

        ck = self.cfg.conditioning_key
        x2, kw = route_conditioning(ck, x, normalize_cond(ck, cond))
        return self.unet.apply(
            self.unet_params, x2, t, kw["context"],
            features_adapter=features_adapter, y=kw["y"],
            temporal_context=kw["temporal_context"],
        )

    def infer(
        self,
        args: T2VArgs,
        *,
        callback: Optional[Callable[[int], None]] = None,
        callback_interval: Optional[int] = None,
        batch_index: int = 0,
        sample_type: str = "ddim",  # "ddim" | "ddpm" (sample_utils.py:56-87)
        features_adapter=None,  # T2I-Adapter feature pyramid (depth cond)
        mask=None,  # (1, F, h, w, C) 1=keep source (lvdm ddim.py:188-195)
        source_latents=None,  # x0 for masked regions
        uc_type: Optional[str] = None,  # None | "cfg_original" | "cfg_ours"
    ) -> InferResult:
        sanity_check_args(args)
        seed = rng_lib.resolve_seed(args.seed)
        batch_seed = seed + batch_index if args.seed != -1 else seed
        key = rng_lib.key_for_seed(batch_seed)

        ss = _spatial_scale(self.vae_cfg)
        shape = (1, args.frames, args.height // ss, args.width // ss, self.cfg.in_channels)

        cond = self.encode_text([args.prompt])
        uncond = self.encode_text([args.n_prompt])
        tc = self._resolve_temporal_context(args)

        apply_fn = self.make_apply_fn(
            features_adapter=features_adapter, temporal_context=tc
        )

        # sampler selection: "ddim" | "ddpm" mirror the reference
        # (sample_utils.py:56-87); "dpm++ 2m" is the beyond-reference
        # multistep sampler (t2v/diffusion/dpmpp.py) — txt2vid only
        # (its carry-based loop takes no mask blend or uc_type override).
        if sample_type not in ("ddim", "ddpm", "dpm++ 2m"):
            raise ValueError(f"unknown sample_type {sample_type!r}")
        sampler_name = "DPM++ 2M" if sample_type == "dpm++ 2m" else "DDIM"
        if sample_type == "dpm++ 2m" and (mask is not None or uc_type):
            raise ValueError(
                "sample_type='dpm++ 2m' does not support mask inpainting "
                "or uc_type CFG variants — use 'ddim'"
            )

        t0 = time.perf_counter()
        if sample_type == "ddpm":
            from t2v.diffusion import ddpm as ddpm_mod
            from t2v.diffusion.sampling import make_eps_fn

            eps_fn = make_eps_fn(
                apply_fn, cond, uncond, args.cfg_scale, "full",
                parameterization=self.cfg.parameterization,
                schedule=self.schedule,
            )
            noise = rng_lib.latent_noise(key, shape)
            # clip_denoised=False: LatentDiffusion disables the x0 clip
            # (ddpm3d.py:540) — latents routinely exceed +/-1
            x0 = ddpm_mod.sample(
                eps_fn, self.schedule, noise, key, clip_denoised=False
            )
        elif callback is not None and callback_interval is not None and (
            sampler_name == "DPM++ 2M"
        ):
            # windowed multistep execution: the 2M carry (x, prev_D)
            # crosses jitted windows; interrupt polled between windows
            # (same cancellation semantics as the DDIM window path)
            from t2v.diffusion import dpmpp
            from t2v.diffusion.sampling import _unipc_model_fn

            p = dpmpp.plan(self.schedule, args.steps)
            unet, ck = self.unet, self.cfg.conditioning_key
            base_static = (
                "dpmpp-win", args.steps, shape, float(args.cfg_scale),
                features_adapter is not None, tc is not None,
            )

            def build_dpm_window(n):
                def f(params, x, d_prev, off, cond, uncond, feats, tcond):
                    apply = _routed_apply(unet, ck, params, feats, tcond)
                    model_fn = _unipc_model_fn(
                        apply, cond, uncond, args.cfg_scale, p,
                        parameterization=self.cfg.parameterization,
                    )
                    return dpmpp.window(x, d_prev, model_fn, p, off, n)

                return jax.jit(f)

            x = rng_lib.latent_noise(key, shape).astype(jnp.float32)
            d_prev = jnp.zeros_like(x)
            done = 0
            while done < p.steps:
                n = min(callback_interval, p.steps - done)
                fkey = base_static + (n,)
                fn = self._sample_cache.get(fkey)
                if fn is None:
                    fn = build_dpm_window(n)
                    self._sample_cache[fkey] = fn
                x, d_prev = fn(
                    self.unet_params, x, d_prev, done, cond, uncond,
                    features_adapter, tc,
                )
                jax.block_until_ready(x)
                done += n
                callback(done)  # raises to interrupt/skip
            x0 = x
        elif (
            callback is None
            or callback_interval is None
        ):
            # whole-loop jit, params as a real argument (avoids embedding
            # the weights as jaxpr constants — see ModelScopePipeline.infer)
            static = (
                args.steps, shape, float(args.cfg_scale), float(args.eta),
                mask is not None, uc_type, features_adapter is not None,
                sampler_name, tc is not None,
            )
            fn = self._sample_cache.get(static)
            if fn is None:
                unet, ck = self.unet, self.cfg.conditioning_key
                inpaint = "lvdm_static" if mask is not None else "initial_only"

                def f(params, key, cond, uncond, mask, source_latents, feats, tcond):
                    apply = _routed_apply(unet, ck, params, feats, tcond)
                    return sample_loop(
                        apply, self.schedule, steps=args.steps, shape=shape,
                        cond=cond, uncond=uncond,
                        guidance_scale=args.cfg_scale, eta=args.eta,
                        sampler_name=sampler_name, key=key, mask=mask,
                        image_latents=source_latents, inpaint_mode=inpaint,
                        cfg_combine_mode=uc_type,
                        parameterization=self.cfg.parameterization,
                    )

                fn = jax.jit(f)
                self._sample_cache[static] = fn
            x0 = fn(
                self.unet_params, key, cond, uncond, mask, source_latents,
                features_adapter, tc,
            )
        else:
            # windowed interrupt-capable path, params as a jit argument
            # (mirrors ModelScopePipeline.infer)
            from t2v.diffusion.sampling import (
                make_step_body,
                plan_and_start,
                run_window,
            )

            inpaint = "lvdm_static" if mask is not None else "initial_only"
            mod, p, x = plan_and_start(
                self.schedule, steps=args.steps, shape=shape, eta=args.eta,
                sampler_name="DDIM", key=key,
            )
            unet, ck = self.unet, self.cfg.conditioning_key
            base_static = (
                "window", args.steps, shape, float(args.cfg_scale),
                float(args.eta), inpaint, uc_type,
                mask is not None, features_adapter is not None,
                tc is not None,
            )

            def build_window(n):
                def build():
                    def f(params, x, start, cond, uncond, mask, src, feats,
                          tcond, wkey):
                        apply = _routed_apply(unet, ck, params, feats, tcond)
                        body = make_step_body(
                            mod, p, apply, cond, uncond, args.cfg_scale,
                            wkey, args.eta, mask, src, inpaint,
                            self.schedule, uc_type,
                            self.cfg.parameterization,
                        )
                        return run_window(body, x, start, n)

                    return jax.jit(f)

                return build

            done = 0
            while done < p.steps:
                n = min(callback_interval, p.steps - done)
                fkey = base_static + (n,)
                fn = self._sample_cache.get(fkey)
                if fn is None:
                    fn = build_window(n)()
                    self._sample_cache[fkey] = fn
                x = fn(
                    self.unet_params, x, done, cond, uncond, mask,
                    source_latents, features_adapter, tc, key,
                )
                x.block_until_ready()
                done += n
                callback(done)
            x0 = x
        x0.block_until_ready()
        t_sample = time.perf_counter() - t0

        frames = self.decode_latents(x0[0])
        infotext = self.create_infotext(args, batch_seed)
        print(f"t2v videocrafter timings: sample={t_sample:.2f}s")
        return InferResult(frames=list(frames), latents=x0, infotext=infotext)

    def build_inpainting_inputs(self, image_rgb, args: T2VArgs):
        """img2vid inputs for the LVDM static mask blend
        (lvdm ddim.py:188-195): returns (mask, source_latents).

        Reuses the ModelScope keyframe-weight DSL (process_modelscope.py:
        170-219) but with LVDM polarity — there mask=1 KEEPS the source, so
        the per-frame keep-weight is 1 - w (w: how much is generated)."""
        import numpy as np

        from t2v.pipeline.keyframes import KeyFrameSeries

        ss = _spatial_scale(self.vae_cfg)
        lat_h, lat_w = args.height // ss, args.width // ss
        keys = KeyFrameSeries(args.frames, args.seed, max(args.inpainting_frames, 1))
        weights = keys.inpainting_weights(args.inpainting_weights)

        img = np.asarray(image_rgb, np.float32) / 255.0 * 2.0 - 1.0
        frames = np.repeat(img[None], args.frames, axis=0)
        source_latents = jnp.asarray(self.compute_latents(frames))

        mask = np.zeros((1, args.frames, lat_h, lat_w, self.cfg.in_channels), np.float32)
        for i in range(args.frames):
            mask[:, i] = 1.0 - float(weights[i])
        return jnp.asarray(mask), source_latents

    def create_infotext(self, args: T2VArgs, seed: int) -> str:
        return (
            f"{args.prompt}\nNegative prompt: {args.n_prompt}\n"
            f"Steps: {args.steps}, Sampler: DDIM, CFG scale: {args.cfg_scale}, "
            f"Seed: {seed}, Size: {args.width}x{args.height}, "
            f"Frames: {args.frames}, Model: VideoCrafter"
        )

    def compute_latents(self, frames_rgb) -> jax.Array:
        """(F, H, W, 3) float in [-1,1] → (1, F, h, w, 4) scaled latents —
        the LVDM 2D frame-batched encode (ddpm3d.py:769-819), posterior
        mean × scale_factor, fused into one program
        (models.vae.make_encode_latents_fn)."""
        if self._encode_fn is None:
            from t2v.models.vae import make_encode_latents_fn

            self._encode_fn = make_encode_latents_fn(
                self.vae, float(self.cfg.scale_factor)
            )
        x = jnp.asarray(frames_rgb, jnp.float32)
        chunks = []
        for i in range(0, x.shape[0], DECODE_CHUNK):
            chunks.append(self._encode_fn(self.vae_params, x[i : i + DECODE_CHUNK]))
        return jnp.concatenate(chunks, axis=0)[None]

    def decode_latents(self, latents: jax.Array) -> np.ndarray:
        """Unscale/decode/normalise/quantise in one jitted program with a
        uint8 readback (models.vae.make_decode_uint8_fn)."""
        if self._decode_fn is None:
            from t2v.models.vae import make_decode_uint8_fn

            fn = make_decode_uint8_fn(self.vae, float(self.cfg.scale_factor))
            vp = self.vae_params
            self._decode_fn = lambda z: fn(vp, z)
        outs = []
        for i in range(0, latents.shape[0], DECODE_CHUNK):
            outs.append(np.asarray(self._decode_fn(latents[i : i + DECODE_CHUNK])))
        return np.concatenate(outs, axis=0)


def _cast(tree, dtype):
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)


_VC_PIPELINE_CACHE: dict[tuple, "VideoCrafterPipeline"] = {}


def load_vc_pipeline(
    model_dir: str, policy: Policy = Policy.bf16(), keep_in_vram: bool = True
) -> "VideoCrafterPipeline":
    """Cached VideoCrafter loader with the same hot-switch semantics as
    ``pipeline.load_pipeline``. The reference reloads the model.ckpt on every
    job (process_videocrafter.py:33-44) because eager torch has nothing to
    amortise; here a reload would also drop the pipeline's jitted-sampler
    cache, so repeat API/CLI requests reuse the loaded pipeline."""
    from t2v.core.compile_cache import enable_compile_cache

    enable_compile_cache()
    key = (os.path.abspath(model_dir), policy.param_dtype)
    if key in _VC_PIPELINE_CACHE:
        return _VC_PIPELINE_CACHE[key]
    _VC_PIPELINE_CACHE.clear()
    pipe = VideoCrafterPipeline.from_model_dir(model_dir, policy=policy)
    if keep_in_vram:
        _VC_PIPELINE_CACHE[key] = pipe
    return pipe
