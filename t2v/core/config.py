"""Unified configuration schema for the t2v framework.

One typed layer replaces the reference's four config systems (ModelScope
``configuration.json`` dicts, VideoCrafter OmegaConf YAML, the flat
``T2VArgs`` locals()-dict, and A1111 ``shared.opts`` — see
/root/reference/scripts/t2v_helpers/args.py:219-296 and
scripts/modelscope/t2v_pipeline.py:67-94 for the surfaces being unified).

Request-level defaults match the reference exactly (args.py:219-236,
:264-291) so that API calls produce identical generations modulo RNG.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass(frozen=True)
class ModelScopeUNetConfig:
    """Architecture of the ModelScope 3D-factorised UNet (``UNetSD``).

    Field names mirror the ``model_cfg`` keys of a ModelScope model dir's
    ``configuration.json`` (reference t2v_pipeline.py:76-94); defaults are the
    published ModelScope 1.7B text2video values.
    """

    in_dim: int = 4
    dim: int = 320
    y_dim: int = 768
    context_dim: int = 1024
    out_dim: int = 4
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    head_dim: int = 64
    num_res_blocks: int = 2
    attn_scales: tuple[float, ...] = (1.0, 0.5, 0.25)
    dropout: float = 0.1
    temporal_attention: bool = True
    temporal_attn_times: int = 1
    use_scale_shift_norm: bool = False
    parameterization: str = "eps"  # "eps" | "x0" | "v"
    num_timesteps: int = 1000

    @property
    def embed_dim(self) -> int:
        return self.dim * 4

    @classmethod
    def from_configuration_json(cls, model_dir: str) -> "ModelScopeUNetConfig":
        """Parse a ModelScope ``configuration.json`` (t2v_pipeline.py:67-94).

        The reference stores ``temporal_attention`` as the *string* "True";
        we preserve that quirk when parsing.
        """
        with open(os.path.join(model_dir, "configuration.json")) as f:
            config_dict = json.load(f)
        cfg = config_dict["model"]["model_cfg"]
        ta = cfg.get("temporal_attention", True)
        if isinstance(ta, str):
            ta = ta == "True"
        return cls(
            in_dim=cfg["unet_in_dim"],
            dim=cfg["unet_dim"],
            y_dim=cfg["unet_y_dim"],
            context_dim=cfg["unet_context_dim"],
            out_dim=cfg["unet_out_dim"],
            dim_mult=tuple(cfg["unet_dim_mult"]),
            num_heads=cfg["unet_num_heads"],
            head_dim=cfg["unet_head_dim"],
            num_res_blocks=cfg["unet_res_blocks"],
            attn_scales=tuple(cfg["unet_attn_scales"]),
            dropout=cfg["unet_dropout"],
            parameterization=cfg.get("mean_type", "eps"),
            temporal_attention=ta,
            num_timesteps=cfg.get("num_timesteps", 1000),
        )

    def tiny(self) -> "ModelScopeUNetConfig":
        """A CPU-testable miniature with the same topology."""
        return dataclasses.replace(
            self,
            dim=32,
            context_dim=32,
            y_dim=32,
            num_heads=2,
            head_dim=16,
            num_res_blocks=1,
            dim_mult=(1, 2),
            attn_scales=(1.0, 0.5),
        )


@dataclass(frozen=True)
class VAEConfig:
    """SD KL-VAE (VQGAN_autoencoder.pth) architecture.

    Matches the ddconfig hardcoded at reference t2v_pipeline.py:117-131.
    """

    z_channels: int = 4
    embed_dim: int = 4
    in_channels: int = 3
    out_channels: int = 3
    ch: int = 128
    ch_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: tuple[int, ...] = ()
    resolution: int = 256
    double_z: bool = True
    scale_factor: float = 0.18215  # latent scaling (t2v_pipeline.py:153,185,300)

    def tiny(self) -> "VAEConfig":
        # ch must stay a multiple of 32 (GroupNorm groups)
        return dataclasses.replace(self, ch=32, ch_mult=(1, 2), num_res_blocks=1)


@dataclass(frozen=True)
class CLIPTextConfig:
    """OpenCLIP text tower config.

    Defaults are ViT-H-14 (the ModelScope text encoder,
    reference clip_hardcode.py:59-90): width 1024, 24 layers, 16 heads,
    ``penultimate`` layer output.
    """

    vocab_size: int = 49408
    width: int = 1024
    layers: int = 24
    heads: int = 16
    context_length: int = 77
    layer: str = "penultimate"  # "last" | "penultimate"
    # CLIP-L (VideoCrafter / HF openai/clip-vit-large-patch14) uses
    # width=768, layers=12, heads=12, layer="last", final_ln=True.
    final_ln: bool = True
    # HF CLIPTextModel uses quick_gelu; OpenCLIP ViT-H uses exact gelu.
    act: str = "gelu"  # "gelu" | "quick_gelu"

    @classmethod
    def vit_h_14(cls) -> "CLIPTextConfig":
        return cls()

    @classmethod
    def clip_l_14(cls) -> "CLIPTextConfig":
        return cls(width=768, layers=12, heads=12, layer="last", act="quick_gelu")

    def tiny(self) -> "CLIPTextConfig":
        return dataclasses.replace(self, width=64, layers=2, heads=2, vocab_size=1024)


# Sampler names are part of the public surface
# (reference samplers_common.py:89-93); the DPM++ and Euler entries are
# beyond-reference additions (t2v/diffusion/{dpmpp,euler}.py).
SAMPLER_NAMES: tuple[str, ...] = (
    "DDIM_Gaussian", "DDIM", "UniPC", "DPM++ 2M", "DPM++ 2M Karras",
    "Euler", "Euler a",
)


@dataclass
class T2VArgs:
    """Generation request. Defaults mirror reference args.py:219-236."""

    prompt: str = ""
    n_prompt: str = "text, watermark, copyright, blurry, nsfw"
    sampler: str = "DDIM_Gaussian"
    steps: int = 30
    frames: int = 24
    seed: int = -1
    cfg_scale: float = 17.0
    width: int = 256
    height: int = 256
    eta: float = 0.0
    batch_count: int = 1
    # vid2vid
    do_vid2vid: bool = False
    vid2vid_input: str | None = None  # path or URL of the source video
    strength: float = 0.75
    vid2vid_startFrame: int = 0
    # img2vid / inpainting
    inpainting_image: str | None = None
    inpainting_frames: int = 0
    inpainting_weights: str = '0:(t/max_i_f), "max_i_f":(1)'
    # FPS conditioning (VideoCrafter models with a cond_stage2 FPS
    # embedder, sample_utils.py:65-71): the frame rate the sampled clip
    # should depict. Required when the loaded model is FPS-conditioned;
    # ignored otherwise.
    cond_fps: int | None = None
    # prompt-processing settings — A1111 exposes these as global webui
    # options (opts.comma_padding_backtrack, opts.enable_emphasis,
    # clip_hardcode.py:153-156,203-214); here they ride the request
    comma_padding_backtrack: int = 20
    enable_emphasis: bool = True
    # model selection. model=None with a warm pipe reuses the previously
    # loaded model (process_modelscope.py:62-66)
    model_type: str = "ModelScope"  # "ModelScope" | "VideoCrafter"
    model: str | None = "<modelscope>"

    def replace(self, **kw: Any) -> "T2VArgs":
        return dataclasses.replace(self, **kw)


@dataclass
class T2VOutputArgs:
    """Video output options. Defaults mirror reference args.py:264-291."""

    skip_video_creation: bool = False
    fps: int = 15
    make_gif: bool = False  # write an animated GIF alongside the mp4
    delete_imgs: bool = False  # delete PNG frames after a successful stitch
    # output path templates (reference args.py:268-270); None = the default
    # per-run directory layout. image_path may carry a %-style frame index.
    image_path: str | None = None
    mp4_path: str | None = None
    ffmpeg_location: str | None = None  # auto-discovered when None
    ffmpeg_crf: int = 17
    ffmpeg_preset: str = "slow"
    add_soundtrack: str = "None"  # "None" | "File" | "Init Video"
    soundtrack_path: str = ""
    # schema-only in the reference AND here: per-step preview dumps were
    # never consumed by any reference code path (args.py:272-273)
    render_steps: bool = False
    path_name_modifier: str = "x0_pred"  # "x0_pred" | "x"
    # Upscaling / frame-interpolation options (schema parity with
    # args.py:277-290 — stubs in the reference's extension path too; an
    # external RealESRGAN/RIFE/FILM stage would consume them)
    r_upscale_video: bool = False
    r_upscale_factor: str = "x2"  # "x2" | "x3" | "x4"
    r_upscale_model: str = "realesr-animevideov3"
    r_upscale_keep_imgs: bool = True
    frame_interpolation_engine: str = "None"  # "None" | "RIFE v4.6" | "FILM"
    frame_interpolation_x_amount: int = 2
    frame_interpolation_slow_mo_enabled: bool = False
    frame_interpolation_slow_mo_amount: int = 2
    frame_interpolation_keep_imgs: bool = False

    def replace(self, **kw: Any) -> "T2VOutputArgs":
        return dataclasses.replace(self, **kw)


def sanity_check_args(args: T2VArgs) -> None:
    """Validate a request; mirrors reference T2VArgs_sanity_check
    (args.py:238-262) minus the on-disk model-dir check (done at load time).
    """
    if args.frames < 1:
        raise ValueError("Frames count cannot be lower than 1!")
    if args.batch_count < 1:
        raise ValueError("Batch count cannot be lower than 1!")
    if args.width < 1 or args.height < 1:
        raise ValueError("Video dimensions cannot be lower than 1 pixel!")
    if args.cfg_scale < 1:
        raise ValueError("CFG scale cannot be lower than 1!")
    if args.steps < 1:
        raise ValueError("Steps cannot be lower than 1!")
    if not 0 <= args.strength <= 1:
        raise ValueError("vid2vid strength should be in range of 0 to 1!")
    if args.vid2vid_startFrame >= args.frames:
        raise ValueError("vid2vid start frame cannot be greater than the number of frames!")
    if not 0 <= args.inpainting_frames <= args.frames:
        raise ValueError("inpainting frames count should lie between 0 and the frames number!")
    if args.sampler not in SAMPLER_NAMES:
        raise ValueError("Sampler does not exist.")
