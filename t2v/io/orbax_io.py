"""Native (orbax) checkpoint save/restore for converted pipelines.

Reading the torch zoo (.pth zip-pickle → converted flax trees) costs tens
of seconds per load; a converted pipeline saved once with orbax restores
directly into device arrays (SURVEY.md §5.4 "orbax for native
checkpoints"). Layout:

  <dir>/unet/   <dir>/vae/   <dir>/clip/      (orbax PyTree checkpoints)
  <dir>/t2v_native.json                        (configs + format version)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

FORMAT_VERSION = 1


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_native(
    out_dir: str,
    *,
    unet_params: Any,
    vae_params: Any,
    clip_params: Any,
    unet_cfg,
    vae_cfg,
    clip_cfg,
    model_family: str = "modelscope",
) -> str:
    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ckpt = _checkpointer()
    ckpt.save(os.path.join(out_dir, "unet"), unet_params, force=True)
    ckpt.save(os.path.join(out_dir, "vae"), vae_params, force=True)
    ckpt.save(os.path.join(out_dir, "clip"), clip_params, force=True)
    meta = {
        "format_version": FORMAT_VERSION,
        "model_family": model_family,
        "unet_cfg": dataclasses.asdict(unet_cfg),
        "vae_cfg": dataclasses.asdict(vae_cfg),
        "clip_cfg": dataclasses.asdict(clip_cfg),
    }
    with open(os.path.join(out_dir, "t2v_native.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def is_native_checkpoint(model_dir: str) -> bool:
    return os.path.exists(os.path.join(model_dir, "t2v_native.json"))


def load_native(model_dir: str) -> dict[str, Any]:
    """Returns {meta, unet_params, vae_params, clip_params}."""
    with open(os.path.join(model_dir, "t2v_native.json")) as f:
        meta = json.load(f)
    if meta["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"native checkpoint format {meta['format_version']} is newer than "
            f"this build ({FORMAT_VERSION})"
        )
    ckpt = _checkpointer()
    return {
        "meta": meta,
        "unet_params": ckpt.restore(os.path.join(model_dir, "unet")),
        "vae_params": ckpt.restore(os.path.join(model_dir, "vae")),
        "clip_params": ckpt.restore(os.path.join(model_dir, "clip")),
    }
