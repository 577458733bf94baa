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
    tokenizer_vocab: str | None = None,
    cond_stage2_params: Any = None,
) -> str:
    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ckpt = _checkpointer()
    ckpt.save(os.path.join(out_dir, "unet"), unet_params, force=True)
    ckpt.save(os.path.join(out_dir, "vae"), vae_params, force=True)
    ckpt.save(os.path.join(out_dir, "clip"), clip_params, force=True)
    if cond_stage2_params is not None:
        ckpt.save(
            os.path.join(out_dir, "cond_stage2"), cond_stage2_params, force=True
        )
    if tokenizer_vocab and os.path.exists(tokenizer_vocab):
        # ship the BPE vocab so the native dir is self-contained; no-op when
        # saving over the dir the vocab came from (same-file copy raises)
        import shutil

        target = os.path.join(out_dir, os.path.basename(tokenizer_vocab))
        if os.path.abspath(tokenizer_vocab) != os.path.abspath(target):
            shutil.copy(tokenizer_vocab, target)
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


def config_from_dict(cls, d: dict) -> Any:
    """Rebuild a config dataclass from its JSON dict (lists → tuples,
    unknown keys ignored so old checkpoints survive config growth)."""
    kw = {}
    for f in dataclasses.fields(cls):
        if f.name in d:
            v = d[f.name]
            kw[f.name] = tuple(v) if isinstance(v, list) else v
    return cls(**kw)


def is_native_checkpoint(model_dir: str) -> bool:
    return os.path.exists(os.path.join(model_dir, "t2v_native.json"))


def save_train_state(out_dir: str, state: Any, mode: dict | None = None) -> str:
    """Full training state (params + optimizer state + step + EMA) for
    resume. The reference had no training resume at all (SURVEY.md §5.4 —
    inference-only checkpoint loading); here it is first-class. ``mode``
    records run-shape facts (lora rank, ema on/off) so an incompatible
    --resume fails with a clear message instead of an orbax tree
    mismatch."""
    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    import jax

    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "ema_params": state.ema_params,
    }
    _checkpointer().save(
        os.path.join(out_dir, "train_state"), jax.device_get(tree), force=True
    )
    meta = {"format_version": FORMAT_VERSION, "step": int(state.step)}
    if mode:
        meta["mode"] = mode
    with open(os.path.join(out_dir, "train_state.json"), "w") as f:
        json.dump(meta, f)
    return out_dir


def train_state_mode(out_dir: str) -> dict:
    """The ``mode`` dict recorded at save time ({} for older states)."""
    with open(os.path.join(out_dir, "train_state.json")) as f:
        return json.load(f).get("mode", {})


def has_train_state(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, "train_state.json"))


def restore_train_state(out_dir: str, template_state: Any) -> Any:
    """Restore into the structure/dtypes/shardings of ``template_state``
    (produced by ``init_train_state`` on the same config + mesh)."""
    tree = {
        "params": template_state.params,
        "opt_state": template_state.opt_state,
        "step": template_state.step,
        "ema_params": template_state.ema_params,
    }
    restored = _checkpointer().restore(
        os.path.join(os.path.abspath(out_dir), "train_state"), item=tree
    )
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    # place restored leaves with the template's shardings (tp/dp resume);
    # leaves the template left on a single device (optimizer scalars from
    # optax init) are replicated over the same mesh — jit rejects a state
    # that mixes mesh-wide and single-device placements
    mesh = None
    for leaf in jax.tree.leaves(tree):
        s = getattr(leaf, "sharding", None)
        if isinstance(s, NamedSharding):
            mesh = s.mesh
            break

    def _place(r, t):
        s = getattr(t, "sharding", None)
        if isinstance(s, NamedSharding):
            return jax.device_put(r, s)
        if mesh is not None:
            return jax.device_put(r, NamedSharding(mesh, PartitionSpec()))
        return r

    restored = jax.tree.map(_place, restored, tree)
    return type(template_state)(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        ema_params=restored["ema_params"],
    )


def latest_train_state(root: str) -> str | None:
    """Newest ``step_N`` / ``lora_state_N`` dir under ``root`` carrying a
    train state (LoRA runs save states under the distinct ``lora_state_``
    prefix so generation's --model-dir never mistakes them for full
    checkpoints)."""
    if not os.path.isdir(root):
        return None
    best, best_step = None, -1
    for name in os.listdir(root):
        p = os.path.join(root, name)
        if (
            name.startswith("step_") or name.startswith("lora_state_")
        ) and has_train_state(p):
            try:
                s = int(name.rsplit("_", 1)[1])
            except ValueError:
                continue
            if s > best_step:
                best, best_step = p, s
    return best


def load_native(
    model_dir: str, only: tuple[str, ...] | None = None
) -> dict[str, Any]:
    """Returns {meta, unet_params, vae_params, clip_params}.

    Each component tree lives in its own orbax dir, so ``only`` restricts
    the restore to the named components (e.g. ``("vae", "clip")`` for
    ``reload_aux`` — re-materialising the UNet just to discard it would
    double peak memory). Unrestored keys come back ``None``."""
    with open(os.path.join(model_dir, "t2v_native.json")) as f:
        meta = json.load(f)
    if meta["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"native checkpoint format {meta['format_version']} is newer than "
            f"this build ({FORMAT_VERSION})"
        )
    ckpt = _checkpointer()
    want = lambda name: only is None or name in only
    out = {
        "meta": meta,
        "unet_params": (
            ckpt.restore(os.path.join(model_dir, "unet")) if want("unet") else None
        ),
        "vae_params": (
            ckpt.restore(os.path.join(model_dir, "vae")) if want("vae") else None
        ),
        "clip_params": (
            ckpt.restore(os.path.join(model_dir, "clip")) if want("clip") else None
        ),
        "cond_stage2_params": None,
    }
    cs2 = os.path.join(model_dir, "cond_stage2")
    if os.path.exists(cs2) and want("cond_stage2"):
        out["cond_stage2_params"] = ckpt.restore(cs2)
    return out
