"""LoRA merging as pure param-tree transforms.

Covers both of the reference's LoRA systems (SURVEY.md §2.7):

  * **stable-lora** (ModelScope path): ``.safetensors`` files keyed by torch
    module path with ``.lora_A`` / ``.lora_B`` pairs; merge is
    ``W += (B @ A) * alpha`` with a Conv3d temporal mean-collapse
    (lora_processor.py:74-96) and optional bias deltas. Undo-merge is the
    algebraic inverse — here simply re-merging with ``-alpha`` (the
    reference tracks previous merges for the same purpose,
    lora_processor.py:117-147).
  * **cloneofsimo / LVDM format** (VideoCrafter path): torch files keyed
    ``...lora_up.weight`` / ``...lora_down.weight``; merge is
    ``W += up @ down * scale`` (lvdm lora.py:620-672 ``net_load_lora``).

Both produce a NEW param tree (functional; jit-compatible upstream). The
torch-name → flax-path resolution uses the converter's module index so the
two stay mechanically in sync.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from t2v.core.config import CLIPTextConfig, ModelScopeUNetConfig
from t2v.io.convert import clip_module_index, torch_module_index

Array = np.ndarray


def _delta_to_flax(delta: Array, kind: str, target_shape: tuple[int, ...]) -> Array:
    """Torch-layout LoRA delta → flax param layout."""
    if kind == "linear":
        return delta.T
    if kind == "conv1d":
        return delta.reshape(delta.shape[0], delta.shape[1]).T
    if kind == "conv2d":
        # delta (out, in*kh*kw) or already (out,in,kh,kw)
        kh, kw, cin, cout = target_shape
        return delta.reshape(cout, cin, kh, kw).transpose(2, 3, 1, 0)
    if kind == "conv3d":
        # temporal (kt,1,1) conv: reference views the 2D-trained delta as
        # (out,in,k,k,1) and mean-collapses the second spatial axis
        # (lora_processor.py:85-93)
        kt, _, _, cin, cout = target_shape
        d = delta.reshape(cout, cin, kt, kt, 1).mean(axis=3, keepdims=True)
        return d.transpose(2, 3, 4, 1, 0)
    if kind == "embedding":
        return delta.T
    raise ValueError(kind)


def _iter_lora_pairs(lora_sd: Mapping[str, Array]):
    for key in lora_sd:
        if key.endswith(".lora_A"):
            name = key[: -len(".lora_A")]
            yield name, lora_sd[key], lora_sd[f"{name}.lora_B"]


def merge_stable_lora(
    params: dict,
    lora_sd: Mapping[str, Array],
    alpha: float,
    module_index: Mapping[str, tuple[tuple[str, ...], str]],
    *,
    undo: bool = False,
    merge_bias: bool = True,
) -> tuple[dict, list[str]]:
    """Merge a stable-lora state_dict into flax ``{'params': ...}``.

    Returns (new_params, skipped_module_names). Module names absent from
    the index (e.g. norm layers, or CLIP modules when merging the UNet)
    are skipped and reported, matching the reference's silent tolerance.
    """
    import jax

    sign = -1.0 if undo else 1.0
    tree = jax.tree.map(lambda x: x, params)  # shallow-copy containers
    skipped: list[str] = []

    def leaf_ref(path: tuple[str, ...]) -> dict | None:
        node = tree["params"]
        for seg in path[:-1]:
            if seg not in node:
                return None
            node = node[seg]
        return node if path[-1] in node else None

    for name, lora_a, lora_b in _iter_lora_pairs(lora_sd):
        if name not in module_index:
            skipped.append(name)
            continue
        fpath, kind = module_index[name]
        a, b = np.asarray(lora_a, np.float32), np.asarray(lora_b, np.float32)
        # Conv LoRAs may carry trailing singleton dims (lora_webui squeeze,
        # lora_processor.py:232-235)
        while a.ndim > 2:
            a = a.squeeze(-1)
        while b.ndim > 2:
            b = b.squeeze(-1)
        delta = b @ a

        leaf_key = "embedding" if kind == "embedding" else "kernel"
        node = leaf_ref(fpath + (leaf_key,))
        if node is None:
            skipped.append(name)
            continue
        kernel = np.asarray(node[leaf_key], np.float32)
        merged = kernel + sign * alpha * _delta_to_flax(delta, kind, kernel.shape)
        node[leaf_key] = merged.astype(np.asarray(node[leaf_key]).dtype)

        if merge_bias and f"{name}.bias" in lora_sd:
            bnode = leaf_ref(fpath + ("bias",))
            if bnode is not None:
                bias = np.asarray(bnode["bias"], np.float32)
                bnode["bias"] = (bias + sign * alpha * np.asarray(lora_sd[f"{name}.bias"], np.float32)).astype(bias.dtype)

    return tree, skipped


def merge_lvdm_lora(
    params: dict,
    lora_sd: Mapping[str, Array],
    module_index: Mapping[str, tuple[tuple[str, ...], str]],
    scale: float = 1.0,
) -> tuple[dict, list[str]]:
    """cloneofsimo-format merge: ``W += (up @ down) * scale``
    (lvdm lora.py:620-672)."""
    import jax

    tree = jax.tree.map(lambda x: x, params)
    skipped: list[str] = []

    ups = {k[: -len(".lora_up.weight")]: v for k, v in lora_sd.items() if k.endswith(".lora_up.weight")}
    downs = {k[: -len(".lora_down.weight")]: v for k, v in lora_sd.items() if k.endswith(".lora_down.weight")}

    def leaf_parent(path):
        node = tree["params"]
        for seg in path[:-1]:
            if seg not in node:
                return None
            node = node[seg]
        return node if path[-1] in node else None

    for name, up in ups.items():
        if name not in downs or name not in module_index:
            skipped.append(name)
            continue
        fpath, kind = module_index[name]
        u = np.asarray(up, np.float32)
        d = np.asarray(downs[name], np.float32)
        while u.ndim > 2:
            u = u.squeeze(-1)
        while d.ndim > 2:
            d = d.squeeze(-1)
        delta = (u @ d) * scale
        parent = leaf_parent(fpath + ("kernel",))
        if parent is None:
            skipped.append(name)
            continue
        kernel = np.asarray(parent["kernel"], np.float32)
        parent["kernel"] = (kernel + _delta_to_flax(delta, kind, kernel.shape)).astype(kernel.dtype)
    return tree, skipped


def unet_module_index(cfg: ModelScopeUNetConfig):
    return torch_module_index(cfg)


def text_module_index(cfg: CLIPTextConfig):
    return clip_module_index(cfg)


# ---------------------------------------------------------------------------
# Discovery (lora_processor.py:18-34): scan a directory tree for .safetensors
# files tagged with the stable-lora metadata key.

METADATA_TAG = "stable_lora_text_to_video"


def discover_loras(lora_dir: str) -> list[dict]:
    """Recursive scan for stable-lora files. Returns one metadata dict per
    file, augmented with 'path' and 'lora_name' (matching the reference's
    ``get_lora_files``)."""
    import glob
    import os

    from safetensors import safe_open

    found = []
    for path in sorted(
        glob.glob(os.path.join(lora_dir, "**", "*.safetensors"), recursive=True)
    ):
        try:
            with safe_open(path, "numpy") as f:
                metadata = f.metadata()
        except Exception:
            continue
        if metadata is not None and METADATA_TAG in metadata:
            metadata = dict(metadata)
            metadata["path"] = path
            metadata["lora_name"] = os.path.splitext(os.path.basename(path))[0]
            found.append(metadata)
    return found


# ---------------------------------------------------------------------------
# LoRA training: low-rank adapters as a separate trainable pytree, merged
# into the frozen base functionally inside the jitted loss. The torch-side
# equivalent is lvdm lora.py's inject/extract machinery; here injection is
# a pure function, so "inject" and "extract" are trivial.


def init_lora(
    params: dict,
    module_index: Mapping[str, tuple[tuple[str, ...], str]],
    rank: int,
    key,
    *,
    include=None,
) -> dict:
    """Create a LoRA tree {torch_module_name: {"lora_A": (in, r),
    "lora_B": (r, out)}} over every *linear* kernel in the index.

    Init matches cloneofsimo (lvdm lora.py:30-70): down/A ~ N(0, 1/r),
    up/B = 0 — the merged delta starts at zero.
    """
    import jax
    import jax.numpy as jnp

    include = include or (lambda name, kind: kind == "linear")
    lora: dict = {}
    for name, (fpath, kind) in module_index.items():
        if not include(name, kind):
            continue
        node = params["params"]
        ok = True
        for seg in fpath:
            if seg not in node:
                ok = False
                break
            node = node[seg]
        if not ok or "kernel" not in node:
            continue
        kern = node["kernel"]
        if kern.ndim != 2:
            continue
        d_in, d_out = kern.shape
        key, sub = jax.random.split(key)
        lora[name] = {
            "lora_A": jax.random.normal(sub, (d_in, rank), jnp.float32) / rank,
            "lora_B": jnp.zeros((rank, d_out), jnp.float32),
        }
    return lora


def apply_lora(
    params: dict,
    lora: Mapping[str, dict],
    module_index: Mapping[str, tuple[tuple[str, ...], str]],
    alpha: float = 1.0,
):
    """Functionally merge a (trainable) LoRA tree into flax params:
    kernel += (A @ diag? @ B) * scale? * alpha. jit/grad-compatible —
    gradients flow to A/B. Optional per-module ``scale`` / ``diag`` entries
    mirror the reference wrapper's runtime scale and rank selector
    (lvdm lora.py:51-56; see t2v.pipeline.lora_zoo)."""
    import jax

    new = jax.tree.map(lambda x: x, params)
    for name, ab in lora.items():
        fpath, _ = module_index[name]
        node = new["params"]
        for seg in fpath[:-1]:
            node = node[seg]
        leaf = node[fpath[-1]]
        kern = leaf["kernel"]
        a = ab["lora_A"]
        if "diag" in ab:
            a = a * ab["diag"][None, :]
        delta = (a @ ab["lora_B"]) * (alpha * ab.get("scale", 1.0))
        node[fpath[-1]] = dict(leaf, kernel=kern + delta.astype(kern.dtype))
    return new


def lora_to_stable_sd(lora: Mapping[str, dict]) -> dict[str, np.ndarray]:
    """Flax LoRA tree → stable-lora torch-layout state dict:
    A (in,r) → lora_A (r,in); B (r,out) → lora_B (out,r), so the file is
    loadable by both the reference and ``merge_stable_lora``."""
    sd = {}
    for name, ab in lora.items():
        sd[f"{name}.lora_A"] = np.asarray(ab["lora_A"], np.float32).T.copy()
        sd[f"{name}.lora_B"] = np.asarray(ab["lora_B"], np.float32).T.copy()
    return sd


def save_stable_lora(
    path: str, lora: Mapping[str, dict], metadata: Mapping[str, str] | None = None
) -> str:
    """Write a reference-compatible stable-lora .safetensors
    (metadata tag per lora_processor.py:26)."""
    from safetensors.numpy import save_file

    meta = {METADATA_TAG: "true"}
    if metadata:
        meta.update({k: str(v) for k, v in metadata.items()})
    save_file(lora_to_stable_sd(lora), path, metadata=meta)
    return path


def lora_to_lvdm_sd(lora: Mapping[str, dict]) -> dict[str, np.ndarray]:
    """Flax LoRA tree → cloneofsimo/LVDM layout (lvdm lora.py:384-452
    save_lora_weight / save_safeloras key scheme): per torch module name,
    ``<name>.lora_down.weight`` (r, in) and ``<name>.lora_up.weight``
    (out, r) — consumable by both ``merge_lvdm_lora`` and the reference's
    ``net_load_lora`` (:620-672)."""
    sd = {}
    for name, ab in lora.items():
        sd[f"{name}.lora_down.weight"] = np.asarray(ab["lora_A"], np.float32).T.copy()
        sd[f"{name}.lora_up.weight"] = np.asarray(ab["lora_B"], np.float32).T.copy()
    return sd


def save_lvdm_lora(
    path: str, lora: Mapping[str, dict], metadata: Mapping[str, str] | None = None
) -> str:
    """Write an extracted LoRA in the LVDM (cloneofsimo) format as
    .safetensors — the extract/save half of the reference's lvdm lora zoo
    (lora.py:384-452) that round 1 left out."""
    from safetensors.numpy import save_file

    meta = {k: str(v) for k, v in (metadata or {}).items()}
    save_file(lora_to_lvdm_sd(lora), path, metadata=meta or None)
    return path
