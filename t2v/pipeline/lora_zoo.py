"""The LVDM LoRA utility zoo as pure pytree algebra.

The reference ships a large LoRA toolkit built on torch module surgery
(/root/reference/scripts/videocrafter/lvdm/models/modules/lora.py:776-1251):
``inject`` swaps ``nn.Linear`` children for ``LoraInjectedLinear`` wrappers,
``monkeypatch_*`` mutates the wrappers' factor weights in place,
``tune_lora_scale`` / ``set_lora_diag`` poke runtime attributes, and the
``safeloras`` container serialises several models' factors plus
textual-inversion embeds into one safetensors file.

Here params are immutable pytrees and a LoRA is its own tree
``{torch_module_name: {"lora_A": (in, r), "lora_B": (r, out)}}``
(see t2v.pipeline.lora), so every mutation above becomes a pure function
over that tree — same capabilities, no module graph to patch:

  reference (lora.py)                     | here
  ----------------------------------------|---------------------------------
  inject_trainable_lora (:256)            | lora.init_lora
  extract_lora_ups_down / save (:384-437) | lora_to_flat_weights
  monkeypatch_or_replace_lora (:813)      | flat_weights_to_lora
  monkeypatch_add_lora (:991)             | add_lora (alpha/beta compose)
  monkeypatch_remove_lora (:953)          | drop the tree / alpha=0
  tune_lora_scale (:1018)                 | tune_lora_scale (per-module key)
  set_lora_diag (:1024)                   | set_lora_diag (per-rank selector)
  collapse_lora (:776)                    | collapse_lora → base params
  inspect_lora (:1167)                    | inspect_lora
  save_safeloras_with_embeds (:452)       | save_safeloras_with_embeds
  parse_safeloras[_embeds] (:539-617)     | parse_safeloras[_embeds]
  patch_pipe (:1099)                      | patch_safeloras
  save_all (:1186)                        | save_all

The wrapper's forward is ``W x + up(selector(down(x))) * scale``
(lora.py:51-56); the merged delta is therefore
``B^T diag(d) A^T * scale`` in torch layout — ``apply_lora`` /
``collapse_lora`` honour the optional ``"scale"`` and ``"diag"`` entries.
``realize_as_lora`` (lora.py:58-59) folds scale into the up factor on
extraction but NOT the selector; the container writers here mirror that.

File-format notes (byte-compatible with the reference container):
  * weights keyed ``{model}:{i}:up`` / ``{model}:{i}:down`` in fp16, where
    ``i`` enumerates target modules in ``named_modules`` order — which for
    checkpoints converted by t2v.io.convert equals the module-index
    insertion order (the converter walks the torch topology);
  * metadata ``{model}`` → JSON list of target module class names,
    ``{model}:{i}:rank`` → rank, and textual-inversion tokens flagged
    ``EMBED_FLAG`` exactly as lora.py:452-485 writes them.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterable, Mapping, Sequence

import numpy as np

from t2v.pipeline.lora import apply_lora

Array = np.ndarray

EMBED_FLAG = "<embed>"

# Reference target sets (lora.py:158-166) — kept for container metadata
# round-trips; selection here happens by module kind, not class name.
UNET_DEFAULT_TARGET_REPLACE = {
    "MemoryEfficientCrossAttention", "CrossAttention", "Attention", "GEGLU",
}
TEXT_ENCODER_DEFAULT_TARGET_REPLACE = {"CLIPAttention"}


def lora_module_order(
    module_index: Mapping[str, tuple[tuple[str, ...], str]],
    include: Callable[[str, str], bool] | None = None,
) -> list[str]:
    """Enumeration order of LoRA-targeted modules.

    The reference's ``_find_modules`` yields targets in ``named_modules``
    definition order (lora.py:187-233); the converter's module index is
    built by walking the same torch topology, so filtered insertion order
    reproduces it. Default filter: linear kernels (the wrapper family the
    LVDM zoo actually trains)."""
    include = include or (lambda name, kind: kind == "linear")
    return [n for n, (_p, kind) in module_index.items() if include(n, kind)]


def lora_to_flat_weights(
    lora: Mapping[str, dict], order: Sequence[str] | None = None
) -> list[Array]:
    """Flax LoRA tree → the reference's flat ``[up0, down0, up1, down1, …]``
    list (extract_lora_ups_down/save_lora_weight, lora.py:384-437; fp16 like
    the reference writer). ``realize_as_lora`` semantics: a per-module
    ``scale`` folds into the up factor."""
    order = list(order) if order is not None else list(lora)
    flat: list[Array] = []
    for name in order:
        ab = lora[name]
        scale = float(ab.get("scale", 1.0))
        up = np.asarray(ab["lora_B"], np.float32).T * scale  # (out, r)
        down = np.asarray(ab["lora_A"], np.float32).T        # (r, in)
        # ascontiguousarray: .T.astype() keeps F-order (numpy order='K') and
        # safetensors 0.8 serialises the raw buffer assuming C-order.
        flat.append(np.ascontiguousarray(up.astype(np.float16)))
        flat.append(np.ascontiguousarray(down.astype(np.float16)))
    return flat


def flat_weights_to_lora(
    weights: Iterable[Array], order: Sequence[str]
) -> dict[str, dict]:
    """The reference's ``monkeypatch_or_replace_lora`` (lora.py:813-854):
    consume ``[up, down]`` pairs in module order into a fresh LoRA tree.
    Trailing singleton conv dims are squeezed like merge_lvdm_lora does."""
    it = iter(weights)
    lora: dict[str, dict] = {}
    for name in order:
        up = np.asarray(next(it), np.float32)
        down = np.asarray(next(it), np.float32)
        while up.ndim > 2:
            up = up.squeeze(-1)
        while down.ndim > 2:
            down = down.squeeze(-1)
        lora[name] = {"lora_A": down.T.copy(), "lora_B": up.T.copy()}
    return lora


def add_lora(
    lora: Mapping[str, dict],
    new: Mapping[str, dict],
    alpha: float = 1.0,
    beta: float = 1.0,
) -> dict[str, dict]:
    """``monkeypatch_add_lora`` (lora.py:991-1015): factor-wise blend
    ``up = new_up*alpha + old_up*beta`` (and likewise for down). Modules
    present in only one tree keep/gain their factors scaled accordingly."""
    out: dict[str, dict] = {}
    for name in set(lora) | set(new):
        a, b = lora.get(name), new.get(name)
        if a is None:
            out[name] = {
                "lora_A": np.asarray(b["lora_A"], np.float32) * alpha,
                "lora_B": np.asarray(b["lora_B"], np.float32) * alpha,
            }
        elif b is None:
            out[name] = {
                "lora_A": np.asarray(a["lora_A"], np.float32) * beta,
                "lora_B": np.asarray(a["lora_B"], np.float32) * beta,
            }
        else:
            out[name] = {
                "lora_A": np.asarray(b["lora_A"], np.float32) * alpha
                + np.asarray(a["lora_A"], np.float32) * beta,
                "lora_B": np.asarray(b["lora_B"], np.float32) * alpha
                + np.asarray(a["lora_B"], np.float32) * beta,
            }
        for extra in ("scale", "diag"):
            src = a if (a is not None and extra in a) else b
            if src is not None and extra in src:
                out[name][extra] = src[extra]
    return out


def tune_lora_scale(lora: Mapping[str, dict], alpha: float = 1.0) -> dict:
    """``tune_lora_scale`` (lora.py:1018-1021): set every module's runtime
    scale. Returns a new tree; apply_lora/collapse_lora honour it."""
    return {n: dict(ab, scale=float(alpha)) for n, ab in lora.items()}


def set_lora_diag(lora: Mapping[str, dict], diag: Array) -> dict:
    """``set_lora_diag`` (lora.py:1024-1027): install a per-rank selector
    ``diag(d)`` between down and up (forward becomes
    ``up @ diag(d) @ down``). ``diag`` must have shape (r,)."""
    diag = np.asarray(diag, np.float32)
    out = {}
    for n, ab in lora.items():
        r = np.asarray(ab["lora_A"]).shape[-1]
        if diag.shape != (r,):
            raise ValueError(f"diag shape {diag.shape} != rank ({r},) for {n}")
        out[n] = dict(ab, diag=diag)
    return out


def effective_delta(ab: Mapping[str, Any]) -> Array:
    """The module's merged torch-layout delta ``up @ diag @ down * scale``
    — in flax orientation: (in, out)."""
    a = np.asarray(ab["lora_A"], np.float32)
    b = np.asarray(ab["lora_B"], np.float32)
    if "diag" in ab:
        a = a * np.asarray(ab["diag"], np.float32)[None, :]
    return (a @ b) * float(ab.get("scale", 1.0))


def collapse_lora(
    params: dict,
    lora: Mapping[str, dict],
    module_index: Mapping[str, tuple[tuple[str, ...], str]],
    alpha: float = 1.0,
):
    """``collapse_lora`` (lora.py:776-810): fold ``up @ down * alpha`` into
    the base weights, producing plain params with no LoRA left. Like the
    reference, the raw factors are used — runtime ``scale``/``diag`` are
    ignored (collapse reads ``.weight.data`` directly, not the forward)."""
    raw = {n: {"lora_A": ab["lora_A"], "lora_B": ab["lora_B"]} for n, ab in lora.items()}
    return apply_lora(params, raw, module_index, alpha=alpha)


def inspect_lora(lora: Mapping[str, dict]) -> dict[str, float]:
    """``inspect_lora`` (lora.py:1167-1183): mean |up @ down| per module —
    the training-drift diagnostic the reference prints each epoch."""
    out = {}
    for name, ab in lora.items():
        delta = np.asarray(ab["lora_B"], np.float32).T @ np.asarray(ab["lora_A"], np.float32).T
        out[name] = float(np.abs(delta).mean())
    return out


# ---------------------------------------------------------------------------
# safeloras container (lora.py:452-617)


def save_safeloras_with_embeds(
    loramap: Mapping[str, tuple[Mapping[str, dict], Iterable[str]]],
    embeds: Mapping[str, Array] | None = None,
    outpath: str = "./lora.safetensors",
    orders: Mapping[str, Sequence[str]] | None = None,
) -> str:
    """Write the reference's multi-model container
    (``save_safeloras_with_embeds``, lora.py:452-485).

    ``loramap`` maps model name → (lora_tree, target_replace_module names);
    ``orders`` optionally pins each model's module enumeration order
    (defaults to tree insertion order — see lora_module_order)."""
    from safetensors.numpy import save_file

    weights: dict[str, np.ndarray] = {}
    metadata: dict[str, str] = {}
    for name, (lora, targets) in loramap.items():
        metadata[name] = json.dumps(sorted(targets))
        order = list(orders[name]) if orders and name in orders else list(lora)
        flat = lora_to_flat_weights(lora, order)
        for i in range(len(order)):
            up, down = flat[2 * i], flat[2 * i + 1]
            metadata[f"{name}:{i}:rank"] = str(down.shape[0])
            weights[f"{name}:{i}:up"] = up
            weights[f"{name}:{i}:down"] = down
    for token, tensor in (embeds or {}).items():
        metadata[token] = EMBED_FLAG
        weights[token] = np.ascontiguousarray(np.asarray(tensor, np.float32))
    save_file(weights, outpath, metadata=metadata)
    return outpath


def save_safeloras(loramap, outpath="./lora.safetensors", orders=None) -> str:
    """``save_safeloras`` (lora.py:487-491) — container without embeds."""
    return save_safeloras_with_embeds(loramap, None, outpath, orders)


def _open_safeloras(path: str):
    from safetensors import safe_open

    return safe_open(path, "numpy")


def parse_safeloras(
    path: str,
) -> dict[str, tuple[list[Array], list[int], list[str]]]:
    """``parse_safeloras`` (lora.py:539-597): container → per-model
    ``(flat [up, down, …] weights, ranks, target class names)``."""
    loras: dict[str, tuple[list[Array], list[int], list[str]]] = {}
    with _open_safeloras(path) as f:
        metadata = f.metadata() or {}
        by_model: dict[str, list[str]] = {}
        for key in f.keys():
            name = key.split(":")[0]
            if metadata.get(name) in (None, EMBED_FLAG):
                if metadata.get(name) is None and ":" in key:
                    raise ValueError(
                        f"Tensor {name} has no metadata - is this a Lora safetensor?"
                    )
                continue
            by_model.setdefault(name, []).append(key)
        for name, keys in by_model.items():
            targets = json.loads(metadata[name])
            n = len(keys) // 2
            ranks = [4] * n
            weights: list[Array | None] = [None] * len(keys)
            for key in keys:
                _, idx, direction = key.split(":")
                idx = int(idx)
                ranks[idx] = int(metadata[f"{name}:{idx}:rank"])
                weights[idx * 2 + (1 if direction == "down" else 0)] = f.get_tensor(key)
            loras[name] = (weights, ranks, targets)  # type: ignore[assignment]
    return loras


def parse_safeloras_embeds(path: str) -> dict[str, Array]:
    """``parse_safeloras_embeds`` (lora.py:600-617): container → TI embeds."""
    embeds = {}
    with _open_safeloras(path) as f:
        metadata = f.metadata() or {}
        for key in f.keys():
            if metadata.get(key) == EMBED_FLAG:
                embeds[key] = f.get_tensor(key)
    return embeds


def _resolves_2d(params: dict, fpath: tuple[str, ...]) -> bool:
    node = params["params"]
    for seg in fpath:
        if seg not in node:
            return False
        node = node[seg]
    return "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2


def patch_safeloras(
    path: str,
    params_map: Mapping[str, dict],
    module_indices: Mapping[str, Mapping[str, tuple[tuple[str, ...], str]]],
    embedding_db=None,
    alpha: float = 1.0,
) -> dict[str, dict]:
    """``patch_pipe`` for the safetensors branch (lora.py:1153-1165):
    load every model's factors from the container, merge them into the
    matching base params, and register any textual-inversion embeds in the
    encoder's EmbeddingDatabase. Returns ``{model name: new params}``;
    models in the container without a params entry are skipped (the
    reference errors — here a t2v pipeline may legitimately drive only the
    UNet)."""
    parsed = parse_safeloras(path)
    out: dict[str, dict] = {}
    for name, (weights, _ranks, _targets) in parsed.items():
        if name not in params_map:
            continue
        # Align enumeration with the modules a functional LoRA can target:
        # linear kind AND a resolvable 2D kernel (init_lora's predicate) —
        # the reference aligns by _find_modules order on the same criteria.
        order = [
            n
            for n in lora_module_order(module_indices[name])
            if _resolves_2d(params_map[name], module_indices[name][n][0])
        ][: len(weights) // 2]
        lora = flat_weights_to_lora(weights, order)
        out[name] = apply_lora(params_map[name], lora, module_indices[name], alpha=alpha)
    if embedding_db is not None:
        for token, vec in parse_safeloras_embeds(path).items():
            vec = np.asarray(vec, np.float32)
            embedding_db.register(token, vec[None] if vec.ndim == 1 else vec)
    return out


def save_all(
    unet_lora: Mapping[str, dict],
    text_lora: Mapping[str, dict] | None,
    save_path: str,
    embeds: Mapping[str, Array] | None = None,
    unet_targets: Iterable[str] = UNET_DEFAULT_TARGET_REPLACE,
    text_targets: Iterable[str] = TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
) -> str:
    """``save_all`` safe-form (lora.py:1186-1260): one container holding the
    UNet LoRA, the text-encoder LoRA, and learned embeddings."""
    if not save_path.endswith(".safetensors"):
        raise ValueError(f"Save path : {save_path} should end with .safetensors")
    loramap: dict[str, tuple[Mapping[str, dict], Iterable[str]]] = {
        "unet": (unet_lora, unet_targets)
    }
    if text_lora is not None:
        loramap["text_encoder"] = (text_lora, text_targets)
    return save_safeloras_with_embeds(loramap, embeds, save_path)
