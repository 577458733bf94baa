"""Text conditioning pipeline: prompt → per-step cond tables.

Ties together the tokenizer, emphasis parser, 75-token chunker, the Flax
CLIP tower, A1111-style multiplier renormalisation and multi-chunk hstack —
the semantics of the reference's ``FrozenOpenCLIPEmbedder.forward`` /
``process_tokens`` (clip_hardcode.py:361-422) — plus prompt-editing
schedules resolved ahead of time into stacked cond tables for the
sampler's ``lax.scan`` (replacing per-step ``reconstruct_cond_batch``,
general_utils.py:27-30).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from t2v.core.config import CLIPTextConfig
from t2v.text import chunking
from t2v.text.clip import CLIPTextTransformer
from t2v.text.schedule import parse_prompt_schedule
from t2v.text.tokenizer import CLIPTokenizer


class EmbeddingDB:
    """Textual-inversion embedding lookup (clip_hardcode.py:219-234 role).

    Embeddings register by name; during chunking, a token run matching a
    name's tokenization is replaced by the embedding matrix rows.
    """

    def __init__(self, tokenizer: CLIPTokenizer):
        self.tokenizer = tokenizer
        self._by_first_token: dict[int, list[tuple[list[int], np.ndarray]]] = {}
        self.version = 0  # bumped on registration; invalidates cond caches

    def register(self, name: str, vectors: np.ndarray):
        ids = self.tokenizer.encode(name)
        self._by_first_token.setdefault(ids[0], []).append((ids, vectors))
        self.version += 1

    def find(self, tokens: list[int], position: int):
        cands = self._by_first_token.get(tokens[position], [])
        best = None
        for ids, vec in cands:
            if tokens[position : position + len(ids)] == ids:
                if best is None or len(ids) > len(best[0]):
                    best = (ids, vec)
        if best is None:
            return None, 0
        return best[1], len(best[0])

    def __bool__(self):
        return bool(self._by_first_token)

    def register_file(self, path: str, name: str | None = None) -> str:
        """Load an A1111-format textual-inversion embedding file and
        register it under its filename (or ``name``). Supports the torch
        ``{'string_to_param': {'*': T}}`` layout, bare-tensor ``.pt`` dumps
        keyed 'emb_params', and ``.safetensors`` (textual_inversion
        semantics from clip_hardcode.py:219-234's host db)."""
        import os

        if path.endswith(".safetensors"):
            from t2v.io.safetensors_io import load_safetensors

            sd = load_safetensors(path)
            if isinstance(sd, tuple):
                sd = sd[0]
        else:
            from t2v.io.pickle_reader import load_torch_checkpoint

            sd = load_torch_checkpoint(path)
        vec = None
        if "string_to_param" in sd:
            p = sd["string_to_param"]
            vec = p.get("*") if hasattr(p, "get") else None
            if vec is None and hasattr(p, "values"):
                vec = next(iter(p.values()))
        elif "emb_params" in sd:
            vec = sd["emb_params"]
        else:
            # single-tensor dict
            tensors = [v for v in sd.values() if hasattr(v, "ndim")]
            if len(tensors) == 1:
                vec = tensors[0]
        if vec is None:
            raise ValueError(f"unrecognised embedding file layout: {path}")
        vec = np.asarray(vec, np.float32)
        if vec.ndim == 1:
            vec = vec[None]
        name = name or os.path.splitext(os.path.basename(path))[0]
        self.register(name, vec)
        return name

    def load_dir(self, emb_dir: str) -> list[str]:
        """Register every embedding file in a directory (A1111
        embeddings-dir behaviour). Returns the registered names."""
        import os

        names = []
        if not os.path.isdir(emb_dir):
            return names
        for fn in sorted(os.listdir(emb_dir)):
            if fn.endswith((".pt", ".bin", ".safetensors")):
                try:
                    names.append(self.register_file(os.path.join(emb_dir, fn)))
                except Exception as e:  # tolerate foreign files, like A1111
                    print(f"t2v: skipping embedding {fn}: {e}")
        return names


@dataclass
class Conditioning:
    """cond/uncond tables ready for diffusion.sampling.sample_loop.

    cond / uncond: (L, D) arrays — or (S, L, D) when scheduled (S unique
    per-step variants expanded to per-step rows).
    """

    cond: jax.Array
    uncond: jax.Array


def _weight_renorm(z: jax.Array, mult: jax.Array) -> jax.Array:
    """A1111 emphasis renorm (clip_hardcode.py:415-420): scale token rows
    by their multipliers, then restore the pre-scale batch mean."""
    m = mult[..., None].astype(z.dtype)
    original_mean = z.mean()
    z = z * m
    return z * (original_mean / z.mean())


class TextEncoder:
    def __init__(
        self,
        model: CLIPTextTransformer,
        params,
        tokenizer: CLIPTokenizer,
        *,
        comma_backtrack: int = chunking.DEFAULT_COMMA_BACKTRACK,
        enable_emphasis: bool = True,
        id_pad: int = 0,
    ):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.comma_backtrack = comma_backtrack
        self.enable_emphasis = enable_emphasis
        self.id_pad = id_pad
        self.embedding_db = EmbeddingDB(tokenizer)

        # the tower AND the A1111 weight renorm in ONE jitted program: the
        # renorm's means/multiplies as eager ops each cost a full device
        # dispatch round-trip (seconds-scale through remote transports),
        # which dominated request latency
        def _fwd(params, tokens, mult):
            z = model.apply(params, tokens)
            return _weight_renorm(z, mult)

        def _fwd_emb(params, tokens, emb, mult):
            z = model.apply(params, tokens, input_embeddings=emb)
            return _weight_renorm(z, mult)

        self._encode_jit = jax.jit(_fwd)
        self._encode_emb_jit = jax.jit(_fwd_emb)
        self._cache: dict[tuple, np.ndarray] = {}

    # ------------------------------------------------------------------

    def invalidate_cache(self) -> None:
        """Drop memoised line encodings — required after anything mutates
        ``self.params`` in place (e.g. a LoRA merge into the CLIP tower)."""
        self._cache.clear()

    def _encode_chunk_batch(self, tokens: np.ndarray, multipliers: np.ndarray, fixes) -> jax.Array:
        """One 77-token chunk through the tower + weight renorm
        (process_tokens, clip_hardcode.py:397-422) — one device program."""
        if self.id_pad != self.tokenizer.eos_id:
            tokens = chunking.pad_after_eos(tokens, self.tokenizer.eos_id, self.id_pad)
        mult = jnp.asarray(multipliers, jnp.float32)
        if fixes and any(fixes):
            return self._apply_with_fixes(tokens, fixes, mult)
        return self._encode_jit(self.params, jnp.asarray(tokens), mult)

    def _apply_with_fixes(self, tokens: np.ndarray, fixes, mult) -> jax.Array:
        """Textual-inversion forward: splice embedding rows into the token
        embeddings before the transformer (the A1111 hijack's role). The +1
        offset accounts for the BOS prepended after fixes were recorded."""
        emb_table = np.asarray(self.params["params"]["token_embedding"]["embedding"])
        x = emb_table[tokens].copy()
        for row, row_fixes in enumerate(fixes):
            for pos, vec in row_fixes:
                n = min(vec.shape[0], x.shape[1] - (pos + 1))
                x[row, pos + 1 : pos + 1 + n] = vec[:n]
        return self._encode_emb_jit(
            self.params, jnp.asarray(tokens), jnp.asarray(x), mult
        )

    def encode_line(self, line: str) -> np.ndarray:
        """(77*chunks, D) embedding for one prompt line, cached (keyed on
        the embedding-db version so later TI registrations invalidate)."""
        key = (
            line, self.comma_backtrack, self.enable_emphasis,
            self.embedding_db.version,
        )
        if key in self._cache:
            return self._cache[key]
        if len(self._cache) >= 256:  # bound the long-running server's memory
            self._cache.pop(next(iter(self._cache)))
        db = self.embedding_db.find if self.embedding_db else None
        chunks, _ = chunking.tokenize_line(
            line,
            self.tokenizer,
            enable_emphasis=self.enable_emphasis,
            comma_backtrack=self.comma_backtrack,
            embedding_db=db,
        )
        zs = []
        for ch in chunks:
            z = self._encode_chunk_batch(
                np.asarray([ch.tokens], np.int32),
                np.asarray([ch.multipliers], np.float32),
                [ch.fixes],
            )
            zs.append(np.asarray(z[0]))
        out = np.concatenate(zs, axis=0)
        self._cache[key] = out
        return out

    # ------------------------------------------------------------------

    def encode_request(self, prompt: str, n_prompt: str, steps: int) -> Conditioning:
        """Full request conditioning with prompt-editing support.

        Static prompts produce (1, L, D); scheduled ones (S, 1, L, D) with
        one row per sampling step.
        """
        sched_c = parse_prompt_schedule(prompt, steps)
        sched_uc = parse_prompt_schedule(n_prompt, steps)

        zs_c = [self.encode_line(p) for p in sched_c.prompts]
        zs_uc = [self.encode_line(p) for p in sched_uc.prompts]

        # chunk-count alignment: pad the shorter side with empty-chunk
        # encodings so fused CFG can concatenate (cf. reference uc/c length
        # alignment, t2v_model.py:1528-1533)
        max_len = max(z.shape[0] for z in zs_c + zs_uc)
        empty = None

        def pad(z: np.ndarray) -> np.ndarray:
            nonlocal empty
            if z.shape[0] == max_len:
                return z
            if empty is None:
                empty = self.encode_line("")
            reps = (max_len - z.shape[0]) // empty.shape[0]
            return np.concatenate([z] + [empty] * reps, axis=0)

        zs_c = [pad(z) for z in zs_c]
        zs_uc = [pad(z) for z in zs_uc]

        if sched_c.is_static and sched_uc.is_static:
            return Conditioning(
                cond=jnp.asarray(zs_c[0])[None],
                uncond=jnp.asarray(zs_uc[0])[None],
            )
        cond = jnp.asarray(np.stack([zs_c[i] for i in sched_c.index]))[:, None]
        uncond = jnp.asarray(np.stack([zs_uc[i] for i in sched_uc.index]))[:, None]
        return Conditioning(cond=cond, uncond=uncond)
