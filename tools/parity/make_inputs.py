"""Produce the shared inputs both parity sides consume.

Tokenisation/chunking runs ONCE (our implementation — its semantics are
pinned to the reference by the golden tests in tests/test_text.py) and the
initial latent noise is drawn exactly as ``ModelScopePipeline.infer`` will
draw it for the same seed, so the torch golden consumes byte-identical
inputs. Saved to ``inputs.npz``:

  tokens_c / tokens_uc   (n_chunks, 77) int32  per-chunk padded token ids
  mult_c / mult_uc       (n_chunks, 77) float32 A1111 emphasis multipliers
  noise                  (1, F, h, w, 4) float32 video-NHWC x_T

Run on CPU (no model weights needed).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from t2v.core import rng as rng_lib
from t2v.text.chunking import pad_after_eos, tokenize_line
from t2v.text.tokenizer import CLIPTokenizer

PROMPT = "a (photo:1.3) of an astronaut riding a horse on mars, cinematic"
N_PROMPT = "text, watermark, copyright, blurry"
SEED = 1234


def chunks_for(line: str, tok: CLIPTokenizer):
    chunks, _ = tokenize_line(line, tok)
    tokens = pad_after_eos(
        np.stack([np.asarray(c.tokens, np.int32) for c in chunks]), tok.eos_id
    )
    mults = np.stack([np.asarray(c.multipliers, np.float32) for c in chunks])
    return tokens, mults


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    # pixel->latent factor: 8 for the real SD VAE (ch_mult 1,2,4,4); the
    # --small harness VAE (ch_mult 1,2) downsamples by 2
    ap.add_argument("--latent-scale", type=int, default=8)
    args = ap.parse_args()

    tok = CLIPTokenizer.find_and_load(args.model_dir)
    tokens_c, mult_c = chunks_for(PROMPT, tok)
    tokens_uc, mult_uc = chunks_for(N_PROMPT, tok)

    lat = args.size // args.latent_scale
    shape = (1, args.frames, lat, lat, 4)
    key = rng_lib.key_for_seed(SEED)
    noise = np.asarray(rng_lib.latent_noise(key, shape))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(
        args.out,
        tokens_c=tokens_c, mult_c=mult_c,
        tokens_uc=tokens_uc, mult_uc=mult_uc,
        noise=noise,
        prompt=np.array(PROMPT), n_prompt=np.array(N_PROMPT),
        seed=np.array(SEED),
    )
    print(
        f"inputs: cond {tokens_c.shape} uncond {tokens_uc.shape} "
        f"noise {noise.shape} -> {args.out}"
    )


if __name__ == "__main__":
    main()
