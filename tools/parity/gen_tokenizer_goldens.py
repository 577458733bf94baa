"""Mint the tokenizer golden battery (tests/data/tokenizer_*).

Builds a deterministic merge table with the published file's structure
(#version line, "a b" pairs, trimmed to the 49152-256-2 merge budget) and
deep, rank-interleaved merge chains, then records the independent oracle's
(tools/parity/tokenizer_oracle.py) token ids for a battery of tricky
prompts: mojibake, html entities, contractions, unicode, punctuation runs,
long merges. tests/test_tokenizer_goldens.py pins the production
CLIPTokenizer against both artifacts.

Usage: python tools/parity/gen_tokenizer_goldens.py
"""

from __future__ import annotations

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from tokenizer_oracle import OracleTokenizer, oracle_byte_table

OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "..", "tests", "data"
)

WORDS = [
    "the", "a", "an", "of", "in", "on", "and", "photo", "photograph",
    "masterpiece", "watermark", "text", "blurry", "quality", "best",
    "cat", "dog", "horse", "astronaut", "riding", "running", "forest",
    "cinematic", "lighting", "detailed", "highly", "video", "frame",
    "don", "it", "we", "isn", "world", "hello", "mars", "cafe",
]
SUFFIXES = ["ing", "ed", "ly"]
PUNCT = ["!!!", "...", "((", "))", ":1", ".3"]


def build_merges() -> list[tuple[str, str]]:
    table = oracle_byte_table()
    chains: list[list[tuple[str, str]]] = []
    for w in WORDS:
        mapped = "".join(table[b] for b in w.encode("utf-8"))
        pieces = list(mapped[:-1]) + [mapped[-1] + "</w>"]
        chain = []
        while len(pieces) > 1:
            chain.append((pieces[0], pieces[1]))
            pieces = [pieces[0] + pieces[1]] + pieces[2:]
        chains.append(chain)
    # word-INTERNAL stems for suffixed forms ("runn" + "ing</w>")
    for s in SUFFIXES:
        mapped = "".join(table[b] for b in s.encode("utf-8"))
        pieces = list(mapped[:-1]) + [mapped[-1] + "</w>"]
        chain = []
        while len(pieces) > 1:
            chain.append((pieces[0], pieces[1]))
            pieces = [pieces[0] + pieces[1]] + pieces[2:]
        chains.append(chain)
    # contraction tails the split regex produces ('s 't 're 've 'm 'll 'd)
    for tail in ["s", "t", "re", "ve", "m", "ll", "d"]:
        chains.append([("'", tail + "</w>")] if len(tail) == 1 else
                      [(tail[0], tail[1] + "</w>"), ("'", tail + "</w>")])
    # the utf-8 byte pair of é and the mojibake-relevant merges
    for ch in ["é", "ï", "ü"]:
        bs = ch.encode("utf-8")
        chains.append([(table[bs[0]], table[bs[1]] + "</w>")])
    for p in PUNCT:
        mapped = "".join(table[b] for b in p.encode("utf-8"))
        if len(mapped) >= 2:
            chains.append([(mapped[0], mapped[1])])

    # interleave chains round-robin so merge RANK ordering matters across
    # words (lowest-rank-first must pick between competing pairs)
    merges: list[tuple[str, str]] = []
    seen = set()
    idx = 0
    while any(chains):
        chain = chains[idx % len(chains)]
        if chain:
            m = chain.pop(0)
            if m not in seen:
                seen.add(m)
                merges.append(m)
        idx += 1
        if idx > 10000:
            break
        chains = [c for c in chains if c] or []
        if not chains:
            break
    return merges


PROMPTS = [
    "a photo of a cat",
    "A PHOTO OF A CAT",
    "  a \t photo\n of   a cat  ",
    "masterpiece, best quality, highly detailed",
    "an astronaut riding a horse on mars, cinematic lighting",
    "don't stop, it's we're isn't",
    "hello, world!!!",
    "((masterpiece:1.3))",
    "café",
    "cafÃ©",  # UTF-8 read as cp1252 — must repair to café
    "cafÃƒÂ©",  # doubly mis-decoded
    "naïve über",
    "fish &amp; chips",
    "fish &amp;amp; chips",
    "1234 frames",
    "日本語のプロンプト",
    "🐈 in a forest",
    "the the the thethe",
    "running jumped quickly",
    "photograph of the photographer",  # shared stem, different tails
    "<|endoftext|> literal",
    "'s 'll 'd",
    "a--b  c__d",
    "",
    "   ",
    "ÐŸÑ€Ð¸Ð²ÐµÑ‚",  # mojibake cyrillic "Привет"
]


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    merges = build_merges()
    merges_path = os.path.join(OUT_DIR, "tokenizer_merges.txt.gz")
    with gzip.open(merges_path, "wt", encoding="utf-8") as f:
        f.write("#version: 0.2 t2v-representative\n")
        f.write("\n".join(" ".join(m) for m in merges) + "\n")

    tok = OracleTokenizer(merges)
    goldens = {p: tok.encode(p) for p in PROMPTS}
    goldens_path = os.path.join(OUT_DIR, "tokenizer_goldens.json")
    with open(goldens_path, "w", encoding="utf-8") as f:
        json.dump(
            {"merges_file": os.path.basename(merges_path),
             "n_merges": len(merges), "goldens": goldens},
            f, indent=1, ensure_ascii=False,
        )
        f.write("\n")
    print(f"wrote {merges_path} ({len(merges)} merges) and {goldens_path} "
          f"({len(goldens)} prompts)")


if __name__ == "__main__":
    main()
