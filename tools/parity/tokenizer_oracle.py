"""Independent oracle for CLIP BPE tokenization.

A second, structurally independent implementation of the tokenizer
open_clip's ``SimpleTokenizer`` defines (the reference reaches it via
``open_clip.tokenize`` inside clip_hardcode.py:59-145). Used to mint the
golden id battery in tests/test_tokenizer_goldens.py — the production
``t2v.text.tokenizer.CLIPTokenizer`` must agree with this oracle on every
prompt over the same merge table.

Neither open_clip nor the published ``bpe_simple_vocab_16e6`` merge data
is available in this offline image, so the goldens are recorded over a
committed merge table with the real file's structure (#version header,
"a b"-pair lines, 49408-slot id layout with BOS 49406 / EOS 49407) and
deep multi-step merges. The ALGORITHM is what is pinned: cleaning
(ftfy-style mojibake repair, double html.unescape, whitespace collapse,
lowercase), the CLIP split regex, byte→unicode mapping, and the
lowest-rank-first merge loop with </w> end-of-word markers.

Deliberately different implementation choices from the production
tokenizer (recursion-free list rebuild vs index-scan merge, dict-based
pair ranking, no caching) so a shared bug is unlikely.
"""

from __future__ import annotations

import gzip
import html
import sys


def oracle_byte_table() -> dict[int, str]:
    # identical semantics to openai CLIP's bytes_to_unicode, derived
    # independently: printable latin-1 bytes map to themselves, the rest
    # to the private range starting at 256, in byte order
    printable = set(range(33, 127)) | set(range(161, 173)) | set(range(174, 256))
    table = {}
    next_extra = 256
    for b in range(256):
        if b in printable:
            table[b] = chr(b)
        else:
            table[b] = chr(next_extra)
            next_extra += 1
    return table


def oracle_token_order() -> list[str]:
    """Byte tokens in VOCAB-ID order: openai CLIP assigns ids in dict
    insertion order — printable bytes first, then the remapped rest —
    not in byte-value order."""
    printable = (
        list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    )
    rest = [b for b in range(256) if b not in set(printable)]
    table = oracle_byte_table()
    return [table[b] for b in printable + rest]


def oracle_fix_text(s: str) -> str:
    """ftfy.fix_text's core repair, same gating as the production side."""
    for _ in range(3):
        if all(ord(c) < 128 for c in s):
            return s
        fixed = None
        for enc in ("cp1252", "latin-1"):
            try:
                fixed = s.encode(enc).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
            break
        if fixed is None or fixed == s:
            return s
        s = fixed
    return s


def oracle_clean(s: str) -> str:
    s = oracle_fix_text(s)
    s = html.unescape(html.unescape(s))
    return " ".join(s.split())


# the CLIP split pattern, written out with explicit alternatives
import regex as _re

_PAT = _re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
    _re.IGNORECASE,
)


class OracleTokenizer:
    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.byte_table = oracle_byte_table()
        base = oracle_token_order()
        # id layout identical to open_clip: 256 byte tokens, 256 byte+</w>
        # tokens, one token per merge, then BOS/EOS
        tokens = base + [t + "</w>" for t in base]
        tokens += ["".join(p) for p in merges]
        tokens += ["<|startoftext|>", "<|endoftext|>"]
        self.ids = {t: i for i, t in enumerate(tokens)}

    def _merge_word(self, pieces: list[str]) -> list[str]:
        while len(pieces) > 1:
            best_rank = None
            best_idx = -1
            for i in range(len(pieces) - 1):
                r = self.ranks.get((pieces[i], pieces[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_idx = r, i
            if best_rank is None:
                break
            # merge EVERY occurrence of that exact pair, left to right
            first, second = pieces[best_idx], pieces[best_idx + 1]
            rebuilt: list[str] = []
            i = 0
            while i < len(pieces):
                if (
                    i + 1 < len(pieces)
                    and pieces[i] == first
                    and pieces[i + 1] == second
                ):
                    rebuilt.append(first + second)
                    i += 2
                else:
                    rebuilt.append(pieces[i])
                    i += 1
            pieces = rebuilt
        return pieces

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for tok in _PAT.findall(oracle_clean(text).lower()):
            mapped = "".join(self.byte_table[b] for b in tok.encode("utf-8"))
            if mapped in ("<|startoftext|>", "<|endoftext|>"):
                # open_clip pre-seeds its bpe cache with the special
                # tokens mapped to themselves, so a literal special in
                # the prompt text encodes as its single id
                out.append(self.ids[mapped])
                continue
            pieces = list(mapped[:-1]) + [mapped[-1] + "</w>"]
            for piece in self._merge_word(pieces):
                out.append(self.ids[piece])
        return out


def load_merges(path: str) -> list[tuple[str, str]]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as f:
        lines = f.read().split("\n")
    lines = lines[1 : 49152 - 256 - 2 + 1]
    return [tuple(l.split()) for l in lines if len(l.split()) == 2]


if __name__ == "__main__":
    import json

    merges_path, prompts_path = sys.argv[1], sys.argv[2]
    tok = OracleTokenizer(load_merges(merges_path))
    with open(prompts_path) as f:
        prompts = json.load(f)
    print(json.dumps({p: tok.encode(p) for p in prompts}, ensure_ascii=False))
