"""A1111-style 75-token prompt chunking — pure functions.

Re-implements the behaviour of the reference's ``tokenize_line``
(clip_hardcode.py:146-239): emphasis-parsed segments are tokenized, packed
into 75-token chunks wrapped with BOS/EOS, with
  * the BREAK keyword forcing a chunk boundary (:190-192),
  * comma backtracking — if a chunk fills within ``comma_padding_backtrack``
    tokens of the last comma, the tail after the comma moves to the next
    chunk (:203-214; A1111 default backtrack = 20),
  * per-token weight multipliers carried alongside (:219-223),
  * SD2-style padding: everything after the first EOS becomes id_pad=0
    (process_tokens :404-408).

Textual-inversion embeddings hook in via ``embedding_db`` (a lookup that
returns (embedding_vectors, consumed_token_count) at a position), matching
find_embedding_at_position semantics (:219-234).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from t2v.text.prompt_parser import parse_prompt_attention
from t2v.text.tokenizer import CLIPTokenizer

CHUNK_LENGTH = 75
DEFAULT_COMMA_BACKTRACK = 20


@dataclass
class PromptChunk:
    tokens: list[int] = field(default_factory=list)
    multipliers: list[float] = field(default_factory=list)
    # (position, embedding_matrix) pairs for textual inversion
    fixes: list[tuple[int, np.ndarray]] = field(default_factory=list)


def tokenize_line(
    line: str,
    tokenizer: CLIPTokenizer,
    *,
    enable_emphasis: bool = True,
    comma_backtrack: int = DEFAULT_COMMA_BACKTRACK,
    embedding_db: Optional[Callable[[list[int], int], tuple[Optional[np.ndarray], int]]] = None,
) -> tuple[list[PromptChunk], int]:
    """Returns (chunks, token_count). Every chunk is 77 wide (BOS+75+EOS)."""
    parsed = parse_prompt_attention(line) if enable_emphasis else [[line, 1.0]]
    tokenized = [tokenizer.encode(text) for text, _ in parsed]

    comma_token = tokenizer.encoder.get(",</w>")
    bos, eos = tokenizer.bos_id, tokenizer.eos_id

    chunks: list[PromptChunk] = []
    chunk = PromptChunk()
    token_count = 0
    last_comma = -1

    def next_chunk(is_last: bool = False):
        nonlocal chunk, token_count, last_comma
        token_count += len(chunk.tokens) if is_last else CHUNK_LENGTH
        to_add = CHUNK_LENGTH - len(chunk.tokens)
        if to_add > 0:
            chunk.tokens += [eos] * to_add
            chunk.multipliers += [1.0] * to_add
        chunk.tokens = [bos] + chunk.tokens + [eos]
        chunk.multipliers = [1.0] + chunk.multipliers + [1.0]
        last_comma = -1
        chunks.append(chunk)
        chunk = PromptChunk()

    for tokens, (text, weight) in zip(tokenized, parsed):
        if text == "BREAK" and weight == -1:
            next_chunk()
            continue

        position = 0
        while position < len(tokens):
            token = tokens[position]

            if token == comma_token:
                last_comma = len(chunk.tokens)
            elif (
                comma_backtrack != 0
                and len(chunk.tokens) == CHUNK_LENGTH
                and last_comma != -1
                and len(chunk.tokens) - last_comma <= comma_backtrack
            ):
                break_location = last_comma + 1
                reloc_tokens = chunk.tokens[break_location:]
                reloc_mults = chunk.multipliers[break_location:]
                chunk.tokens = chunk.tokens[:break_location]
                chunk.multipliers = chunk.multipliers[:break_location]
                next_chunk()
                chunk.tokens = reloc_tokens
                chunk.multipliers = reloc_mults

            if len(chunk.tokens) == CHUNK_LENGTH:
                next_chunk()

            embedding = None
            emb_consumed = 0
            if embedding_db is not None:
                embedding, emb_consumed = embedding_db(tokens, position)
            if embedding is None:
                chunk.tokens.append(token)
                chunk.multipliers.append(weight)
                position += 1
                continue

            emb_len = int(embedding.shape[0])
            if len(chunk.tokens) + emb_len > CHUNK_LENGTH:
                next_chunk()
            chunk.fixes.append((len(chunk.tokens), embedding))
            chunk.tokens += [0] * emb_len
            chunk.multipliers += [weight] * emb_len
            position += emb_consumed

    if len(chunk.tokens) > 0 or len(chunks) == 0:
        next_chunk(is_last=True)

    return chunks, token_count


def pad_after_eos(tokens: np.ndarray, eos: int, pad: int = 0) -> np.ndarray:
    """SD2 padding rule: all positions after the first EOS become id_pad
    (clip_hardcode.py:404-408)."""
    out = tokens.copy()
    for row in out:
        idx = int(np.argmax(row == eos))
        row[idx + 1 :] = pad
    return out
