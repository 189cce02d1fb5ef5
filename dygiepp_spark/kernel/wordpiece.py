"""Greedy WordPiece subword tokenization with byte fallback (X3) —
pure python, no model dependence.

The reference indexes tokens into BERT wordpieces and mean-pools piece
embeddings back to word level (SURVEY.md §2.7 X3; ref:dygie AllenNLP
PretrainedTransformerMismatchedIndexer/Embedder pair). The real BERT
vocab file is unavailable in this sandbox, so the ALGORITHM is real —
greedy longest-match-first over the token with ``##`` continuation
pieces (Wu et al. 2016; BERT's tokenization.py) — over a pinned
synthetic vocabulary of frequent English subwords, with the
byte-fallback of modern tokenizers (SentencePiece/GPT-2 style): all
256 single bytes are vocabulary pieces, so EVERY token segments and
non-ASCII scripts get discriminative per-byte pieces instead of
collapsing to one [UNK] embedding (a Common-Crawl corpus is heavily
multilingual — an ASCII-only vocab would make all CJK tokens
identical to the encoder). On a real cluster the subword list swaps
for ``vocab.txt`` and nothing else changes; ``operators/vocab.py``
builds corpus token vocabularies for that path.

Everything here is deterministic and order-frozen: piece id = index in
``VOCAB``, and the decode golden hash pins the whole chain.

Matching operates on the lowercased token's UTF-8 bytes; piece length
is capped at ``MAX_PIECE`` so segmentation is O(len * MAX_PIECE).
"""

from __future__ import annotations

from functools import lru_cache

UNK = "[UNK]"
MAX_PIECE = 8

# frequent English subwords (public knowledge — any standard affix
# list); order is part of the pinned fixture, do not reorder
_SUBWORDS = [
    "the", "and", "ing", "ion", "tion", "ation", "ed", "er", "est",
    "re", "un", "in", "on", "at", "en", "es", "al", "ar", "an", "or",
    "it", "is", "le", "ly", "nt", "th", "st", "se", "de", "co", "pro",
    "pre", "con", "com", "ex", "ter", "ent", "ment", "ness", "able",
    "ive", "ous", "ful", "less", "ize", "ate", "ity", "ism", "ist",
    "graph", "micro", "multi", "over", "under", "out", "up", "down",
    "data", "net", "work", "span", "form", "ward", "ship", "dom",
]


def _display(b: bytes) -> str:
    if len(b) == 1 and 33 <= b[0] < 127:
        return chr(b[0])
    if len(b) == 1:
        return f"<0x{b[0]:02X}>"
    return b.decode("ascii")


def build_vocab() -> list[str]:
    """Pinned display vocabulary: [UNK], the 256 single bytes, their
    ## continuation forms, then the subword list in both forms."""
    singles = [bytes([i]) for i in range(256)]
    vocab = [UNK]
    vocab += [_display(b) for b in singles]
    vocab += ["##" + _display(b) for b in singles]
    vocab += _SUBWORDS + ["##" + s for s in _SUBWORDS]
    return vocab


VOCAB = build_vocab()
UNK_ID = 0

# byte-keyed lookup: (is_continuation, piece_bytes) -> id, mirroring
# VOCAB's index order exactly
_INDEX: dict[tuple[bool, bytes], int] = {}
for _i, _b in enumerate(bytes([j]) for j in range(256)):
    _INDEX[(False, _b)] = 1 + _i
    _INDEX[(True, _b)] = 1 + 256 + _i
for _i, _s in enumerate(_SUBWORDS):
    _INDEX[(False, _s.encode("ascii"))] = 1 + 512 + _i
    _INDEX[(True, _s.encode("ascii"))] = 1 + 512 + len(_SUBWORDS) + _i


@lru_cache(maxsize=65536)
def wordpiece_ids(token: str) -> tuple[int, ...]:
    """Greedy longest-match-first segmentation of one (lowercased)
    token's UTF-8 bytes into piece ids. Single bytes are always in
    the vocab, so every non-empty token segments; only the empty
    token maps to [UNK]."""
    data = token.lower().encode("utf-8")
    n = len(data)
    if n == 0:
        return (UNK_ID,)
    ids: list[int] = []
    pos, first = 0, True
    while pos < n:
        end = min(n, pos + MAX_PIECE)
        while end > pos:
            pid = _INDEX.get((not first, data[pos:end]))
            if pid is not None:
                ids.append(pid)
                pos = end
                break
            end -= 1
        first = False
    return tuple(ids)
