"""Span enumeration + the closed-form count invariant.

SURVEY.md §2.8 M2: the reference enumerates every span of width ≤
``max_span_width`` per sentence at read time (AllenNLP
``enumerate_spans`` called from ref:dygie/data/dataset_readers/
dygie.py::DyGIEReader.text_to_instance). Spans are [start, end]
END-INCLUSIVE (SURVEY.md §1.1), ordered (start asc, end asc) — the
enumeration order is semantics-bearing because downstream tie-breaks
key on it.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from dygiepp_spark.config import MAX_SPAN_WIDTH, SENT_CHUNK


@lru_cache(maxsize=256)
def _enumerate_spans_cached(n_tokens: int, max_width: int) -> np.ndarray:
    out = [
        (s, e)
        for s in range(n_tokens)
        for e in range(s, min(s + max_width, n_tokens))
    ]
    arr = np.asarray(out, dtype=np.int64)
    arr.setflags(write=False)  # cached — callers must not mutate
    return arr


def enumerate_spans(n_tokens: int, max_width: int = MAX_SPAN_WIDTH) -> np.ndarray:
    """All (start, end) with end-start < max_width, end-inclusive,
    ordered by (start, end). Returns int64 array [n_spans, 2].
    Memoized: sentence lengths are bounded by SENT_CHUNK, so only a
    handful of enumerations ever exist per process."""
    if n_tokens <= 0:
        return np.empty((0, 2), dtype=np.int64)
    return _enumerate_spans_cached(n_tokens, max_width)


def span_count(n_tokens: int, max_width: int = MAX_SPAN_WIDTH) -> int:
    """Closed form: n·W − W(W−1)/2 for n ≥ W, else n(n+1)/2
    (SURVEY.md §2.8 M2 count invariant)."""
    n, w = n_tokens, max_width
    if n <= 0:
        return 0
    if n >= w:
        return n * w - w * (w - 1) // 2
    return n * (n + 1) // 2


def span_count_chunked(n_tokens: int,
                       chunk: int = SENT_CHUNK,
                       max_width: int = MAX_SPAN_WIDTH) -> int:
    """Span count for a punctuation-free document split into
    ``chunk``-token sentences (kernel.tokenize.split_sentences rule).
    SQL-mirrorable:  (n/chunk)·C_full + C_rem(n % chunk)."""
    if n_tokens <= 0:
        return 0
    full, rem = divmod(n_tokens, chunk)
    return full * span_count(chunk, max_width) + span_count(rem, max_width)


def width_buckets(starts: np.ndarray, ends: np.ndarray,
                  n_buckets: int) -> np.ndarray:
    """Span width -> clipped bucket index (SURVEY.md §2.7 X4,
    ref EndpointSpanExtractor width embeddings [BASELINE])."""
    return np.minimum(ends - starts, n_buckets - 1).astype(np.int64)
