"""Deterministic text extraction + sentence split + tokenization.

Re-expresses the reference's preprocessing stage (SURVEY.md §2.7 X1/X2,
§3 E3: ref:scripts/data/* normalizers and the spaCy-based splitter in
ref:dygie/spacy_interface/) as frozen, pure-python rules with NO model
dependence, because:

1. BASELINE.json's per-row invariant is *byte-identical extracted text
   per url* — a rule-based extractor is trivially reproducible across
   reruns and parallelism levels; and
2. the tokenizer must be mirrorable in ANSI SQL for the DuckDB oracle
   (whitespace tokens + fixed-size sentence chunking are both
   SQL-expressible; spaCy is not).

These functions are pure (no I/O, no globals mutated) so the Spark
pandas UDFs and the single-process oracle decoder share them verbatim.
"""

from __future__ import annotations

import html as _htmlmod
import re

from dygiepp_spark.config import SENT_CHUNK, SENT_PUNCT

_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes | bytearray | memoryview | None) -> str:
    """HTML bytes -> extracted text. Frozen rule: strip tags, unescape
    entities. For pages synthesized per FIXTURES.md §1
    (``<html><body><p>{text}</p></body></html>``) the output is
    byte-identical to the source ``text`` column — the [BASELINE]
    invariant; golden-tested in tests/test_tokenize.py.
    """
    if html_bytes is None:
        return ""
    raw = bytes(html_bytes).decode("utf-8", errors="replace")
    no_tags = _TAG_RE.sub("", raw)
    return _htmlmod.unescape(no_tags)


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization (maximal non-whitespace runs).

    Chosen so that ``len(tokenize(t))`` equals DuckDB
    ``len(string_split_regex(trim(t), '\\s+'))`` and Spark
    ``size(split(trim(t), '\\s+'))`` — the SQL-oracle seam for the
    span-count invariant (SURVEY.md §5.2 item 2).
    """
    if not text:
        return []
    stripped = text.strip()
    if not stripped:
        return []
    return _WS_RE.split(stripped)


def split_sentences(tokens: list[str]) -> list[list[str]]:
    """Deterministic sentence segmentation over tokens.

    Rule: a sentence ends after a token whose last character is one of
    ``. ! ?``, or after ``SENT_CHUNK`` tokens, whichever comes first.
    The driver's synthetic documents contain no punctuation, so there
    sentence lengths are exactly ``SENT_CHUNK``-token chunks — which
    makes per-doc span counts a closed-form SQL expression over the
    whitespace token count (see spans.span_count_chunked).
    """
    sentences: list[list[str]] = []
    cur: list[str] = []
    for tok in tokens:
        cur.append(tok)
        if len(cur) >= SENT_CHUNK or (tok and tok[-1] in SENT_PUNCT):
            sentences.append(cur)
            cur = []
    if cur:
        sentences.append(cur)
    return sentences


def doc_to_sentences(text: str) -> list[list[str]]:
    """text -> list of token-lists (the Document.sentences shape,
    SURVEY.md §1.1)."""
    return split_sentences(tokenize(text))
