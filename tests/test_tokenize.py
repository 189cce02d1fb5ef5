"""X1/X2 tests: byte-identical extraction + SQL-mirrorable tokenizer."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from dygiepp_spark import config as C
from dygiepp_spark.kernel.tokenize import (doc_to_sentences, extract_text,
                                           split_sentences, tokenize)


def _wrap(text: str) -> bytes:
    return f"<html><body><p>{text}</p></body></html>".encode("utf-8")


def test_extract_text_byte_identity(sf_docs):
    """The [BASELINE] per-row invariant on every sf0.001 document."""
    for _url, text in sf_docs:
        assert extract_text(_wrap(text)) == text


def test_extract_text_entities_and_none():
    assert extract_text(b"<p>a &amp; b</p>") == "a & b"
    assert extract_text(None) == ""
    assert extract_text(b"") == ""


@given(st.text(alphabet=st.characters(blacklist_characters="<>&",
                                      blacklist_categories=["Cs"]),
               max_size=200))
@settings(max_examples=100, deadline=None)
def test_extract_text_roundtrip_property(text):
    assert extract_text(_wrap(text)) == text


def test_tokenize_matches_duckdb_whitespace_split(sf_docs):
    """Token counts must equal the DuckDB oracle expression — the seam
    used by the q_span_count / q_token_stats oracle queries."""
    con = duckdb.connect()
    for _url, text in sf_docs[:50]:
        n_sql = con.execute(
            r"select len(string_split_regex(trim(?), '\s+'))", [text]
        ).fetchone()[0]
        assert len(tokenize(text)) == n_sql
    con.close()


def test_sentence_chunking():
    toks = [f"t{i}" for i in range(40)]
    sents = split_sentences(toks)
    assert [len(s) for s in sents] == [16, 16, 8]
    # punctuation ends a sentence early
    toks = ["a", "b.", "c", "d"]
    assert [len(s) for s in split_sentences(toks)] == [2, 2]


def test_doc_to_sentences_empty():
    assert doc_to_sentences("") == []
    assert doc_to_sentences("   ") == []


def test_registered_sql_functions(spark):
    """The engine's SQL function surface: kernel rules callable from
    Spark SQL, consistent with the oracle-twinned JVM expressions."""
    from dygiepp_spark.functions import register_all
    register_all(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(100).createOrReplaceTempView("d100")
    rows = spark.sql("""
        SELECT doc_id,
               kg_token_count(text) AS n_tok,
               size(split(trim(text), '\\\\s+')) AS n_tok_jvm,
               kg_span_count(text) AS n_spans,
               kg_extract_text(encode(concat('<p>', text, '</p>'),
                               'UTF-8')) AS rt
        FROM d100
    """).collect()
    from dygiepp_spark.kernel.spans import span_count_chunked
    for r in rows:
        assert r.n_tok == r.n_tok_jvm
        assert r.n_spans == span_count_chunked(r.n_tok)
    # byte-identical roundtrip through the SQL-registered X1
    texts = {r.doc_id: r.rt for r in rows}
    orig = {r.doc_id: r.text
            for r in docs.limit(100).select("doc_id", "text").collect()}
    assert texts == orig
