"""Vocabulary build (A2): the distinct->collect->broadcast pattern.

SURVEY.md §2.4 A2 — the reference builds label/token vocabularies
from dataset instances at training time (AllenNLP
``Vocabulary.from_instances``; namespaces like ner_labels /
relation_labels per dataset). The engine's frozen-weight decode uses
pinned label lists (config.py), but a reference user switching over
still needs the build step for new corpora; this is it, Spark-first:

- label namespaces: one distinct-aggregate per namespace over the
  gold annotation arrays (higher-order functions, no UDF), collected
  (the result is vocabulary-sized by definition) and broadcast;
- token vocabulary: count -> threshold -> deterministic top-K
  (count desc, token asc — the AllenNLP ordering), one shuffle with
  map-side partial aggregation.

At 10^12 documents the label build is a full-scan + tiny distinct
(mergeable partials, ~bytes per partition) and the token build is a
word-count — both embarrassingly scalable; only vocabulary-sized
results ever reach the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def label_vocab_from_docs(docs: DataFrame) -> dict[str, list[str]]:
    """Gold document-JSON DataFrame (jsonl.read_document_jsonl /
    ingest.* output schema with ner/relations columns present) ->
    {"ner_labels": [...], "relation_labels": [...]}, each sorted.

    ner items are [start, end, LABEL]; relation items are
    [s1, e1, s2, e2, LABEL] — the label is the LAST element either
    way, so one expression serves both namespaces.

    SINGLE PASS: every namespace's (ns, label) pairs are emitted from
    one projection over one scan (per-namespace jobs would each
    re-scan the gold corpus — one saved scan per extra namespace at
    crawl scale), then one distinct and one vocabulary-sized collect.
    Plan-asserted in tests (one Scan node)."""
    out: dict[str, list[str]] = {
        ns: [] for ns, _ in _NAMESPACES}
    pairs = label_pairs(docs)
    if pairs is None:
        return out
    for r in pairs.collect():
        out[r.ns].append(r.label)
    for ns in out:
        out[ns].sort()
    return out


_NAMESPACES = (("ner_labels", "ner"), ("relation_labels", "relations"))


def label_pairs(docs: DataFrame) -> DataFrame | None:
    """The lazy (ns, label) distinct frame behind
    label_vocab_from_docs — exposed so the one-scan plan shape is
    assertable. None when no namespace column exists."""
    namespaces = [(ns, col) for ns, col in _NAMESPACES
                  if col in docs.columns]
    if not namespaces:
        return None
    # per namespace: null-safe flatten of per-sentence item lists,
    # items -> (ns, label) structs; all namespaces concatenated in the
    # SAME projection so Catalyst plans a single scan.
    streams = [
        F.transform(
            F.flatten(F.filter(
                F.coalesce(F.col(col), F.array()),
                lambda s: s.isNotNull())),
            lambda it: F.struct(F.lit(ns).alias("ns"),
                                F.element_at(it, -1).alias("label")))
        for ns, col in namespaces]
    return (docs
            .select(F.explode(F.concat(*streams)).alias("p"))
            .select("p.ns", "p.label")
            .filter(F.col("label").isNotNull())
            .distinct())


def token_vocab(docs: DataFrame, text_col: str = "text",
                min_count: int = 1,
                max_size: int = 50_000) -> list[tuple[str, int]]:
    """Whitespace-token vocabulary: [(token, count)] ordered by
    (count desc, token asc), thresholded and capped. One shuffle
    (word-count); the global top-K sort runs on the already-
    aggregated (distinct-token-sized) table."""
    counts = (docs
              .select(F.explode(F.split(F.trim(F.col(text_col)),
                                        r"\s+")).alias("tok"))
              .filter(F.col("tok") != "")
              .groupBy("tok")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
              .filter(F.col("n") >= min_count)
              .orderBy(F.col("n").desc(), F.col("tok").asc())
              .limit(max_size))
    return [(r.tok, int(r.n)) for r in counts.collect()]


def build_and_broadcast(spark: SparkSession, docs: DataFrame,
                        text_col: str = "text",
                        min_count: int = 1,
                        max_size: int = 50_000):
    """Full A2 pass: label namespaces + token vocab, returned as a
    dict and as a SparkContext broadcast (the J6 dimension-lookup
    side — executors index it instead of joining)."""
    vocab = {
        **label_vocab_from_docs(docs),
        "tokens": [t for t, _n in token_vocab(docs, text_col,
                                              min_count, max_size)],
    }
    return vocab, spark.sparkContext.broadcast(vocab)
