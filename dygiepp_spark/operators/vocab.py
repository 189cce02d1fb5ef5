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
    way, so one expression serves both namespaces."""
    out: dict[str, list[str]] = {}
    for ns, col in (("ner_labels", "ner"),
                    ("relation_labels", "relations")):
        if col not in docs.columns:
            out[ns] = []
            continue
        labels = (docs
                  .select(F.explode_outer(col).alias("per_sent"))
                  .select(F.explode_outer("per_sent").alias("item"))
                  .select(F.element_at("item", -1).alias("label"))
                  .filter(F.col("label").isNotNull())
                  .distinct())
        out[ns] = sorted(r.label for r in labels.collect())
    return out


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
