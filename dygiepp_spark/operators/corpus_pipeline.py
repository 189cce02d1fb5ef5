"""Training-data corpus cleaning: the composed pipeline a pretraining
data team would run over a crawl before tokenization.

Stages (all JVM-side, each individually oracle-tested via the query
registry; this module is the composition):

1. quality filter  — token-count + stopword-ratio + mean-token-length
                     gates (q_quality_score semantics)
2. language filter — keep an allow-list (q_langid_heuristic semantics
                     would slot in when lang is predicted, here the
                     crawl's lang column)
3. exact dedup     — min-id keeper per content hash
4. near dedup      — MinHash-LSH candidates verified by n-gram
                     Jaccard >= threshold; survivors = min doc_id per
                     connected near-dup component

Every stage is a narrow filter or a hash-keyed shuffle; nothing joins
on raw text. Returns (clean_docs, stats_row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dygiepp_spark.operators.cc import connected_components
from dygiepp_spark.operators.dedup import (dedup_exact,
                                           jaccard_verify_candidates,
                                           minhash_lsh_candidates)


def quality_predicate(text_col: str = "text",
                      min_tokens: int = 16,
                      max_stop_ratio: float = 0.5,
                      min_avg_tok_len: float = 2.0):
    """The quality-gate Column shared by the funnel and its oracle
    twin (plans/queries_corpus.q_quality_filter) — one definition, so
    a threshold or stopword-list change cannot silently diverge the
    pinned cross-engine survivor set from the pipeline."""
    tk = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = F.size(tk)
    stop = F.size(F.filter(tk, lambda x: x.isin("the", "a", "an")))
    nch = F.length(F.regexp_replace(text_col, r"\s", ""))
    return ((n_tok >= min_tokens)
            & (stop * F.lit(1.0) / n_tok <= max_stop_ratio)
            & (nch * F.lit(1.0) / n_tok >= min_avg_tok_len))


def clean_corpus(docs: DataFrame,
                 min_tokens: int = 16,
                 max_stop_ratio: float = 0.5,
                 min_avg_tok_len: float = 2.0,
                 langs: tuple[str, ...] | None = None,
                 near_dup_jaccard: float = 0.9,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> tuple[DataFrame, dict]:
    n0 = docs.count()

    quality = docs.filter(quality_predicate(
        text_col, min_tokens, max_stop_ratio, min_avg_tok_len))
    if langs is not None:
        quality = quality.filter(F.col("lang").isin(*langs))
    quality = quality.localCheckpoint(eager=True)
    n1 = quality.count()

    exact = dedup_exact(quality, id_col, text_col) \
        .localCheckpoint(eager=True)
    n2 = exact.count()

    # near-dup removal: LSH candidates -> exact Jaccard verify ON THE
    # CANDIDATES ONLY (blocking-then-verify; verifying the full
    # shared-shingle self-join first would be the quadratic blowup
    # LSH exists to avoid) -> connected components over verified
    # pairs -> keep min id
    cand = minhash_lsh_candidates(exact, id_col, text_col)
    verified = jaccard_verify_candidates(exact, cand, id_col, text_col,
                                         threshold=near_dup_jaccard)
    comp = connected_components(
        verified.select(F.col("id1").alias("src"),
                        F.col("id2").alias("dst")))
    drop = (comp.groupBy("component")
            .agg(F.collect_list("node").alias("members"),
                 F.min("node").alias("keeper"))
            .select(F.explode("members").alias(id_col), "keeper")
            .filter(F.col(id_col) != F.col("keeper"))
            .select(id_col))
    clean = exact.join(drop, id_col, "left_anti")
    n3 = clean.count()

    stats = {"n_input": n0, "n_after_quality": n1,
             "n_after_exact_dedup": n2, "n_after_near_dedup": n3,
             "removed_quality": n0 - n1, "removed_exact": n1 - n2,
             "removed_near": n2 - n3}
    return clean, stats
