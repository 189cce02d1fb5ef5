"""Gold<->prediction evaluation (J4 / §2.9): the reference's
`allennlp evaluate` surface as DataFrame set-algebra.

The reference computes span-level NER / relation P/R/F1 against gold
annotations (ref:dygie/training/ner_metrics.py,
relation_metrics.py — exact span + label match). Here the same
contract is two equi-joins:

- TP = inner join of pred and gold on the full match key
  (doc, span(s), label);
- per-label and micro-averaged P/R/F1 from TP / n_pred / n_gold
  counts.

Scale: both sides shard on doc_key; the join key is (doc, ints,
label) — uniform, no skew guard needed. Counts are map-side-combined
aggregates; only the per-label metric table (vocabulary-sized)
materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALL = "__ALL__"


def gold_ner_spans(gold_docs: DataFrame) -> DataFrame:
    """Document-JSON gold -> (doc_key, start, end, label); ner items
    are [start, end, LABEL] with document-level indices."""
    return (gold_docs
            .select("doc_key", F.explode_outer("ner").alias("per_sent"))
            .select("doc_key", F.explode_outer("per_sent").alias("it"))
            .filter(F.col("it").isNotNull())
            .select("doc_key",
                    F.element_at("it", 1).cast("int").alias("start"),
                    F.element_at("it", 2).cast("int").alias("end"),
                    F.element_at("it", 3).alias("label"))
            .distinct())


def gold_relation_spans(gold_docs: DataFrame) -> DataFrame:
    """Document-JSON gold -> (doc_key, s1, e1, s2, e2, label)."""
    return (gold_docs
            .select("doc_key",
                    F.explode_outer("relations").alias("per_sent"))
            .select("doc_key", F.explode_outer("per_sent").alias("it"))
            .filter(F.col("it").isNotNull())
            .select("doc_key",
                    F.element_at("it", 1).cast("int").alias("s1"),
                    F.element_at("it", 2).cast("int").alias("e1"),
                    F.element_at("it", 3).cast("int").alias("s2"),
                    F.element_at("it", 4).cast("int").alias("e2"),
                    F.element_at("it", 5).alias("label"))
            .distinct())


def pred_ner_spans(triples: DataFrame) -> DataFrame:
    """kind='ner' triples -> the gold_ner_spans shape (url==doc_key)."""
    return (triples.filter(F.col("kind") == "ner")
            .select(F.col("url").alias("doc_key"),
                    F.col("subj_start").alias("start"),
                    F.col("subj_end").alias("end"),
                    F.col("obj").alias("label"))
            .distinct())


def pred_relation_spans(triples: DataFrame) -> DataFrame:
    return (triples.filter(F.col("kind") == "relation")
            .select(F.col("url").alias("doc_key"),
                    F.col("subj_start").alias("s1"),
                    F.col("subj_end").alias("e1"),
                    F.col("obj_start").alias("s2"),
                    F.col("obj_end").alias("e2"),
                    F.col("pred").alias("label"))
            .distinct())


def prf_table(pred: DataFrame, gold: DataFrame,
              keys: list[str]) -> DataFrame:
    """Exact-match P/R/F1 per label + a micro-averaged __ALL__ row.
    `keys` is the full match key INCLUDING `label`. Output:
    (label, tp, n_pred, n_gold, precision, recall, f1), label-sorted.
    """
    tp = (pred.join(gold, keys, "inner")
          .groupBy("label").agg(F.count(F.lit(1)).alias("tp")))
    np_ = pred.groupBy("label").agg(F.count(F.lit(1)).alias("n_pred"))
    ng = gold.groupBy("label").agg(F.count(F.lit(1)).alias("n_gold"))
    per = (np_.join(ng, "label", "full").join(tp, "label", "left")
           .select("label",
                   F.coalesce("tp", F.lit(0)).alias("tp"),
                   F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
                   F.coalesce("n_gold", F.lit(0)).alias("n_gold")))
    # coalesce: a global sum over zero rows is NULL, and the micro
    # row must exist with zero counts even on an empty evaluation
    micro = per.select(
        F.lit(_ALL).alias("label"),
        F.coalesce(F.sum("tp"), F.lit(0)).alias("tp"),
        F.coalesce(F.sum("n_pred"), F.lit(0)).alias("n_pred"),
        F.coalesce(F.sum("n_gold"), F.lit(0)).alias("n_gold"))
    base = per.unionByName(micro)
    p = F.when(F.col("n_pred") > 0,
               F.col("tp") / F.col("n_pred")).otherwise(F.lit(0.0))
    r = F.when(F.col("n_gold") > 0,
               F.col("tp") / F.col("n_gold")).otherwise(F.lit(0.0))
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return (base.select("label",
                        F.col("tp").cast("bigint").alias("tp"),
                        F.col("n_pred").cast("bigint").alias("n_pred"),
                        F.col("n_gold").cast("bigint").alias("n_gold"),
                        F.round(p, 6).alias("precision"),
                        F.round(r, 6).alias("recall"),
                        F.round(f1, 6).alias("f1"))
            .orderBy("label"))


def evaluate_against_gold(triples: DataFrame,
                          gold_docs: DataFrame) -> dict[str, DataFrame]:
    """Full evaluation pass: {"ner": prf_df, "relations": prf_df} —
    the reference's test-set metric tables, one DataFrame each."""
    ner = prf_table(pred_ner_spans(triples), gold_ner_spans(gold_docs),
                    ["doc_key", "start", "end", "label"])
    rel = prf_table(pred_relation_spans(triples),
                    gold_relation_spans(gold_docs),
                    ["doc_key", "s1", "e1", "s2", "e2", "label"])
    return {"ner": ner, "relations": rel}
