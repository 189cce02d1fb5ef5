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


def gold_event_triggers(gold_docs: DataFrame) -> DataFrame:
    """Document-JSON gold events -> (doc_key, trigger, label). Each
    event's FIRST element is [trigger_tok, event_type]
    (ref:dygie/training/event_metrics.py trigger scoring — exact
    token + type match)."""
    return (gold_docs
            .select("doc_key", F.explode_outer("events").alias("per_sent"))
            .select("doc_key", F.explode_outer("per_sent").alias("ev"))
            .filter(F.col("ev").isNotNull())
            .select("doc_key",
                    F.element_at(F.element_at("ev", 1), 1)
                    .cast("int").alias("trigger"),
                    F.element_at(F.element_at("ev", 1), 2).alias("label"))
            .distinct())


def gold_event_args(gold_docs: DataFrame) -> DataFrame:
    """Document-JSON gold events -> one row per argument:
    (doc_key, trigger, start, end, label=role). Elements 2..n of each
    event entry are [arg_start, arg_end, ROLE] (argument
    identification+classification relative to the trigger —
    ref:dygie/training/event_metrics.py argument scoring)."""
    ev = (gold_docs
          .select("doc_key", F.explode_outer("events").alias("per_sent"))
          .select("doc_key", F.explode_outer("per_sent").alias("ev"))
          .filter(F.col("ev").isNotNull()))
    return (ev.select(
        "doc_key",
        F.element_at(F.element_at("ev", 1), 1)
        .cast("int").alias("trigger"),
        F.explode(F.slice("ev", 2, F.greatest(
            F.size("ev") - 1, F.lit(0)))).alias("arg"))
        .select("doc_key", "trigger",
                F.element_at("arg", 1).cast("int").alias("start"),
                F.element_at("arg", 2).cast("int").alias("end"),
                F.element_at("arg", 3).alias("label"))
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


def pred_event_triggers(triples: DataFrame) -> DataFrame:
    """kind='event' triples -> the gold_event_triggers shape."""
    return (triples.filter(F.col("kind") == "event")
            .select(F.col("url").alias("doc_key"),
                    F.col("subj_start").alias("trigger"),
                    F.col("obj").alias("label"))
            .distinct())


def pred_event_args(triples: DataFrame) -> DataFrame:
    """kind='event_arg' triples -> the gold_event_args shape."""
    return (triples.filter(F.col("kind") == "event_arg")
            .select(F.col("url").alias("doc_key"),
                    F.col("subj_start").alias("trigger"),
                    F.col("obj_start").alias("start"),
                    F.col("obj_end").alias("end"),
                    F.col("pred").alias("label"))
            .distinct())


def gold_cluster_mentions(gold_docs: DataFrame) -> DataFrame:
    """Document-JSON gold `clusters` (list of clusters of [start, end]
    spans) -> (doc_key, cluster_id, start, end) — the same shape
    linking.coref_clusters emits for predictions."""
    return (gold_docs
            .select("doc_key",
                    F.posexplode_outer("clusters").alias("cluster_id",
                                                         "cl"))
            .select("doc_key", "cluster_id",
                    F.explode_outer("cl").alias("sp"))
            .filter(F.col("sp").isNotNull())
            .select("doc_key", F.col("cluster_id").cast("int"),
                    F.element_at("sp", 1).cast("int").alias("start"),
                    F.element_at("sp", 2).cast("int").alias("end"))
            .distinct())


def pred_cluster_mentions(triples: DataFrame) -> DataFrame:
    """kind='coref' triples -> (doc_key, cluster_id, start, end) via
    the per-document union-find (linking.coref_clusters)."""
    from dygiepp_spark.operators.linking import coref_clusters
    return (coref_clusters(triples)
            .select(F.col("url").alias("doc_key"),
                    F.col("cluster_id").cast("int"),
                    F.col("start").cast("int"),
                    F.col("end").cast("int")))


def _cluster_links(m: DataFrame) -> DataFrame:
    """Cluster membership -> within-cluster mention PAIRS (the
    pairwise coref link set; ordered (s1,e1) < (s2,e2)). Cluster ids
    are per-doc local, so the self-join key (doc_key, cluster_id) is
    beam-bounded — never a hot key."""
    a = m.select("doc_key", "cluster_id",
                 F.col("start").alias("s1"), F.col("end").alias("e1"))
    b = m.select("doc_key", "cluster_id",
                 F.col("start").alias("s2"), F.col("end").alias("e2"))
    return (a.join(b, ["doc_key", "cluster_id"])
            .filter((F.col("s1") < F.col("s2"))
                    | ((F.col("s1") == F.col("s2"))
                       & (F.col("e1") < F.col("e2"))))
            .select("doc_key", "s1", "e1", "s2", "e2",
                    F.lit("link").alias("label"))
            .distinct())


def _cluster_sigs(m: DataFrame) -> DataFrame:
    """Cluster membership -> one canonical signature per cluster (the
    sorted span multiset), for exact-cluster match."""
    return (m.groupBy("doc_key", "cluster_id")
            .agg(F.array_join(F.array_sort(F.collect_list(
                F.format_string("%d-%d", "start", "end"))), "|")
                .alias("sig"))
            .select("doc_key", "sig", F.lit("cluster").alias("label"))
            .distinct())


def coref_cluster_tables(pred_m: DataFrame,
                         gold_m: DataFrame) -> dict[str, DataFrame]:
    """The reference's coref evaluation surface from cluster
    memberships: mention-link P/R/F1 (pairwise links within clusters)
    and exact-cluster P/R/F1 (whole-cluster set match)."""
    links = prf_table(_cluster_links(pred_m), _cluster_links(gold_m),
                      ["doc_key", "s1", "e1", "s2", "e2", "label"])
    exact = prf_table(_cluster_sigs(pred_m), _cluster_sigs(gold_m),
                      ["doc_key", "sig", "label"])
    return {"coref_links": links, "coref_exact": exact}


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
    """Full evaluation pass — the reference's `allennlp evaluate`
    metric tables, one DataFrame each: ner, relations, always; event
    trigger/argument tables when the gold docs carry `events`; coref
    link + exact-cluster tables when they carry `clusters`."""
    out = {
        "ner": prf_table(pred_ner_spans(triples),
                         gold_ner_spans(gold_docs),
                         ["doc_key", "start", "end", "label"]),
        "relations": prf_table(pred_relation_spans(triples),
                               gold_relation_spans(gold_docs),
                               ["doc_key", "s1", "e1", "s2", "e2",
                                "label"]),
    }
    # gate on CONTENT, not column presence: every repo reader emits
    # the events/clusters columns — null OR a per-sentence list of
    # EMPTY lists when the corpus carries no such annotations (the
    # ACE reader always materializes [[], [], ...]) — so both a
    # column-existence and an isNotNull check would fabricate
    # misleading zero-gold tables. "Has annotations" therefore means
    # >= 1 actual item after flattening; both flags come from ONE
    # aggregate job over the gold docs.
    def _nonempty(col: str):
        flat = F.flatten(F.filter(F.col(col),
                                  lambda s: s.isNotNull()))
        return F.max(F.coalesce(F.size(flat) > 0, F.lit(False)))

    probe_cols = [c for c in ("events", "clusters")
                  if c in gold_docs.columns]
    flags = {c: False for c in ("events", "clusters")}
    if probe_cols:
        row = gold_docs.agg(
            *[_nonempty(c).alias(c) for c in probe_cols]).first()
        for c in probe_cols:
            flags[c] = bool(row[c])

    if flags["events"]:
        out["event_triggers"] = prf_table(
            pred_event_triggers(triples), gold_event_triggers(gold_docs),
            ["doc_key", "trigger", "label"])
        out["event_args"] = prf_table(
            pred_event_args(triples), gold_event_args(gold_docs),
            ["doc_key", "trigger", "start", "end", "label"])
    if flags["clusters"]:
        out.update(coref_cluster_tables(
            pred_cluster_mentions(triples),
            gold_cluster_mentions(gold_docs)))
    return out
