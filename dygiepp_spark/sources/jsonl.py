"""Document-JSON source/sink — the reference's native format.

SURVEY.md §1.1 / §2.1 S1+S3: the reference reads one JSON object per
line (`ref:dygie/data/dataset_readers/document.py::Document.from_json`)
and the predictor writes the same shape back with `predicted_*` fields
(`Document.to_json`). This module gives the new engine the same
surface: read ACE05/SciERC-style jsonl into a DataFrame with an
explicit schema (no inference — schema-on-read is pinned), and fold a
triples stream back into per-document predicted_* JSON.

Index conventions preserved exactly (§1.1): document-level token
indices, END-INCLUSIVE spans, triggers as single token indices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# sentences: list[list[str]]; gold fields optional (prediction input
# usually has only doc_key/dataset/sentences).
DOC_JSON_SCHEMA = T.StructType([
    T.StructField("doc_key", T.StringType(), False),
    T.StructField("dataset", T.StringType(), True),
    T.StructField("sentences",
                  T.ArrayType(T.ArrayType(T.StringType())), False),
    T.StructField("ner", T.ArrayType(T.ArrayType(
        T.ArrayType(T.StringType()))), True),
    T.StructField("relations", T.ArrayType(T.ArrayType(
        T.ArrayType(T.StringType()))), True),
    T.StructField("clusters", T.ArrayType(T.ArrayType(
        T.ArrayType(T.LongType()))), True),
    # per-sentence event list; each event is a ragged list whose FIRST
    # element is [trigger_tok, event_type] and whose remaining elements
    # are [arg_start, arg_end, role] (the reference's events JSON shape,
    # ref:scripts/data/ace-event/parse_ace_event.py output)
    T.StructField("events", T.ArrayType(T.ArrayType(T.ArrayType(
        T.ArrayType(T.StringType())))), True),
])


def read_document_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """jsonl corpus -> (doc_key, dataset, sentences, text). `text` is
    reconstructed as the space-joined tokens, which round-trips through
    the engine's whitespace tokenizer losslessly — so document-JSON
    input and pages input hit the identical decode path."""
    raw = spark.read.schema(DOC_JSON_SCHEMA).json(path)
    return raw.select(
        "doc_key", "dataset", "sentences",
        F.array_join(F.flatten("sentences"), " ").alias("text"),
        # gold annotations ride along (null when absent) — the A2
        # vocabulary build and gold<->pred matching consume them
        "ner", "relations", "clusters", "events")


def docs_to_pages(docs: DataFrame) -> DataFrame:
    """Adapt document-JSON rows to the pages operator contract
    (url/text); html synthesized so the X1 path stays exercised."""
    return docs.select(
        F.col("doc_key").alias("url"),
        F.current_timestamp().alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body><p>"), F.col("text"),
                          F.lit("</p></body></html>")), "UTF-8")
        .alias("html"),
        "text",
        F.lit("en").alias("lang"))


def triples_to_predictions(triples: DataFrame) -> DataFrame:
    """Fold the wide triples stream back into per-document
    `predicted_*` shapes (S3 sink): one row per doc_key with
    predicted_ner [start, end, label, score], predicted_relations
    [s1, e1, s2, e2, label, score], predicted_events (one entry per
    TRIGGER — present even with zero arguments, matching the
    reference's [trigger_tok, event_type] entry for arg-less events;
    ref:dygie/models/events.py::EventExtractor decode) and
    predicted_clusters (the coref surface;
    ref:dygie/models/coref.py::CorefResolver decode) — the §1.1/§2.9
    contract surface, JSON-serializable via df.write.json."""
    ner = (triples.filter(F.col("kind") == "ner")
           .groupBy(F.col("url").alias("doc_key"))
           .agg(F.array_sort(F.collect_list(F.struct(
               F.col("subj_start").alias("start"),
               F.col("subj_end").alias("end"),
               F.col("obj").alias("label"),
               F.col("score")))).alias("predicted_ner")))
    rel = (triples.filter(F.col("kind") == "relation")
           .groupBy(F.col("url").alias("doc_key"))
           .agg(F.array_sort(F.collect_list(F.struct(
               F.col("subj_start").alias("s1"),
               F.col("subj_end").alias("e1"),
               F.col("obj_start").alias("s2"),
               F.col("obj_end").alias("e2"),
               F.col("pred").alias("label"),
               F.col("score")))).alias("predicted_relations")))
    # events: trigger rows (kind='event') LEFT-join their args so an
    # argument-less trigger still emits its [trigger, event_type]
    # entry; args nested per trigger, deterministic ordering.
    args = (triples.filter(F.col("kind") == "event_arg")
            .groupBy("url", F.col("subj_start").alias("trigger"))
            .agg(F.array_sort(F.collect_list(F.struct(
                F.col("obj_start").alias("arg_start"),
                F.col("obj_end").alias("arg_end"),
                F.col("pred").alias("role"),
                F.col("score")))).alias("args")))
    empty_args = F.array().cast(
        "array<struct<arg_start:int,arg_end:int,role:string,"
        "score:double>>")
    ev = (triples.filter(F.col("kind") == "event")
          .select("url", F.col("subj_start").alias("trigger"),
                  F.col("obj").alias("event_type"), "score")
          .join(args, ["url", "trigger"], "left")
          .groupBy(F.col("url").alias("doc_key"))
          .agg(F.array_sort(F.collect_list(F.struct(
              "trigger", "event_type", "score",
              F.coalesce("args", empty_args).alias("args"))))
              .alias("predicted_events")))
    # clusters: per-doc union-find over antecedent links
    from dygiepp_spark.operators.linking import coref_clusters
    clus = (coref_clusters(triples)
            .groupBy("url", "cluster_id")
            .agg(F.array_sort(F.collect_list(F.struct("start", "end")))
                 .alias("spans"))
            .groupBy(F.col("url").alias("doc_key"))
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("cluster_id", "spans"))),
                lambda x: x["spans"]).alias("predicted_clusters")))
    return (ner.join(rel, "doc_key", "full")
            .join(ev, "doc_key", "full")
            .join(clus, "doc_key", "full"))
