"""The headline test (SURVEY.md §5.2 item 1): Spark pipeline triples ==
single-process oracle decode, exact (url, subj, pred, obj) match,
P/R ≥ 0.95 required — 1.0 expected (shared kernel, shared tie-breaks).
Also: partitioning invariance (decode parity across parallelism)."""

from __future__ import annotations

import pandas as pd
import pytest

from dygiepp_spark.kernel.oracle import decode_corpus, triple_prf

N_DOCS = 150


@pytest.fixture(scope="module")
def gold(sf_docs):
    return decode_corpus(sf_docs[:N_DOCS])


def _spark_triples(spark, n_partitions: int) -> pd.DataFrame:
    from pyspark.sql import functions as F
    from dygiepp_spark.operators.extract import extract_triples
    from dygiepp_spark.sources.pages import synth_pages
    pages = (synth_pages(spark, "/root/testdata/sf0.001")
             .withColumn("doc_id",
                         F.split(F.col("url"), "/").getItem(4).cast("long"))
             .filter(F.col("doc_id") < N_DOCS)
             .drop("doc_id")
             .repartition(n_partitions))
    return extract_triples(pages, from_html=True).toPandas()


def test_spark_matches_oracle(spark, gold):
    pred = _spark_triples(spark, 4)
    m = triple_prf(pred, gold)
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m
    # shared kernel => exact
    assert m["precision"] == 1.0 and m["recall"] == 1.0, m


def test_partitioning_invariance(spark, gold):
    """SURVEY.md §4.3: decode identical at different parallelism —
    the sandbox evidence for cross-cluster-size determinism."""
    a = _spark_triples(spark, 1)
    b = _spark_triples(spark, 7)
    key = ["url", "kind", "subj", "pred", "obj",
           "subj_start", "subj_end", "obj_start", "obj_end", "sent_id"]
    sa = a.sort_values(key).reset_index(drop=True)
    sb = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(sa, sb)


def test_html_path_equals_text_path(spark):
    """X1 invariant end-to-end: decoding from html == decoding from the
    text column (byte-identical extraction)."""
    from dygiepp_spark.operators.extract import extract_triples
    from dygiepp_spark.sources.pages import synth_pages
    pages = synth_pages(spark, "/root/testdata/sf0.001").limit(60)
    via_html = extract_triples(pages, from_html=True).toPandas()
    via_text = extract_triples(pages, from_html=False).toPandas()
    key = ["url", "kind", "subj", "pred", "obj", "subj_start",
           "subj_end", "obj_start", "obj_end", "sent_id"]
    pd.testing.assert_frame_equal(
        via_html.sort_values(key).reset_index(drop=True),
        via_text.sort_values(key).reset_index(drop=True))


def test_length_bucketed_batching_invariant(spark):
    """W4 (SURVEY §2.5): length-bucketed batching is a physical
    optimization only — decode output identical."""
    from dygiepp_spark.operators.extract import extract_triples
    from dygiepp_spark.sources.pages import synth_pages
    pages = synth_pages(spark, "/root/testdata/sf0.001").limit(80)
    a = extract_triples(pages, from_html=True).toPandas()
    b = extract_triples(pages, from_html=True,
                        length_bucketed=True).toPandas()
    key = ["url", "kind", "subj", "pred", "obj", "subj_start",
           "subj_end", "obj_start", "obj_end", "sent_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
