"""Physical-plan property assertions (SURVEY §4.2 — verify Catalyst is
doing what the design assumes, instead of hoping)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_extraction_is_zero_shuffle_and_pruned(spark):
    from dygiepp_spark.operators.extract import extract_triples
    from dygiepp_spark.sources.pages import synth_pages
    df = extract_triples(synth_pages(spark, "/root/testdata/sf0.001"),
                         from_html=True)
    plan = _plan(df)
    assert "Exchange" not in plan, "extraction must stay narrow"
    assert "MapInPandas" in plan
    # column pruning: text column never read on the html path
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "n_chars" not in read_schema[0]


def test_region_revenue_uses_broadcast_joins(spark):
    import __spark_entry__ as E
    df = E.queries()["q_region_revenue"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "all dims should broadcast — no sort-merge join expected")


def test_pricing_summary_pushes_filter_to_scan(spark):
    import __spark_entry__ as E
    df = E.queries()["q_pricing_summary"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]


def test_pages_scan_prunes_unused_columns(spark):
    from dygiepp_spark.sources.pages import synth_pages
    df = synth_pages(spark, "/root/testdata/sf0.001").select("url", "lang")
    plan = _plan(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in read_schema and "n_chars" not in read_schema


def test_edges_join_has_no_broadcast_hint(spark):
    """gid2ent is corpus-sized (one row per distinct mention text) —
    the edges join must NOT carry a forced broadcast hint; AQE decides
    at runtime. Inverse of test_region_revenue_uses_broadcast_joins."""
    from dygiepp_spark.plans.pipeline import build_graph
    rows = [
        ("u1", "ner", "acme corp", "is_a", "ORG", 0, 1, -1, -1, 0, 0.9),
        ("u1", "relation", "acme corp", "based_in", "paris",
         0, 1, 3, 3, 0, 0.8),
        ("u1", "ner", "paris", "is_a", "LOC", 3, 3, -1, -1, 0, 0.9),
    ]
    from dygiepp_spark.operators.extract import TRIPLE_SCHEMA
    triples = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    _, edges = build_graph(spark, triples)
    analyzed = edges._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, (
        "edges join must not force a broadcast of the corpus-sized "
        "gid2ent side")


def test_whole_stage_codegen_covers_projection(spark):
    from dygiepp_spark.sources.pages import synth_pages
    plan = _plan(synth_pages(spark, "/root/testdata/sf0.001"))
    # "*(n)" prefixes mark WholeStageCodegen stages in executedPlan
    assert "*(1) Project" in plan
