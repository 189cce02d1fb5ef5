"""Dedup / ANN / multimodal / jsonl-source operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


# --------------------------------------------------------------- dedup
def test_exact_dedup_removes_known_dups(spark, docs):
    from dygiepp_spark.operators.dedup import dedup_exact, exact_duplicates
    dups = exact_duplicates(docs).collect()
    n_extra = sum(r.n - 1 for r in dups)
    kept = dedup_exact(docs)
    assert kept.count() == docs.count() - n_extra
    # deduped corpus has fully unique texts
    assert kept.select("text").distinct().count() == kept.count()
    # keepers survive
    keepers = {r.keeper for r in dups}
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert keepers <= kept_ids


def test_minhash_lsh_finds_exact_dups(spark, docs):
    """Exact duplicates share all shingles => all bands match => every
    exact-dup pair must be an LSH candidate (recall-1 floor)."""
    from dygiepp_spark.operators.dedup import minhash_lsh_candidates
    dup_pairs = (docs.alias("a").join(
        docs.alias("b"),
        (F.col("a.text") == F.col("b.text"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id1"),
                F.col("b.doc_id").alias("id2")))
    cand = minhash_lsh_candidates(docs).select("id1", "id2")
    missed = dup_pairs.join(cand, ["id1", "id2"], "left_anti").count()
    assert missed == 0
    # and those pairs matched on all 4 bands
    full = (minhash_lsh_candidates(docs)
            .join(dup_pairs, ["id1", "id2"], "left_semi")
            .filter(F.col("n_bands") == 4))
    assert full.count() == dup_pairs.count()


def test_lsh_dedup_incremental_planted(spark):
    """Incremental near-dup dedup on planted data: a near-copy of a
    corpus doc and the later half of an in-batch exact pair are
    dropped; unique docs (long or short) survive; appending the
    survivors' bands makes re-ingesting the same batch a no-op."""
    from dygiepp_spark.operators.dedup import (lsh_band_table,
                                               lsh_dedup_incremental)

    def text(tag: str, n: int = 30) -> str:
        return " ".join(f"{tag}w{j}" for j in range(n))

    corpus = spark.createDataFrame(
        [(0, text("a")), (1, text("b")), (2, text("c"))],
        "doc_id bigint, text string")
    state = lsh_band_table(corpus)
    new = spark.createDataFrame(
        [(10, text("a") + " extra"),   # near-copy of corpus doc 0
         (11, text("u")),              # unique -> survives
         (12, text("d")), (13, text("d")),  # in-batch pair -> min id
         (14, "just two")],            # short unique -> survives
        "doc_id bigint, text string")
    surv = {r.doc_id
            for r in lsh_dedup_incremental(new, state).collect()}
    assert surv == {11, 12, 14}, surv

    # steady-state append: state += survivors' bands; the same batch
    # re-ingested is now entirely duplicate (idempotent ingestion)
    surv_docs = new.join(
        spark.createDataFrame([(i,) for i in surv], "doc_id bigint"),
        "doc_id", "left_semi")
    state2 = state.unionByName(lsh_band_table(surv_docs))
    assert lsh_dedup_incremental(new, state2).count() == 0


def test_approx_distinct_within_bound(spark, docs):
    """q_approx_distinct (HLL++, rsd=0.02) lands within 10% of the
    exact per-language distinct-text counts — the documented
    10^12-doc swap, bounded as code."""
    from dygiepp_spark.plans.queries_corpus import q_approx_distinct
    approx = {r.lang: r.n_unique_approx
              for r in q_approx_distinct(
                  spark, "/root/testdata/sf0.001").collect()}
    exact = {r.lang: r.n
             for r in docs.groupBy("lang")
             .agg(F.countDistinct("text").alias("n")).collect()}
    assert set(approx) == set(exact)
    for lang, n in exact.items():
        assert abs(approx[lang] - n) <= max(2, 0.1 * n), (
            lang, approx[lang], n)


def test_approx_quantiles_within_bound(spark):
    """q_length_quantiles_approx tracks the exact quartiles: the
    sketch returns a member of the value set, so each approx quartile
    sits within one neighbor-gap (bounded here by 5% / 2 tokens)."""
    from dygiepp_spark.plans.queries_corpus import (
        q_length_quantiles, q_length_quantiles_approx)
    sf = "/root/testdata/sf0.001"
    ex = {r.lang: (r.q25, r.q50, r.q75)
          for r in q_length_quantiles(spark, sf).collect()}
    ap = {r.lang: (r.q25, r.q50, r.q75)
          for r in q_length_quantiles_approx(spark, sf).collect()}
    assert set(ex) == set(ap)
    for lang in ex:
        for a, e in zip(ap[lang], ex[lang]):
            assert abs(a - e) <= max(2.0, 0.05 * e), (lang, a, e)


def test_ngram_jaccard_exact_dups_score_one(spark, docs):
    from dygiepp_spark.operators.dedup import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(docs, threshold=0.999)
    dup_pairs = (docs.alias("a").join(
        docs.alias("b"),
        (F.col("a.text") == F.col("b.text"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))))
    assert pairs.count() >= dup_pairs.count()


def test_jaccard_verify_candidates_matches_full_join(spark, docs):
    """Candidates-only verify must return exactly the uncapped
    full-join Jaccard values restricted to the candidate set."""
    from dygiepp_spark.operators.dedup import (jaccard_verify_candidates,
                                               minhash_lsh_candidates,
                                               ngram_jaccard_pairs)
    cand = minhash_lsh_candidates(docs).select("id1", "id2")
    via_cand = jaccard_verify_candidates(docs, cand, threshold=0.5)
    via_full = (ngram_jaccard_pairs(docs, threshold=0.5, df_cap=None)
                .join(cand, ["id1", "id2"], "left_semi"))
    a = {(r.id1, r.id2, round(r.jaccard, 6)) for r in via_cand.collect()}
    b = {(r.id1, r.id2, round(r.jaccard, 6)) for r in via_full.collect()}
    assert a == b and len(a) > 0


def test_ngram_jaccard_df_cap_drops_hot_shingles(spark):
    """A boilerplate shingle shared by every doc must not create
    pairs once the df-cap drops it."""
    from dygiepp_spark.operators.dedup import ngram_jaccard_pairs
    boiler = "all rights reserved"
    rows = [(i, f"{boiler} unique{i} content{i} tail{i} x{i} y{i}")
            for i in range(6)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    uncapped = ngram_jaccard_pairs(d, threshold=0.01, df_cap=None)
    capped = ngram_jaccard_pairs(d, threshold=0.01, df_cap=3)
    assert uncapped.count() == 15  # all pairs share the boilerplate
    assert capped.count() == 0     # hot shingle capped away


def test_clean_corpus_verify_input_is_candidate_set(spark, docs,
                                                    monkeypatch):
    """The near-dup verify stage must receive the LSH candidate set,
    not the shared-shingle self-join (blocking before verification)."""
    import dygiepp_spark.operators.corpus_pipeline as cp
    from dygiepp_spark.operators.dedup import jaccard_verify_candidates
    seen = {}

    def spy(d, cand, *a, **kw):
        seen["n_cand"] = cand.count()
        return jaccard_verify_candidates(d, cand, *a, **kw)

    monkeypatch.setattr(cp, "jaccard_verify_candidates", spy)
    planted = docs.limit(5).withColumn("doc_id",
                                       F.col("doc_id") + 100000)
    _clean, stats = cp.clean_corpus(docs.unionByName(planted),
                                    min_tokens=8)
    n = stats["n_after_exact_dedup"]
    assert seen["n_cand"] >= 1          # planted dups are candidates
    assert seen["n_cand"] < n * (n - 1) // 20, (
        "verify input looks like an all/shared-shingle pair set, "
        "not LSH candidates")


def test_embedding_near_dups_blocked_recall(spark, emb):
    """LSH-blocked near-dup must recover >=95% of the brute-force
    pairs at the same threshold, with identical cosines."""
    from dygiepp_spark.operators.dedup import (embedding_near_dups,
                                               embedding_near_dups_blocked)
    brute = embedding_near_dups(emb, threshold=0.25)
    blocked = embedding_near_dups_blocked(emb, threshold=0.25,
                                          n_tables=16, bits=2)
    b = {(r.id1, r.id2): r.cosine for r in brute.collect()}
    k = {(r.id1, r.id2): r.cosine for r in blocked.collect()}
    assert len(b) > 0
    recall = len(b.keys() & k.keys()) / len(b)
    assert recall >= 0.95, recall
    # no false positives, exact cosines on the intersection
    assert set(k) <= set(b)
    assert all(abs(b[p] - k[p]) < 1e-9 for p in k)


def test_simhash_identical_for_dups_and_portable(spark, docs):
    from dygiepp_spark.operators.dedup import simhash
    sh = simhash(docs.limit(100))
    assert sh.count() == 100
    joined = (docs.alias("a").join(docs.alias("b"),
              (F.col("a.text") == F.col("b.text"))
              & (F.col("a.doc_id") != F.col("b.doc_id")))
              .select(F.col("a.doc_id").alias("d1"),
                      F.col("b.doc_id").alias("d2")))
    sh_all = simhash(docs)
    s1 = sh_all.withColumnRenamed("doc_id", "d1") \
               .withColumnRenamed("simhash", "h1")
    s2 = sh_all.withColumnRenamed("doc_id", "d2") \
               .withColumnRenamed("simhash", "h2")
    diff = (joined.join(s1, "d1").join(s2, "d2")
            .filter(F.col("h1") != F.col("h2")))
    assert diff.count() == 0


# ----------------------------------------------------------------- ANN
def test_ann_lsh_recall_vs_brute_force(spark, emb):
    from dygiepp_spark.operators.ann import brute_force_topk, lsh_topk
    queries = (emb.filter(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qv")))
    bf = brute_force_topk(emb, queries, k=5)
    ls = lsh_topk(emb, queries, k=5, n_tables=12, bits=4)
    bf_set = {(r.query_id, r.vec_id) for r in bf.collect()}
    ls_set = {(r.query_id, r.vec_id) for r in ls.collect()}
    recall = len(bf_set & ls_set) / len(bf_set)
    # random gaussian vectors are a worst case for LSH; still demand
    # far better than the ~1% random-candidate floor
    assert recall >= 0.3, recall
    # exact re-rank: every returned cosine matches brute force
    joined = (ls.alias("l").join(
        bf.alias("b"), ["query_id", "vec_id"])
        .filter(F.abs(F.col("l.cosine") - F.col("b.cosine")) > 1e-9))
    assert joined.count() == 0


# ---------------------------------------------------------- multimodal
def test_multimodal_features_deterministic(spark):
    from dygiepp_spark.operators.multimodal import (extract_media_features,
                                                    synth_media)
    media = synth_media(spark, 48)
    f1 = extract_media_features(media).orderBy("media_id").collect()
    f2 = extract_media_features(media).orderBy("media_id").collect()
    assert [r.features for r in f1] == [r.features for r in f2]
    assert all(r.decode_status == "ok" and len(r.features) == 32
               for r in f1)


def test_multimodal_resize_deterministic_and_narrow(spark):
    from dygiepp_spark.operators.multimodal import (resize_media,
                                                    synth_media)
    media = synth_media(spark, 36)
    r1 = resize_media(media, 64, 48).orderBy("media_id").collect()
    r2 = resize_media(media, 64, 48).orderBy("media_id").collect()
    assert [bytes(r.payload) for r in r1] == \
           [bytes(r.payload) for r in r2]
    assert all(r.width == 64 and r.height == 48
               and r.resize_status == "ok" for r in r1)
    assert {r.kind for r in r1} == {"image", "video"}  # audio filtered
    # different target dims -> different payload bytes
    r3 = resize_media(media, 32, 32).orderBy("media_id").collect()
    assert bytes(r1[0].payload) != bytes(r3[0].payload)
    # narrow plan: no shuffle
    plan = resize_media(media, 64, 48) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_multimodal_frame_plan_prunes_payload(spark):
    from dygiepp_spark.operators.multimodal import (frame_sample_plan,
                                                    synth_media)
    media = synth_media(spark, 30)
    plan = frame_sample_plan(media, every_nth=7)
    rows = plan.collect()
    assert all(r.frame_idx % 7 == 0 for r in rows)
    explained = plan._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in explained


def test_real_decode_raises():
    from dygiepp_spark.operators.multimodal import real_decode
    with pytest.raises(NotImplementedError):
        real_decode(b"x", "image")


# ------------------------------------------------------- jsonl source
def test_document_jsonl_roundtrip(spark, tmp_path):
    import json
    docs = [
        {"doc_key": "d1", "dataset": "scierc_style",
         "sentences": [["the", "fast", "parser", "uses", "spark"],
                       ["it", "scales"]]},
        {"doc_key": "d2", "dataset": "scierc_style",
         "sentences": [["batch", "stream", "join", "merge"]]},
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs))

    from dygiepp_spark.operators.extract import extract_triples
    from dygiepp_spark.sources.jsonl import (docs_to_pages,
                                             read_document_jsonl,
                                             triples_to_predictions)
    df = read_document_jsonl(spark, str(p))
    assert df.count() == 2
    row = {r.doc_key: r.text for r in df.collect()}
    assert row["d1"] == "the fast parser uses spark it scales"

    triples = extract_triples(docs_to_pages(df), from_html=True)
    preds = triples_to_predictions(triples)
    assert preds.count() <= 2
    assert "predicted_ner" in preds.columns
    assert "predicted_events" in preds.columns
    assert "predicted_clusters" in preds.columns
    # every predicted trigger appears as an event entry, including
    # argument-less ones (the reference's [trigger, type] surface)
    n_trig = triples.filter(F.col("kind") == "event").count()
    n_ev = sum(len(r.predicted_events or [])
               for r in preds.select("predicted_events").collect())
    assert n_ev == n_trig
    # arg-less triggers carry an empty args array, not null
    ev_rows = [e for r in preds.select("predicted_events").collect()
               for e in (r.predicted_events or [])]
    assert all(e.args is not None for e in ev_rows)

    # decode parity with the oracle on the same text
    from dygiepp_spark.kernel.oracle import decode_corpus, triple_prf
    gold = decode_corpus([(k, t) for k, t in row.items()])
    import pandas as pd
    pred = triples.toPandas()
    m = triple_prf(pred, gold)
    assert m["precision"] == 1.0 and m["recall"] == 1.0


# -------------------------------------------------------- streaming
def test_streaming_wrapper_matches_batch(spark, tmp_path):
    from dygiepp_spark.sources.pages import synth_pages
    from dygiepp_spark.streaming import stream_pages_to_triples
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")
    (synth_pages(spark, "/root/testdata/sf0.001").limit(40)
     .drop("partition_id")
     .write.parquet(pages_dir))
    q = stream_pages_to_triples(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    from dygiepp_spark.operators.extract import extract_triples
    batch = extract_triples(
        spark.read.parquet(pages_dir), from_html=True)
    assert got.count() == batch.count()


def test_ivf_topk_recall_vs_brute_force(spark, emb):
    from dygiepp_spark.operators.ann import brute_force_topk, ivf_topk
    queries = (emb.filter(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qv")))
    bf = brute_force_topk(emb, queries, k=5)
    ivf = ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=6)
    bf_set = {(r.query_id, r.vec_id) for r in bf.collect()}
    iv_set = {(r.query_id, r.vec_id) for r in ivf.collect()}
    recall = len(bf_set & iv_set) / len(bf_set)
    assert recall >= 0.3, recall
    # probing 6/16 of random-gaussian space ~ 37% of candidates;
    # exact re-rank means returned cosines are exact
    joined = (ivf.alias("l").join(bf.alias("b"), ["query_id", "vec_id"])
              .filter(F.abs(F.col("l.cosine") - F.col("b.cosine")) > 1e-9))
    assert joined.count() == 0


def test_coref_clusters_consistent_with_links(spark):
    from dygiepp_spark.operators.extract import extract_triples
    from dygiepp_spark.operators.linking import coref_clusters
    from dygiepp_spark.sources.pages import synth_pages
    triples = extract_triples(
        synth_pages(spark, "/root/testdata/sf0.001").limit(40),
        from_html=True)
    links = triples.filter(F.col("kind") == "coref").collect()
    clusters = coref_clusters(triples).collect()
    cl = {}
    for r in clusters:
        cl[(r.url, r.start, r.end)] = (r.url, r.cluster_id)
    for r in links:
        assert cl[(r.url, r.subj_start, r.subj_end)] == \
               cl[(r.url, r.obj_start, r.obj_end)], "linked spans split"


def test_asof_join_paths_agree(spark):
    """Built-in composition vs merge_asof cogroup path: identical
    output on real events data."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = ev.filter(F.col("event_type") == "purchase")
    s = ev.filter(F.col("event_type") == "signup")
    from dygiepp_spark.operators.asof import asof_join, asof_join_pandas
    a = asof_join(p, s, on="user_id", tolerance_sec=7200)
    b = asof_join_pandas(p, s, on="user_id", tolerance_sec=7200)
    key = ["event_id", "r_event_id"]
    ra = sorted(map(tuple, a.select(*key).collect()))
    rb = sorted(map(tuple, b.select(*key).collect()))
    assert ra == rb and len(ra) > 0


def test_asof_join_preserves_duplicate_left_rows(spark):
    """Two fully identical left rows must EACH keep their match (the
    pd.merge_asof multiplicity contract) — the rank-1 window runs on a
    per-row synthetic key, not the left column tuple."""
    from dygiepp_spark.operators.asof import asof_join, asof_join_pandas
    left = spark.createDataFrame(
        [(1, 100), (1, 100), (1, 50)],
        "user_id int, ts int").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, 90, 7), (1, 40, 8)],
        "user_id int, ts int, event_id int").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"),
            "event_id")
    a = asof_join(left, right, on="user_id", tolerance_sec=3600)
    b = asof_join_pandas(left, right, on="user_id", tolerance_sec=3600)
    assert a.count() == 3, "duplicate left row was silently dropped"
    ra = sorted((r.user_id, r.r_event_id) for r in a.collect())
    rb = sorted((r.user_id, r.r_event_id) for r in b.collect())
    assert ra == rb == [(1, 7), (1, 7), (1, 8)]


def test_asof_join_property_random_tables(spark):
    """Both as-of implementations agree on randomized inputs with
    duplicate left rows, tied right timestamps, and sparse keys —
    the regimes where the round-2 duplicate-collapse bug lived."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from dygiepp_spark.operators.asof import asof_join, asof_join_pandas

    row = st.tuples(st.integers(0, 3),            # user_id
                    st.integers(0, 5000))         # epoch sec
    lefts = st.lists(row, min_size=1, max_size=12)
    rights = st.lists(row, min_size=1, max_size=12)

    @settings(max_examples=12, deadline=None)
    @given(lefts, rights)
    def prop(ls, rs):
        left = spark.createDataFrame(
            [(u, t) for u, t in ls], "user_id int, ts int").select(
                "user_id", F.col("ts").cast("timestamp").alias("ts"))
        right = spark.createDataFrame(
            [(u, t, i) for i, (u, t) in enumerate(rs)],
            "user_id int, ts int, event_id int").select(
                "user_id", F.col("ts").cast("timestamp").alias("ts"),
                "event_id")
        a = asof_join(left, right, on="user_id", tolerance_sec=1800)
        b = asof_join_pandas(left, right, on="user_id",
                             tolerance_sec=1800)
        ka = sorted((r.user_id, r.ts, r.r_event_id)
                    for r in a.collect())
        kb = sorted((r.user_id, r.ts, r.r_event_id)
                    for r in b.collect())
        assert ka == kb

    prop()


def test_clean_corpus_pipeline(spark, docs):
    from dygiepp_spark.operators.corpus_pipeline import clean_corpus
    # plant 10 exact duplicates with fresh ids
    planted = docs.limit(10).withColumn(
        "doc_id", F.col("doc_id") + 100000)
    with_dups = docs.unionByName(planted)
    clean, stats = clean_corpus(with_dups, min_tokens=8,
                                langs=("en", "de", "es", "fr", "zh"))
    assert stats["n_input"] == 510
    assert stats["n_after_quality"] <= stats["n_input"]
    # planted exact dups must be gone (their originals survive)
    assert stats["removed_exact"] >= 10
    assert clean.select("text").distinct().count() == clean.count()
    # keepers are the min ids: no planted id survives
    assert clean.filter(F.col("doc_id") >= 100000).count() == 0
    # monotone funnel
    assert (stats["n_input"] >= stats["n_after_quality"]
            >= stats["n_after_exact_dedup"]
            >= stats["n_after_near_dedup"])


def test_simhash_blocked_pairs_exact_recall(spark, docs):
    """Pigeonhole blocking (d+1 disjoint blocks) must return EXACTLY
    the brute-force Hamming<=d pair set — recall and precision 1.0
    by construction (VERDICT r2 'What's wrong' #1)."""
    from dygiepp_spark.operators.dedup import (simhash,
                                               simhash_near_pairs_blocked)
    d = 3
    got = {(r.id1, r.id2, r.hamming)
           for r in simhash_near_pairs_blocked(docs, max_hamming=d)
           .collect()}
    sh = simhash(docs)
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    exact = {(r.id1, r.id2, r.hamming) for r in
             (a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
              .select(F.col("a.doc_id").alias("id1"),
                      F.col("b.doc_id").alias("id2"),
                      ham.cast("int").alias("hamming"))
              .filter(F.col("hamming") <= d)).collect()}
    assert got == exact and len(exact) > 0


def test_extract_with_broadcast_archive(spark, tmp_path):
    """S2 end-to-end: the distributed decode runs with a broadcast
    model.tar.gz archive. Same archive -> identical triples as the
    seed fixture path; a perturbed archive -> different decode (the
    broadcast is actually used, not silently ignored)."""
    import numpy as np
    from dygiepp_spark.kernel.weights import (broadcast_archive,
                                              build_weights,
                                              save_archive)
    from dygiepp_spark.operators.extract import extract_triples
    from dygiepp_spark.sources.pages import synth_pages
    pages = synth_pages(spark, "/root/testdata/sf0.001").limit(20)

    arc = str(tmp_path / "model.tar.gz")
    save_archive(build_weights(), arc)
    bc = broadcast_archive(spark, arc)
    base = extract_triples(pages, from_html=True).toPandas()
    via_arc = extract_triples(pages, from_html=True,
                              weights_bc=bc).toPandas()
    key = ["url", "kind", "subj", "pred", "obj", "subj_start",
           "subj_end", "obj_start", "obj_end", "sent_id"]
    a = base[key].sort_values(key).reset_index(drop=True)
    b = via_arc[key].sort_values(key).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)

    # perturbed trigger bias -> decode must change
    w2 = build_weights()
    w2["t_b2"] = w2["t_b2"].copy()
    w2["t_b2"][0] = np.float32(50.0)  # null bias huge -> no triggers
    arc2 = str(tmp_path / "model2.tar.gz")
    save_archive(w2, arc2)
    bc2 = broadcast_archive(spark, arc2)
    via_arc2 = extract_triples(pages, from_html=True,
                               weights_bc=bc2).toPandas()
    assert (via_arc2["kind"] == "event").sum() == 0
    assert (base["kind"] == "event").sum() > 0


def test_task_losses_matches_numpy_oracle(spark):
    """M11 parity: the distributed loss rows equal the single-process
    numpy path EXACTLY (same kernel, per-doc rows, no cross-partition
    accumulation), and teacher forcing sanity holds — gold that
    matches the model's own decode scores a strictly lower NER NLL
    than a label-rotated corruption of the same gold."""
    import json

    import duckdb

    from dygiepp_spark import config as C
    from dygiepp_spark.kernel.model import decode_document
    from dygiepp_spark.kernel.weights import get_weights
    from dygiepp_spark.operators.loss import loss_rows, task_losses
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    docs = con.execute(
        f"select doc_id, text from read_parquet("
        f"'{SF_SMOKE}/documents.parquet') order by doc_id limit 40"
    ).fetchall()
    con.close()
    w = get_weights()

    # gold = the model's OWN decode (teacher forcing: the reachable,
    # maximally-agreeing gold)
    def self_gold(url, text):
        d = decode_document(url, text, w)
        return {
            "ner": [(s, e, lab) for _, s, e, lab, _ in d["mentions"]],
            "relations": [(s1, e1, s2, e2, lab) for _, s1, e1, s2, e2,
                          lab, _ in d["relations"]],
            "triggers": [(t, lab) for _, t, lab, _ in d["triggers"]],
            "args": [],
        }

    golds = {f"doc://{i}": self_gold(f"doc://{i}", t) for i, t in docs}
    rows_np = []
    for (i, t) in docs:
        rows_np.extend(loss_rows(f"doc://{i}", t, golds[f"doc://{i}"], w))

    sdf = spark.createDataFrame(
        [(f"doc://{i}", t, json.dumps(golds[f"doc://{i}"]))
         for i, t in docs],
        "url string, text string, gold_json string")
    rows_spark = [tuple(r) for r in
                  task_losses(sdf).orderBy("url", "task").collect()]
    assert sorted(rows_np) == sorted(rows_spark)

    # corrupt: rotate every gold NER label by one -> NER NLL must rise
    # (on the first doc whose decode emits any mention)
    url0, t0 = next((f"doc://{i}", t) for i, t in docs
                    if golds[f"doc://{i}"]["ner"])
    g_ok = golds[url0]
    rot = {lab: C.NER_LABELS[(C.NER_LABELS.index(lab) % 4) + 1]
           for lab in C.NER_LABELS[1:]}
    g_bad = dict(g_ok)
    g_bad["ner"] = [(s, e, rot[lab]) for s, e, lab in g_ok["ner"]]
    nll_ok = dict((r[1], r[3]) for r in loss_rows(url0, t0, g_ok, w))
    nll_bad = dict((r[1], r[3]) for r in loss_rows(url0, t0, g_bad, w))
    assert nll_bad["ner"] > nll_ok["ner"]
    assert nll_bad["trigger"] == nll_ok["trigger"]  # untouched head
