"""spark-submit entrypoint for the corpus-cleaning funnel.

The training-data-pipeline submission form:

    spark-submit --py-files dygiepp_spark.zip jobs/clean_corpus.py \
        --in /root/testdata/sf0.01/documents.parquet \
        --out /tmp/clean_docs \
        [--min-tokens 16] [--langs en,de] [--near-dup-jaccard 0.9]

Runs operators/corpus_pipeline.clean_corpus (quality -> language ->
exact dedup -> LSH-blocked near dedup), writes the surviving corpus
as parquet, and prints one JSON line of funnel stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_path", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-tokens", type=int, default=16)
    ap.add_argument("--max-stop-ratio", type=float, default=0.5)
    ap.add_argument("--min-avg-tok-len", type=float, default=2.0)
    ap.add_argument("--langs", default=None,
                    help="comma-separated allow-list; omit = keep all")
    ap.add_argument("--near-dup-jaccard", type=float, default=0.9)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    from dygiepp_spark.plans.session import bootstrap_session
    spark = bootstrap_session("clean-corpus")

    from dygiepp_spark.operators.corpus_pipeline import clean_corpus
    docs = spark.read.parquet(args.in_path)
    langs = tuple(args.langs.split(",")) if args.langs else None
    clean, stats = clean_corpus(
        docs, min_tokens=args.min_tokens,
        max_stop_ratio=args.max_stop_ratio,
        min_avg_tok_len=args.min_avg_tok_len,
        langs=langs, near_dup_jaccard=args.near_dup_jaccard)
    clean.write.mode("overwrite").parquet(args.out)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
