"""spark-submit entrypoint for the KG construction pipeline.

The north_star submission form:

    spark-submit --py-files dygiepp_spark.zip jobs/run_kg.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/kg_out \
        [--no-resume] [--parallelism 96] [--partitions 8]

On a cluster the session comes from spark-submit's conf (master,
executors); this script only sets semantics-bearing conf (timezone,
Arrow) and runs plans/pipeline.run_kg. Local fallback for the sandbox:
builds a local[*] session when run as a plain python script.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--bucketed", action="store_true",
                    help="also persist triples+mentions co-bucketed "
                         "by url and write the coverage rollup")
    ap.add_argument("--model-archive", default=None,
                    help="model.tar.gz to broadcast for the decode "
                         "(default: the seeded fixture)")
    args = ap.parse_args()

    # --py-files puts the zip on sys.path for the driver too; the
    # repo-root fallback covers plain `python jobs/run_kg.py`.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    from dygiepp_spark.plans.session import bootstrap_session
    spark = bootstrap_session("kg-construct")

    from dygiepp_spark.plans.pipeline import run_kg
    metrics = run_kg(spark, args.sf_dir, args.out,
                     resume=not args.no_resume,
                     parallelism=args.parallelism,
                     bucketed=args.bucketed,
                     weights_archive=args.model_archive)
    print(json.dumps(metrics, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
