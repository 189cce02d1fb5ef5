from __future__ import annotations

import os
import sys

REPO_FOR_PIN = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_FOR_PIN not in sys.path:
    sys.path.insert(0, REPO_FOR_PIN)
# BLAS pinning must precede the first numpy import in the test
# process (not just in executors): the driver-side oracle must run
# the same single-threaded kernels as the workers or near-tied
# argmaxes diverge. The package __init__ owns the pinned variable
# list — importing it here (before numpy can load) is the single
# source of truth.
import dygiepp_spark  # noqa: F401,E402

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from dygiepp_spark.plans.session import ensure_pyfiles, get_spark
    s = get_spark(app_name="dygiepp-tests", cores=4, shuffle_partitions=4)
    ensure_pyfiles(s)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_docs():
    """(url, text) pairs for sf0.001 via duckdb (no spark needed)."""
    import duckdb
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text, lang, source from "
        f"read_parquet('{SF_SMOKE}/documents.parquet') order by doc_id"
    ).fetchall()
    con.close()
    return [(f"https://{s}.example/{l}/{d}", t) for d, t, l, s in rows]
