"""M11: distributed multi-task evaluation loss.

The corpus-scale "how far is this frozen model from this gold"
measurement (ref:dygie/models/dygie.py forward loss accumulation, run
in evaluation mode — training stays out of scope per SURVEY §2.8).
Per document, `kernel/model.py::loss_document` computes each task
head's candidate count and summed NLL; this operator fans it out the
same way extraction does — ONE mapInPandas, zero shuffles, weights
rebuilt once per worker — so the loss sweep scales exactly like the
decode sweep.

Determinism: every per-doc row is produced by one worker running the
same float32 fixed-order kernel the oracle runs, so Spark rows equal
the single-process numpy rows EXACTLY (tested in
tests/test_operators.py::test_task_losses_matches_numpy_oracle).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

LOSS_SCHEMA = ("url string, task string, n_items bigint, "
               "nll double, mean_nll double")

_TASKS = ("ner", "relation", "trigger", "arg")


def loss_rows(url: str, text: str, gold: dict, w: dict) -> list[tuple]:
    """(url, task, n_items, nll, mean_nll) rows for one document —
    shared by the Spark operator and the numpy oracle path."""
    from dygiepp_spark.kernel.model import loss_document
    res = loss_document(url, text, gold, w)
    rows = []
    for task in _TASKS:
        t = res[task]
        mean = t["nll"] / t["n"] if t["n"] else 0.0
        rows.append((url, task, int(t["n"]), float(t["nll"]),
                     float(mean)))
    return rows


def task_losses(docs: DataFrame, url_col: str = "url",
                text_col: str = "text",
                gold_col: str = "gold_json") -> DataFrame:
    """docs: (url, text, gold_json) where gold_json is the JSON form
    of loss_document's gold dict. Returns one row per (doc, task)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dygiepp_spark.kernel.weights import get_weights
        w = get_weights()
        for pdf in batches:
            rows: list[tuple] = []
            for r in pdf.itertuples(index=False):
                gold = json.loads(getattr(r, gold_col) or "{}")
                rows.extend(loss_rows(getattr(r, url_col),
                                      getattr(r, text_col), gold, w))
            yield pd.DataFrame(
                rows, columns=["url", "task", "n_items", "nll",
                               "mean_nll"])

    return (docs.select(url_col, text_col, gold_col)
            .mapInPandas(run, LOSS_SCHEMA))
