"""Single-process oracle decoder (SURVEY.md §7 step 1, §5.2 test 1).

Stand-in for ``allennlp predict`` (SURVEY.md §3 E1) while
/root/reference is empty: a plain python loop over documents calling
the SAME kernel as the Spark operator. The Spark pipeline's triple
output is compared against this for P/R ≥ 0.95 (target 1.0 — same
math, same tie-breaks).
"""

from __future__ import annotations

import pandas as pd

from dygiepp_spark.kernel.model import triples_rows
from dygiepp_spark.kernel.weights import get_weights

TRIPLE_COLUMNS = [
    "url", "kind", "subj", "pred", "obj",
    "subj_start", "subj_end", "obj_start", "obj_end", "sent_id", "score",
]


def decode_corpus(docs: list[tuple[str, str]], seed: int | None = None) -> pd.DataFrame:
    """docs: list of (url, text). Returns the wide triples DataFrame."""
    w = get_weights() if seed is None else get_weights(seed)
    rows: list[tuple] = []
    for url, text in docs:
        rows.extend(triples_rows(url, text if text is not None else "", w))
    return pd.DataFrame(rows, columns=TRIPLE_COLUMNS)


def triple_prf(pred: pd.DataFrame, gold: pd.DataFrame) -> dict[str, float]:
    """Exact (url, subj, pred, obj) set match — the §2.9 contract
    (J4/U2 semantics: TP = intersect, FP/FN = except)."""
    key = ["url", "subj", "pred", "obj"]
    p = set(map(tuple, pred[key].itertuples(index=False, name=None))) \
        if len(pred) else set()
    g = set(map(tuple, gold[key].itertuples(index=False, name=None))) \
        if len(gold) else set()
    tp = len(p & g)
    precision = tp / len(p) if p else (1.0 if not g else 0.0)
    recall = tp / len(g) if g else 1.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "tp": tp, "n_pred": len(p), "n_gold": len(g)}
