"""Registerable SQL functions — the engine's UDF surface for SQL users.

`register_all(spark)` exposes the X1/X2 kernel functions to Spark SQL
(`SELECT kg_extract_text(html), kg_token_count(text) FROM pages`), all
Arrow-vectorized pandas UDFs (SURVEY.md §2.11: no per-row Python).
Column-expression helpers that need no UDF (shingles, cosine) live in
the operators and are re-exported from dygiepp_spark.functions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@F.pandas_udf("string")
def extract_text_udf(html: pd.Series) -> pd.Series:
    """X1: html binary -> byte-identical text (kernel rule)."""
    from dygiepp_spark.kernel.tokenize import extract_text
    return html.map(extract_text)


@F.pandas_udf("int")
def token_count_udf(text: pd.Series) -> pd.Series:
    """X2 token count via the kernel tokenizer (prefer the pure-JVM
    `size(split(...))` in hot paths; this exists for SQL parity with
    the kernel's exact rule, blanks included)."""
    from dygiepp_spark.kernel.tokenize import tokenize
    return text.map(lambda t: len(tokenize(t))).astype("int32")


@F.pandas_udf("array<array<string>>")
def sentences_udf(text: pd.Series) -> pd.Series:
    """X2: text -> Document.sentences shape (list of token lists)."""
    from dygiepp_spark.kernel.tokenize import doc_to_sentences
    return text.map(doc_to_sentences)


@F.pandas_udf("int")
def span_count_udf(text: pd.Series) -> pd.Series:
    """M2 count invariant per document (enumeration-free closed form
    over the kernel's actual sentence splits — exact for any text,
    punctuated or not)."""
    from dygiepp_spark.kernel.spans import span_count
    from dygiepp_spark.kernel.tokenize import doc_to_sentences
    return text.map(
        lambda t: sum(span_count(len(s)) for s in doc_to_sentences(t))
    ).astype("int32")


def register_all(spark: SparkSession) -> None:
    """Make the kernel functions callable from Spark SQL."""
    spark.udf.register("kg_extract_text", extract_text_udf)
    spark.udf.register("kg_token_count", token_count_udf)
    spark.udf.register("kg_sentences", sentences_udf)
    spark.udf.register("kg_span_count", span_count_udf)
