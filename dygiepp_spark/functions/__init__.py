"""Public function surface of the engine.

- SQL-registerable pandas UDFs: functions.text.register_all(spark)
- Column-expression helpers (no UDF): re-exported from operators.
"""

from dygiepp_spark.functions.text import (extract_text_udf,  # noqa: F401
                                          register_all,
                                          sentences_udf,
                                          span_count_udf,
                                          token_count_udf)
from dygiepp_spark.operators.dedup import word_shingles  # noqa: F401
