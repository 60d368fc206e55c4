"""UDF / UDAF / UDTF surface — the escape hatches, used deliberately.

The engine's rule (SURVEY.md §1.2): UDFs are the slow path. These four keys
exist to prove the extension surface works, each shaped the way you'd
actually ship it at scale — Arrow-batched pandas UDFs over row-at-a-time
Python wherever possible. Row-at-a-time @udf appears exactly once
(udf_scalar) as the demonstration of what to avoid in hot paths.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import IntegerType

from ..registry import register
from ..sources.loader import load_table
from .wordcount import tokens


@register(
    "udf_scalar",
    oracle=(
        "WITH w AS (SELECT word, count(*) AS cnt FROM ("
        "  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents"
        ") WHERE word <> '' GROUP BY word) "
        "SELECT word, cnt, "
        "CAST(length(word) - length(regexp_replace(word, '[aeiou]', '', 'g')) AS INTEGER) "
        "AS n_vowels FROM w"
    ),
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python scalar UDF (vowel count per distinct word).

    Deliberately applied AFTER the aggregation so Python sees only the
    31-row vocabulary, not the token stream — the pattern for making an
    unavoidable row UDF harmless at scale."""

    # no type hints: `word: str -> int` trips the Arrow eval-type inference
    # (UNSUPPORTED_SIGNATURE warning) — this is deliberately a classic row UDF
    @udf(returnType=IntegerType())
    def n_vowels(word):
        return sum(1 for ch in word if ch in "aeiou")

    wc = tokens(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))
    return wc.select("word", "cnt", n_vowels("word").alias("n_vowels"))


@register(
    "udf_pandas",
    oracle=(
        "SELECT c_custkey, round(ln(1 + abs(c_acctbal)), 6) AS log_bal "
        "FROM customer"
    ),
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow-batched) pandas UDF — series in, series out; the
    10-100× faster alternative to row-at-a-time Python."""

    @pandas_udf("double")
    def log1p_abs(s: pd.Series) -> pd.Series:
        import numpy as np

        return np.log1p(s.abs())

    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", F.round(log1p_abs("c_acctbal"), 6).alias("log_bal")
    )


@register(
    "udaf_pandas",
    oracle=(
        "SELECT o_orderstatus, round(exp(avg(ln(o_totalprice))), 4) AS geo_mean, "
        "count(*) AS n FROM orders GROUP BY o_orderstatus"
    ),
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (geometric mean) via applyInPandas — the grouped-map
    form Spark ships custom UDAFs in. Each group arrives as one pandas
    DataFrame; the group key shuffle is the only exchange."""
    import numpy as np

    o = load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")

    def geo_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "geo_mean_raw": [float(np.exp(np.mean(np.log(pdf["o_totalprice"]))))],
                "n": [len(pdf)],
            }
        )

    # Round with F.round (HALF_UP, matching DuckDB) — Python/numpy round()
    # is banker's rounding and can differ at exact .5 boundaries.
    return (
        o.groupBy("o_orderstatus")
        .applyInPandas(geo_mean, schema="o_orderstatus string, geo_mean_raw double, n long")
        .select(
            "o_orderstatus", F.round("geo_mean_raw", 4).alias("geo_mean"), "n"
        )
    )


# ROUND-10 ORACLE (written + tested in round 9, registration deferred —
# the r9 window is exactly full): the demonstration UDTF's OUTPUT is plain
# relational algebra (10 decile rows per lang, integer-floor budget), so
# the oracle states the expected result even though DuckDB has no UDTF.
# FLIPPED to oracle=UDTF_PYTHON_ORACLE in round 10.
UDTF_PYTHON_ORACLE = (
    "WITH s AS ("
    "  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars "
    "  FROM documents GROUP BY lang"
    ") SELECT lang, CAST(d AS INT) AS decile, "
    "CAST(total_chars // 10 AS BIGINT) AS char_budget "
    "FROM (SELECT lang, total_chars, unnest(generate_series(0, 9)) AS d FROM s)"
)


@register("udtf_python", oracle=UDTF_PYTHON_ORACLE)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+): one row in, many rows out — expands each
    (lang, source) group row into per-decile synthetic budget rows.
    Rows-only check: table functions aren't in the oracle's SQL dialect."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang: string, decile: int, char_budget: long")
    class BudgetSplit:
        def eval(self, lang: str, total_chars: int):
            for d in range(10):
                yield lang, d, total_chars // 10

    stats = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.sum("n_chars").alias("total_chars"))
    )
    stats.createOrReplaceTempView("pmrwc_lang_stats")
    spark.udtf.register("pmrwc_budget_split", BudgetSplit)
    return spark.sql(
        "SELECT t.lang, t.decile, t.char_budget "
        "FROM pmrwc_lang_stats s, LATERAL pmrwc_budget_split(s.lang, s.total_chars) t"
    )
