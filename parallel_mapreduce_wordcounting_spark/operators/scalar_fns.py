"""Scalar function families — string, date/time, math, conditional, array,
map, json. One query per family, each exercising several functions.

All JVM-side built-ins (whole-stage codegen; no Python in the hot path).
Types are aligned with the DuckDB oracle explicitly where the engines'
return types differ (Spark ceil→BIGINT vs DuckDB DOUBLE, Spark size→INT vs
DuckDB len→BIGINT, DuckDB bare decimals → cast to DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, MapType, StringType

from ..registry import register
from ..sources.loader import load_table


@register(
    "fn_string",
    oracle=(
        "SELECT p_partkey, "
        "upper(p_name) AS name_u, "
        "lower(p_brand) AS brand_l, "
        "substring(p_name, 1, 5) AS name5, "
        "CAST(length(p_name) AS INTEGER) AS name_len, "
        "concat_ws('-', p_brand, p_type) AS brand_type, "
        "replace(p_name, ' ', '_') AS name_us, "
        "lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad, "
        "regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel, "
        "regexp_extract(p_name, '^(\\w+)', 1) AS first_word, "
        "trim(concat(' ', p_name, ' ')) AS name_trim "
        "FROM part"
    ),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_u"),
        F.lower("p_brand").alias("brand_l"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_pad"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
    )


@register(
    "fn_date",
    oracle=(
        "SELECT o_orderkey, "
        "CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo, "
        "CAST(day(o_orderdate) AS INTEGER) AS dom, "
        "CAST(quarter(o_orderdate) AS INTEGER) AS qtr, "
        "CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow, "
        "CAST(weekofyear(o_orderdate) AS INTEGER) AS woy, "
        "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, "
        "CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since, "
        "CAST(o_orderdate AS DATE) + 30 AS plus_30, "
        "last_day(CAST(o_orderdate AS DATE)) AS month_end, "
        "CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s "
        "FROM orders"
    ),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        # Spark dayofweek: 1=Sunday..7; DuckDB dayofweek: 0=Sunday..6 → +1
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_add(F.col("o_orderdate"), 30).alias("plus_30"),
        F.last_day("o_orderdate").alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "fn_math",
    oracle=(
        "SELECT o_orderkey, "
        "round(abs(o_totalprice - 50000.0), 2) AS abs_dev, "
        "CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil, "
        "CAST(floor(o_totalprice) AS BIGINT) AS price_floor, "
        "round(sqrt(o_totalprice), 6) AS price_sqrt, "
        "round(power(o_totalprice / 1000.0, 2), 6) AS price_pow, "
        "round(ln(o_totalprice), 6) AS price_ln, "
        "round(log10(o_totalprice), 6) AS price_log10, "
        "round(exp(o_totalprice / 100000.0), 6) AS price_exp, "
        "CAST(sign(o_totalprice - 50000.0) AS DOUBLE) AS price_sign, "
        "o_orderkey % 7 AS key_mod "
        "FROM orders"
    ),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.abs(x - 50000.0), 2).alias("abs_dev"),
        F.ceil(x).alias("price_ceil"),
        F.floor(x).alias("price_floor"),
        F.round(F.sqrt(x), 6).alias("price_sqrt"),
        F.round(F.pow(x / 1000.0, 2), 6).alias("price_pow"),
        F.round(F.log(x), 6).alias("price_ln"),
        F.round(F.log10(x), 6).alias("price_log10"),
        F.round(F.exp(x / 100000.0), 6).alias("price_exp"),
        F.signum(x - 50000.0).alias("price_sign"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


@register(
    "fn_cond",
    oracle=(
        "SELECT c_custkey, "
        "CASE WHEN c_acctbal >= 5000.0 THEN 'high' WHEN c_acctbal >= 0.0 THEN 'mid' "
        "ELSE 'neg' END AS tier, "
        "coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other, "
        "round(greatest(c_acctbal, 0.0), 2) AS bal_pos, "
        "round(least(c_acctbal, 1000.0), 2) AS bal_cap "
        "FROM customer"
    ),
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    b = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(b >= 5000.0, "high").when(b >= 0.0, "mid").otherwise("neg").alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.round(F.greatest(b, F.lit(0.0)), 2).alias("bal_pos"),
        F.round(F.least(b, F.lit(1000.0)), 2).alias("bal_cap"),
    )


@register(
    "fn_array",
    oracle=(
        "SELECT vec_id, "
        "CAST(len(embedding) AS INTEGER) AS dim, "
        "round(CAST(embedding[1] AS DOUBLE), 6) AS first_val, "
        "round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) "
        "AS norm_sq, "
        "CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos "
        "FROM embeddings"
    ),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column: size, subscript, a
    zip-free dot-product-with-self via aggregate+transform, lambda filter.
    Vectors are L2-normalized so norm_sq rounds to 1.0 — a built-in checksum."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(
                F.transform(
                    F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("norm_sq"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
    )


@register(
    "fn_nulls",
    oracle=(
        "WITH e AS (SELECT event_id, "
        "CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS et, "
        "CASE WHEN value < 1.0 THEN NULL ELSE value END AS v FROM events) "
        "SELECT event_id, "
        "coalesce(et, 'unknown') AS et_filled, "
        "round(coalesce(v, 0.0), 2) AS v_filled, "
        "(et IS NULL) AS et_was_null, "
        "(et IS NOT NULL AND v IS NOT NULL) AS row_complete "
        "FROM e"
    ),
)
def fn_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null handling: introduce NULLs (nullif/when), then fill (na.fill /
    coalesce) and flag — the fixtures are null-free, so the null paths are
    manufactured to actually execute."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("error")).alias("et"),
        F.when(F.col("value") < 1.0, None).otherwise(F.col("value")).alias("v"),
    )
    filled = e.na.fill({"et": "unknown", "v": 0.0})
    return (
        filled.join(e.select("event_id", F.col("et").alias("et_raw"), F.col("v").alias("v_raw")), "event_id")
        .select(
            "event_id",
            F.col("et").alias("et_filled"),
            F.round("v", 2).alias("v_filled"),
            F.col("et_raw").isNull().alias("et_was_null"),
            (F.col("et_raw").isNotNull() & F.col("v_raw").isNotNull()).alias("row_complete"),
        )
    )


@register(
    "fn_struct",
    oracle=(
        "SELECT o_orderkey, o_orderstatus AS status, "
        "round(o_totalprice, 2) AS price, CAST(year(o_orderdate) AS INTEGER) AS yr "
        "FROM orders WHERE round(o_totalprice, 2) > 200000.0"
    ),
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type surface: pack columns into a struct, filter through the
    nested field, project fields back out (output stays flat so the oracle
    compares scalar-for-scalar)."""
    o = load_table(spark, sf_dir, "orders")
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 2).alias("price"),
            F.year("o_orderdate").alias("yr"),
        ).alias("info"),
    )
    return nested.where(F.col("info.price") > 200000.0).select(
        "o_orderkey",
        F.col("info.status").alias("status"),
        F.col("info.price").alias("price"),
        F.col("info.yr").alias("yr"),
    )


@register(
    "fn_map",
    oracle=(
        "SELECT event_id, "
        "CAST(regexp_extract(props, '\"k\":\\s*(\\d+)', 1) AS INTEGER) AS k_val, "
        "props LIKE '%\"k\"%' AS has_k "
        "FROM events"
    ),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props → MapType → element_at. The oracle extracts the same value
    with a regex to avoid depending on DuckDB's json extension."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), MapType(StringType(), IntegerType()))
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.col("props").like('%"k"%').alias("has_k"),
    )


@register(
    "fn_json",
    oracle=(
        "SELECT event_id, "
        "regexp_extract(props, '\"k\":\\s*(\\d+)', 1) AS k_str, "
        "CAST(regexp_extract(props, '\"k\":\\s*(\\d+)', 1) AS INTEGER) + 1 AS k_plus "
        "FROM events"
    ),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        (F.get_json_object("props", "$.k").cast("int") + 1).alias("k_plus"),
    )
