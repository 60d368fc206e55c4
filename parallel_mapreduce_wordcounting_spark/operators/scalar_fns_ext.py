"""Scalar-function extensions: cryptographic hashes/fingerprints, regex
multi-extraction, bitwise operators, and trigonometry — rounding out the
§2 function surface in scalar_fns.py.

All JVM-side built-ins inside whole-stage codegen; no UDFs. Hash functions
(md5/sha256) are bit-identical across engines by specification, which makes
fn_hash the strongest cross-engine check in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table


@register(
    "fn_hash",
    oracle=(
        "SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256, "
        "CAST(length(md5(text)) AS INTEGER) AS md5_len "
        "FROM documents WHERE doc_id < 100"
    ),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints — md5 and sha-256 hex digests (the exact-dedup
    and cache-key primitives; both lowercase-hex by spec on both engines)."""
    d = load_table(spark, sf_dir, "documents")
    return d.where(F.col("doc_id") < 100).select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.length(F.md5("text")).alias("md5_len"),
    )


@register(
    "fn_regexp_extract_all",
    oracle=(
        "SELECT doc_id, "
        "array_to_string(regexp_extract_all(text, '[a-z]*a[a-z]*'), ',') AS a_words, "
        "CAST(len(regexp_extract_all(text, '[a-z]*a[a-z]*')) AS INTEGER) AS n_a_words "
        "FROM documents WHERE doc_id < 50"
    ),
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All matches of a pattern per document (tokens containing 'a') — the
    multi-match sibling of fn_string's single regexp_extract. Greedy
    leftmost matching gives identical match sets on Java regex and RE2 for
    this alternation-free pattern. The match list is emitted comma-joined
    (order-preserving) because the driver's value-hash needs hashable cells
    — same convention as agg_collect."""
    d = load_table(spark, sf_dir, "documents")
    matches = F.regexp_extract_all("text", F.lit("[a-z]*a[a-z]*"), 0)
    return d.where(F.col("doc_id") < 50).select(
        "doc_id",
        F.concat_ws(",", matches).alias("a_words"),
        F.size(matches).alias("n_a_words"),
    )


@register(
    "fn_bits",
    oracle=(
        "SELECT o_orderkey, "
        "o_orderkey << 3 AS shl, "
        "o_orderkey >> 2 AS shr, "
        "o_orderkey & 255 AS low_byte, "
        "o_orderkey | 4096 AS with_flag, "
        "xor(o_orderkey, o_custkey) AS key_xor, "
        "~o_orderkey AS inverted "
        "FROM orders WHERE o_orderkey < 500"
    ),
)
def fn_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise shift/and/or/xor/not on 64-bit keys — two's-complement
    semantics match exactly across engines."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.where(k < 500).select(
        "o_orderkey",
        F.shiftleft(k, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.bitwise_not(k).alias("inverted"),
    )


@register(
    "fn_trig",
    oracle=(
        "SELECT p_partkey, "
        "round(sin(p_size / 10.0), 6) AS sin_v, "
        "round(cos(p_size / 10.0), 6) AS cos_v, "
        "round(atan2(p_size, p_retailprice / 100.0), 6) AS angle, "
        "round(degrees(atan2(p_size, p_retailprice / 100.0)), 6) AS angle_deg, "
        "round(radians(p_size), 6) AS size_rad "
        "FROM part WHERE p_partkey < 200"
    ),
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric surface (sin/cos/atan2/degrees/radians). Inputs are
    exact small rationals; libm differences live at the final-ulp (1e-17)
    level, absorbed by 6-decimal rounding."""
    p = load_table(spark, sf_dir, "part")
    x = F.col("p_size") / 10.0
    angle = F.atan2(F.col("p_size").cast("double"), F.col("p_retailprice") / 100.0)
    return p.where(F.col("p_partkey") < 200).select(
        "p_partkey",
        F.round(F.sin(x), 6).alias("sin_v"),
        F.round(F.cos(x), 6).alias("cos_v"),
        F.round(angle, 6).alias("angle"),
        F.round(F.degrees(angle), 6).alias("angle_deg"),
        F.round(F.radians(F.col("p_size").cast("double")), 6).alias("size_rad"),
    )


FN_URL_ORACLE = (
    "WITH u AS ("
    "  SELECT doc_id, 'https://' || source || '.example.com/docs/' ||"
    "         CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url"
    "  FROM documents"
    ") SELECT doc_id, url, "
    "regexp_extract(url, 'https://([^/]+)/', 1) AS host, "
    "regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path, "
    "regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_param "
    "FROM u"
)


@register("fn_url", oracle=FN_URL_ORACLE)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family (host / path / query-param extraction) — the
    first step of every crawl-curation pipeline (domain blocklists, per-host
    rate stats, URL dedup keys). URLs are synthesized deterministically
    from the fixture so the oracle mirrors byte-for-byte; extraction uses
    regexp groups (identical semantics both engines) rather than
    Spark-only parse_url, and the whole op is codegen expressions with no
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        "url",
        F.regexp_extract("url", "https://([^/]+)/", 1).alias("host"),
        F.regexp_extract("url", "https://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", "lang=([a-z]+)", 1).alias("lang_param"),
    )


FN_UUID_STABLE_ORACLE = (
    "WITH h AS (SELECT doc_id, md5(text) AS x FROM documents) "
    "SELECT doc_id, substr(x,1,8) || '-' || substr(x,9,4) || '-' || "
    "substr(x,13,4) || '-' || substr(x,17,4) || '-' || substr(x,21,12) "
    "AS content_uuid FROM h"
)


@register("fn_uuid_stable", oracle=FN_UUID_STABLE_ORACLE)
def fn_uuid_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed stable IDs: a UUID-shaped identifier derived from
    md5(text), identical across runs, partitionings, and engines — what a
    training-data lake uses as the record key so re-crawls of the same
    content collide instead of duplicating (Spark's builtin uuid() is
    random per run and unusable as a stable key). Zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    x = F.md5(F.col("text"))
    return d.select(
        "doc_id",
        F.concat_ws(
            "-",
            F.substring(x, 1, 8),
            F.substring(x, 9, 4),
            F.substring(x, 13, 4),
            F.substring(x, 17, 4),
            F.substring(x, 21, 12),
        ).alias("content_uuid"),
    )


FN_TRY_ARITH_ORACLE = (
    "SELECT l_orderkey, l_linenumber, "
    "CASE WHEN l_quantity - 10 = 0 THEN NULL "
    "     ELSE round(l_extendedprice / (l_quantity - 10), 6) END AS safe_ratio, "
    "TRY_CAST(l_returnflag AS INTEGER) AS flag_num, "
    "CASE WHEN l_quantity - 10 = 0 THEN NULL "
    "     ELSE CAST(floor(l_extendedprice) AS BIGINT) % CAST(l_quantity - 10 AS BIGINT) END AS safe_mod "
    "FROM lineitem WHERE l_orderkey % 10 = 0"
)


@register("fn_try_arith", oracle=FN_TRY_ARITH_ORACLE)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface: try_divide / try_cast / try_mod turn
    would-be runtime errors (division by zero, bad casts) into NULLs — the
    ANSI-mode answer to "one poison row kills a 9-hour job". At 100 TB you
    can't pre-validate every row; try_* keeps the pipeline total while the
    NULL count becomes the data-quality metric.

    The fixture's l_quantity hits 10 often, so the zero denominator
    actually occurs; the oracle mirrors each try_* with its explicit
    CASE/TRY_CAST DuckDB equivalent. Pure codegen expressions, no
    shuffle."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    denom = F.col("l_quantity") - 10
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", denom), 6).alias("safe_ratio"),
        F.try_to_number("l_returnflag", F.lit("9")).cast("int").alias("flag_num"),
        # floor() on both sides: a bare double->long CAST truncates in
        # Spark but rounds in DuckDB
        F.try_mod(F.floor("l_extendedprice"), denom.cast("long")).alias("safe_mod"),
    )


FN_MASK_ORACLE = (
    "SELECT c_custkey, "
    "regexp_replace(regexp_replace(regexp_replace(c_name, "
    "'[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked_name, "
    "CASE WHEN length(c_name) > 4 "
    "     THEN repeat('*', length(c_name) - 4) || right(c_name, 4) "
    "     ELSE c_name END AS last4 "
    "FROM customer WHERE c_custkey % 50 = 0"
)


@register("fn_mask", oracle=FN_MASK_ORACLE)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-masking surface: ``mask()`` (Spark 3.4+ — upper->X, lower->x,
    digit->n, punctuation kept; the oracle mirrors it with three regexp
    passes, probed identical) plus the show-last-4 redaction pattern every
    PII-bearing column export uses. Both are pure codegen string
    expressions — masking at 100 TB is a free rider on the export scan,
    which is why column-level masking policies compile to exactly this."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 50 == 0)
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_name"),
        F.when(
            F.length("c_name") > 4,
            F.concat(
                F.repeat(F.lit("*"), F.length("c_name") - 4),
                F.substring(F.col("c_name"), -4, 4),
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("last4"),
    )


FN_VARIANT_ORACLE = (
    "SELECT event_id, "
    "CAST(json_extract(props, '$.k') AS INTEGER) AS k, "
    "json_extract_string(props, '$.k') AS k_str, "
    "CAST(json_extract(props, '$.absent') AS INTEGER) AS k_absent "
    "FROM events"
)


@register("fn_variant", oracle=FN_VARIANT_ORACLE)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion: ``parse_json`` → binary variant →
    typed ``variant_get`` extraction (int and string views of the same
    field, NULL for an absent path). Variant is the semi-structured
    answer to "json strings re-parsed by every query": parse once at
    ingest, store the binary form, and every downstream ``variant_get``
    is a cheap typed access instead of a string re-parse — the
    shredded-storage path parquet readers are growing. The oracle mirrors
    with DuckDB's json_extract casts (fn_json covers the string-JSON
    surface; this key pins the variant-typed one)."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'int')").alias("k"),
        F.expr("variant_get(v, '$.k', 'string')").alias("k_str"),
        F.expr("variant_get(v, '$.absent', 'int')").alias("k_absent"),
    )


FN_COLLATE_ORACLE = (
    "WITH n AS (SELECT CASE CAST(doc_id % 3 AS INTEGER) "
    "WHEN 0 THEN upper(source) WHEN 1 THEN source "
    "ELSE upper(substr(source, 1, 1)) || substr(source, 2) END AS name "
    "FROM documents) "
    "SELECT lower(name) AS src_lc, CAST(count(*) AS BIGINT) AS n_docs "
    "FROM n GROUP BY lower(name)"
)


@register("fn_collate", oracle=FN_COLLATE_ORACLE)
def fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: GROUP BY under ``UTF8_LCASE`` — the engine
    compares/hashes case-insensitively at the collation level instead of
    materializing a ``lower()`` shadow column. That matters beyond ASCII
    (locale collations get Turkish-i / ß right where ``lower()`` doesn't)
    and keeps the original-cased value available after grouping. Mixed-case
    source names are synthesized from the fixture (UPPER / as-is /
    Capitalized by doc_id mod 3); output normalizes the group key with
    ``lower`` so both engines emit identical representatives (the collated
    group's surviving spelling is whichever variant the engine saw first —
    deliberately not part of the contract). The oracle groups by plain
    lower(), correct for this ASCII corpus. Same single-exchange hash
    aggregate as any groupBy — collation only changes the key's
    hash/equality functions."""
    d = load_table(spark, sf_dir, "documents")
    name = (
        F.when(F.col("doc_id") % 3 == 0, F.upper("source"))
        .when(F.col("doc_id") % 3 == 1, F.col("source"))
        .otherwise(
            F.concat(F.upper(F.substring("source", 1, 1)), F.expr("substr(source, 2)"))
        )
    )
    return (
        d.select(name.alias("name"))
        .groupBy(F.expr("collate(name, 'UTF8_LCASE')").alias("c"))
        .agg(F.count("*").alias("n_docs"))
        # cast back to the default collation: the collated type must not
        # leak into the output schema (the driver compares schemas exactly)
        .select(F.lower(F.col("c").cast("string")).alias("src_lc"), "n_docs")
    )
