"""Embedding-corpus diagnostics: per-label centroids and the pairwise
similarity histogram — the tooling for choosing ANN/near-dup thresholds
(the 0.45/0.6 cutoffs elsewhere in this engine came from exactly these
distributions).

Scale: sim_centroid is one posexplode + groupBy (shuffles on (label, pos) —
64·n_labels keys, tiny); sim_pair_hist demonstrates the histogram contract
on a bounded id-range slice; its full-corpus form is the block-grid GEMM of
similarity.grid_pair_sims_above feeding the same bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table
from .similarity import _DOT_ORACLE, dot


@register(
    "sim_centroid",
    oracle=(
        "SELECT label, CAST(i - 1 AS INTEGER) AS pos, "
        "round(sum(CAST(embedding[i] AS DOUBLE)) / count(*), 6) AS centroid_val "
        "FROM embeddings CROSS JOIN generate_series(1, 64) t(i) "
        "GROUP BY label, i"
    ),
)
def sim_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dimension). posexplode turns
    the array column into (pos, val) rows so the mean is a plain groupBy —
    no UDF, no collect; the float32→double casts make both engines sum the
    same doubles (order noise ~1e-15 under the 6-decimal round)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            F.round(
                F.sum(F.col("val").cast("double")) / F.count(F.lit(1)), 6
            ).alias("centroid_val")
        )
    )


@register(
    "sim_pair_hist",
    oracle=(
        "WITH pairs AS (SELECT "
        f"round({_DOT_ORACLE}, 6) AS cosine "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE a.vec_id < 200 AND b.vec_id < 200) "
        "SELECT CAST(floor(cosine * 20) AS BIGINT) AS bucket, "
        "round(CAST(floor(cosine * 20) AS BIGINT) / 20.0, 2) AS bucket_lo, "
        "count(*) AS n_pairs "
        "FROM pairs GROUP BY 1"
    ),
)
def sim_pair_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of pairwise cosines (0.05-wide buckets) over the first 200
    vectors — the threshold-tuning distribution. Bucketing floors the
    already-rounded cosine, so both engines bucket identical values."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    a = e.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("eb"))
    cosine = F.round(dot(F.col("ea"), F.col("eb")), 6)
    bucket = F.floor(cosine * 20)
    return (
        a.join(b, F.col("ida") < F.col("idb"))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_pairs"))
        .withColumn("bucket_lo", F.round(F.col("bucket") / 20.0, 2))
        .select("bucket", "bucket_lo", "n_pairs")
    )


SIM_HARD_NEGATIVES_ORACLE = (
    "WITH sims AS ("
    "  SELECT a.vec_id AS query_id, a.label AS query_label, b.vec_id AS neg_id, "
    "  round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine "
    "  FROM embeddings a JOIN embeddings b"
    "  ON a.vec_id < 20 AND b.vec_id >= 20 AND a.label <> b.label"
    ") SELECT query_id, neg_id, cosine FROM ("
    "  SELECT query_id, neg_id, cosine, row_number() OVER ("
    "    PARTITION BY query_id ORDER BY cosine DESC, neg_id) AS rk FROM sims"
    ") WHERE rk <= 3"
)


@register("sim_hard_negatives", oracle=SIM_HARD_NEGATIVES_ORACLE, tier="B")
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query vector
    (vec_id < 20), the 3 most-similar corpus vectors carrying a DIFFERENT
    label — the near-misses a triplet/InfoNCE loss learns most from.

    Scale: same broadcast-query shape as sim_knn_query (the query batch is
    small by construction — a training step's worth); the corpus side
    streams through one pass with a per-query top-k window over the
    (tiny) query×k candidate set. For corpus-scale query sets, swap the
    broadcast for the IVF-blocked path (sim_topk_blocked) and keep the
    label-mismatch filter inside the block kernel."""
    from .similarity import dot

    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.where(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("embedding").alias("q_emb"),
        )
    )
    corpus = e.where(F.col("vec_id") >= 20)
    sims = (
        corpus.crossJoin(q)
        .where(F.col("label") != F.col("query_label"))
        .select(
            "query_id",
            F.col("vec_id").alias("neg_id"),
            F.round(dot(F.col("embedding"), F.col("q_emb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neg_id")
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("query_id", "neg_id", "cosine")
    )


# --- int8 embedding quantization --------------------------------------------

SIM_QUANTIZE_ORACLE = (
    "WITH v AS (SELECT vec_id, "
    "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings), "
    "s AS (SELECT vec_id, e, "
    "  greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) / 127.0 AS scale FROM v), "
    "q AS (SELECT vec_id, e, scale, "
    "  list_transform(e, x -> CAST(round(x / scale) AS INTEGER)) AS qvec FROM s) "
    "SELECT vec_id, qvec, round(scale, 9) AS scale_r, "
    "round(list_sum(list_transform(e, (x, i) -> pow(x - qvec[i] * scale, 2))) / len(e), 9) "
    "AS mse_r FROM q"
)


@register("sim_quantize_int8", oracle=SIM_QUANTIZE_ORACLE, tier="B")
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column:
    scale = max|x|/127, q = round(x/scale), plus the reconstruction MSE —
    the 4x storage/bandwidth compression every 100 TB embedding store
    applies before ANN serving (IVF/PQ systems re-rank against these
    int8 codes and only fetch float vectors for the final top-k).

    Scale: pure array-lambda expressions (transform/aggregate/zip_with),
    zero shuffles, linear. The float32 -> float64 casts are exact, scale is
    the same double on both engines, and round() ties (x/scale landing on
    exactly k + 0.5) cannot occur for these irrational ratios — so qvec is
    bit-identical cross-engine and the 9-decimal rounds on scale/MSE only
    absorb summation-order noise below 1e-15."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    e = e.withColumn(
        "scale",
        F.greatest(F.array_max(F.transform("e", F.abs)), F.lit(1e-30)) / 127.0,
    )
    e = e.withColumn(
        "qvec",
        F.transform("e", lambda x: F.round(x / F.col("scale")).cast("int")),
    )
    sq_err = F.zip_with(
        "e", "qvec", lambda x, q: F.pow(x - q.cast("double") * F.col("scale"), 2)
    )
    return e.select(
        "vec_id",
        "qvec",
        F.round("scale", 9).alias("scale_r"),
        F.round(
            F.aggregate(sq_err, F.lit(0.0), lambda acc, t: acc + t)
            / F.size("e"),
            9,
        ).alias("mse_r"),
    )
