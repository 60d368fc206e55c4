"""The word-count core — tier A, the reference's actual pipeline.

The reference repo (``parallel_mapreduce_wordCounting``) is the canonical
MapReduce word count: map = tokenize + emit (word, 1); combine = map-side
pre-sum; shuffle = hash-partition by word; reduce = sum per word; output =
(word, count), optionally top-k (SURVEY.md §3.1 — reconstructed from public
MapReduce semantics; the reference tree is empty, SURVEY.md §0).

Spark-first expression: ``explode(split(...))`` + ``groupBy().count()``
compiles to exactly that MR plan — Generate/Filter (map), partial
HashAggregate (combiner), Exchange hashpartitioning(word) (shuffle), final
HashAggregate (reduce), TakeOrderedAndProject (top-k without a global sort).
Verified with .explain("formatted") on Spark 4.1.2 (SURVEY.md §3.2).

100 TB notes: a word shuffle skews on hot words ("the"); AQE skew handling is
on session-wide, and the partial aggregate absorbs most of the skew map-side
(hot words collapse to one row per map partition before the shuffle).
Top-k never global-sorts: TakeOrderedAndProject keeps a k-row heap per
partition and merges on the driver.
"""

from __future__ import annotations

from operator import add

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table

#: Stopwords drawn from the fixture's 31-token vocabulary (FIXTURES.md).
STOPWORDS = ("the", "a")

#: DuckDB CTE mirroring :func:`tokens` — shared by the word-count oracles.
TOKS_CTE = """WITH toks AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents
  ) WHERE word <> ''
)"""


def tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The map phase: one row per (doc_id, token), lowercased, empties dropped.

    The fixture corpus is single-space separated (FIXTURES.md), so a literal
    space split plus an empty filter is equivalent to ``\\s+`` splitting —
    and matches DuckDB's ``string_split`` exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
    ).where(F.col("word") != "")


@register(
    "scan_text",
    oracle="SELECT text AS value FROM documents",
    tier="A",
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-line scan — the reference's input format, served from the
    ``documents`` fixture (parquet scan prunes to the single ``text`` column)."""
    return load_table(spark, sf_dir, "documents").select(F.col("text").alias("value"))


@register(
    "wc_tokenize",
    oracle=f"{TOKS_CTE} SELECT doc_id, word FROM toks",
    tier="A",
)
def wc_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokens(spark, sf_dir)


@register(
    "wc_counts",
    oracle=f"{TOKS_CTE} SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word",
    tier="A",
)
def wc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MR pipeline: partial agg (combiner) → shuffle on word → final agg."""
    return tokens(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))


@register(
    "wc_topk",
    oracle=f"{TOKS_CTE} SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word "
    "ORDER BY cnt DESC, word LIMIT 10",
    tier="A",
)
def wc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 words; ``word`` is the unique tiebreaker so the returned *set*
    is deterministic on both engines (SURVEY.md §5.2)."""
    return (
        wc_counts(spark, sf_dir)
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(10)
    )


@register(
    "wc_rdd",
    oracle=f"{TOKS_CTE} SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word",
    tier="A",
)
def wc_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reduceByKey formulation named by the brief — kept as the one RDD
    demonstration artifact (everything else is DataFrame-first).

    ``reduceByKey`` map-side-combines before the shuffle, mirroring the MR
    combiner. Results are converted back to a DataFrame to declare a schema.
    """
    texts = load_table(spark, sf_dir, "documents").select("text").rdd
    counts = (
        texts.flatMap(lambda row: row.text.lower().split(" "))
        .filter(lambda w: w != "")
        .map(lambda w: (w, 1))
        .reduceByKey(add)
    )
    return spark.createDataFrame(counts, schema="word string, cnt long")


@register(
    "wc_per_doc",
    oracle=f"{TOKS_CTE} SELECT doc_id, word, COUNT(*) AS cnt FROM toks GROUP BY doc_id, word",
    tier="A",
)
def wc_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokens(spark, sf_dir).groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))


@register(
    "wc_stopwords",
    oracle=f"{TOKS_CTE} SELECT word, COUNT(*) AS cnt FROM toks "
    f"WHERE word NOT IN {STOPWORDS!r} GROUP BY word".replace("'", "'"),
    tier="A",
)
def wc_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tokens(spark, sf_dir)
        .where(~F.col("word").isin(*STOPWORDS))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "wc_distinct_vocab",
    oracle=f"{TOKS_CTE} SELECT COUNT(DISTINCT word) AS vocab_size FROM toks",
    tier="A",
)
def wc_distinct_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokens(spark, sf_dir).agg(F.countDistinct("word").alias("vocab_size"))


@register(
    "wc_topk_per_lang",
    oracle=(
        "WITH toks AS ("
        "  SELECT lang, word FROM ("
        "    SELECT lang, unnest(string_split(lower(text), ' ')) AS word FROM documents"
        "  ) WHERE word <> ''"
        "), counts AS (SELECT lang, word, count(*) AS cnt FROM toks GROUP BY lang, word) "
        "SELECT lang, word, cnt, CAST(rn AS INTEGER) AS rn FROM ("
        "  SELECT lang, word, cnt, row_number() OVER ("
        "    PARTITION BY lang ORDER BY cnt DESC, word) AS rn FROM counts"
        ") WHERE rn <= 3"
    ),
    tier="A",
)
def wc_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: the 3 most frequent words per language — per-group
    word count with a rank-then-filter window instead of a global sort."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).where(F.col("word") != "")
    counts = toks.groupBy("lang", "word").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("word"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("lang", "word", "cnt", "rn")
    )


@register(
    "wc_char_freq",
    oracle=(
        "SELECT ch, COUNT(*) AS cnt FROM ("
        "  SELECT unnest(regexp_extract_all(lower(text), '[a-z]')) AS ch FROM documents"
        ") GROUP BY ch"
    ),
    tier="A",
)
def wc_char_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Letter frequency — the character-level sibling of word count."""
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "")).alias("ch")
    ).where(F.col("ch").rlike("^[a-z]$"))
    return chars.groupBy("ch").agg(F.count("*").alias("cnt"))
