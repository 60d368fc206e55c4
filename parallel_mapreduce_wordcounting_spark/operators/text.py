"""Text-analysis operators for an LLM data pipeline — corpus stats, n-grams,
TF-IDF, lexicon sentiment, language-ID heuristic, quality scoring, token
counting, fingerprinting.

All built on the word-count core (operators/wordcount.py) with zero Python
UDFs: joins against broadcast lexicons and array expressions keep everything
in whole-stage codegen. At 100 TB the per-doc aggregations shuffle on doc_id
(or are computed as array expressions with no shuffle at all), and the
doc-frequency join broadcasts the vocabulary side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table
from .wordcount import TOKS_CTE, tokens

#: Sentiment lexicon over the fixture vocabulary. Weights are binary-exact
#: doubles (0.25 multiples) so sums are order-independent and bit-identical
#: between Spark and DuckDB.
SENTIMENT_LEXICON = {
    "fast": 1.0,
    "big": 0.5,
    "slow": -1.0,
    "small": -0.5,
    "dup": -0.25,
}

_LEX_CASE = (
    "CASE word "
    + " ".join(f"WHEN '{w}' THEN CAST({v} AS DOUBLE)" for w, v in SENTIMENT_LEXICON.items())
    + " ELSE CAST(0.0 AS DOUBLE) END"
)


@register(
    "text_lang_stats",
    oracle=(
        "SELECT lang, source, count(*) AS n_docs, "
        "round(avg(n_chars), 6) AS avg_chars, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
        "min(doc_id) AS first_doc "
        "FROM documents GROUP BY lang, source"
    ),
    tier="B",
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "text_ngrams",
    oracle=(
        "SELECT bigram, count(*) AS cnt FROM ("
        "  SELECT unnest(list_transform(generate_series(1, len(t) - 1), "
        "         i -> t[i] || ' ' || t[i + 1])) AS bigram "
        "  FROM (SELECT string_split(lower(text), ' ') AS t FROM documents) "
        "  WHERE len(t) >= 2"
        ") GROUP BY bigram"
    ),
    tier="B",
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts via a pure array expression — the n-gram construction is
    sequence+transform over the token array (no shuffle until the count)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.lower("text"), " ").alias("t")).where(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.concat_ws(" ", F.element_at(F.col("t"), i + 1), F.element_at(F.col("t"), i + 2)),
            )
        ).alias("bigram")
    )
    return bigrams.groupBy("bigram").agg(F.count("*").alias("cnt"))


@register(
    "text_tfidf",
    oracle=(
        f"{TOKS_CTE}, "
        "tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word), "
        "df AS (SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word), "
        "n AS (SELECT count(*) AS n_docs FROM documents) "
        "SELECT tf.doc_id, tf.word, tf.tf, df.df, "
        "round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf "
        "FROM tf JOIN df ON tf.word = df.word CROSS JOIN n"
    ),
    tier="B",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, word). The doc-frequency side is vocabulary-sized —
    broadcast; total doc count rides along as a broadcast 1-row cross join
    (never a driver-side collect)."""
    toks = tokens(spark, sf_dir)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n = load_table(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(df_), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )


@register(
    "text_sentiment",
    oracle=(
        f"{TOKS_CTE} "
        f"SELECT doc_id, round(CAST(sum({_LEX_CASE}) AS DOUBLE) / count(*), 6) AS sentiment, "
        "count(*) AS n_tokens "
        "FROM toks GROUP BY doc_id"
    ),
    tier="B",
)
def text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based polarity (pattern from EDBT'16 Spark Twitter sentiment,
    PAPERS.md): broadcast-join tokens against the lexicon, average per doc.
    Lexicon weights are 0.25 multiples → order-independent exact sums."""
    toks = tokens(spark, sf_dir)
    lex = F.broadcast(
        toks.sparkSession.createDataFrame(
            list(SENTIMENT_LEXICON.items()), schema="word string, score double"
        )
    )
    return (
        toks.join(lex, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("score"), F.lit(0.0))) / F.count("*"), 6
            ).alias("sentiment"),
            F.count("*").alias("n_tokens"),
        )
    )


@register(
    "text_quality",
    oracle=(
        f"{TOKS_CTE}, "
        "per_doc AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_uniq, "
        f"           sum(CASE WHEN word IN ('the','a') THEN 1 ELSE 0 END) AS n_stop "
        "            FROM toks GROUP BY doc_id) "
        "SELECT d.doc_id, d.n_chars, p.n_tokens, "
        "round(CAST(p.n_uniq AS DOUBLE) / p.n_tokens, 6) AS ttr, "
        "round(CAST(p.n_stop AS DOUBLE) / p.n_tokens, 6) AS stopword_ratio, "
        "round(CAST(d.n_chars AS DOUBLE) / p.n_tokens, 6) AS avg_token_len, "
        "(p.n_tokens >= 20 AND CAST(p.n_uniq AS DOUBLE) / p.n_tokens >= 0.1) AS keep "
        "FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id"
    ),
    tier="B",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: type-token ratio, stopword ratio, average
    token length, and a keep/drop flag — the standard pre-training filters."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = (
        tokens(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("word").alias("n_uniq"),
            F.sum(F.when(F.col("word").isin("the", "a"), 1).otherwise(0)).alias("n_stop"),
        )
    )
    ttr = F.col("n_uniq").cast("double") / F.col("n_tokens")
    return (
        d.join(per_doc, "doc_id")
        .select(
            "doc_id",
            "n_chars",
            "n_tokens",
            F.round(ttr, 6).alias("ttr"),
            F.round(F.col("n_stop").cast("double") / F.col("n_tokens"), 6).alias(
                "stopword_ratio"
            ),
            F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 6).alias(
                "avg_token_len"
            ),
            ((F.col("n_tokens") >= 20) & (ttr >= 0.1)).alias("keep"),
        )
    )


@register(
    "text_langid",
    oracle=(
        "SELECT doc_id, lang, "
        "CASE WHEN contains(text, 'the ') OR contains(text, ' the') THEN 'en_like' "
        "ELSE 'other' END AS lang_guess, "
        "(lang = 'en') AS is_en "
        "FROM documents"
    ),
    tier="B",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic surface: an n-gram-marker rule (the fixture's
    synthetic corpus shares one vocabulary across langs, so the real signal
    is the labeled column; the rule demonstrates the operator shape)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.when(
            F.col("text").contains("the ") | F.col("text").contains(" the"), "en_like"
        )
        .otherwise("other")
        .alias("lang_guess"),
        (F.col("lang") == "en").alias("is_en"),
    )


@register(
    "text_token_count",
    oracle=(
        "SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens, "
        "length(text) AS n_bytes, "
        "CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens, "
        "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) "
        "AS bpe_regex_tokens "
        "FROM documents"
    ),
    tier="B",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for LLM budget accounting: whitespace tokens, the
    chars/4 estimate, and a BPE-ish regex split (letter runs / digit runs /
    single other-chars — the GPT-2 pre-tokenizer shape, simplified to the
    regex subset Spark's Java regex and DuckDB's RE2 agree on)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.length("text").cast("long").alias("n_bytes"),
        F.ceil(F.length("text") / 4.0).alias("approx_bpe_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
        .cast("long")
        .alias("bpe_regex_tokens"),
    )


@register(
    "text_fingerprint",
    oracle=(
        "SELECT doc_id, md5(text) AS fp, "
        "md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) "
        "AS fp_sorted_vocab, "
        "list_min(list_transform(generate_series(1, length(text) - 15), "
        "i -> md5(substr(text, CAST(i AS INTEGER), 16)))) AS fp_winnow "
        "FROM documents WHERE length(text) >= 16"
    ),
    tier="B",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting, three grains: exact content hash, an
    order-insensitive vocabulary hash (catches token-order shuffles), and a
    rolling-window winnow — the minimum hash over every 16-char window, the
    content-defined-chunking primitive that survives local edits (an edit
    only changes the fingerprint if it touched the minimal window)."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 16)
    winnow = F.array_min(
        F.expr("transform(sequence(1, length(text) - 15), i -> md5(substring(text, i, 16)))")
    )
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        F.md5(
            F.concat_ws(
                " ", F.sort_array(F.array_distinct(F.split(F.lower("text"), " ")))
            ).cast("binary")
        ).alias("fp_sorted_vocab"),
        winnow.alias("fp_winnow"),
    )
