"""Text-analysis extensions for the LLM-pipeline tier: token entropy,
Zipf rank-frequency, bigram PMI, and document co-occurrence — corpus
statistics a training-data pipeline computes before filtering/mixing.

Exactness: every statistic is built from integer counts; the only floating
steps are final divisions/logs of identical integers, so both engines see
bit-identical doubles before the 6-decimal rounding.

Scale: all are counts-first designs — aggregate to the (small) vocabulary
or bigram space before any join, never join raw token streams. The
co-occurrence self-join is bounded by per-document DISTINCT vocabulary
(≤ |V| per doc), the standard trick that keeps it out of n² territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table

def _tokens():
    """Tokenization shared by all four: lowercase, split on single spaces —
    identical to wordcount.py's contract tokenizer. Built lazily: Column
    construction needs an active SparkContext."""
    return F.split(F.lower("text"), " ")


@register(
    "text_entropy",
    oracle=(
        "WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w "
        "FROM documents), "
        "cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w), "
        "tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id) "
        "SELECT c.doc_id, CAST(t.n AS BIGINT) AS n_tokens, "
        "count(*) AS n_distinct, "
        "round(-sum((c.c / (1.0 * t.n)) * log2(c.c / (1.0 * t.n))), 6) AS entropy "
        "FROM cnt c JOIN tot t ON c.doc_id = t.doc_id "
        "GROUP BY c.doc_id, t.n"
    ),
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token distribution — the repetition
    detector (low entropy = boilerplate/spam) used in corpus quality
    filtering. Counts are exact ints; p·log2 p terms sum per doc (≤31 terms,
    noise ~1e-16 under the 6-decimal round)."""
    d = load_table(spark, sf_dir, "documents")
    cnt = (
        d.select("doc_id", F.explode(_tokens()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / (1.0 * F.col("n"))
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id", "n")
        .agg(
            F.count("*").alias("n_distinct"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy"),
        )
        .select(
            "doc_id", F.col("n").alias("n_tokens"), "n_distinct", "entropy"
        )
    )


@register(
    "text_zipf",
    oracle=(
        "WITH wc AS (SELECT w, count(*) AS cnt FROM ("
        "SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents) "
        "GROUP BY w) "
        "SELECT w AS word, cnt, "
        "CAST(row_number() OVER (ORDER BY cnt DESC, w) AS INTEGER) AS rank, "
        "round(log10(row_number() OVER (ORDER BY cnt DESC, w)), 6) AS log_rank, "
        "round(log10(cnt), 6) AS log_freq "
        "FROM wc"
    ),
)
def text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency table (log-log columns ready for a slope fit) —
    the vocabulary-health diagnostic. The global rank window is over the
    aggregated vocabulary (31 rows), not the token stream."""
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(_tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("w"))
    return wc.select(
        F.col("w").alias("word"),
        "cnt",
        F.row_number().over(w).alias("rank"),
        F.round(F.log10(F.row_number().over(w)), 6).alias("log_rank"),
        F.round(F.log10("cnt"), 6).alias("log_freq"),
    )


@register(
    "text_bigram_pmi",
    oracle=(
        "WITH tok AS (SELECT string_split(lower(text), ' ') AS t FROM documents), "
        "uni AS (SELECT unnest(t) AS w FROM tok), "
        "ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w), "
        "nu AS (SELECT sum(c) AS n FROM ucnt), "
        "big AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1), "
        "i -> t[i] || ' ' || t[i+1])) AS bg FROM tok), "
        "bcnt AS (SELECT bg, count(*) AS c FROM big GROUP BY bg), "
        "nb AS (SELECT sum(c) AS n FROM bcnt) "
        "SELECT b.bg AS bigram, b.c AS cnt, "
        "round(log2(((1.0 * b.c) / nb.n) / "
        "(((1.0 * u1.c) / nu.n) * ((1.0 * u2.c) / nu.n))), 6) AS pmi "
        "FROM bcnt b CROSS JOIN nu CROSS JOIN nb "
        "JOIN ucnt u1 ON string_split(b.bg, ' ')[1] = u1.w "
        "JOIN ucnt u2 ON string_split(b.bg, ' ')[2] = u2.w "
        "WHERE b.c >= 5 "
        "ORDER BY pmi DESC, bigram LIMIT 50"
    ),
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs — collocation
    mining. PMI = log2(p(xy) / (p(x)p(y))) evaluated over DOUBLE ratios —
    p(xy) = c_xy/Nb and p(x) = c_x/Nu as explicit double divisions, mirrored
    op-for-op in the oracle so both engines feed log2 the identical IEEE
    value. (The previous single-ratio form multiplied c_xy·Nu² in int64,
    which is exact at fixture scale but wraps silently at the ×10-×100
    replication scales scale_up.py exercises while DuckDB widens to HUGEINT
    — ADVICE r3. Ratios of counts can never overflow.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(_tokens().alias("t"))
    ucnt = (
        toks.select(F.explode("t").alias("w")).groupBy("w").agg(F.count("*").alias("c"))
    )
    nu = ucnt.agg(F.sum("c").alias("nu"))
    # the size filter only gates the BIGRAM branch (unigram counts must see
    # every doc): a 1-token doc makes sequence(0, size-2) descend to [0,-1]
    # and element_at(t, 0)/element_at(t, 2) throw — the oracle's
    # generate_series is simply empty for it (round-8 hazard sweep)
    bigrams = toks.where(F.size("t") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(F.col("t"), i + 1), F.element_at(F.col("t"), i + 2)
                ),
            )
        ).alias("bg")
    )
    bcnt = bigrams.groupBy("bg").agg(F.count("*").alias("cb"))
    nb = bcnt.agg(F.sum("cb").alias("nb"))
    u1 = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    parts = F.split(F.col("bg"), " ")
    pmi = F.round(
        F.log2(
            ((F.lit(1.0) * F.col("cb")) / F.col("nb"))
            / (
                ((F.lit(1.0) * F.col("c1")) / F.col("nu"))
                * ((F.lit(1.0) * F.col("c2")) / F.col("nu"))
            )
        ),
        6,
    )
    return (
        bcnt.where(F.col("cb") >= 5)
        .join(F.broadcast(nu))
        .join(F.broadcast(nb))
        .withColumn("w1", F.element_at(parts, 1))
        .withColumn("w2", F.element_at(parts, 2))
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select(F.col("bg").alias("bigram"), F.col("cb").alias("cnt"), pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(50)
    )


@register(
    "text_cooccur",
    oracle=(
        "WITH docw AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS w "
        "FROM documents) "
        "SELECT a.w AS word_a, b.w AS word_b, count(*) AS n_docs "
        "FROM docw a JOIN docw b ON a.doc_id = b.doc_id AND a.w < b.w "
        "GROUP BY a.w, b.w "
        "ORDER BY n_docs DESC, word_a, word_b LIMIT 50"
    ),
)
def text_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level co-occurrence: top word pairs appearing in the same
    documents. The join operates on per-doc DISTINCT vocabulary (≤31 rows
    per doc), so cost is Σ vocab² per doc — the inverted-index shape, not
    corpus²."""
    d = load_table(spark, sf_dir, "documents")
    docw = d.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("w")
    )
    a = docw.select("doc_id", F.col("w").alias("word_a"))
    b = docw.select("doc_id", F.col("w").alias("word_b"))
    return (
        a.join(b, "doc_id")
        .where(F.col("word_a") < F.col("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "word_a", "word_b")
        .limit(50)
    )


TEXT_NGRAM_LM_ORACLE = (
    "WITH toks AS ("
    "  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents"
    "  WHERE len(string_split(lower(text), ' ')) >= 2"
    "), bg AS ("
    "  SELECT doc_id, w[i] AS w1, w[i+1] AS w2"
    "  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) t"
    "), c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY w1, w2), "
    "c1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1) "
    "SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
    "round(sum(log2(n12 / (1.0 * n1))) / count(*), 6) AS avg_log2p "
    "FROM bg b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) "
    "GROUP BY b.doc_id"
)


@register("text_ngram_lm", oracle=TEXT_NGRAM_LM_ORACLE, tier="B")
def text_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model typicality: train bigram MLE probabilities
    p(w2|w1) = c(w1,w2)/c(w1) on the corpus, score each document by its
    mean log2 bigram probability — the bigram upgrade of
    text_unigram_logprob (low scores flag gibberish or out-of-domain text;
    LM-perplexity bucketing is a standard corpus-quality axis).

    Scale: both count tables are vocabulary²-bounded (≪ corpus) and join
    back onto the bigram stream by key — broadcast territory for real
    vocabularies; the per-doc score is one map-side-combining aggregate.
    No smoothing term is needed because the corpus scores itself (every
    scored bigram has count ≥ 1)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.lower("text"), " ").alias("w")).where(
        F.size("w") >= 2
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(w)-2), i -> struct(w[i] AS w1, w[i+1] AS w2))")
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    # both count tables are vocab²-bounded: broadcast them so the full
    # bigram stream never shuffles (un-hinted, the two shuffle joins went
    # 13.7× at ×10 data — measured; broadcast brings it back to linear)
    return (
        bg.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum(F.log2(F.col("n12") / (1.0 * F.col("n1")))) / F.count("*"), 6
            ).alias("avg_log2p"),
        )
    )


TEXT_BOILERPLATE_ORACLE = (
    "WITH pre AS ("
    "  SELECT source, array_to_string((string_split(lower(text), ' '))[1:5], ' ') AS prefix"
    "  FROM documents WHERE len(string_split(lower(text), ' ')) >= 5"
    "), cnt AS ("
    "  SELECT source, prefix, count(*) AS n FROM pre GROUP BY source, prefix"
    "), tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS docs FROM cnt GROUP BY source), "
    "top AS ("
    "  SELECT source, prefix, n, row_number() OVER ("
    "    PARTITION BY source ORDER BY n DESC, prefix) AS rk FROM cnt"
    ") SELECT t.source, t.prefix AS top_prefix, CAST(t.n AS BIGINT) AS n_docs, "
    "round(t.n / (1.0 * o.docs), 6) AS share "
    "FROM top t JOIN tot o ON t.source = o.source WHERE t.rk = 1"
)


@register("text_boilerplate", oracle=TEXT_BOILERPLATE_ORACLE, tier="B")
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection per source: the most common 5-word
    document prefix and the share of the source's docs that start with it —
    a high share means a scraped template (cookie banners, nav headers)
    that a C4-style cleaner should strip before training.

    Scale: prefixes aggregate per (source, prefix) with map-side combine;
    the top-1 window runs over per-source prefix counts (vocabulary-sized,
    not corpus-sized)."""
    d = load_table(spark, sf_dir, "documents")
    pre = (
        d.select("source", F.split(F.lower("text"), " ").alias("w"))
        .where(F.size("w") >= 5)
        .select("source", F.array_join(F.slice("w", 1, 5), " ").alias("prefix"))
    )
    cnt = pre.groupBy("source", "prefix").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("source").agg(F.sum("n").alias("docs"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), "prefix")
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .join(F.broadcast(tot), "source")
        .select(
            "source",
            F.col("prefix").alias("top_prefix"),
            F.col("n").alias("n_docs"),
            F.round(F.col("n") / (1.0 * F.col("docs")), 6).alias("share"),
        )
    )


TEXT_BPE_PAIRS_ORACLE = (
    "WITH toks AS ("
    "  SELECT word FROM ("
    "    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents"
    "  ) WHERE word <> ''"
    "), wc AS (SELECT word, count(*) AS n FROM toks GROUP BY word), "
    "p AS ("
    "  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, n FROM ("
    "    SELECT word, n, unnest(generate_series(1, length(word) - 1)) AS i "
    "    FROM wc WHERE length(word) >= 2)"
    ") SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM p "
    "GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50"
)


@register("text_bpe_pairs", oracle=TEXT_BPE_PAIRS_ORACLE, tier="B")
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training step zero: corpus-weighted adjacent
    character-pair frequencies — the statistic whose argmax IS the first
    BPE merge (Sennrich et al. 2016). The full trainer is this op in a
    loop (merge the top pair, re-count); each iteration has exactly this
    plan shape.

    Scale design: pairs explode from the DISTINCT word vocabulary
    weighted by word counts, never from the raw token stream — the
    explode side is |V| · avg_len rows (vocabulary-bounded) instead of
    corpus-length rows, the same counts-first trick as text_cooccur.
    Single-char words are filtered BEFORE the position explode on both
    engines (Spark's sequence(1,0) walks backwards rather than emitting
    empty). Top-50 is a TakeOrderedAndProject heap with the pair itself
    as tiebreaker."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).where(F.col("word") != "")
    wc = toks.groupBy("word").agg(F.count("*").alias("n"))
    pairs = (
        wc.where(F.length("word") >= 2)
        .select(
            "word",
            "n",
            F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
        )
        .select(F.expr("substring(word, i, 2)").alias("pair"), "n")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(50)
    )


_TAG_RE = "<[^>]+>"
_SCRIPT_RE = "<script>.*?</script>"

TEXT_HTML_STRIP_ORACLE = (
    "WITH h AS (SELECT doc_id, "
    "'<html><body><h1>' || source || '</h1><p>' || text || "
    "' &amp; more &lt;here&gt;</p><script>var x=1;</script></body></html>' AS html "
    "FROM documents), s AS (SELECT doc_id, html, "
    f"regexp_replace(html, '{_SCRIPT_RE}', '', 'g') AS noscript FROM h) "
    "SELECT doc_id, "
    f"CAST(len(regexp_extract_all(html, '{_TAG_RE}')) AS BIGINT) AS n_tags, "
    "replace(replace(replace(replace("
    f"regexp_replace(noscript, '{_TAG_RE}', '', 'g'), "
    "'&lt;', '<'), '&gt;', '>'), '&amp;', '&'), '&nbsp;', ' ') AS clean_text "
    "FROM s"
)


@register("text_html_strip", oracle=TEXT_HTML_STRIP_ORACLE, tier="B")
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate stripping — the extraction step between a raw crawl
    and every text gate in this repo (quality, langid, dedup all assume
    plain text): drop <script> blocks wholesale (non-greedy match so
    sibling blocks don't merge), strip remaining tags, decode the common
    entities. HTML is synthesized around the fixture text (mirrored
    byte-for-byte in the oracle) since the corpus is already clean — the
    subject is the strip plan: ~4 codegen regexp/replace passes, zero
    shuffle, trivially linear. A production extractor (trafilatura-class)
    slots in behind the same mapInPandas seam as the multimodal decode;
    this key pins the pure-SQL fast path."""
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body><h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(" &amp; more &lt;here&gt;</p><script>var x=1;</script></body></html>"),
    )
    h = d.select("doc_id", html.alias("html"))
    noscript = F.regexp_replace("html", _SCRIPT_RE, "")
    clean = F.regexp_replace(noscript, _TAG_RE, "")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&"), ("&nbsp;", " ")):
        clean = F.replace(clean, F.lit(ent), F.lit(ch))
    return h.select(
        "doc_id",
        F.expr(f"regexp_count(html, '{_TAG_RE}')").cast("long").alias("n_tags"),
        clean.alias("clean_text"),
    )


TEXT_KEYWORDS_ORACLE = (
    "WITH toks AS ("
    "  SELECT doc_id, word FROM ("
    "    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word"
    "    FROM documents"
    "  ) WHERE word <> ''"
    "), tf AS ("
    "  SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word"
    "), df AS ("
    "  SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word"
    "), n AS (SELECT count(*) AS n_docs FROM documents), "
    "scored AS ("
    "  SELECT tf.doc_id, tf.word, "
    "  round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf "
    "  FROM tf JOIN df ON tf.word = df.word CROSS JOIN n"
    "), ranked AS ("
    "  SELECT doc_id, word, tfidf, row_number() OVER ("
    "    PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rank"
    "  FROM scored"
    ") SELECT doc_id, CAST(rank AS INTEGER) AS rank, word, tfidf "
    "FROM ranked WHERE rank <= 3"
)


@register("text_keywords", oracle=TEXT_KEYWORDS_ORACLE, tier="B")
def text_keywords(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k keyword extraction per document: the k highest-TF-IDF terms
    (rank window over the text_tfidf scores) — the unsupervised tagging /
    routing signal a curation pipeline attaches to every document before
    clustering or mixture sampling.

    Determinism: the window orders by the 6-dp ROUNDED score (the value the
    driver hashes — both engines agree on it bit-for-bit, per text_tfidf's
    hash-pass) with the word itself as total-order tiebreaker, so rank is
    engine-independent even where raw IEEE scores differ by 1 ulp around a
    rounding boundary.

    Scale: same plan family as text_tfidf (vocabulary-sized DF side
    broadcast, 1-row doc count broadcast) plus ONE window partitioned by
    doc_id — per-partition top-k heaps, no global sort; per-doc vocabulary
    bounds every partition's sort."""
    from .wordcount import tokens

    toks = tokens(spark, sf_dir)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n = load_table(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.select(
            "doc_id", F.row_number().over(w).alias("rank"), "word", "tfidf"
        )
        .where(F.col("rank") <= k)
    )
