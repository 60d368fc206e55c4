"""Training-data curation operators, round 5 — the pipeline stages a 100 TB
pretraining-corpus build needs beyond dedup/similarity/quality (which live in
dedup.py / similarity.py / text.py): PII scrubbing, benchmark-contamination
checks, repetition scoring, sequence packing, temperature-based domain
mixing, incremental (snapshot-aware) dedup, and event anomaly flagging.

Same house rules as every operator module: built-in JVM expressions only (no
Python in any hot path), one declared shuffle per logical step, every
computed column aliased identically in the Spark plan and the DuckDB oracle,
doubles rounded to 6 d.p. on both sides before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table, ts_day, ts_us
from .exact import floor_day_us_sql

# --- PII scrubbing -----------------------------------------------------------

# Patterns are deliberately simple (email + international-ish phone): the
# operator's subject is the SCRUB PLUMBING — counting and redacting in one
# JVM-side pass — not regex completeness. Swap in a richer pattern set (or a
# presidio-style model behind mapInPandas) without touching the plan shape.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"

PII_SCRUB_ORACLE = (
    "WITH aug AS ("
    "  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) ||"
    "         '@example.com or +1-555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') AS text"
    "  FROM documents"
    ") SELECT doc_id, "
    f"CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails, "
    f"CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones, "
    f"regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'), "
    f"'{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed "
    "FROM aug"
)


@register("text_pii_scrub", oracle=PII_SCRUB_ORACLE, tier="B")
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails/phone numbers and count what was removed, one pass.

    The fixture corpus contains no PII, so each doc is first augmented with
    a deterministic synthetic contact line derived from its own doc_id —
    the scrubber then has real work whose outcome the oracle can mirror
    exactly. Scale: pure regexp expressions inside whole-stage codegen; no
    shuffle at all (embarrassingly parallel over documents), which is what
    makes scrubbing affordable as a mandatory early gate at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("scrubbed"),
    )


# --- benchmark contamination -------------------------------------------------

CONTAMINATION_ORACLE = (
    "WITH toks AS ("
    "  SELECT doc_id, string_split(text, ' ') AS w FROM documents"
    "  WHERE len(string_split(text, ' ')) >= 5"
    "), g AS ("
    "  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS gram"
    "  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w)-4)) AS i) t"
    "), ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0), "
    "tot AS ("
    "  SELECT doc_id, count(*) AS n_grams FROM g WHERE doc_id % 50 <> 0 GROUP BY doc_id"
    "), cont AS ("
    "  SELECT g.doc_id, count(DISTINCT g.gram) AS n_contaminated"
    "  FROM g JOIN ev USING (gram) WHERE g.doc_id % 50 <> 0 GROUP BY g.doc_id"
    ") SELECT t.doc_id, t.n_grams, "
    "CAST(coalesce(c.n_contaminated, 0) AS BIGINT) AS n_contaminated, "
    "round(coalesce(c.n_contaminated, 0) / (1.0 * t.n_grams), 6) AS score "
    "FROM tot t LEFT JOIN cont c ON t.doc_id = c.doc_id"
)


@register("text_contamination", oracle=CONTAMINATION_ORACLE, tier="B")
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each training doc's word
    5-grams that also appear in the eval set (docs with doc_id % 50 == 0
    stand in for a held-out benchmark). Docs shorter than 5 words carry no
    5-gram evidence and are excluded (documented contract).

    Scale: the eval side collapses to DISTINCT 5-grams — benchmark suites
    are tiny (≪1 GB of grams even for a large eval battery), so the join
    against the training-side gram stream is a broadcast; the only real
    shuffle is the per-doc count aggregation. This is the standard n-gram
    decontamination pass (Brown et al. 2020 use 13-grams; 5 fits the
    fixture's short docs)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w")).where(F.size("w") >= 5)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(w)-5), i -> array_join(slice(w, i+1, 5), ' '))")
        ).alias("gram"),
    )
    train = grams.where(F.col("doc_id") % 50 != 0)
    ev = F.broadcast(grams.where(F.col("doc_id") % 50 == 0).select("gram").distinct())
    tot = train.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    cont = (
        train.join(ev, "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_contaminated"))
    )
    return (
        tot.join(cont, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)) / (1.0 * F.col("n_grams")), 6
            ).alias("score"),
        )
    )


# --- repetition scoring ------------------------------------------------------

REPETITION_ORACLE = (
    "WITH toks AS ("
    "  SELECT doc_id, string_split(text, ' ') AS w FROM documents"
    "  WHERE len(string_split(text, ' ')) >= 2"
    "), bg AS ("
    "  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bigram"
    "  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) t"
    "), bgc AS ("
    "  SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY doc_id, bigram"
    "), per_doc AS ("
    "  SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top_cnt,"
    "         CAST(sum(cnt) AS BIGINT) AS n_bigrams FROM bgc GROUP BY doc_id"
    "), words AS ("
    "  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,"
    "         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct FROM toks"
    ") SELECT p.doc_id, "
    "round(p.top_cnt / (1.0 * p.n_bigrams), 6) AS top_bigram_frac, "
    "round(1.0 - wo.n_distinct / (1.0 * wo.n_words), 6) AS dup_word_frac "
    "FROM per_doc p JOIN words wo ON p.doc_id = wo.doc_id"
)


@register("text_repetition", oracle=REPETITION_ORACLE, tier="B")
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: the fraction of
    bigram mass held by the single most frequent bigram, and the duplicate-
    word fraction (1 − distinct/total). High values flag boilerplate and
    degenerate generations — a standard pretraining keep/drop gate.

    Scale: the bigram counts aggregate per (doc_id, bigram) with map-side
    partial aggregation before the one shuffle; the word-level fractions are
    pure array expressions with no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w")).where(F.size("w") >= 2)
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")
        ).alias("bigram"),
    )
    per_doc = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_cnt"), F.sum("cnt").alias("n_bigrams"))
    )
    words = toks.select(
        "doc_id",
        F.size("w").cast("long").alias("n_words"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct"),
    )
    return per_doc.join(words, "doc_id").select(
        "doc_id",
        F.round(F.col("top_cnt") / (1.0 * F.col("n_bigrams")), 6).alias("top_bigram_frac"),
        F.round(1.0 - F.col("n_distinct") / (1.0 * F.col("n_words")), 6).alias("dup_word_frac"),
    )


# --- sequence packing --------------------------------------------------------

PACK_SEQUENCES_ORACLE = (
    "WITH t AS ("
    "  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens"
    "  FROM documents"
    "), c AS ("
    "  SELECT doc_id, n_tokens, coalesce(sum(n_tokens) OVER ("
    "    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    "  ), 0) AS cum FROM t"
    ") SELECT CAST(cum // 512 AS BIGINT) AS bin_id, count(*) AS n_docs, "
    "CAST(sum(n_tokens) AS BIGINT) AS n_seq_tokens "
    "FROM c GROUP BY 1"
)


def pack_sequences_global_window(
    spark: SparkSession, sf_dir: str, ctx_len: int = 512
) -> DataFrame:
    """Single-window reference form of :func:`pack_sequences` (UNREGISTERED
    since round 6 — it is the readable spec and the in-repo equivalence
    oracle for the distributed rewrite, not the production path): documents
    in a fixed global order (doc_id), each assigned to the context-window
    bin its starting token offset falls in (bin = exclusive running token
    count // ctx_len); emits per-bin document and token counts.

    Scale: one global-order running sum — a single-partition window, fine up
    to ~10⁸ docs but a straggler at 100 TB, which is why the registered key
    runs :func:`pack_sequences_distributed` instead (round-5 verdict
    item 3). tests/test_curation_ext.py asserts the two agree bin-for-bin."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    c = t.select(
        "n_tokens", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum")
    )
    return c.groupBy(F.expr(f"cum div {ctx_len}").alias("bin_id")).agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_seq_tokens")
    )


@register("pack_sequences", oracle=PACK_SEQUENCES_ORACLE, tier="B")
def pack_sequences_distributed(
    spark: SparkSession, sf_dir: str, ctx_len: int = 512, bucket_width: int = 64
) -> DataFrame:
    """Concat-and-chunk sequence packing, the standard pretraining batch
    layout — registered in its 100 TB form (round-5 verdict item 3): the
    classic distributed prefix sum, with NO global-order window and NO
    collect:

    1. bucket docs by a fixed-width key range (``doc_id div bucket_width`` —
       deterministic, unlike sampled range partitioning),
    2. within-bucket exclusive running sums are a parallel window
       (partitionBy bucket),
    3. per-bucket totals are a tiny aggregate (one row per bucket) whose own
       exclusive running sum — the bucket offsets — is a window over
       bucket-count rows, broadcast back onto the docs,
    4. global offset = bucket offset + local running sum; identical bin
       assignment to the single-window form.

    tests/test_curation_ext.py asserts bin-for-bin equality with
    :func:`pack_sequences_global_window` (the readable single-window spec,
    which is also what PACK_SEQUENCES_ORACLE expresses in SQL). At 100 TB,
    step 3's window runs over ~10⁵ bucket rows while every data-sized step
    is parallel."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.expr(f"doc_id div {bucket_width}").alias("bucket"),
    )
    w_local = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = t.select(
        "bucket",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0)).alias("local_cum"),
    )
    w_bucket = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = F.broadcast(
        t.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_total"))
        .select(
            "bucket",
            F.coalesce(F.sum("bucket_total").over(w_bucket), F.lit(0)).alias("offset"),
        )
    )
    return (
        local.join(offsets, "bucket")
        .groupBy(
            F.expr(f"(offset + local_cum) div {ctx_len}").alias("bin_id")
        )
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_seq_tokens"))
    )


# --- temperature-based domain mixing ----------------------------------------

DOMAIN_MIX_ORACLE = (
    "WITH cnt AS ("
    "  SELECT source, count(*) AS n FROM documents GROUP BY source"
    "), wts AS ("
    "  SELECT source, CAST(floor(sqrt(n) * 1000000) AS BIGINT) AS w FROM cnt"
    "), q AS ("
    "  SELECT source, (200 * w) // (SELECT sum(w) FROM wts) AS quota FROM wts"
    "), r AS ("
    "  SELECT doc_id, source, row_number() OVER ("
    "    PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id"
    "  ) AS rk FROM documents"
    ") SELECT r.doc_id, r.source FROM r JOIN q USING (source) WHERE r.rk <= q.quota"
)


@register("sample_domain_mix", oracle=DOMAIN_MIX_ORACLE, tier="B")
def sample_domain_mix(
    spark: SparkSession, sf_dir: str, n_total: int = 200, temperature: float = 0.5
) -> DataFrame:
    """Temperature-reweighted domain mixture (the multilingual/multi-source
    sampling rule of mBERT/XLM-R, α = 0.5): each ``source`` gets a quota
    ∝ count^α, flattening the natural distribution so small domains are
    upsampled relative to their share; docs fill the quota in the
    deterministic md5(doc_id) pseudo-random order (cross-engine stable —
    rand() is not oracle-able).

    Exactness: the weight is floor(n^α·1e6) per source — a SINGLE IEEE
    power per source, no float summation — then all quota arithmetic is
    integer (200·w // Σw), so Spark and DuckDB cannot disagree at a floor
    boundary. α = 0.5 routes through ``F.sqrt`` (correctly-rounded, exactly
    what the oracle's ``sqrt`` computes); other temperatures use ``F.pow``,
    which may differ from a hand-written oracle by 1 ulp at a floor
    boundary — and the registered oracle hardcodes sqrt and n_total = 200
    anyway, so non-default arguments are covered by unit tests
    (tests/test_curation_ext.py), not the driver oracle (ADVICE r5: the
    parameter was previously declared but ignored — any α silently
    returned the 0.5 mixture). Scale: source counts are a tiny aggregate
    (broadcast), the rank window shuffles once on source — same plan
    family as sample_stratified, with computed rather than constant
    quotas."""
    d = load_table(spark, sf_dir, "documents")
    weight = (
        F.sqrt("n") if temperature == 0.5 else F.pow("n", F.lit(temperature))
    )
    wts = (
        d.groupBy("source")
        .agg(F.count("*").alias("n"))
        .select("source", F.floor(weight * 1_000_000).alias("w"))
    )
    total_w = F.broadcast(wts.agg(F.sum("w").alias("tw")))
    quotas = F.broadcast(
        wts.crossJoin(total_w).select(
            "source", F.expr(f"({n_total} * w) div tw").alias("quota")
        )
    )
    rk = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select("doc_id", "source", F.row_number().over(rk).alias("rk"))
    return ranked.join(quotas, "source").where(F.col("rk") <= F.col("quota")).select(
        "doc_id", "source"
    )


# --- incremental (snapshot-aware) dedup -------------------------------------

DEDUP_INCREMENTAL_ORACLE = (
    "SELECT d.doc_id, md5(d.text) AS content_key FROM documents d "
    "WHERE d.doc_id >= 100 AND NOT EXISTS ("
    "  SELECT 1 FROM documents p WHERE p.doc_id < 100 AND md5(p.text) = md5(d.text)"
    ")"
)


@register("dedup_incremental", oracle=DEDUP_INCREMENTAL_ORACLE, tier="B")
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup: keep only incoming docs (doc_id ≥ 100 here)
    whose content hash is absent from the prior snapshot (doc_id < 100) —
    the every-crawl-vs-all-previous-crawls pass of a living corpus.

    Plan: anti-join on the 16-byte content hash, never on text — the
    shuffle carries hashes, not documents. Scale: with
    spark.sql.optimizer.runtime.bloomFilter.enabled (on by default ≥3.5)
    Spark injects a bloom filter built from the snapshot side into the
    incoming scan, so rows that cannot match never reach the shuffle —
    exactly the hand-built bloom pattern, as a free optimizer rewrite; the
    anti-join keeps the result exact regardless of false positives. The
    snapshot side would live as a bucketed-by-hash table so repeated daily
    runs skip its shuffle entirely."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.col("text")).alias("content_key")
    prior = d.where(F.col("doc_id") < 100).select(key)
    incoming = d.where(F.col("doc_id") >= 100).select("doc_id", key)
    return incoming.join(prior, "content_key", "left_anti").select(
        "doc_id", "content_key"
    )


# --- event anomaly flagging --------------------------------------------------

EVENT_ANOMALY_ORACLE = (
    "WITH daily AS ("
    f"  SELECT {floor_day_us_sql()} AS day, count(*) AS n_events"
    "  FROM events GROUP BY 1"
    "), st AS (SELECT avg(n_events) AS mu, stddev(n_events) AS sigma FROM daily) "
    "SELECT day, n_events, round((n_events - mu) / sigma, 6) AS z "
    "FROM daily, st"
)


@register("event_anomaly", oracle=EVENT_ANOMALY_ORACLE, tier="C")
def event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day event volume z-scores — the drift/outage detector a pipeline
    runs over its own telemetry (a z beyond ±2–3 flags a collection anomaly
    worth quarantining before the data enters training).

    Scale: daily counts are one shuffle with map-side combine; the global
    mean/stddev is a 1-row broadcast riding along as a cross join — no
    collect, no second pass over events."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(ts_day("ts").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n_events"))
    )
    st = F.broadcast(
        daily.agg(F.avg("n_events").alias("mu"), F.stddev("n_events").alias("sigma"))
    )
    return daily.crossJoin(st).select(
        "day",
        "n_events",
        # try_divide: perfectly flat daily volume makes sigma 0 — the
        # oracle's x/0 yields NULL where ANSI `/` would abort the job
        F.round(
            F.try_divide(F.col("n_events") - F.col("mu"), F.col("sigma")), 6
        ).alias("z"),
    )


SPLIT_TRAIN_VAL_ORACLE = (
    "WITH b AS ("
    "  SELECT doc_id, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)) AS BIGINT) % 100 AS bucket"
    "  FROM documents"
    ") SELECT doc_id, CASE WHEN bucket < 90 THEN 'train' "
    "WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split FROM b"
)


@register("split_train_val", oracle=SPLIT_TRAIN_VAL_ORACLE, tier="B")
def split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment: the first 8 hex chars
    of md5(doc_id || ':split') mod 100 pick the bucket. Hash-based (not
    positional) so the split is stable under any repartitioning, insertion,
    or re-run — the property a corpus split MUST have so documents never
    migrate between train and eval across pipeline versions. The salt
    string namespaces this split decision from any other hash use of
    doc_id. Zero shuffle, pure codegen expressions."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return d.select(
        "doc_id",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test").alias("split"),
    )


SAMPLE_WEIGHTED_ORACLE = (
    "WITH k AS ("
    "  SELECT doc_id, source, n_chars, "
    "  round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wsample'), 1, 6)) "
    "AS BIGINT) + 1) / 16777216.0) / n_chars, 9) AS skey"
    "  FROM documents"
    ") SELECT doc_id, source, n_chars, skey FROM k "
    "ORDER BY skey DESC, doc_id LIMIT 100"
)


@register("sample_weighted", oracle=SAMPLE_WEIGHTED_ORACLE, tier="B")
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-Res,
    IPL 2006): each doc draws u ∈ (0,1] and ranks by ln(u)/weight — the
    top-k of that key IS an exact weighted sample, fully distributed (the
    top-k is a TakeOrderedAndProject heap, never a global sort). Here
    weight = n_chars, the "sample long documents proportionally more"
    mix knob.

    Determinism contract: u is derived from the first 6 hex chars of
    md5(doc_id || ':wsample') — same bytes on both engines — so the
    "random" draw replays identically across engines, re-runs, and
    repartitionings (the reproducibility a corpus build needs; compare
    split_train_val). The rank key is ROUNDED to 9 d.p. BEFORE ordering
    on both sides: key magnitude is ~1e-2, so the engines' ≤1-ulp ln()
    disagreement (~1e-17) can never reorder the rounded keys, and doc_id
    breaks rounded ties."""
    d = load_table(spark, sf_dir, "documents")
    u_int = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":wsample"))), 1, 6
        ),
        16,
        10,
    ).cast("long")
    skey = F.round(F.ln((u_int + 1) / F.lit(16777216.0)) / F.col("n_chars"), 9)
    return (
        d.select("doc_id", "source", "n_chars", skey.alias("skey"))
        .orderBy(F.col("skey").desc(), "doc_id")
        .limit(100)
    )


DEDUP_URL_ORACLE = (
    "WITH u AS ("
    "  SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER) "
    "  WHEN 0 THEN 'HTTPS://H' || CAST((doc_id // 4) % 7 AS VARCHAR) || "
    "'.EXAMPLE.COM:443/page/' || CAST(doc_id // 4 AS VARCHAR) || '?utm_source=feed' "
    "  WHEN 1 THEN 'https://h' || CAST((doc_id // 4) % 7 AS VARCHAR) || "
    "'.example.com/page/' || CAST(doc_id // 4 AS VARCHAR) || '/' "
    "  WHEN 2 THEN 'https://h' || CAST((doc_id // 4) % 7 AS VARCHAR) || "
    "'.example.com/page/' || CAST(doc_id // 4 AS VARCHAR) || '?utm_campaign=mail' "
    "  ELSE 'https://h' || CAST((doc_id // 4) % 7 AS VARCHAR) || "
    "'.example.com/page/' || CAST(doc_id // 4 AS VARCHAR) END AS url FROM documents"
    "), c AS ("
    "  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(lower(url), "
    "':443/', '/'), '\\?utm_[a-z_]+=[a-z]+$', ''), '/$', '') AS canonical_url FROM u"
    ") SELECT canonical_url, min(doc_id) AS keep_id, "
    "CAST(count(*) AS BIGINT) AS n_variants "
    "FROM c GROUP BY canonical_url"
)


@register("dedup_url", oracle=DEDUP_URL_ORACLE, tier="B")
def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the FIRST dedup gate of every crawl
    pipeline (CommonCrawl-scale corpora shed ~30% of fetches here before
    any content hashing): scheme/host case-folding, default-port (:443)
    stripping, utm_* tracking-parameter removal, and trailing-slash
    normalization collapse cosmetic URL variants onto one canonical key;
    groupBy(canonical) keeps the smallest doc_id per page and counts the
    collapsed variants.

    Messy URLs are synthesized deterministically from the fixture (four
    variants per page id, mirrored byte-for-byte in the oracle) since the
    corpus has no URL column — the operator's subject is the CANONICALIZE →
    GROUP plan: all-codegen string normalization, then one map-side-
    combined aggregate on the canonical key. At 100 TB this is the cheap
    shuffle (one short string key per fetched page) that saves the
    expensive ones downstream (minhash, embeddings)."""
    d = load_table(spark, sf_dir, "documents")
    page = (F.col("doc_id") / 4).cast("long")
    host = F.concat(F.lit("h"), (page % 7).cast("string"), F.lit(".example.com"))
    HOST = F.upper(host)
    path = F.concat(F.lit("/page/"), page.cast("string"))
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("HTTPS://"), HOST, F.lit(":443"), path, F.lit("?utm_source=feed")),
        )
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("https://"), host, path, F.lit("/")))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://"), host, path, F.lit("?utm_campaign=mail")),
        )
        .otherwise(F.concat(F.lit("https://"), host, path))
    )
    canonical = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(url), ":443/", "/"),
            "\\?utm_[a-z_]+=[a-z]+$",
            "",
        ),
        "/$",
        "",
    )
    return (
        d.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_variants"),
        )
    )


# Poisson(λ=1) CDF thresholds for k = 0..5 (exact literals on both engines;
# mass above k=5 → multiplicity 6). Inverse-CDF on a hash-derived uniform
# gives each doc a replayable bootstrap multiplicity.
_POIS1_CDF = (
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.981011843123846", "0.9963401531726563", "0.9994058151824183",
)

_BOOT_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS1_CDF)
    )
    + " ELSE 6 END"
)

SAMPLE_BOOTSTRAP_ORACLE = (
    "WITH b AS (SELECT source, "
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':boot'), 1, 8)) AS BIGINT) "
    "/ 4294967296.0 AS u FROM documents), "
    f"k AS (SELECT source, {_BOOT_CASE_SQL} AS mult FROM b) "
    "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(mult) AS BIGINT) AS n_sampled, "
    "CAST(sum(CASE WHEN mult > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct "
    "FROM k GROUP BY source"
)


@register("sample_bootstrap", oracle=SAMPLE_BOOTSTRAP_ORACLE, tier="B")
def sample_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap: each doc gets a replicate
    multiplicity k ~ Poisson(1) via inverse-CDF over a hash-derived
    uniform — the distributed form of sampling-with-replacement (drawing n
    of n with replacement ≡ independent Poisson(1) multiplicities as
    n→∞), which is how bagging ensembles and confidence intervals are
    computed over data too large to resample centrally (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012).

    u = first-8-hex of md5(doc_id||':boot') / 2³² is dyadic-exact, the CDF
    cuts are identical literals on both engines, so every comparison — and
    therefore every multiplicity — replays identically across engines,
    runs, and partitionings (no RNG state, no seed plumbing). Zero
    shuffle before the per-source census. Changing ':boot' to ':boot2'
    yields the next independent replicate."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":boot"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    mult = F.lit(6)
    for k in range(5, -1, -1):
        mult = F.when(u < float(_POIS1_CDF[k]), k).otherwise(mult)
    return (
        d.select("source", mult.alias("mult"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("mult").cast("long").alias("n_sampled"),
            F.sum(F.when(F.col("mult") > 0, 1).otherwise(0)).cast("long").alias("n_distinct"),
        )
    )
