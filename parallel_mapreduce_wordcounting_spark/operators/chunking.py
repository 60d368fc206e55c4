"""Document chunking and corpus-level block dedup — the segmentation stages
between raw documents and training sequences (the complement of
``pack_sequences``, which assembles; these SPLIT and CLEAN).

- ``text_chunk``: overlapping token-window chunking (RAG indexing /
  long-doc pretraining prep). Pure array built-ins + one explode; no
  shuffle at all — embarrassingly parallel, which is what a 100 TB
  chunking pass must be.
- ``dedup_lines``: C4-style corpus-wide repeated-block removal (Raffel et
  al. 2020 dropped any line occurring >=3 times in C4; the fixture corpus
  has no newlines, so the "line" unit here is the 4-token block). One
  count shuffle + one key join + one doc regroup — never all-pairs.

House rules as everywhere: built-in JVM expressions only, every computed
column aliased identically in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table

# --- overlapping token chunking ---------------------------------------------

CHUNK_SIZE = 32  # tokens per chunk
CHUNK_STRIDE = 24  # 25% overlap between neighbors

TEXT_CHUNK_ORACLE = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "s AS (SELECT doc_id, toks, len(toks) AS n, "
    f"      unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS start FROM t) "
    f"SELECT doc_id, CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id, "
    f"array_to_string(list_slice(toks, start + 1, start + {CHUNK_SIZE}), ' ') AS chunk_text, "
    f"CAST(least({CHUNK_SIZE}, n - start) AS BIGINT) AS n_tokens "
    "FROM s"
)


@register("text_chunk", oracle=TEXT_CHUNK_ORACLE, tier="B")
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping token windows with stable,
    per-document chunk ids — the standard RAG-indexing / long-document
    segmentation pass (size 32, stride 24 here; the constants are the only
    tuning surface).

    Chunk starts are ``0, stride, 2*stride, ...`` while ``start < n``, so
    the final chunk may be short (``n_tokens`` says how short) and every
    token belongs to at least one chunk. Scale: ``split``/``sequence``/
    ``slice``/``array_join`` are all whole-stage-codegen array expressions
    and the explode is per-row — zero shuffles, linear in corpus size, and
    the output inherits the input partitioning (chunk ids are
    document-local, so no global coordination exists to pay for)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    d = d.withColumn("n", F.size("toks")).select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    return d.select(
        "doc_id",
        F.expr(f"start div {CHUNK_STRIDE}").cast("long").alias("chunk_id"),
        F.array_join(
            F.slice("toks", F.col("start") + 1, F.lit(CHUNK_SIZE)), " "
        ).alias("chunk_text"),
        F.least(F.lit(CHUNK_SIZE), F.col("n") - F.col("start"))
        .cast("long")
        .alias("n_tokens"),
    )


# --- corpus-wide repeated-block removal (C4-style line dedup) ----------------

BLOCK = 4  # tokens per block ("line" unit — the fixture corpus has no \n)
LINE_DUP_MIN = 3  # C4's rule: drop content occurring >= 3 times corpus-wide

DEDUP_LINES_ORACLE = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "b AS (SELECT doc_id, toks, "
    f"      unnest(generate_series(0, (len(toks) - 1) // {BLOCK})) AS i FROM t), "
    "blk AS (SELECT doc_id, i, "
    f"       array_to_string(list_slice(toks, i * {BLOCK} + 1, i * {BLOCK} + {BLOCK}), ' ') AS bt "
    "       FROM b), "
    "c AS (SELECT bt, count(*) AS cnt FROM blk GROUP BY bt) "
    "SELECT blk.doc_id, CAST(count(*) AS BIGINT) AS n_blocks, "
    f"CAST(count(*) FILTER (WHERE c.cnt >= {LINE_DUP_MIN}) AS BIGINT) AS n_removed, "
    # coalesce: an all-removed doc has an empty kept-list, which DuckDB's
    # FILTERed list() returns as NULL but Spark's array_join renders as ''
    f"coalesce(array_to_string(list(blk.bt ORDER BY blk.i) FILTER (WHERE c.cnt < {LINE_DUP_MIN}), ' '), '') "
    "AS cleaned_text "
    "FROM blk JOIN c USING (bt) GROUP BY blk.doc_id"
)


@register("dedup_lines", oracle=DEDUP_LINES_ORACLE, tier="B")
def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove blocks of text that repeat across the corpus (boilerplate,
    navigation chrome, license headers), keeping each document's surviving
    blocks in original order — C4's ">=3 occurrences" line rule applied at
    the 4-token-block granularity this fixture supports.

    Plan: explode blocks (no shuffle) -> groupBy block text for corpus
    counts (shuffle 1, map-side combined) -> join blocks back to counts on
    block text (shuffle 2; this is the inverted-index shape — cost is
    Sum(freq) over blocks, never all-pairs) -> regroup by doc_id to
    reconstruct (shuffle 3). At 100 TB the counts side can first be
    filtered to ``cnt >= LINE_DUP_MIN`` and broadcast when the heavy-block
    set is small (it usually is — boilerplate is by definition few distinct
    strings), collapsing shuffle 2 into a broadcast anti-lookup; the
    general shuffle-join form here is the fallback that never OOMs."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    blk = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0), ((F.size("toks") - 1) / F.lit(BLOCK)).cast("int")
            )
        ).alias("i"),
    ).select(
        "doc_id",
        "i",
        F.array_join(
            F.slice("toks", F.col("i") * BLOCK + 1, F.lit(BLOCK)), " "
        ).alias("bt"),
    )
    counts = blk.groupBy("bt").agg(F.count("*").alias("cnt"))
    joined = blk.join(counts, "bt")
    kept_struct = F.struct(
        F.col("i"),
        F.when(F.col("cnt") < LINE_DUP_MIN, F.col("bt")).alias("bt"),
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.count_if(F.col("cnt") >= LINE_DUP_MIN).alias("n_removed"),
            F.array_join(
                F.filter(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x["bt"],
                    ),
                    lambda s: s.isNotNull(),
                ),
                " ",
            ).alias("cleaned_text"),
        )
        .select("doc_id", "n_blocks", "n_removed", "cleaned_text")
    )


# --- composed RAG index build ------------------------------------------------

PIPELINE_RAG_ORACLE = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "s AS (SELECT doc_id, toks, len(toks) AS n, "
    f"      unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS start FROM t), "
    f"ch AS (SELECT doc_id, CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id, "
    f"array_to_string(list_slice(toks, start + 1, start + {CHUNK_SIZE}), ' ') AS chunk_text, "
    f"CAST(least({CHUNK_SIZE}, n - start) AS BIGINT) AS n_tokens FROM s), "
    "fp AS (SELECT doc_id, chunk_id, n_tokens, md5(chunk_text) AS fp FROM ch) "
    "SELECT doc_id, chunk_id, n_tokens, fp, "
    "(row_number() OVER (PARTITION BY fp ORDER BY doc_id, chunk_id) = 1) AS is_canonical "
    "FROM fp"
)


@register("pipeline_rag_index", oracle=PIPELINE_RAG_ORACLE, tier="B")
def pipeline_rag_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed RAG-index build: chunk every document (text_chunk's
    geometry), content-fingerprint each chunk (md5 — same literal function
    both engines), and mark one canonical copy per distinct chunk content
    (first (doc_id, chunk_id) wins). Downstream, only canonical chunks get
    embedded — on repetitive corpora that is the single biggest cost lever
    an embedding pipeline has, and retrieval hits on a duplicate resolve
    through its canonical chunk's fingerprint.

    Plan: zero-shuffle chunking -> one window shuffle on the fingerprint
    (the dedup key, uniformly distributed by construction — md5 can't
    skew). At 100 TB the window's per-key state is the duplicate family
    size; pathological families (the empty chunk, boilerplate) are exactly
    what dedup_lines removes upstream in the full curation chain."""
    ch = text_chunk(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("doc_id", "chunk_id")
    return (
        ch.withColumn("fp", F.md5("chunk_text"))
        .withColumn("is_canonical", F.row_number().over(w) == 1)
        .select("doc_id", "chunk_id", "n_tokens", "fp", "is_canonical")
    )


@register("dedup_lines_bcast", oracle=DEDUP_LINES_ORACLE, tier="B")
def dedup_lines_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`dedup_lines` computed by its documented scale path: the
    corpus count table is filtered to the heavy blocks FIRST
    (cnt >= LINE_DUP_MIN — by definition few distinct strings, boilerplate
    is concentrated) and broadcast, so the block stream is never shuffled
    on block text; a broadcast left join marks heavy blocks in place and
    the only remaining shuffles are the count aggregate and the per-doc
    regroup. Identical output, same oracle — the same share-the-oracle
    pattern as dedup_cluster_star."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    blk = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), ((F.size("toks") - 1) / F.lit(BLOCK)).cast("int"))
        ).alias("i"),
    ).select(
        "doc_id",
        "i",
        F.array_join(F.slice("toks", F.col("i") * BLOCK + 1, F.lit(BLOCK)), " ").alias(
            "bt"
        ),
    )
    heavy = (
        blk.groupBy("bt")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= LINE_DUP_MIN)
        .select("bt", F.lit(True).alias("is_heavy"))
    )
    marked = blk.join(F.broadcast(heavy), "bt", "left").withColumn(
        "is_heavy", F.coalesce("is_heavy", F.lit(False))
    )
    kept_struct = F.struct(
        F.col("i"), F.when(~F.col("is_heavy"), F.col("bt")).alias("bt")
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.count_if(F.col("is_heavy")).alias("n_removed"),
            F.array_join(
                F.filter(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)), lambda x: x["bt"]
                    ),
                    lambda s: s.isNotNull(),
                ),
                " ",
            ).alias("cleaned_text"),
        )
        .select("doc_id", "n_blocks", "n_removed", "cleaned_text")
    )
