"""Warehouse-maintenance operators: MERGE-style upsert and SCD2 dimension
history — the mutation patterns a lakehouse runs nightly, expressed as pure
batch joins/windows so they stay oracle-checkable (a Delta/Iceberg MERGE is
exactly this plan plus a transactional commit protocol underneath).

The "source" (changed rows) is synthesized deterministically from the fixture
itself so the oracle can mirror it: updates bump every 10th order's total by
exactly +1.0 (an exact float op — no rounding divergence), inserts clone
every 97th order under a shifted key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table, ts_us

# Insert-clone keys are shifted ABOVE the live key space by max(key)+1,
# derived from the data on both engines (ADVICE r5: a fixed 10M constant
# collides with real TPC-H orderkeys — they reach 6M·SF — from SF≈1.7,
# silently turning inserts into spurious matches).

MERGE_UPSERT_ORACLE = (
    "WITH shift AS (SELECT max(o_orderkey) + 1 AS s FROM orders), "
    "src AS ("
    "  SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, 'update' AS op"
    "  FROM orders WHERE o_orderkey % 10 = 0"
    "  UNION ALL "
    "  SELECT o_orderkey + (SELECT s FROM shift), o_totalprice, 'insert'"
    "  FROM orders WHERE o_orderkey % 97 = 0"
    ") SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey, "
    "coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice, "
    "coalesce(s.op, 'keep') AS op "
    "FROM (SELECT o_orderkey, o_totalprice FROM orders) t "
    "FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey"
)


@register("merge_upsert", oracle=MERGE_UPSERT_ORACLE, tier="C")
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a full outer join: matched rows take the
    source's values ('update'), unmatched source rows append ('insert'),
    unmatched target rows pass through ('keep').

    Scale: one shuffle on the merge key for each side — and in a real
    deployment the target is bucketed on the key, so only the (much
    smaller) source side shuffles per run; Delta/Iceberg add file-level
    pruning so only touched files rewrite. The coalesce-based column
    resolution is exactly how Spark's own MERGE compiles when both WHEN
    MATCHED and WHEN NOT MATCHED update all columns. The insert-key shift
    is max(o_orderkey)+1 computed IN the plan (broadcast 1-row aggregate,
    no collect) so synthetic inserts can never collide with live keys at
    any SF; the oracle derives the identical scalar via a subquery."""
    base = load_table(spark, sf_dir, "orders")
    t = base.select("o_orderkey", "o_totalprice")
    shift = F.broadcast(base.agg((F.max("o_orderkey") + 1).alias("s")))
    src = (
        base.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
            F.lit("update").alias("op"),
        )
        .unionAll(
            base.where(F.col("o_orderkey") % 97 == 0)
            .crossJoin(shift)
            .select(
                (F.col("o_orderkey") + F.col("s")).alias("o_orderkey"),
                "o_totalprice",
                F.lit("insert").alias("op"),
            )
        )
    )
    joined = t.alias("t").join(
        src.alias("s"), F.col("t.o_orderkey") == F.col("s.o_orderkey"), "full_outer"
    )
    return joined.select(
        F.coalesce("s.o_orderkey", "t.o_orderkey").alias("o_orderkey"),
        F.coalesce("s.o_totalprice", "t.o_totalprice").alias("o_totalprice"),
        F.coalesce("s.op", F.lit("keep")).alias("op"),
    )


SCD2_ORACLE = (
    "WITH e AS ("
    "  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us, event_id"
    "  FROM events"
    "), marked AS ("
    "  SELECT user_id, event_type, ts_us, event_id, "
    "    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type"
    "         THEN 1 ELSE 0 END AS is_change"
    "  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)"
    "), runs AS ("
    "  SELECT user_id, event_type, ts_us, CAST(sum(is_change) OVER ("
    "    PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING"
    "  ) AS BIGINT) AS version FROM marked"
    "), hist AS ("
    "  SELECT user_id, version, min(event_type) AS state, "
    "         min(ts_us) AS valid_from_us FROM runs GROUP BY user_id, version"
    ") SELECT user_id, version, state, valid_from_us, "
    "lead(valid_from_us) OVER ("
    "  PARTITION BY user_id ORDER BY version) AS valid_to_us "
    "FROM hist"
)


@register("scd2_build", oracle=SCD2_ORACLE, tier="C")
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event log: each run
    of consecutive identical states per user becomes one version row with
    [valid_from, valid_to) microsecond bounds (valid_to null = current) —
    the standard gaps-and-islands change-capture that turns an append-only
    log into a point-in-time joinable dimension.

    Scale: everything is windows and aggregates over ONE user_id
    partitioning — Catalyst keeps the lag, the running change-count, the
    per-version aggregate and the lead on a single exchange layout."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", ts_us("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = e.select(
        "user_id",
        "event_type",
        "ts_us",
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0).alias("is_change"),
    )
    w_run = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    runs = marked.select(
        "user_id",
        "event_type",
        "ts_us",
        F.sum("is_change").over(w_run).alias("version"),
    )
    hist = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"), F.min("ts_us").alias("valid_from_us")
    )
    w_ver = Window.partitionBy("user_id").orderBy("version")
    return hist.select(
        "user_id",
        "version",
        "state",
        "valid_from_us",
        F.lead("valid_from_us").over(w_ver).alias("valid_to_us"),
    )


CDC_APPLY_ORACLE = (
    "WITH ch AS ("
    "  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id, value, "
    "  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op"
    "  FROM events"
    "), r AS ("
    "  SELECT user_id, op, value, "
    "  row_number() OVER ("
    "    PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn, "
    "  count(*) OVER (PARTITION BY user_id) AS n_changes FROM ch"
    ") SELECT user_id, round(value, 2) AS last_value, "
    "CAST(n_changes AS BIGINT) AS n_changes "
    "FROM r WHERE rn = 1 AND op <> 'delete'"
)


@register("cdc_apply", oracle=CDC_APPLY_ORACLE, tier="C")
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture compaction: collapse a multi-version changelog to
    the latest surviving state per key (last-write-wins, deletes drop the
    key) — the Debezium/Kafka-topic-to-snapshot pattern, and the batch
    equivalent of a streaming upsert sink. The changelog is synthesized
    deterministically from events: every row is a change to its user_id,
    'error' rows are tombstones, (ts, event_id) is the total version order.

    Scale: deliberately NOT the oracle's row_number window (which sorts
    every version of every key): ``max_by(struct(op, value),
    struct(ts_us, event_id))`` is a hash aggregate with map-side partial
    combine, so each partition forwards ONE candidate row per key and the
    single shuffle moves keys, not versions — at 100 TB of changelog with
    hot keys (the realistic shape: few keys, many updates) this is the
    difference between a bounded aggregate and a straggler sort. Struct
    ordering is lexicographic on both the comparand and the ordering key,
    exactly the (ts_us, event_id) DESC-first semantics the oracle's window
    expresses. Tombstones filter AFTER the aggregate: a delete only wins if
    it is genuinely the newest change."""
    e = load_table(spark, sf_dir, "events")
    ch = e.select(
        "user_id",
        ts_us("ts").alias("ts_us"),
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    latest = ch.groupBy("user_id").agg(
        F.max_by(
            F.struct("op", "value"), F.struct("ts_us", "event_id")
        ).alias("last"),
        F.count("*").alias("n_changes"),
    )
    return latest.where(F.col("last.op") != "delete").select(
        "user_id",
        F.round(F.col("last.value"), 2).alias("last_value"),
        "n_changes",
    )
