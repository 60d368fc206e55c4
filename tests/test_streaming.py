"""Real Structured Streaming runs — replay the events fixture as a 4-chunk
file-source micro-batch stream and assert batch equivalence for the §2.9
operators, plus genuine watermark/dedup streaming behavior the batch forms
can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_mapreduce_wordcounting_spark.streaming import events_stream, run_to_batch

from .conftest import SF_DIR


def _normalize(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_stream_tumbling_equals_batch(spark):
    stream, _ = events_stream(spark, SF_DIR)
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("w_start"), "event_type", "cnt")
    )
    result = run_to_batch(spark, agg, output_mode="complete")

    import parallel_mapreduce_wordcounting_spark as engine

    batch = engine.REGISTRY["stream_tumbling"].fn(spark, SF_DIR).drop("avg_value")
    cols = ["w_start", "event_type", "cnt"]
    assert _normalize(result, cols) == _normalize(batch, cols)


def test_stream_session_equals_batch(spark):
    stream, _ = events_stream(spark, SF_DIR)
    agg = (
        stream.withWatermark("ts", "100 days")  # streaming session windows need one
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
    result = run_to_batch(spark, agg, output_mode="complete")

    import parallel_mapreduce_wordcounting_spark as engine

    batch = engine.REGISTRY["stream_session"].fn(spark, SF_DIR)
    cols = ["user_id", "session_start", "n_events"]
    assert _normalize(result, cols) == _normalize(batch, cols)


def test_stream_stateful_counts_equal_batch(spark):
    stream, _ = events_stream(spark, SF_DIR)
    agg = stream.groupBy("user_id").agg(F.count("*").alias("n_events"))
    result = run_to_batch(spark, agg, output_mode="complete")

    import parallel_mapreduce_wordcounting_spark as engine

    batch = engine.REGISTRY["stream_stateful"].fn(spark, SF_DIR)
    cols = ["user_id", "n_events"]
    assert _normalize(result, cols) == _normalize(batch, cols)


def test_stream_dedup_within_watermark_drops_duplicates(spark):
    """dropDuplicatesWithinWatermark: re-send every event twice; the stream
    must still emit each event_id exactly once."""
    src = events_stream(spark, SF_DIR)[0]
    doubled = src.union(src)
    deduped = doubled.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    result = run_to_batch(spark, deduped.select("event_id"), output_mode="append")
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    got = result.count()
    assert got == n_events, f"expected {n_events} unique events, got {got}"


def test_apply_in_pandas_with_state_running_count(spark):
    """Custom stateful operator via applyInPandasWithState: a per-user
    running count carried in GroupState across micro-batches must end at
    the batch groupBy count."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream, _ = events_stream(spark, SF_DIR)

    def running_count(key, pdfs, state: GroupState):
        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [count]})

    counted = (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            running_count,
            outputStructType="user_id long, n_events long",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    result = run_to_batch(spark, counted, output_mode="update")
    # update mode emits one row per user per micro-batch; the max is final
    final = {
        r.user_id: r.n_events
        for r in result.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    }
    batch = {
        r.user_id: r.n_events
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert final == batch


def test_watermark_drops_late_rows(spark):
    """A genuinely late row (beyond the watermark delay, arriving in a later
    run against the same checkpoint) must be excluded from its closed
    window's aggregate. Three sequential availableNow runs share one
    checkpoint so the watermark persists between arrivals."""
    import tempfile

    root = tempfile.mkdtemp(prefix="pmrwc_late_")
    stage, ckpt, out = f"{root}/in", f"{root}/ckpt", f"{root}/out"

    def arrive(rows):
        df = spark.createDataFrame(rows, "event_id long, ts_str string").select(
            "event_id", F.col("ts_str").cast("timestamp").alias("ts")
        )
        df.coalesce(1).write.mode("append").parquet(stage)

    def drain():
        stream = (
            spark.readStream.schema("event_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("cnt"))
            .select(F.col("window.start").alias("w_start"), "cnt")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    arrive([(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")])
    drain()  # watermark advances to 11:50 → the 10:00 window is closed
    arrive([(3, "2024-01-01 10:00:01")])  # late: behind the watermark
    drain()  # 10:00 window emits WITHOUT the late row
    arrive([(4, "2024-01-01 14:00:00")])
    drain()  # closes the 12:00 window too

    counts = {
        r.w_start.strftime("%H"): r.cnt for r in spark.read.parquet(out).collect()
    }
    assert counts.get("10") == 1, f"late row leaked into closed window: {counts}"
    assert counts.get("12") == 1, f"on-time row missing: {counts}"


def test_stream_win_topk_equals_batch(spark):
    """stream_win_topk's documented streaming form: windowed counts run as a
    complete-mode stream; the per-window rank-1 runs on the sink output."""
    from pyspark.sql import Window

    stream, _ = events_stream(spark, SF_DIR)
    counts = (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("w_start"), "event_type", "cnt")
    )
    sink = run_to_batch(spark, counts, output_mode="complete")
    w = Window.partitionBy("w_start").orderBy(F.col("cnt").desc(), "event_type")
    result = (
        sink.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("w_start", "event_type", "cnt")
    )

    import parallel_mapreduce_wordcounting_spark as engine

    batch = engine.REGISTRY["stream_win_topk"].fn(spark, SF_DIR)
    cols = ["w_start", "event_type", "cnt"]
    assert _normalize(result, cols) == _normalize(batch, cols)


def test_streaming_word_count_equals_batch(spark):
    """The flagship reference operator as a REAL stream: incremental word
    counts over a documents file-stream (4 micro-batches, complete mode)
    must equal the batch wc_counts operator exactly — Structured Streaming's
    incremental hash aggregate is the MapReduce combine/reduce, maintained
    across batches."""
    from parallel_mapreduce_wordcounting_spark.streaming.runner import (
        documents_stream,
    )

    stream, _ = documents_stream(spark, SF_DIR)
    counts = (
        stream.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    result = run_to_batch(spark, counts, output_mode="complete")

    import parallel_mapreduce_wordcounting_spark as engine

    batch = engine.REGISTRY["wc_counts"].fn(spark, SF_DIR)
    cols = ["word", "cnt"]
    assert _normalize(result, cols) == _normalize(batch, cols)


def test_custom_state_equals_batch_aggregate(spark):
    """Round-6: ARBITRARY per-user state (count, last-seen µs, integer-cent
    total) carried in GroupState via applyInPandasWithState across the
    4-chunk micro-batch replay. The final state must equal stream_stateful's
    batch aggregate row-for-row — and state must demonstrably carry ACROSS
    batches (users spanning several chunks emit several monotone updates)."""
    from parallel_mapreduce_wordcounting_spark.streaming import user_state_stream

    stream, _ = events_stream(spark, SF_DIR)
    result = run_to_batch(spark, user_state_stream(stream), output_mode="update")

    rows = result.collect()
    # state carried across micro-batches: most users appear in >1 chunk and
    # so emit >1 cumulative update
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    assert max(len(v) for v in per_user.values()) >= 2
    final = {
        u: max(v, key=lambda r: r.n_events)  # n_events is monotone per user
        for u, v in per_user.items()
    }

    import parallel_mapreduce_wordcounting_spark as engine

    batch = {
        r.user_id: r
        for r in engine.REGISTRY["stream_stateful"].fn(spark, SF_DIR).collect()
    }
    assert set(final) == set(batch)
    for u, got in final.items():
        want = batch[u]
        assert got.n_events == want.n_events, u
        from datetime import timezone

        # collected timestamps are UTC wall time (session tz); pin the tz
        # rather than trusting naive .timestamp()'s local-tz assumption
        want_us = int(
            want.last_ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000
        )
        assert got.last_ts_us == want_us, u
        assert got.total_value == want.total_value, u


def test_stream_static_join_equals_batch(spark):
    """Stream-static enrichment: the events stream joined to the static
    customer dimension per micro-batch must equal the registered batch
    form exactly (stateless join + complete-mode aggregate)."""
    import parallel_mapreduce_wordcounting_spark as engine

    stream, _ = events_stream(spark, SF_DIR)
    c = engine.load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey"
    )
    agg = (
        stream.join(F.broadcast(c), stream.user_id == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 6).alias("avg_value"))
    )
    result = run_to_batch(spark, agg, output_mode="complete")
    batch = engine.REGISTRY["stream_static_join"].fn(spark, SF_DIR)
    cols = ["c_nationkey", "cnt", "avg_value"]
    assert _normalize(result, cols) == _normalize(batch, cols)


def test_stream_stream_join_equals_batch(spark):
    """Stream-stream interval join: two independent readStreams over the
    same event replay, views joined to purchases within 30 minutes. The
    far watermark keeps all state live across micro-batches, so the append
    sink must contain exactly the batch join's pairs — including pairs
    whose two sides arrived in different micro-batches."""
    import parallel_mapreduce_wordcounting_spark as engine

    s1, _ = events_stream(spark, SF_DIR)
    s2, _ = events_stream(spark, SF_DIR)
    v = (
        s1.where("event_type = 'view'")
        .select("user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "100 days")
    )
    p = (
        s2.where("event_type = 'purchase'")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "100 days")
    )
    j = v.join(
        p,
        (v.user_id == p.p_user)
        & (p.p_ts >= v.v_ts)
        & (p.p_ts <= v.v_ts + F.expr("INTERVAL 30 MINUTES")),
    )
    result = run_to_batch(
        spark, j.select("view_id", "purchase_id"), output_mode="append"
    )
    batch = engine.REGISTRY["stream_stream_join"].fn(spark, SF_DIR)
    cols = ["view_id", "purchase_id"]
    assert _normalize(result, cols) == _normalize(batch, cols)
    assert result.count() > 0  # non-vacuous at this SF


def test_foreach_batch_cdc_upsert_equals_batch_compaction(spark):
    """Round-7: the streaming twin of ``cdc_apply`` — a foreachBatch upsert
    sink (the production Delta/Iceberg MERGE topology) replaying the events
    changelog in 4 micro-batches must converge to exactly the batch
    compaction's snapshot. Each batch is compacted with the SAME
    max_by(struct) aggregate, then merged last-write-wins into the running
    snapshot; tombstones only win while nothing newer follows in a LATER
    batch."""
    from pyspark.sql import functions as F

    import parallel_mapreduce_wordcounting_spark as engine
    from parallel_mapreduce_wordcounting_spark.sources.loader import ts_us

    snapshot: dict[int, tuple] = {}  # user_id -> (version, op, value)
    n_changes: dict[int, int] = {}
    batches_seen = []

    def upsert(batch_df, batch_id):
        compacted = (
            batch_df.select(
                "user_id",
                ts_us("ts").alias("ts_us"),
                "event_id",
                "value",
                F.when(F.col("event_type") == "error", F.lit("delete"))
                .otherwise(F.lit("upsert"))
                .alias("op"),
            )
            .groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("op", "value"), F.struct("ts_us", "event_id")
                ).alias("last"),
                F.max(F.struct("ts_us", "event_id")).alias("ver"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        batches_seen.append(len(compacted))
        for r in compacted:
            ver = (r.ver.ts_us, r.ver.event_id)
            n_changes[r.user_id] = n_changes.get(r.user_id, 0) + r.n
            prev = snapshot.get(r.user_id)
            if prev is None or ver > prev[0]:
                snapshot[r.user_id] = (ver, r.last.op, r.last.value)

    stream, _ = events_stream(spark, SF_DIR)
    q = (
        stream.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    assert len(batches_seen) >= 4  # genuinely incremental, not one big batch

    got = {
        u: (round(v, 2), n_changes[u])
        for u, (_, op, v) in snapshot.items()
        if op != "delete"
    }
    want = {
        r.user_id: (r.last_value, r.n_changes)
        for r in engine.REGISTRY["cdc_apply"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_checkpoint_recovery_resumes_without_loss_or_duplication(spark, tmp_path):
    """REAL stop/restart recovery through a checkpoint: a stateful count
    drains two source files, the query STOPS (process-restart simulation),
    two more files arrive, and a new query object with the SAME checkpoint
    resumes — the final state must equal the all-at-once batch aggregate
    (checkpointed state survived; consumed files were not reprocessed), and
    a third restart with no new data must emit nothing. This is the
    exactly-once story a 100 TB streaming pipeline actually relies on."""
    import time

    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table

    src = load_table(spark, SF_DIR, "events")
    stage = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    chunks = [src.where(F.col("event_id") % 4 == i) for i in range(4)]

    state: dict[str, int] = {}
    batch_ids: list[int] = []

    def sink(batch_df, batch_id):
        batch_ids.append(batch_id)
        for r in batch_df.collect():
            state[r.event_type] = r.cnt

    def start_query():
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(stage)
        )
        return (
            stream.groupBy("event_type")
            .agg(F.count("*").alias("cnt"))
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )

    for i in (0, 1):
        chunks[i].coalesce(1).write.mode("overwrite").parquet(f"{stage}/c{i}")
    q = start_query()
    q.awaitTermination(120)
    assert not q.isActive
    n_first = len(batch_ids)
    assert n_first >= 1
    partial = dict(state)
    assert sum(partial.values()) == chunks[0].count() + chunks[1].count()

    for i in (2, 3):
        chunks[i].coalesce(1).write.mode("overwrite").parquet(f"{stage}/c{i}")
    q2 = start_query()  # NEW query object, same checkpoint
    q2.awaitTermination(120)
    assert not q2.isActive
    # recovered state + new batches = the batch aggregate over everything
    truth = {
        r.event_type: r.cnt
        for r in src.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert state == truth
    # restart 3: no new files -> no re-emission of consumed batches
    n_before = len(batch_ids)
    q3 = start_query()
    q3.awaitTermination(120)
    assert not q3.isActive
    new_batches = batch_ids[n_before:]
    assert all(b not in batch_ids[:n_before] for b in new_batches)
    assert state == truth  # an (empty) bookkeeping batch must not change state


def test_anomaly_state_machine_equals_batch_window(spark):
    """The per-user prior-stats anomaly stream must flag EXACTLY the rows a
    batch unboundedPreceding→-1 window flags: order-dependent custom state
    (each decision uses only earlier events) carried across 4 real
    micro-batches, with μ/σ² written as the identical double expressions on
    both sides so the booleans are bit-equal, not approximately equal."""
    from parallel_mapreduce_wordcounting_spark.operators.exact import money_cents
    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table
    from parallel_mapreduce_wordcounting_spark.streaming.runner import (
        events_stream,
        run_to_batch,
    )
    from parallel_mapreduce_wordcounting_spark.streaming.stateful import (
        ANOMALY_MIN_PRIOR,
        ANOMALY_Z2,
        user_anomaly_stream,
    )

    stream, _ = events_stream(spark, SF_DIR)
    got = {
        r.event_id: (r.n_prior, r.is_anomaly)
        for r in run_to_batch(
            spark, user_anomaly_stream(stream), output_mode="append"
        ).collect()
    }

    from pyspark.sql import Window

    e = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", money_cents(F.col("value")).alias("c")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.coalesce(F.count("c").over(w), F.lit(0))
    s = F.coalesce(F.sum("c").over(w), F.lit(0))
    ss = F.coalesce(F.sum(F.col("c") * F.col("c")).over(w), F.lit(0))
    mean = s / n
    var = (ss - s * (s / n)) / n
    dev = F.col("c") - mean
    batch = e.select(
        "event_id",
        n.alias("n_prior"),
        F.when(
            n >= ANOMALY_MIN_PRIOR, dev * dev > F.lit(ANOMALY_Z2) * var
        )
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )
    want = {r.event_id: (r.n_prior, r.is_anomaly) for r in batch.collect()}
    assert got == want
    assert any(flag for _, flag in got.values())  # the fixture has outliers


def test_anomaly_stream_rejects_cross_batch_time_regression(spark, tmp_path):
    """ADVICE r7: the batch-equivalence contract assumes each user's events
    arrive in event-time order ACROSS micro-batches; with a real
    out-of-order source the flags would silently diverge. The state now
    carries max seen event time per user and a regression must kill the
    query loudly instead."""
    import time

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from parallel_mapreduce_wordcounting_spark.streaming.runner import run_to_batch
    from parallel_mapreduce_wordcounting_spark.streaming.stateful import (
        user_anomaly_stream,
    )

    schema = "event_id long, user_id long, ts timestamp, value double"
    late_first = spark.createDataFrame(
        [(10 + i, 1, f"2024-01-02 00:00:{i:02d}", 1.0) for i in range(6)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    early_second = spark.createDataFrame(
        [(i, 1, f"2024-01-01 00:00:{i:02d}", 1.0) for i in range(6)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # file source replays in modification-time order: write the LATER
    # events first so the second micro-batch regresses user 1's clock
    late_first.coalesce(1).write.parquet(str(tmp_path / "c1"))
    time.sleep(1.1)  # distinct mtimes on coarse filesystems
    early_second.coalesce(1).write.parquet(str(tmp_path / "c2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path))
    )
    with pytest.raises(StreamingQueryException, match="order violated"):
        run_to_batch(spark, user_anomaly_stream(stream), output_mode="append")


# --- idempotent foreachBatch upsert sink (streaming/sinks.py) ----------------


def test_stream_upsert_converges_to_batch_truth(spark):
    """The copy-on-write upsert table, fed by 4 micro-batches of complete-
    mode per-user totals, must equal the static batch aggregate exactly."""
    from pyspark.sql import functions as F

    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table
    from parallel_mapreduce_wordcounting_spark.streaming import sinks

    table = sinks.UpsertTable(None, ["user_id"])
    try:
        got = {
            r["user_id"]: (r["n_events"], r["cents"])
            for r in sinks.stream_upsert_user_totals(spark, SF_DIR, table).collect()
        }
        want = {
            r["user_id"]: (r["n_events"], r["cents"])
            for r in load_table(spark, SF_DIR, "events")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(
                    (
                        F.signum("value") * F.floor(F.abs(F.col("value")) * 100 + 0.5)
                    ).cast("long")
                ).alias("cents"),
            )
            .collect()
        }
        assert got == want
    finally:
        table.cleanup()


def test_upsert_batch_redelivery_is_noop(spark):
    """Re-applying an already-committed batch_id (the crash-between-write-
    and-checkpoint replay) must not change the table — the exactly-once
    contract foreachBatch delegates to the sink."""
    from parallel_mapreduce_wordcounting_spark.streaming import sinks

    table = sinks.UpsertTable(None, ["k"])
    try:
        b0 = spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"])
        table.apply_batch(b0, 0)
        snap0 = sorted(tuple(r) for r in table.read(spark).collect())
        # redelivery of batch 0 with DIFFERENT (corrupted) content: still a
        # no-op, because batch 0 is committed
        table.apply_batch(spark.createDataFrame([(1, 999)], ["k", "v"]), 0)
        assert sorted(tuple(r) for r in table.read(spark).collect()) == snap0
        # a genuinely new batch updates key 1 and inserts key 3
        table.apply_batch(spark.createDataFrame([(1, 11), (3, 30)], ["k", "v"]), 1)
        assert sorted(tuple(r) for r in table.read(spark).collect()) == [
            (1, 11),
            (2, 20),
            (3, 30),
        ]
        # old version directory still readable (time travel by pointer)
        assert table.current_version() == 1
        assert table.committed(0) and table.committed(1)
    finally:
        table.cleanup()


def test_upsert_crash_between_write_and_pointer_flip_is_recovered(spark):
    """ADVICE r7 (medium): a crash AFTER the version write but BEFORE the
    _LATEST pointer flip leaves a complete-looking v{batch_id} dir that no
    reader resolves. The redelivered batch must re-apply (committed() is
    pointer-based, not marker-based) — previously it no-op'd and the
    batch's merge was silently lost."""
    import os
    import shutil

    from parallel_mapreduce_wordcounting_spark.streaming import sinks

    table = sinks.UpsertTable(None, ["k"])
    try:
        table.apply_batch(spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"]), 0)
        # simulate the crash window for batch 1: version dir fully written
        # (with _SUCCESS) but the pointer never flipped
        table.apply_batch(spark.createDataFrame([(1, 11), (3, 30)], ["k", "v"]), 1)
        with open(table._pointer(), "w") as fh:
            fh.write("0")  # roll the pointer back: the flip "never happened"
        assert os.path.isfile(os.path.join(table.root, "v1", "_SUCCESS"))
        assert not table.committed(1)  # marker alone must NOT count
        # redelivery of batch 1 must merge for real, not no-op
        table.apply_batch(spark.createDataFrame([(1, 11), (3, 30)], ["k", "v"]), 1)
        assert table.current_version() == 1
        assert sorted(tuple(r) for r in table.read(spark).collect()) == [
            (1, 11),
            (2, 20),
            (3, 30),
        ]
        # and a redelivery of an OLDER batch stays a no-op under the
        # pointer-based rule (pointer 1 covers batch 0)
        table.apply_batch(spark.createDataFrame([(1, 999)], ["k", "v"]), 0)
        assert sorted(tuple(r) for r in table.read(spark).collect()) == [
            (1, 11),
            (2, 20),
            (3, 30),
        ]
    finally:
        table.cleanup()
