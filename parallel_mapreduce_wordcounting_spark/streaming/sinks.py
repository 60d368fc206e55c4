"""Idempotent streaming upsert sink — the ``foreachBatch`` exactly-once
pattern over a plain-parquet copy-on-write table (no Delta/Iceberg in this
environment, so the two primitives those formats provide are built from
scratch, visibly):

1. **versioned commits**: every micro-batch writes a NEW immutable version
   directory ``v{batch_id}`` — never rewriting the live one in place — and
   then flips a single pointer file (``_LATEST``) via the filesystem's
   atomic rename. Readers resolve the pointer first, so they see either the
   old or the new version, never a half-written mix.
2. **idempotent retries**: Structured Streaming re-delivers a batch (same
   ``batch_id``) after a failure between sink-write and checkpoint-commit.
   A committed ``batch_id`` marker makes the re-apply a NO-OP, which is
   exactly the contract ``foreachBatch`` documents the sink must provide
   to upgrade at-least-once delivery to effectively-exactly-once.

The merge itself is last-writer-wins per key on the monotonically
increasing ``batch_id`` — the streaming CDC upsert (warehouse.merge_upsert
is the batch twin).

At 100 TB the same design holds with two refinements a real table format
adds: partition-level (not table-level) rewrites so a commit touches only
affected partitions, and a manifest of data files instead of a directory
listing. The pointer-swap commit protocol is identical.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class UpsertTable:
    """A tiny copy-on-write keyed table with atomic pointer commits."""

    def __init__(self, root: str | None, key_cols: list[str]):
        self.root = root or tempfile.mkdtemp(prefix="pmrwc_upsert_")
        self.key_cols = list(key_cols)
        os.makedirs(self.root, exist_ok=True)

    # -- commit protocol -------------------------------------------------

    def _pointer(self) -> str:
        return os.path.join(self.root, "_LATEST")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer()) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _commit(self, version: int) -> None:
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._pointer())  # atomic on POSIX

    def committed(self, batch_id: int) -> bool:
        """A batch is committed only when the POINTER covers it.

        The version directory's ``_SUCCESS`` marker is NOT sufficient: the
        parquet write creates it before :meth:`_commit` flips ``_LATEST``,
        so a crash in that window leaves a complete-looking ``v{batch_id}``
        that no reader will ever resolve. Testing the marker here made the
        redelivered batch a silent no-op while the pointer still targeted
        the old version — the batch's merge was lost and every later batch
        merged from stale state (ADVICE r7, medium). Pointer-based
        committedness is crash-consistent because batch ids are monotonic
        and each version folds in all prior state: pointer >= batch_id ⇔
        this batch's merge is visible to readers."""
        v = self.current_version()
        return v is not None and v >= batch_id

    # -- read / upsert ---------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        v = self.current_version()
        if v is None:
            return None
        return spark.read.parquet(os.path.join(self.root, f"v{v}")).drop("_batch")

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch body: no-op on redelivery, else merge + commit."""
        if self.committed(batch_id):
            return  # retry of an already-committed batch: exactly-once no-op
        spark = batch_df.sparkSession
        new = batch_df.withColumn("_batch", F.lit(int(batch_id)))
        v = self.current_version()
        if v is not None:
            cur = spark.read.parquet(os.path.join(self.root, f"v{v}"))
            merged = cur.unionByName(new)
        else:
            merged = new
        w = Window.partitionBy(*self.key_cols).orderBy(F.col("_batch").desc())
        dedup = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        out = os.path.join(self.root, f"v{batch_id}")
        dedup.write.mode("overwrite").parquet(out)
        self._commit(int(batch_id))

    def cleanup(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)


def stream_upsert_user_totals(
    spark: SparkSession, sf_dir: str, table: UpsertTable | None = None
) -> DataFrame:
    """Flagship streaming upsert: per-user running event totals maintained
    as a KEYED TABLE (not an append log) by foreachBatch upserts — each
    micro-batch recomputes the affected users' totals and last-writer-wins
    merges them into the copy-on-write table.

    Uses complete-mode aggregation upstream so each batch emits full
    per-user totals; the sink's key-merge makes the table converge to the
    batch ground truth (asserted in tests against the static groupBy)."""
    from .runner import events_stream

    table = table or UpsertTable(None, ["user_id"])
    stream, stage = events_stream(spark, sf_dir)
    agg = stream.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(
            (F.signum("value") * F.floor(F.abs(F.col("value")) * 100 + 0.5)).cast(
                "long"
            )
        ).alias("cents"),
    )
    q = (
        agg.writeStream.foreachBatch(table.apply_batch)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
        raise TimeoutError("upsert stream did not drain")
    shutil.rmtree(stage, ignore_errors=True)
    out = table.read(spark)
    assert out is not None
    return out
