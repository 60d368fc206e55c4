"""Real Structured Streaming runner — replays the static events fixture as a
file-source micro-batch stream so tests can assert batch equivalence.

The events parquet is re-written into N chunk files in a temp dir; a
readStream with maxFilesPerTrigger=1 consumes them as N micro-batches into a
memory sink. ``run_to_batch`` blocks until the stream drains and returns the
sink contents as a DataFrame.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table


def events_stream(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> tuple[DataFrame, str]:
    """Re-write events (ts already converted to TimestampType) into n_chunks
    files and open a file-source stream over them.

    Chunks are split on ``event_id % n_chunks`` so replay order is
    deterministic-ish but interleaved in event time — a realistic ooo stream.
    """
    from pyspark.sql import Window

    src = load_table(spark, sf_dir, "events")
    stage = tempfile.mkdtemp(prefix="pmrwc_stream_")
    # Chunk in EVENT-TIME order (ntile over ts) and write sequentially so the
    # file source's modification-time ordering replays the stream in order —
    # chunking on an unrelated key would make every later batch arrive
    # almost entirely behind the watermark.
    chunked = src.withColumn(
        "chunk", F.ntile(n_chunks).over(Window.orderBy("ts", "event_id"))
    )
    for i in range(1, n_chunks + 1):
        (
            chunked.where(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{stage}/c{i}")
        )
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    return stream, stage


def documents_stream(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> tuple[DataFrame, str]:
    """File-source stream over the documents table (the flagship word-count
    input), chunked on ``doc_id % n_chunks`` — no event time, so chunk
    order is irrelevant; each micro-batch is just more corpus."""
    src = load_table(spark, sf_dir, "documents")
    stage = tempfile.mkdtemp(prefix="pmrwc_docstream_")
    for i in range(n_chunks):
        (
            src.where(F.col("doc_id") % n_chunks == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{stage}/c{i}")
        )
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    return stream, stage


def run_to_batch(
    spark: SparkSession,
    stream_df: DataFrame,
    output_mode: str = "complete",
    timeout_s: int = 120,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; return the sink table."""
    name = "sink_" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError("stream did not drain in time")
    return spark.table(name)
