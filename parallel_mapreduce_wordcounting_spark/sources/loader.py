"""Table loader — the single entry point for reading the fixture tables.

Hides the one real environment gotcha (SURVEY.md §7.0): ``events.parquet``
stores ``ts`` as parquet ``INT64 (TIMESTAMP(NANOS,false))`` which stock
``spark.read.parquet`` rejects with ``[PARQUET_TYPE_ILLEGAL]``. The verified
fix is the legacy nanos-as-long conf plus an exact integer µs conversion
(the fixture's ns values are always whole microseconds, so ``div 1000`` is
lossless — probed 2026-08-13).

At 100 TB the same loader is where partition-pruning-friendly layouts and
schema enforcement would hook in: everything downstream goes through
``load_table`` and never touches ``spark.read`` directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _configure(spark: SparkSession) -> None:
    # Runtime-settable confs (verified to take effect on an existing session).
    # UTC keeps collected timestamps identical to DuckDB's epoch-naive values.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    _ship_package(spark)


def _ship_package(spark: SparkSession) -> None:
    """Make the engine importable on Spark's Python workers.

    cloudpickle serializes closures by value but module-level references by
    name — a UDF touching a module global then needs this package on every
    worker's import path, which the driver's session does not guarantee
    (workers inherit neither the driver's sys.path nor its cwd). Shipping a
    zip via addPyFile closes that hole for good; done once per context.
    """
    sc = spark.sparkContext
    if getattr(sc, "_pmrwc_pkg_shipped", False):
        return
    import pathlib
    import tempfile
    import zipfile

    pkg_root = pathlib.Path(__file__).resolve().parents[1]
    zpath = (
        pathlib.Path(tempfile.mkdtemp(prefix="pmrwc_pkg_"))
        / "parallel_mapreduce_wordcounting_spark.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(pkg_root.rglob("*.py")):
            z.write(p, f"{pkg_root.name}/{p.relative_to(pkg_root)}")
    sc.addPyFile(str(zpath))
    sc._pmrwc_pkg_shipped = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame with clean Spark types.

    ``events.ts`` arrives as INT64 nanoseconds (legacy conf) and is converted
    to a proper TimestampType via exact integer division — ``timestamp_micros``
    keeps the arithmetic JVM-side and codegen-friendly.
    """
    _configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # raw fixture layout: ts arrived as ns-longs via the legacy conf;
        # re-written events (e.g. staged test copies) already carry a real
        # TimestampType and must not be converted twice
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so users can run plain
    SQL (``spark.sql(...)``) against the engine — the same table names the
    DuckDB oracle uses (region nation customer supplier part orders lineitem
    events documents embeddings)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sink_parquet(df: DataFrame, path: str) -> None:
    """Write results back out as parquet (the reference writes output files)."""
    df.write.mode("overwrite").parquet(path)
