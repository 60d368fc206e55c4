"""Cross-engine output-type parity: the driver's t2 gate compares schemas,
so every oracled key's Spark output types must map onto the DuckDB oracle's
output types exactly (no silent INT vs BIGINT or HUGEINT drift)."""

from __future__ import annotations

import pytest

import parallel_mapreduce_wordcounting_spark as engine

from .conftest import SF_DIR

_SPARK = {
    "bigint": "i64",
    "int": "i32",
    "double": "f64",
    "float": "f32",
    "string": "str",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "date": "date",
    "boolean": "bool",
}
_SPARK.update(
    {
        "array<string>": "list<str>",
        "array<bigint>": "list<i64>",
        "array<int>": "list<i32>",
        "array<double>": "list<f64>",
        "array<float>": "list<f32>",
    }
)

_DUCK = {
    "VARCHAR[]": "list<str>",
    "BIGINT[]": "list<i64>",
    "INTEGER[]": "list<i32>",
    "DOUBLE[]": "list<f64>",
    "FLOAT[]": "list<f32>",
    "BIGINT": "i64",
    "INTEGER": "i32",
    "HUGEINT": "i128",
    "DOUBLE": "f64",
    "FLOAT": "f32",
    "VARCHAR": "str",
    "TIMESTAMP": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts_tz",
    "TIMESTAMP_NS": "ts_ns",
    "DATE": "date",
    "BOOLEAN": "bool",
}

ORACLED = sorted(k for k, s in engine.REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("key", ORACLED)
def test_output_types_match_oracle(spark, duck, key):
    spec = engine.REGISTRY[key]
    sdf = spec.fn(spark, SF_DIR)
    stypes = {
        f.name: _SPARK.get(f.dataType.simpleString(), f.dataType.simpleString())
        for f in sdf.schema.fields
    }
    dtypes = {
        r[0]: _DUCK.get(str(r[1]).upper().split("(")[0], str(r[1]).upper())
        for r in duck.execute(f"DESCRIBE SELECT * FROM ({spec.oracle})").fetchall()
    }
    assert stypes == dtypes, f"{key}: spark={stypes} duck={dtypes}"


def test_money_sum_negative_half_up(spark, duck):
    """ADVICE r3: pin money_sum's rounding convention on NEGATIVE terms.

    The convention is HALF_UP (half away from zero), matching F.round /
    BigDecimal: a term of -234.5 cents sums as -235, where the old bare
    floor(x*100 + 0.5) form gave -234. Asserted three ways on the same
    sign-symmetric value sweep (odd/200 doubles land exactly on half-cent
    boundaries): Spark == DuckDB mirror == Decimal HALF_UP of the stored
    doubles.
    """
    import decimal

    from pyspark.sql import functions as F

    from parallel_mapreduce_wordcounting_spark.operators.exact import (
        money_sum,
        money_sum_sql,
    )

    vals = [s * num / 200.0 for num in (1, 199, 200, 201, 469, 123456789)
            for s in (1, -1)] + [0.0, -2.345, 2.345]
    assert -469 / 200.0 == -2.345  # the -234.5-cent boundary case is exact

    def half_up_cents(x: float) -> int:
        return int(
            decimal.Decimal(x).scaleb(2).quantize(0, rounding=decimal.ROUND_HALF_UP)
        )

    expected = sum(half_up_cents(v) for v in vals) / 100.0

    got_spark = (
        spark.createDataFrame([(v,) for v in vals], "x double")
        .agg(money_sum(F.col("x")).alias("s"))
        .collect()[0]["s"]
    )

    placeholders = ", ".join(f"({v!r})" for v in vals)
    got_duck = duck.execute(
        f"SELECT {money_sum_sql('x')} AS s FROM (VALUES {placeholders}) t(x)"
    ).fetchone()[0]

    assert got_spark == got_duck == expected
