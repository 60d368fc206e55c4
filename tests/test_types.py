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
