"""Physical-plan introspection helpers — used by tests to assert the plans
we want at 100 TB actually materialize (pushdown, broadcast, top-k heap),
not just that results are correct."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (Spark only prints it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_down(df: DataFrame, *needles: str) -> None:
    """Assert each needle (e.g. 'PushedFilters: [IsNotNull(o_totalprice)',
    'BroadcastHashJoin', 'TakeOrderedAndProject') appears in the plan."""
    plan = explain_str(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"
