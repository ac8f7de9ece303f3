"""Physical-plan inspection helpers — the engine's 'did Catalyst do what we
designed for?' assertions. Used by tests to lock in scale properties
(pushdown reached the scan, the dim join broadcast, top-k compiled to
TakeOrderedAndProject) so a refactor that silently degrades the plan at
100 TB fails CI at sf0.001."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_contains(df: DataFrame, *needles: str) -> bool:
    plan = formatted_plan(df)
    return all(n in plan for n in needles)


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, "no pushdown section in scan"
    assert fragment in plan, f"filter {fragment!r} not pushed into scan:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    assert plan_contains(df, "BroadcastHashJoin") or plan_contains(
        df, "BroadcastNestedLoopJoin"
    ), f"expected a broadcast join:\n{formatted_plan(df)}"


def assert_top_k(df: DataFrame) -> None:
    assert plan_contains(df, "TakeOrderedAndProject"), (
        f"expected TakeOrderedAndProject (bounded top-k):\n{formatted_plan(df)}"
    )


def scan_read_schema(df: DataFrame) -> list[str]:
    """Columns actually read from the (first) parquet scan — for asserting
    column pruning (e.g. the media/blob column is NOT read)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if line.strip().startswith("ReadSchema:"):
            return [
                c.split(":")[0]
                for c in line.split("struct<", 1)[-1].rstrip(">").split(",")
                if c
            ]
    return []
