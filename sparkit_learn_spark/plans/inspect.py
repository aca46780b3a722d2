"""Plan inspection: assert the plan Catalyst produced is the plan we
want (pushdown reached the scan, small sides broadcast, top-k stayed
a heap). SURVEY §4 guardrails, mechanized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (DataFrame.explain only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_has(df: DataFrame, *needles: str, mode: str = "formatted") -> bool:
    plan = explain_str(df, mode)
    return all(n in plan for n in needles)
