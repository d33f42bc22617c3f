"""Physical-plan inspection helpers.

`.explain()`-driven engineering made assertable: tests pin the plan shapes
the engine is designed around (filter pushdown into scans, WindowGroupLimit
for top-k, broadcast joins for small stats, bounded exchange counts) so a
regression that silently de-optimizes a plan fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "extended") -> str:
    qe = df._jdf.queryExecution()
    if mode == "formatted":
        return qe.explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    return qe.executedPlan().toString()


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the physical plan (before AQE re-planning)."""
    return len(re.findall(r"Exchange (?:hash|range)partitioning",
                          physical_plan(df)))


def has_window_group_limit(df: DataFrame) -> bool:
    return "WindowGroupLimit" in physical_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoop" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters segments of every scan node."""
    return "\n".join(
        m.group(0)
        for m in re.finditer(r"PushedFilters: \[[^\]]*\]", physical_plan(df))
    )
