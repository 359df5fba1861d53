"""Physical-plan introspection — the tooling behind our scale guarantees.

The reference hard-wires its physical choices (SURVEY.md §4); on Spark the
optimizer picks them, so the guards live in tests: every headline query
asserts the plan properties that must survive a 100×/1000× scale-up —
filters pushed into the parquet scan, columns pruned, small dimensions
broadcast (no shuffle of the fact table for them), and a bounded number of
Exchanges. A plan regression fails CI instead of melting a cluster.

All helpers parse ``df._jdf.queryExecution().explainString`` (formatted
mode) — the same text ``df.explain("formatted")`` prints.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excludes broadcast exchanges)."""
    plan = physical_plan(df, "simple")
    return len(re.findall(r"(?<!Broadcast)Exchange (?!SinglePartition)(?:hash|range|rebalance)?", plan)) + len(
        re.findall(r"(?<!Broadcast)Exchange SinglePartition", plan)
    )


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in the plan, e.g. ['BroadcastHashJoin', 'SortMergeJoin']."""
    plan = physical_plan(df, "simple")
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def pushed_filters(df: DataFrame) -> dict[str, str]:
    """{scan location -> PushedFilters string} for each parquet scan."""
    plan = physical_plan(df, "formatted")
    out = {}
    for scan in re.split(r"\(\d+\) Scan parquet", plan)[1:]:
        loc = re.search(r"Location: \S+ \[([^\]]*)", scan)
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", scan)
        if loc:
            out[loc.group(1)] = pf.group(1) if pf else ""
    return out


def read_schema(df: DataFrame) -> dict[str, str]:
    """{scan location -> ReadSchema struct string} — checks column pruning."""
    plan = physical_plan(df, "formatted")
    out = {}
    for scan in re.split(r"\(\d+\) Scan parquet", plan)[1:]:
        loc = re.search(r"Location: \S+ \[([^\]]*)", scan)
        rs = re.search(r"ReadSchema: struct<([^>]*)>", scan)
        if loc:
            out[loc.group(1)] = rs.group(1) if rs else ""
    return out


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partitionSpec in the optimized logical
    plan — each funnels its whole input through ONE task, so every
    occurrence must be justified by dimension-scale input (post-agg ranks,
    per-partition offset tables, top-of-funnel lists). The plan sweep in
    tests/test_plans.py allowlists the documented ones and fails on any
    new fact-scale global window before it melts a cluster."""
    out: list[str] = []

    def walk(node) -> None:
        if node.getClass().getSimpleName() == "Window" and node.partitionSpec().isEmpty():
            out.append(node.simpleString(120))
        for i in range(node.children().length()):
            walk(node.children().apply(i))
        # scalar/EXISTS/IN subqueries hold their own plans in expressions,
        # not in children() — a global window inside one would otherwise
        # escape the lint
        subs = node.subqueries()
        for i in range(subs.length()):
            walk(subs.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def wholestage_codegen_ids(df: DataFrame) -> list[int]:
    """Distinct WholeStageCodegen span ids — wider spans = more JVM fusion."""
    plan = physical_plan(df, "simple")
    return sorted({int(m) for m in re.findall(r"WholeStageCodegen \((\d+)\)", plan)})


def scan_report(df: DataFrame) -> str:
    """Human-readable one-stop report used in benchmarks and docs."""
    lines = [
        f"exchanges: {count_exchanges(df)}",
        f"joins: {join_strategies(df)}",
        f"codegen spans: {len(wholestage_codegen_ids(df))}",
    ]
    for loc, pf in pushed_filters(df).items():
        lines.append(f"scan {loc}: PushedFilters=[{pf}]")
    for loc, rs in read_schema(df).items():
        lines.append(f"scan {loc}: ReadSchema=<{rs}>")
    return "\n".join(lines)
