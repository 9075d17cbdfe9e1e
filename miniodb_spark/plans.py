"""Physical-plan inspection: the scale-correctness feedback loop.

The reference implements pruning as explicit layers (column-pruned
views, Redis min/max file skipping, time-partition pruning —
SURVEY §4.1) and *proves* them with counters (FilesSkipped, data-read
reduction). On Spark those optimizations are Catalyst's job; what we
must prove instead is that our plans actually *get* them. These
helpers read the formatted physical plan so tests (and humans) can
assert:

- filters reached the parquet scan (``PushedFilters``);
- partition pruning happened (``PartitionFilters`` on ``dt``);
- column pruning happened (``ReadSchema`` is narrow);
- small dims broadcast (``BroadcastHashJoin``), facts didn't
  (no stray ``SortMergeJoin``/``Exchange``);
- top-k compiles to ``TakeOrderedAndProject``, not a global sort.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def partition_filters(df: DataFrame) -> list[str]:
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", formatted_plan(df))


def scan_columns(df: DataFrame) -> set[str]:
    """Union of column names actually read by all parquet scans."""
    cols: set[str] = set()
    for schema in read_schemas(df):
        inner = schema[len("struct<") : -1]
        for fieldspec in _split_top_level(inner):
            name = fieldspec.split(":", 1)[0].strip()
            if name:
                cols.add(name)
    return cols


def _split_top_level(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def join_kinds(df: DataFrame) -> dict[str, int]:
    plan = simple_plan(df)
    return {
        "broadcast_hash": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge": len(re.findall(r"SortMergeJoin", plan)),
        "shuffled_hash": len(re.findall(r"ShuffledHashJoin", plan)),
        "broadcast_nested_loop": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
    }


def num_shuffles(df: DataFrame) -> int:
    """Exchange operators in the plan (AQE may later coalesce them, but
    each one is a full shuffle boundary)."""
    return len(re.findall(r"Exchange ", simple_plan(df)))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in simple_plan(df)


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window operators with an EMPTY partition spec — the ones Spark
    executes as a single task over their whole input ("No Partition
    Defined for Window operation" warning). In plan text a Window line
    carries bracket groups `[exprs], [partitionSpec], [orderSpec]`,
    and EITHER empty spec is omitted from the print — so two groups is
    ambiguous: `[exprs], [orderSpec]` (global-order window, the
    single-task hazard) vs `[exprs], [partitionSpec]` (whole-partition
    frame with no ordering, perfectly distributed). Order specs are
    distinguishable because every entry carries an ASC/DESC direction;
    partition specs are bare column lists."""
    out = []
    for line in simple_plan(df).splitlines():
        m = re.search(r"\bWindow(?:GroupLimit)?\s+(\[.*)$", line)
        if not m or "WindowGroupLimit" in line:
            continue
        spans, depth, start = [], 0, None
        for i, ch in enumerate(m.group(1)):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    spans.append(m.group(1)[start:i + 1])
        if len(spans) <= 1:
            out.append(line.strip())  # neither partition nor order spec
        elif len(spans) == 2 and re.search(r"\b(ASC|DESC)\b", spans[1]):
            out.append(line.strip())  # order-only: empty partition spec
    return out


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    # with AQE the pre-execution plan string hides codegen stages; the
    # "codegen" explain mode compiles them without executing
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    return "WholeStageCodegen" in text


def plan_report(df: DataFrame) -> dict:
    """One-call summary used by tests and by bench diagnostics."""
    return {
        "pushed_filters": pushed_filters(df),
        "partition_filters": partition_filters(df),
        "scan_columns": sorted(scan_columns(df)),
        "joins": join_kinds(df),
        "shuffles": num_shuffles(df),
        "take_ordered": has_take_ordered(df),
        "codegen": uses_whole_stage_codegen(df),
    }
