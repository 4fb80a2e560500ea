"""Parse Spark physical plans into assertable facts."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what `df.explain('formatted')` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's scans, flattened.

    Parsed bracket-aware: an entry like ``In(x, [1,2,3])`` contains
    both ']' and ',', so a first-']' regex + naive comma split would
    truncate the list at the In-list's bracket and shred the entry
    into fragments."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[", plan):
        depth = 1
        start = m.end()
        i = start
        entry_start = start
        while i < len(plan) and depth:
            ch = plan[i]
            if ch in "[(":
                depth += 1
            elif ch in "])":
                depth -= 1
                if depth == 0:
                    tail = plan[entry_start:i].strip()
                    if tail:
                        out.append(tail)
            elif ch == "," and depth == 1:
                entry = plan[entry_start:i].strip()
                if entry:
                    out.append(entry)
                entry_start = i + 1
            i += 1
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings per scan — what actually hits IO after pruning."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (BroadcastExchange NOT counted —
    broadcasting a small side is the goal, not a cost to minimize)."""
    # Count "(n) Exchange" detail headers: each node appears exactly once
    # there (the tree rendering would double-count), and the word
    # boundary excludes BroadcastExchange.
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def count_wholestage_codegen(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in plan order (SortMergeJoin,
    BroadcastHashJoin, ShuffledHashJoin, BroadcastNestedLoopJoin...)."""
    return re.findall(
        r"\(\d+\) (SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        formatted_plan(df),
    )


def _scan_matches(node, path_substr: str) -> bool:
    """True when a FileSourceScanExec reads under ``path_substr`` —
    matched on the relation's root paths (node.toString() truncates
    long locations, silently missing deep tmp paths)."""
    roots = node.relation().location().rootPaths()
    return any(
        path_substr in roots.apply(i).toString() for i in range(roots.size())
    )


def scan_partition_counts(df: DataFrame, path_substr: str) -> list[int]:
    """Executed-plan partition-prune evidence: the ``numPartitions``
    metric of every FileSourceScanExec whose location matches
    ``path_substr`` — the number of hive partition directories the scan
    actually SELECTED after partition-filter pruning (Spark populates
    it at planning; execute the DataFrame first so AQE's final plan is
    in place). ``DataFrame.inputFiles()`` can't serve here: it lists
    the relation's full FileIndex and ignores filters entirely."""
    df.collect()
    counts: list[int] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())  # materialized stages wrap their plan
            return
        if name == "FileSourceScanExec" and _scan_matches(node, path_substr):
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numPartitions":
                    counts.append(int(kv._2().value()))
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return counts
