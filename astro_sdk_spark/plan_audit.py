"""Programmatic plan auditing — the scale-shape check as a library API.

``tools/plan_audit.py`` audits the whole query registry for the repo's
CI; this module exposes the same analysis for USER DataFrames, so a
pipeline can assert its own physical-plan invariants ("no Python
boundary on the hot path", "exactly one shuffle", "filters reached the
scan") in its tests instead of discovering them on the cluster bill.

The metrics mirror what you would check by hand before running a plan on
a 1000-executor cluster: Exchange (shuffle) count, broadcast-vs-sort-
merge join mix, nested-loop/cartesian nodes, WholeStageCodegen spans,
parquet filter pushdown, and Python/Arrow boundary nodes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

PY_NODES = ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas",
            "MapInArrow", "FlatMapGroupsInArrow")
CARTESIAN = ("CartesianProduct", "BroadcastNestedLoopJoin")


def parse_plan(formatted: str, simple: str) -> dict:
    """Metrics from the two explain modes: node counts come from the
    plan TREE (each node renders once as ``Name (id)``; the details
    section repeats names and is not counted); WholeStageCodegen span
    count comes from simple mode's distinct ``*(i)`` ids. For executed
    AQE plans only the ``Final Plan`` subtree is counted — the
    runtime-replanned one a cluster would run."""
    tree = formatted
    if "== Final Plan ==" in formatted:
        tree = formatted.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    else:
        tree = re.split(r"^\(1\) ", tree, maxsplit=1, flags=re.M)[0]
    simple = simple.split("== Initial Plan ==")[0]

    def n(name):
        return len(re.findall(rf"\b{name}\b", tree))

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
    return {
        "exch": n("Exchange"),
        "bcast": n("BroadcastExchange"),
        "bhj": n("BroadcastHashJoin"),
        "smj": n("SortMergeJoin"),
        "cartesian": sum(n(c) for c in CARTESIAN),
        "wsc": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "pushed": any(p.strip() for p in pushed),
        "scans": len(re.findall(r"Scan parquet", tree)),
        "py": sum(n(p) for p in PY_NODES),
    }


def audit_plan(df: DataFrame, execute: bool = True) -> dict:
    """Audit a DataFrame's physical plan. ``execute=True`` (default)
    runs the plan first so AQE finalizes it (runtime smj→bhj
    conversion, coalesced exchanges) — the pre-execution plan is a
    static guess, not what a cluster runs. Pass ``execute=False`` to
    audit the static plan without triggering a job (large inputs)."""
    if execute:
        # collect, not count: count() builds a NEW QueryExecution and
        # would leave THIS df's AQE plan unfinalized
        df.collect()
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    qe = df._jdf.queryExecution()
    return parse_plan(
        jvm.PythonSQLUtils.explainString(qe, "formatted"),
        jvm.PythonSQLUtils.explainString(qe, "simple"),
    )


def assert_scale_shape(
    df: DataFrame,
    max_exchanges: int | None = None,
    max_python_boundaries: int = 0,
    max_cartesian: int = 0,
    require_pushdown: bool = False,
    execute: bool = True,
) -> dict:
    """CI guard: raise ``AssertionError`` when the plan violates the
    declared shape. Returns the audit dict on success so tests can make
    further assertions."""
    m = audit_plan(df, execute=execute)
    problems = []
    if max_exchanges is not None and m["exch"] > max_exchanges:
        problems.append(f"{m['exch']} exchanges (max {max_exchanges})")
    if m["py"] > max_python_boundaries:
        problems.append(
            f"{m['py']} Python/Arrow boundaries (max {max_python_boundaries})"
        )
    if m["cartesian"] > max_cartesian:
        problems.append(
            f"{m['cartesian']} nested-loop/cartesian joins (max {max_cartesian})"
        )
    if require_pushdown and not m["pushed"]:
        problems.append("no PushedFilters reached a parquet scan")
    if problems:
        raise AssertionError(
            "plan violates declared scale shape: " + "; ".join(problems)
        )
    return m
