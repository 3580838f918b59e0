"""Probe where the shuffled-hash-join default actually binds (r13 VERDICT #4).

The r13 session default ``spark.sql.join.preferSortMergeJoin=false`` was
committed with wall-clock wins but WITHOUT plan evidence: at sf0.1 the
64 MB ``autoBroadcastJoinThreshold`` absorbs every dimension side, so the
committed plans show BroadcastHashJoin either way and the conf never
binds. This probe creates the condition where it does bind. NOTE: setting
``autoBroadcastJoinThreshold=-1`` does NOT work — Spark's
``canBuildLocalHashMap`` (the SHJ size condition) is
``stats < autoBroadcastJoinThreshold × numShufflePartitions``, so -1
disables SHJ selection along with broadcast (measured: zero SHJ in any
plan under -1). The honest at-scale proxy is a SMALL positive threshold
(default 1 MB here): dims above it stop broadcasting — as they would at
real scale against any fixed threshold — while SHJ's local-hash-map
bound (threshold × partitions = 32 MB here) still admits
moderately-small build sides, exactly the regime the conf targets.
For each join-heavy query the probe:

- captures ``explain("formatted")`` under ``preferSortMergeJoin`` true
  AND false (plans/r14/shj_probe/<q>__{smj,shj}.txt),
- counts SortMergeJoin / ShuffledHashJoin / BroadcastHashJoin nodes,
- times the query noop-sunk, min-of-N, the two configs interleaved in
  one session (guide §1.4), with per-rep /proc/stat steal.

Usage: python tools/probe_shj.py [--sf DIR] [--reps N] [--out DIR]
       [--threshold BYTES] [q ...]
Prints one JSON line with per-query {smj,shj} node counts and min times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q_tpch_q7",
    "q_tpch_q21",
    "q_tpch_q9",
    "q_tpch_q2",
    "q_tpch_q5",
    "q_dsir_weights",
    "q_scd2_lookup",
    "q_leakage_split",
    "q_incremental_neardup",
]


def _counts(plan: str) -> dict:
    return {
        "SortMergeJoin": plan.count("SortMergeJoin"),
        "ShuffledHashJoin": plan.count("ShuffledHashJoin"),
        "BroadcastHashJoin": plan.count("BroadcastHashJoin"),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    outdir = "plans/r14/shj_probe"
    threshold = str(1 << 20)
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--out":
            outdir = args[i + 1]
            i += 2
        elif args[i] == "--threshold":
            threshold = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = DEFAULT_QUERIES

    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    from astro_sdk_spark import get_session
    from astro_sdk_spark.functions._cache import (
        release_intermediates,
        sweep_persistent_rdds,
    )
    from astro_sdk_spark.queries import spark_queries
    from bench import _steal_sec

    os.makedirs(outdir, exist_ok=True)
    spark = get_session(app_name="shj_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    # the at-scale proxy: dims above the (small) threshold stop
    # broadcasting, while SHJ's local-hash-map bound
    # (threshold × numShufflePartitions) still admits moderate builds —
    # see the module docstring for why -1 would instead disable SHJ too
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)

    qs = spark_queries()
    out: dict = {
        "sf_dir": sf_dir,
        "reps": reps,
        "autoBroadcastJoinThreshold": threshold,
        "queries": {},
    }
    for name in names:
        fn = qs[name]
        rec: dict = {}
        for pref, tag in (("true", "smj"), ("false", "shj")):
            spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{outdir}/{name}__{tag}.txt", "w") as f:
                f.write(plan)
            rec[tag] = {"nodes": _counts(plan)}
            release_intermediates()
            sweep_persistent_rdds(spark)
            spark.catalog.clearCache()
        # interleaved timing: smj, shj, smj, shj, ... in one session
        times: dict = {"smj": [], "shj": []}
        steals: dict = {"smj": [], "shj": []}
        for r in range(reps):
            for pref, tag in (("true", "smj"), ("false", "shj")):
                spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
                spark.sparkContext.setJobDescription(f"shj_probe:{name}:{tag}")
                df = fn(spark, sf_dir)
                s0 = _steal_sec()
                t0 = time.monotonic()
                df.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                s1 = _steal_sec()
                times[tag].append(round(dt, 3))
                steals[tag].append(
                    round(s1 - s0, 2) if s0 is not None and s1 is not None else None
                )
                release_intermediates()
                sweep_persistent_rdds(spark)
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(None)
        for tag in ("smj", "shj"):
            rec[tag]["reps"] = times[tag]
            rec[tag]["steal"] = steals[tag]
            rec[tag]["min"] = min(times[tag])
        out["queries"][name] = rec
        print(
            f"{name}: smj={rec['smj']['min']} {rec['smj']['nodes']} | "
            f"shj={rec['shj']['min']} {rec['shj']['nodes']}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
