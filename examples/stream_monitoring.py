"""Always-on metric monitoring with the streaming sketch store.

The "p99 latency per service + heavy-hitter users" pattern, composed the
way an ops pipeline runs it against an unbounded event stream:

    event stream (files/Kafka)
      → stream_quantile_ingest(by=[group])   per-group latency quantile
                                             sketch, merged every
                                             micro-batch into a table
      → stream_sketch_ingest(by=[group])     per-group count-min sketch
                                             of user frequencies
      → quantile_sketch_query / cms_query    point-in-time reads at ANY
                                             moment, from the tables —
                                             no stream re-scan

Why sketches and not exact state: both stores are bounded by their
geometry (groups × buckets, groups × depth × width), never by stream
length or user cardinality — the state for a year of events is the same
size as for an hour. Both stores survive restarts (same checkpoint →
replays are skipped via the stored batch watermark; fresh checkpoint →
new batches keep merging), and every write goes live through an atomic
staged swap, so a reader never sees a half-merged sketch.

Run at any scale factor (uses the events table as the "stream", staged
as deterministic micro-batches):

    python examples/stream_monitoring.py [sf_dir]

Prints the per-event-type p50/p95 of the value column and the top
estimated per-type frequencies of a user set, then cleans up.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def monitor(spark: SparkSession, sf_dir: str) -> dict:
    """Ingest the events table as two micro-batches into both sketch
    stores, then answer the monitoring questions from the stores."""
    from astro_sdk_spark.functions.cms import cms_query
    from astro_sdk_spark.functions.quantiles import quantile_sketch_query
    from astro_sdk_spark.queries import T
    from astro_sdk_spark.streaming.ops import (
        stream_quantile_ingest,
        stream_sketch_ingest,
    )
    from astro_sdk_spark.streaming.testing import stage_microbatch_files

    events = T(spark, sf_dir, "events").select("event_type", "user_id", "value")
    qt_table, cms_table = "mon_latency_qsk", "mon_user_cms"
    for t in (qt_table, cms_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    work = tempfile.mkdtemp(prefix="stream_monitoring_")
    try:
        src = stage_microbatch_files(
            [
                events.filter(F.col("user_id") % 2 == parity)
                for parity in (0, 1)
            ],
            os.path.join(work, "src"),
        )

        def stream():
            return (
                spark.readStream.schema(
                    "event_type string, user_id bigint, value double"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )

        q1 = stream_quantile_ingest(
            stream(), "value", qt_table, os.path.join(work, "ck_q"),
            width=100, by=["event_type"],
        )
        if not q1.awaitTermination(600):
            q1.stop()
            raise TimeoutError("quantile ingest did not drain")
        q2 = stream_sketch_ingest(
            stream(), "user_id", cms_table, os.path.join(work, "ck_c"),
            width=1024, depth=4, by=["event_type"],
        )
        if not q2.awaitTermination(600):
            q2.stop()
            raise TimeoutError("cms ingest did not drain")
        for q in (q1, q2):
            if q.exception() is not None:
                raise q.exception()

        quantiles = quantile_sketch_query(
            spark.table(qt_table).select("event_type", "bucket", "n"),
            [0.5, 0.95], width=100, by=["event_type"],
        )
        probe_users = events.select("event_type", "user_id").distinct().limit(50)
        freqs = cms_query(
            spark.table(cms_table).select("event_type", "d", "cell", "n"),
            probe_users, "user_id", width=1024, depth=4, by=["event_type"],
        )
        return {
            "quantiles": quantiles.collect(),
            "top_freqs": freqs.orderBy(F.desc("est")).limit(10).collect(),
            "qt_state_rows": spark.table(qt_table).count(),
            "cms_state_rows": spark.table(cms_table).count(),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        for t in (qt_table, cms_table):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = monitor(spark, sf_dir)
    print("per-type quantiles:")
    for r in sorted(out["quantiles"], key=lambda r: (r.event_type, r.q)):
        print(f"  {r.event_type:>10}  p{int(r.q * 100):02d} = {r.value}")
    print("top estimated user frequencies:")
    for r in out["top_freqs"]:
        print(f"  {r.event_type:>10}  user {r.user_id}: ~{r.est}")
    print(
        f"state: {out['qt_state_rows']} quantile rows, "
        f"{out['cms_state_rows']} cms rows"
    )


if __name__ == "__main__":
    main()
