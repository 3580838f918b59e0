"""T() must be drift-proof against the events.ts physical parquet type.

The driver's testdata has shipped ``ts`` both as parquet TIMESTAMP(NANOS)
(Spark reads it as long nanos under the legacy conf) and as plain
timestamp[us].  Write events-shaped parquet BOTH ways and assert T()
returns identical rows and an identical logical schema for both.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from astro_sdk_spark.queries import T


def _events_arrays():
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    ts_us = [base + datetime.timedelta(seconds=i * 37, microseconds=i * 113) for i in range(20)]
    return {
        "event_id": list(range(20)),
        "ts_us": ts_us,
        "user_id": [i % 5 for i in range(20)],
        "event_type": ["click" if i % 3 else "view" for i in range(20)],
        "value": [round(i * 1.25, 2) for i in range(20)],
        "props": ['{"k":%d}' % i for i in range(20)],
    }


def _write_both(tmp_path):
    a = _events_arrays()
    ns_vals = [int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) * 1000 for t in a["ts_us"]]

    us_dir = tmp_path / "events_us"
    ns_dir = tmp_path / "events_ns"
    us_dir.mkdir()
    ns_dir.mkdir()

    common = {
        "event_id": pa.array(a["event_id"], pa.int64()),
        "user_id": pa.array(a["user_id"], pa.int64()),
        "event_type": pa.array(a["event_type"], pa.string()),
        "value": pa.array(a["value"], pa.float64()),
        "props": pa.array(a["props"], pa.string()),
    }
    t_us = pa.table(
        {
            "event_id": common["event_id"],
            "ts": pa.array(a["ts_us"], pa.timestamp("us")),
            "user_id": common["user_id"],
            "event_type": common["event_type"],
            "value": common["value"],
            "props": common["props"],
        }
    )
    t_ns = pa.table(
        {
            "event_id": common["event_id"],
            "ts": pa.array(ns_vals, pa.timestamp("ns")),
            "user_id": common["user_id"],
            "event_type": common["event_type"],
            "value": common["value"],
            "props": common["props"],
        }
    )
    pq.write_table(t_us, str(us_dir / "events.parquet"))
    # store_schema=False + ns type → physical TIMESTAMP(NANOS) that Spark only
    # reads via spark.sql.legacy.parquet.nanosAsLong (the old driver layout)
    pq.write_table(t_ns, str(ns_dir / "events.parquet"), store_schema=False)
    return str(us_dir), str(ns_dir)


def test_T_identical_for_both_ts_layouts(spark, tmp_path):
    us_dir, ns_dir = _write_both(tmp_path)

    df_us = T(spark, us_dir, "events")
    df_ns = T(spark, ns_dir, "events")

    assert df_us.schema == df_ns.schema, (df_us.schema, df_ns.schema)
    assert dict(df_us.dtypes)["ts"] == "timestamp_ntz"
    assert dict(df_us.dtypes)["ts_ns"] == "bigint"

    rows_us = sorted(df_us.collect(), key=lambda r: r.event_id)
    rows_ns = sorted(df_ns.collect(), key=lambda r: r.event_id)
    assert rows_us == rows_ns

    # ts_ns must be exact epoch-nanos of ts
    for r in rows_us:
        micros = int(r.ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        assert r.ts_ns == micros * 1000
