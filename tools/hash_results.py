"""Canonical result hashes for every registry query — the q18 arbiter.

Round 12 recorded a driver-side hash mismatch for q_tpch_q18 that five
independent local reproductions (plain session, tuned session, full
window-sequence replay, three SFs) could not reproduce. This tool makes
the next occurrence decidable: it computes a CANONICAL hash per query —
columns sorted by name, rows sorted, values rendered repr-stable (exact
shortest round-trip float repr, not fixed decimals) — for BOTH the Spark
query and its DuckDB oracle, and the output is committed per round
(HASHES_r{N}.json). If the driver goes red on a query whose committed
hash (a) matches a fresh local run and (b) matches the judge's
independent run, the divergence is provably in the driver harness's
session confs or hash canonicalization, not in the engine.

Usage: python tools/hash_results.py [sf_dir] [--out FILE] [query ...]
Defaults: sf_dir=/root/testdata/sf0.01, --out stdout, all queries.

The canonicalization is deliberately STRICTER than the driver's gate
(exact float repr vs rounded compare): two runs of a correct
deterministic engine must produce byte-identical canonical forms, so
hash equality across machines is meaningful evidence.
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
from datetime import date, datetime, time
from decimal import Decimal

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_SEP_CELL = "\x1f"
_SEP_ROW = "\x1e"


def canon_value(v) -> str:
    """Repr-stable canonical rendering, identical for the same logical
    value regardless of which engine produced it."""
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 2**53:
            # collapse engine-dependent INTEGER/DOUBLE typing of exact
            # integral values (DuckDB round() returns DOUBLE where
            # Spark may keep an int column, and vice versa)
            return str(int(v))
        return repr(v)  # shortest round-trip repr: exact double identity
    if isinstance(v, Decimal):
        if v == v.to_integral_value():
            return str(int(v))
        return repr(float(v))
    if isinstance(v, (datetime, date, time)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, str):
        return v.replace("\\", "\\\\").replace(_SEP_CELL, "\\u001f").replace(
            _SEP_ROW, "\\u001e"
        )
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((canon_value(k), canon_value(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    return repr(v)


def canon_hash(rows, columns) -> str:
    """sha256 over the sorted-row, column-name-sorted canonical form."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        _SEP_CELL.join(canon_value(row[i]) for i in idx) for row in rows
    )
    return hashlib.sha256(_SEP_ROW.join(lines).encode("utf-8")).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set()
    for a in (args[1:] if args and "/" in args[0] else args):
        only.update(x for x in a.split(",") if x)

    import duckdb

    from astro_sdk_spark.functions._cache import (
        release_intermediates,
        sweep_persistent_rdds,
    )
    from astro_sdk_spark.queries import oracle_queries, spark_queries
    from astro_sdk_spark.session import get_session

    spark = get_session("hash_results")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = spark_queries(), oracle_queries()
    names = [n for n in qs if not only or n in only]
    result: dict[str, dict] = {}
    for name in names:
        entry: dict = {}
        try:
            df = qs[name](spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            entry["rows"] = len(rows)
            entry["columns"] = sorted(cols)
            entry["spark_hash"] = canon_hash(rows, cols)
        except Exception as e:  # noqa: BLE001 - recorded, not fatal
            entry["spark_error"] = f"{type(e).__name__}: {e}"[:300]
        finally:
            spark.catalog.clearCache()
            release_intermediates()
            sweep_persistent_rdds(spark)
        if name in oracles and "spark_hash" in entry:
            try:
                res = con.execute(oracles[name])
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                entry["oracle_hash"] = canon_hash(orows, ocols)
                entry["match"] = entry["oracle_hash"] == entry["spark_hash"]
            except Exception as e:  # noqa: BLE001
                entry["oracle_error"] = f"{type(e).__name__}: {e}"[:300]
        result[name] = entry
        status = (
            "ok" if entry.get("match")
            else ("SPARK-ONLY" if "oracle_hash" not in entry else "MISMATCH")
        )
        print(f"{status:10s} {name} {entry.get('spark_hash', '')[:16]}",
              file=sys.stderr)

    payload = {
        "sf_dir": sf_dir,
        "canonicalization": (
            "columns sorted by name; rows sorted; cells joined by US, rows "
            "by RS; floats via shortest round-trip repr (integral floats "
            "collapsed to int); Decimal→int/float; temporal→isoformat; "
            "sha256 hex"
        ),
        "queries": result,
    }
    text = json.dumps(payload, indent=1, sort_keys=True)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(text + "\n")
    else:
        print(text)
    bad = [
        n for n, e in result.items()
        if "spark_error" in e or e.get("match") is False
    ]
    if bad:
        print(f"FAILURES: {bad}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
