"""Local mirror of the driver's t2 correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB at the given sf dir, compare row count, column names, and
order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [name...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    def norm_val(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            # pandas renders DuckDB's NULL-in-BIGINT as NaN in a float64
            # column; normalize back to None to match Spark's None.
            if math.isnan(v):
                return None
            return round(v, 9)
        return v

    # None-safe sort: None orders before any value within a column
    # (tuple comparison would otherwise raise on None < float)
    return sorted(
        (tuple(norm_val(r[c]) for c in cols) for r in rows),
        key=lambda t: tuple(
            (v is not None, v if v is not None else 0) for v in t
        ),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle_check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    import gc

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = normalize([r.asDict() for r in sdf.collect()], scols)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            # Queries persist() intermediates and rely on the caller to
            # reset; 91 of them in one session would otherwise pin
            # enough dead blocks to thrash the block manager (same
            # rationale as bench.py's _reset).
            spark.catalog.clearCache()
            gc.collect()
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(srows)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ocols = sorted(odf.columns)
        orows = normalize(odf.to_dict("records"), ocols)
        status = []
        if scols != ocols:
            status.append(f"cols spark={scols} duck={ocols}")
        if len(srows) != len(orows):
            status.append(f"rows spark={len(srows)} duck={len(orows)}")
        if not status and srows != orows:
            diff = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            status.append(f"values differ, first diffs: {diff}")
        dt = time.time() - t0
        if status:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(status))
            n_fail += 1
        else:
            print(f"PASS {name} ({dt:.1f}s, {len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
