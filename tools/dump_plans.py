"""Dump .explain("formatted") for declared queries to plans/<round>/.

Usage:
  PYTHONPATH=<repo-or-worktree> python tools/dump_plans.py \
      <sf_dir> <out_dir> <suffix> <name...>

Imports __spark_entry__ from PYTHONPATH (so pointing PYTHONPATH at a git
worktree of an older commit dumps that commit's plans), builds each named
query against <sf_dir>, and writes <out_dir>/<name>_<suffix>.txt containing
the formatted physical plan.  No query is executed — only planned — except
where building the DataFrame itself runs bounded driver-side work (e.g.
k-means training pulls k centroids); that is part of the declared query
construction and is noted in the header.
"""

from __future__ import annotations

import io
import os
import sys
import time
import contextlib

sys.path.insert(0, os.environ.get("ENTRY_PATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod


def main():
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump_plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not declared", file=sys.stderr)
            continue
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# query: {name}\n# sf_dir: {sf_dir}\n"
                f"# entry: {os.path.abspath(entry_mod.__file__)}\n"
                f"# build+plan wall: {time.time() - t0:.1f}s\n\n"
            )
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"OK {name}: {path} ({n_ex} Exchange, {time.time()-t0:.1f}s)")

    spark.stop()


if __name__ == "__main__":
    main()
