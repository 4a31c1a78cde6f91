"""Regression gate for the events.ts physical-type drift that broke
round 2 (VERDICT r2 §What's wrong): the driver can regenerate
events.parquet with ts as INT64-nanos, TIMESTAMP(MICROS) naive
(timestamp_ntz), or TIMESTAMP(MICROS) UTC-adjusted — all consumers
must derive epoch-ms through demo.ts_epoch_ms, which handles all
three identically.

Two defenses:
 1. a grep-gate: no raw "ts DIV"/"ts div" expressions anywhere in the
    repo source outside ts_epoch_ms itself;
 2. a physical-type matrix: one parquet per physical type, identical
    found_at from each.
"""

import glob
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from net_spider_spark import demo

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# epoch-micros for 2024-05-01 12:34:56.789 UTC → expected ms value
_MICROS = 1714566896789000
_EXPECTED_MS = _MICROS // 1000


def _source_files():
    files = [
        os.path.join(_REPO, "__spark_entry__.py"),
        os.path.join(_REPO, "bench.py"),
    ]
    for pat in ("net_spider_spark/**/*.py", "tools/**/*.py"):
        files.extend(glob.glob(os.path.join(_REPO, pat), recursive=True))
    return [f for f in files if os.path.exists(f)]


def test_no_raw_ts_div_outside_helper():
    """Every events.ts consumer must go through demo.ts_epoch_ms; a raw
    `ts DIV 1000000` hardcodes the INT64-nanos physical type and breaks
    the moment the driver re-types the parquet (r2: 17 red queries)."""
    pattern = re.compile(r"\bts\s+div\b", re.IGNORECASE)
    offenders = []
    for path in _source_files():
        with open(path, encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                if pattern.search(line):
                    offenders.append(f"{os.path.relpath(path, _REPO)}:{lineno}: {line.strip()}")
    assert offenders == [], (
        "raw 'ts DIV' found outside demo.ts_epoch_ms (use the helper):\n"
        + "\n".join(offenders)
    )


def _write_events(tmp_path, name, arrow_type):
    ts = pa.array([_MICROS], type=pa.timestamp("us")).cast(arrow_type)
    table = pa.table(
        {
            "event_id": pa.array([1], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([7], type=pa.int64()),
            "event_type": pa.array(["click"], type=pa.string()),
            "value": pa.array([1.5], type=pa.float64()),
            "props": pa.array(["{}"], type=pa.string()),
        }
    )
    out = tmp_path / name
    out.mkdir()
    pq.write_table(table, str(out / "part-0.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "label,arrow_type",
    [
        ("int64_nanos", pa.timestamp("ns")),
        ("timestamp_ntz", pa.timestamp("us")),
        ("timestamp_utc", pa.timestamp("us", tz="UTC")),
    ],
)
def test_ts_epoch_ms_physical_type_matrix(spark, tmp_path, label, arrow_type):
    """Same instant written under each parquet physical type must give
    the identical epoch-ms BIGINT (and equal DuckDB epoch_ms)."""
    path = _write_events(tmp_path, label, arrow_type)
    demo.configure(spark)
    df = spark.read.parquet(path)
    got = df.select(demo.ts_epoch_ms(df).alias("found_at")).collect()
    assert len(got) == 1
    assert got[0]["found_at"] == _EXPECTED_MS

    import duckdb

    oracle = duckdb.sql(
        f"SELECT epoch_ms(ts) AS found_at FROM read_parquet('{path}/*.parquet')"
    ).fetchone()[0]
    assert oracle == _EXPECTED_MS


def test_events_findings_runs_on_shipped_parquet(spark):
    """Whatever physical type the driver shipped THIS round, the main
    findings derivation must analyze and execute."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf_dir}/events.parquet"):
        pytest.skip("no testdata")
    for fn in (
        demo.events_findings,
        demo.events_findings_multilink,
        demo.events_findings_dio,
        demo.events_link_samples,
    ):
        assert fn(spark, sf_dir).limit(1).count() >= 0
