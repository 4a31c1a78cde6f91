"""The bench one-line JSON contract (round-11 verdict item 1).

The driver parses the final stdout line from a 2000-char tail of the
bench output, and its PERF comparator joins per-query medians by name
from that line's "queries" dict.  These tests pin the compact-line
builder: the line always fits the tail, always carries the complete
"qv" median list (sorted-name order, sha-bound), and fills "queries"
with the largest medians first when the full dict cannot fit.

No Spark session needed — the builder is pure.
"""

import hashlib
import json

import bench


def _mk(n_queries):
    timings = {
        f"family_{i % 9}_operator_query_{i:03d}": round(0.11 + i * 0.037, 3)
        for i in range(n_queries)
    }
    env = {
        k: {"load1": [1.0, 1.0, 1.0], "gc_ms": [0, 0, 0], "steal_j": [0, 0, 0]}
        for k in timings
    }
    counters = {
        k: {
            "tasks": 10,
            "shuffle_read_bytes": 1000,
            "shuffle_write_bytes": 1000,
            "memory_spill_bytes": 0,
            "disk_spill_bytes": 0,
        }
        for k in timings
    }
    ingest = {
        "rows": 100000,
        "sec": 1.0,
        "rows_per_sec": 100000,
        "walls": [1.0, 1.0, 1.0, 1.0, 1.0],
        "load1": [1.0] * 5,
        "sustained_rows": 1000000,
        "sustained_sec": 2.0,
        "sustained_rows_per_sec": 500000,
        "sustained_walls": [2.0, 2.0, 2.0],
        "sustained_load1": [1.0] * 3,
        "sustained_gc_ms": [0, 0, 0],
    }
    return timings, env, counters, ingest


def test_full_suite_line_fits_tail_and_qv_complete():
    timings, env, counters, ingest = _mk(92)
    line = bench.compact_line(timings, env, counters, ingest, 3, 0.1)
    assert len(line) <= 1950, len(line)
    d = json.loads(line)
    # contract keys
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in d, k
    assert d["unit"] == "sec"
    assert d["n_queries"] == 92
    # qv: complete, sorted-name order, sha-bound
    names = sorted(timings)
    assert len(d["qv"]) == 92
    assert d["qv"] == [round(timings[k], 2) for k in names]
    sha = hashlib.sha256(",".join(names).encode()).hexdigest()[:12]
    assert d["qv_sha"] == sha
    # queries: largest medians first fill the budget; entries match medians
    assert d["queries"]
    assert d.get("queries_omitted", 0) == 92 - len(d["queries"])
    kept_floor = min(timings[k] for k in d["queries"])
    omitted = [timings[k] for k in timings if k not in d["queries"]]
    assert all(v <= kept_floor for v in omitted)
    for k, v in d["queries"].items():
        assert v == round(timings[k], 2)
    # total is the sum of the true medians, not of the shed dict
    assert d["value"] == round(sum(timings.values()), 3)


def test_small_subset_line_keeps_everything():
    timings, env, counters, ingest = _mk(3)
    line = bench.compact_line(timings, env, counters, ingest, 1, 0.01)
    d = json.loads(line)
    assert len(d["queries"]) == 3
    assert "queries_omitted" not in d
    # ingest arrays survive when there is room
    assert d["ingest"]["walls"] == ingest["walls"]


def test_real_r11_names_fit():
    # the actual 92 headline names are the worst case the driver sees
    timings = {k: 0.9 for k in bench.HEADLINE}
    env = {
        k: {"load1": [1.0], "gc_ms": [0], "steal_j": [0]} for k in timings
    }
    counters = {
        k: {
            "tasks": 1,
            "shuffle_read_bytes": 0,
            "shuffle_write_bytes": 0,
            "memory_spill_bytes": 0,
            "disk_spill_bytes": 0,
        }
        for k in timings
    }
    _, _, _, ingest = _mk(1)
    line = bench.compact_line(timings, env, counters, ingest, 3, 0.1)
    assert len(line) <= 1950
    d = json.loads(line)
    assert len(d["qv"]) == len(bench.HEADLINE)
