"""CLI tests: option parsing (CLISpec/SnapshotSpec) and the cis flow."""

import os

import pytest

from net_spider_spark.cli import _interval, build_parser, main
from net_spider_spark.interval import NEG_INF, POS_INF

DATA = os.path.join(os.path.dirname(__file__), "data")


def parse(argv):
    return build_parser().parse_args(argv)


def test_interval_options():
    a = parse(["--db", "x", "snapshot", "--time-from", "i2020-01-01T00:00",
               "--time-to", "x2020-01-02T00:00"])
    iv = _interval(a)
    assert iv.lower_inclusive is True and iv.upper_inclusive is False
    assert iv.upper - iv.lower == 86400_000
    # duration form (secUpTo)
    a2 = parse(["--db", "x", "snapshot", "--time-to", "2020-01-02T00:00",
                "--duration", "3600"])
    iv2 = _interval(a2)
    assert iv2.upper - iv2.lower == 3600_000
    # infinities
    a3 = parse(["--db", "x", "snapshot", "--time-from", "x-inf",
                "--time-to", "+inf"])
    iv3 = _interval(a3)
    assert iv3.lower is NEG_INF and iv3.upper is POS_INF


def test_bad_command_rejected():
    with pytest.raises(SystemExit):
        parse(["--db", "x", "bogus"])
    with pytest.raises(SystemExit):
        parse(["snapshot"])  # missing --db


def test_cis_end_to_end(spark, tmp_path, capsys):
    db = str(tmp_path / "history")
    rc = main(
        ["--db", db, "cis", f"{DATA}/syslog_sample.log",
         "--format", "syslog", "--year", "2021"],
        spark=spark,
    )
    assert rc == 0
    xml = capsys.readouterr().out
    assert xml.startswith('<?xml version="1.0"')
    assert "<node id=" in xml and "<edge source=" in xml
    # combined graph: bare-IPv6 ids, dio attrs prefixed
    assert 'fd00::aaa:1:2:3' in xml and "dio_rank" in xml

    # idempotent re-run (cis clears first)
    rc2 = main(
        ["--db", db, "cis", f"{DATA}/syslog_sample.log",
         "--format", "syslog", "--year", "2021"],
        spark=spark,
    )
    assert rc2 == 0


def test_input_latest_filter_and_clear(spark, tmp_path):
    db = str(tmp_path / "h2")
    rc = main(
        ["--db", db, "input", f"{DATA}/syslog_sample.log",
         "--format", "syslog", "--year", "2021", "--filter", "latest"],
        spark=spark,
    )
    assert rc == 0
    from net_spider_spark.ingest import read_findings

    assert read_findings(spark, db).count() == 3  # 1 dio + 2 dao subjects
    rc = main(["--db", db, "clear"], spark=spark)
    assert rc == 0
    assert read_findings(spark, db).count() == 0
