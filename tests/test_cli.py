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
    assert 'fd00::aaa:1:2:3' in xml and 'attr.name="rank"' in xml

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


def test_cis_merged_dio_two_endpoints(spark, tmp_path, capsys):
    # Both endpoints report the same physical link (A sees B as
    # preferred parent, B sees A as parent candidate), so the shipped
    # dio_unifier_conf actually merges two samples: the CLI's GraphML
    # must carry source_-prefixed winner attrs AND dest_-prefixed loser
    # attrs on one edge (CLI.hs:66-138 cis flow; DIO.hs:254-288 merge).
    db = str(tmp_path / "h3")
    rc = main(
        ["--db", db, "cis", f"{DATA}/syslog_two_way.log",
         "--format", "syslog", "--year", "2021"],
        spark=spark,
    )
    assert rc == 0
    xml = capsys.readouterr().out
    assert "<edge source=" in xml

    import xml.etree.ElementTree as ET

    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    root = ET.fromstring(xml)
    key_by_id = {
        k.get("id"): k.get("attr.name") for k in root.findall("g:key", ns)
    }
    edges = root.findall(".//g:edge", ns)
    assert len(edges) == 1
    attrs = {
        key_by_id[d.get("key")]: d.text for d in edges[0].findall("g:data", ns)
    }
    # winner (preferred_parent, A's sample) -> source_*; loser -> dest_*
    assert attrs["link_type"] == "dio"
    assert attrs["source_neighbor_type"] == "preferred_parent"
    assert attrs["dest_neighbor_type"] == "parent_candidate"
    assert attrs["source_neighbor_rank"] == "128"
    assert attrs["dest_neighbor_rank"] == "356"
    assert attrs["source_metric"] == "100"
    assert attrs["dest_metric"] == "110"


def test_cli_compact(spark, tmp_path, capsys):
    db = str(tmp_path / "h4")
    for _ in range(3):
        rc = main(
            ["--db", db, "input", f"{DATA}/syslog_sample.log",
             "--format", "syslog", "--year", "2021"],
            spark=spark,
        )
        assert rc == 0
    rc = main(["--db", db, "compact"], spark=spark)
    assert rc == 0
    err = capsys.readouterr().err
    assert "compacted" in err and "-> " in err
    from net_spider_spark.ingest import read_findings

    assert read_findings(spark, db).count() == 9  # 3 appends x 3 findings


def test_cli_compact_zorder(spark, tmp_path, capsys):
    db = str(tmp_path / "h5")
    for _ in range(2):
        rc = main(
            ["--db", db, "input", f"{DATA}/syslog_sample.log",
             "--format", "syslog", "--year", "2021"],
            spark=spark,
        )
        assert rc == 0
    rc = main(["--db", db, "compact", "--zorder"], spark=spark)
    assert rc == 0
    err = capsys.readouterr().err
    assert "z-ordered" in err
    import os

    from net_spider_spark.ingest import read_findings

    # found_day partition dirs are gone (time axis moved into the
    # curve); the data survives intact
    assert not any(
        d.startswith("found_day=") for d in os.listdir(db)
    )
    assert read_findings(spark, db).count() == 6


def test_cis_file_output_streams_identically(spark, tmp_path, capsys):
    # -o <path> routes through the streaming file writer; bytes must
    # equal the stdout (in-memory) writer on the same history.
    db = str(tmp_path / "history")
    rc = main(
        ["--db", db, "cis", f"{DATA}/syslog_sample.log",
         "--format", "syslog", "--year", "2021"],
        spark=spark,
    )
    assert rc == 0
    stdout_xml = capsys.readouterr().out
    out = tmp_path / "snap.graphml"
    rc = main(
        ["--db", db, "cis", f"{DATA}/syslog_sample.log",
         "--format", "syslog", "--year", "2021", "-o", str(out)],
        spark=spark,
    )
    assert rc == 0
    assert out.read_text(encoding="utf-8") == stdout_xml


def test_duration_interval_semantics():
    # SnapshotSpec.hs:74-96: duration pairs with exactly one bound
    import argparse

    import pytest

    from net_spider_spark.cli import _interval

    def ns(**kw):
        base = dict(time_from=None, time_to=None, duration=None)
        base.update(kw)
        return argparse.Namespace(**base)

    # secSince/secUntil (Interval.hs:148-185): the derived far end's
    # inclusivity is the NEGATION of the anchor's — all four polarities.
    iv = _interval(ns(time_from="i2019-04-30T19:03:33", duration=3600))
    assert iv.lower == 1556651013000 and iv.lower_inclusive
    assert iv.upper == 1556651013000 + 3600000 and not iv.upper_inclusive

    iv = _interval(ns(time_from="x2019-04-30T19:03:33", duration=3600))
    assert iv.lower == 1556651013000 and not iv.lower_inclusive
    assert iv.upper == 1556651013000 + 3600000 and iv.upper_inclusive

    iv = _interval(ns(time_to="i2019-04-30T19:03:33", duration=600))
    assert iv.upper == 1556651013000 and iv.upper_inclusive
    assert iv.lower == 1556651013000 - 600000 and not iv.lower_inclusive

    iv = _interval(ns(time_to="x2019-04-30T19:03:33", duration=600))
    assert iv.upper == 1556651013000 and not iv.upper_inclusive
    assert iv.lower == 1556651013000 - 600000 and iv.lower_inclusive

    # Infinite anchor + duration -> the empty interval, not a crash
    # (secSince/secUntil doctest: `60 secSince (PosInf, False)` = empty).
    for spec in ({"time_from": "-inf"}, {"time_from": "i+inf"},
                 {"time_to": "+inf"}, {"time_to": "x-inf"}):
        iv = _interval(ns(duration=600, **spec))
        assert not iv.contains(0) and not iv.contains(1556651013000)

    with pytest.raises(SystemExit):
        _interval(ns(time_from="i2019-04-30T19:03:33",
                     time_to="x2019-04-30T20:03:33", duration=600))
    with pytest.raises(SystemExit):
        _interval(ns(duration=600))


def test_snapshot_requires_starts_and_lifts_bare_ipv6(spark, tmp_path, capsys):
    # CLI.hs:109-112: plain `snapshot` with no -s dies; CLISpec.hs: -s
    # takes a BARE IPv6 (IPv6ID) which rebaseQuery lifts into BOTH the
    # dio:// and dao:// namespaces.
    db = str(tmp_path / "h5")
    rc = main(
        ["--db", db, "input", f"{DATA}/syslog_sample.log",
         "--format", "syslog", "--year", "2021"],
        spark=spark,
    )
    assert rc == 0
    with pytest.raises(SystemExit, match="starting nodes"):
        main(["--db", db, "snapshot"], spark=spark)

    rc = main(
        ["--db", db, "snapshot", "-s", "fd00:0::aaa:1:2:3"], spark=spark
    )
    assert rc == 0
    xml = capsys.readouterr().out
    # one bare start reaches both family graphs: dio attrs (rank) AND
    # dao attrs (dao_route_num) in one combined document
    assert 'attr.name="rank"' in xml
    assert 'attr.name="dao_route_num"' in xml
    assert "fd00::aaa:1:2:3" in xml

    with pytest.raises(SystemExit, match="Invalid start node"):
        main(["--db", db, "snapshot", "-s", "not-an-address"], spark=spark)


def test_snapshot_grammar_parity():
    # SnapshotSpec.hs: short -f/-t/-d aliases, positional NODE-ID
    # arguments on `snapshot` appending AFTER the -s options
    # (["90", "-s", "181"] -> [181, 90]); cis takes none.
    a = parse(["--db", "x", "snapshot", "90", "-s", "181"])
    assert a.starts_from == ["181"] and a.start_args == ["90"]
    a = parse(["--db", "x", "snapshot", "143", "200", "473", "21"])
    assert a.start_args == ["143", "200", "473", "21"]
    a = parse(["--db", "x", "snapshot", "-f", "i2018-10-11T14:13:33",
               "-t", "i2018-10-11T14:13:50.332"])
    iv = _interval(a)
    assert iv.lower == 1539267213000 and iv.upper == 1539267230332
    a = parse(["--db", "x", "snapshot", "-s", "x", "-d", "600",
               "-t", "x2019-04-30T19:03:33"])
    assert _interval(a).upper == 1556651013000
    # cis has no NODE-ID positionals — its extra positionals are input
    # FILES (parserInputFiles), exactly like the reference
    a = parse(["--db", "x", "cis", "log1", "log2"])
    assert a.logs == ["log1", "log2"] and not hasattr(a, "start_args")


def test_input_stdin_dash(spark, tmp_path, monkeypatch, capsys):
    # '-' reads findings from STDIN (CLI.hs parserInputFiles)
    import io

    db = str(tmp_path / "h6")
    log_text = open(f"{DATA}/syslog_sample.log", encoding="utf-8").read()
    monkeypatch.setattr("sys.stdin", io.StringIO(log_text))
    rc = main(["--db", db, "input", "-", "--format", "syslog",
               "--year", "2021"], spark=spark)
    assert rc == 0
    from net_spider_spark.ingest import read_findings

    assert read_findings(spark, db).count() == 3


def test_input_stdin_spool_is_cleaned_up(spark, tmp_path, monkeypatch):
    # review fix: the '-' STDIN spool file must not leak into $TMPDIR
    import io
    import tempfile

    created = []
    real_ntf = tempfile.NamedTemporaryFile

    def tracking_ntf(*a, **kw):
        f = real_ntf(*a, **kw)
        created.append(f.name)
        return f

    monkeypatch.setattr(tempfile, "NamedTemporaryFile", tracking_ntf)
    log_text = open(f"{DATA}/syslog_sample.log", encoding="utf-8").read()
    monkeypatch.setattr("sys.stdin", io.StringIO(log_text))
    db = str(tmp_path / "h7")
    rc = main(["--db", db, "input", "-", "--format", "syslog",
               "--year", "2021"], spark=spark)
    assert rc == 0
    spools = [p for p in created if p.endswith(".log")]
    assert spools and all(not os.path.exists(p) for p in spools)


def test_cli_analyze_dodag_attributes(spark, tmp_path, capsys):
    # `analyze` = reference CLI/Analyze.hs analyzeDIO/analyzeDAO over
    # the family snapshots: DODAGAttributes on stdout (Show layout),
    # WriterLoggingM-style debug lines on stderr. The syslog golden's
    # routing links (bbb->aaa, ccc->bbb, 6G-0042->bbb, aaa = DODAG
    # root) pin the DAO numbers exactly.
    db = str(tmp_path / "history")
    rc = main(
        ["--db", db, "input", f"{DATA}/syslog_sample.log",
         "--format", "syslog", "--year", "2023"],
        spark=spark,
    )
    assert rc == 0
    rc = main(["--db", db, "analyze"], spark=spark)
    assert rc == 0
    cap = capsys.readouterr()
    assert (
        "DAO: DODAGAttributes {node_num = 4, edge_num = 3, depth = 2, "
        "root = fd00::aaa:1:2:3, time = 2023-02-03T09:00:03.000}"
    ) in cap.out
    assert (
        "DIO: DODAGAttributes {node_num = 4, edge_num = 1, depth = 1, "
        "root = fd00::bbb:4:5:6, time = 2023-02-03T09:00:02.000}"
    ) in cap.out
    assert "Root of the DAO graph: fd00::aaa:1:2:3" in cap.err
    assert "Timestamp of the DIO graph: 2023-02-03T09:00:02.000" in cap.err

    # an empty history analyzes to errors (reference logErrorW text),
    # not a crash, and still exits 0 like the Nothing path
    empty_db = str(tmp_path / "empty_hist")
    main(["--db", empty_db, "clear"], spark=spark)
    rc = main(["--db", empty_db, "analyze"], spark=spark)
    assert rc == 0
    cap = capsys.readouterr()
    assert "DODAGAttributes" not in cap.out
    assert "The graph has no node that has no parent." in cap.err
