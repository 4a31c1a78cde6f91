"""Vectorized IPv6 kernels (SURVEY C4's 2×Long form): whole-Series
parse/format vs the scalar reference path and `ipaddress`, plus the
plan pin that the parser's address path runs Arrow-batched (no
row-at-a-time BatchEvalPython)."""

import ipaddress
import random

import numpy as np
import pandas as pd

from net_spider_spark.rpl import ipv6


def _halves_to_int(h, l):
    return ((int(h) & 0xFFFFFFFFFFFFFFFF) << 64) | (
        int(l) & 0xFFFFFFFFFFFFFFFF
    )


def test_parse_halves_matches_scalar_parse():
    rng = random.Random(7)
    addrs = []
    for _ in range(2000):
        groups = [
            rng.choice([0, 0, 0, 1, 0xFE80, rng.randrange(1 << 16)])
            for _ in range(8)
        ]
        v = 0
        for g in groups:
            v = (v << 16) | g
        addrs.append(ipaddress.IPv6Address(v))
    texts = [a.compressed for a in addrs]
    texts += [a.exploded for a in addrs[:300]]  # uncompressed forms too
    texts += [
        "::", "::1", "fe80::1", "0:0:0:0:0:0:0:0", "2001:db8::",
        "6G-042", "6G-999", "6G-a0f2", "6G-0000",
        # invalid shapes must be rejected, not misparsed
        None, "", "garbage", "1:2:3", ":::1", "1::2::3", "12345::1",
        "1:2:3:4:5:6:7:8:9", ":1:2:3:4:5:6:7", "6G-12", "6G-abcde",
    ]
    out = ipv6.parse_ipv6_halves(pd.Series(texts, dtype=object))
    for i, t in enumerate(texts):
        try:
            want = ipv6.parse_ipv6(t) if t else None
        except (ValueError, ipaddress.AddressValueError):
            want = None
        if want is None:
            assert not out["ok"].iloc[i], t
        else:
            assert out["ok"].iloc[i], t
            got = _halves_to_int(out["hi"].iloc[i], out["lo"].iloc[i])
            assert got == want, (t, hex(got), hex(want))

    # Python's `ipaddress` accepts zone IDs (3.9+) and embedded IPv4;
    # the reference's log grammar has neither, and the vectorized path
    # rejects both rather than inheriting stdlib accidents.
    extra = ipv6.parse_ipv6_halves(
        pd.Series(["fe80::1%eth0", "::ffff:1.2.3.4"], dtype=object)
    )
    assert not extra["ok"].any()


def test_format_halves_is_rfc5952_canonical():
    rng = random.Random(3)
    vals = []
    for _ in range(2000):
        groups = [
            rng.choice([0, 0, 0, rng.randrange(1 << 16)]) for _ in range(8)
        ]
        v = 0
        for g in groups:
            v = (v << 16) | g
        vals.append(v)
    vals += [0, 1, (1 << 128) - 1, 0xFE80 << 112, 1 << 64]
    hi = np.array([v >> 64 for v in vals], dtype=np.uint64).view(np.int64)
    lo = np.array([v & ((1 << 64) - 1) for v in vals], dtype=np.uint64).view(
        np.int64
    )
    got = ipv6.format_ipv6_halves(hi, lo)
    for v, g in zip(vals, got):
        assert g == ipaddress.IPv6Address(v).compressed, (hex(v), g)


def test_high_bit_addresses_survive_the_arrow_boundary(spark):
    # The float64-decay trap: a nullable int64 crossing Arrow rounds
    # low bits of large magnitudes. ff00::/8 addresses have the sign
    # bit set in hi; low-bit-exact lo values prove no rounding.
    from pyspark.sql import functions as F

    from net_spider_spark.rpl.contiki import _canon_addr, _resolve_neighbor_addr

    rows = [
        ("ffff:ffff:ffff:ffff:ffff:ffff:ffff:fff7",),
        ("fd00::aaa:1:2:3",),
        ("not-an-address",),
    ]
    df = spark.createDataFrame(rows, "addr string")
    got = [r["c"] for r in df.select(_canon_addr(F.col("addr")).alias("c")).collect()]
    assert got == ["ffff:ffff:ffff:ffff:ffff:ffff:ffff:fff7",
                   "fd00::aaa:1:2:3", None]

    pairs = [
        ("fd00::aaa:1:2:3", "fe80::bbb:4:5:6"),   # link-local -> subject prefix
        ("fd00::aaa:1:2:3", "fd01::c:d:e:f"),     # global stays
        ("fd00::aaa:1:2:3", "6G-042"),            # compact decimal node id 42
        ("bad", "fe80::1"),                        # invalid subject -> null
    ]
    df2 = spark.createDataFrame(pairs, "s string, n string")
    got2 = [
        r["r"]
        for r in df2.select(
            _resolve_neighbor_addr(F.col("s"), F.col("n")).alias("r")
        ).collect()
    ]
    assert got2 == ["fd00::bbb:4:5:6", "fd01::c:d:e:f", "::2a", None]


def test_parser_address_path_has_no_row_python(spark):
    # VERDICT r4 #8 done-criterion: the parse plan shows ArrowEvalPython
    # (vectorized pandas UDFs) only — no BatchEvalPython anywhere.
    import os

    from net_spider_spark.rpl.contiki import parse_contiki_logs

    data = os.path.join(os.path.dirname(__file__), "data")
    dio, dao = parse_contiki_logs(
        spark, f"{data}/syslog_sample.log", head="syslog", year=2021
    )
    for df in (dio, dao):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan


def test_compact_prefix_case_sensitive_and_guarded_batch():
    # "6G-" is case-sensitive in the reference grammar (P.string,
    # ContikiNG.hs:332-334); the hex body is not. And an all-compact
    # batch must parse without touching the full-address machinery.
    out = ipv6.parse_ipv6_halves(
        pd.Series(["6g-042", "6G-042", "6g-a0f2", "6G-A0F2"])
    )
    assert list(out["ok"]) == [False, True, False, True]
    out = ipv6.parse_ipv6_halves(pd.Series(["6G-042", "6G-101", None]))
    assert list(out["ok"]) == [True, True, False]
    assert int(out["lo"].iloc[1]) == 0x101 or int(out["lo"].iloc[1]) == 101
