"""Custom unification hooks: applyInPandas merge (A6), custom negation,
SeqID conversion. Models the MergedDIOLink pattern
(net-spider-rpl/src/NetSpider/RPL/DIO.hs:230-279): the merge combines
BOTH endpoints' samples into one output with a different attribute
shape."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from net_spider_spark.findings import FoundLink, FoundNode, findings_to_df
from net_spider_spark.seqid import convert_graph, make_seq_ids, original_id_for
from net_spider_spark.snapshot import Query, get_snapshot
from net_spider_spark.unify import UnifyConfig, no_negation

MERGE_SCHEMA = T.StructType(
    [
        T.StructField("p1", T.StringType()),
        T.StructField("p2", T.StringType()),
        T.StructField("finding_id", T.LongType()),
        T.StructField("link_pos", T.IntegerType()),
        T.StructField("subject_node", T.StringType()),
        T.StructField("target_node", T.StringType()),
        T.StructField("link_state", T.StringType()),
        T.StructField("found_at", T.LongType()),
        T.StructField("link_attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)


def merge_both_endpoints(pdf: pd.DataFrame) -> pd.DataFrame:
    """Latest sample wins, but attrs record both endpoints' metrics
    (from_source / from_dest), like MergedDIOLink."""
    pdf = pdf.sort_values(["found_at", "finding_id"])
    win = pdf.iloc[-1]
    by_subject = {
        row["subject_node"]: row["link_attrs"] for _, row in pdf.iterrows()
    }
    src_attrs = by_subject.get(win["subject_node"]) or {}
    other = [s for s in by_subject if s != win["subject_node"]]
    dst_attrs = by_subject.get(other[0]) if other else None
    merged = {"from_source_m": src_attrs.get("m", "")}
    if dst_attrs is not None:
        merged["from_dest_m"] = dst_attrs.get("m", "")
    out = win.to_frame().T.copy()
    out["link_attrs"] = [merged]
    return out[[c.name for c in MERGE_SCHEMA.fields]]


def test_apply_in_pandas_merge(spark):
    findings = [
        FoundNode("a", 2000, [FoundLink("b", "to_target", {"m": "42"})]),
        FoundNode("b", 1000, [FoundLink("a", "to_subject", {"m": "77"})]),
    ]
    conf = UnifyConfig(
        merge_samples=merge_both_endpoints,
        merge_output_schema=MERGE_SCHEMA,
        negates=no_negation,
    )
    _, links = get_snapshot(
        findings_to_df(spark, findings), Query(unify=conf)
    )
    rows = [r.asDict(recursive=True) for r in links.collect()]
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_node"], r["dest_node"], r["is_directed"]) == ("a", "b", True)
    assert r["link_ts"] == 2000
    assert r["link_attrs"] == {"from_source_m": "42", "from_dest_m": "77"}


def test_custom_negation(spark):
    # Kill every link older than 1500 regardless of endpoints.
    findings = [
        FoundNode("a", 2000, [FoundLink("b", "to_target")]),
        FoundNode("c", 1000, [FoundLink("d", "to_target")]),
    ]
    conf = UnifyConfig(
        negates=lambda node_id, node_ts: F.col("found_at") < F.lit(1500)
    )
    _, links = get_snapshot(findings_to_df(spark, findings), Query(unify=conf))
    got = [(r["source_node"], r["dest_node"]) for r in links.collect()]
    assert got == [("a", "b")]


def test_seqid_roundtrip(spark):
    # x newer than y so the x->y link survives default negation
    findings = [
        FoundNode("x", 2, [FoundLink("y", "to_target")]),
        FoundNode("y", 1, [FoundLink("z", "to_target")]),
    ]
    nodes, links = get_snapshot(findings_to_df(spark, findings), Query())
    mapping, nodes_int, links_int = convert_graph(nodes, links)
    m = {r["node_id"]: r["seq_id"] for r in mapping.collect()}
    assert m == {"x": 0, "y": 1, "z": 2}
    got_links = sorted(
        (r["source_node"], r["dest_node"]) for r in links_int.collect()
    )
    assert got_links == [(0, 1), (1, 2)]
    assert original_id_for(mapping, 2) == "z"
    assert original_id_for(mapping, 99) is None
