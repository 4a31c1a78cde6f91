"""Pangraph-model export: the reference's alternate GraphML serializer.

Parity target: ``net-spider-pangraph/src/NetSpider/Pangraph.hs:60-141``
— snapshot elements convert to pangraph vertices/edges whose attributes
are (key, ByteString-value) pairs: node/link timestamps become a
``@timestamp`` attribute in ms decimal text (makeVertex/makeEdge), all
attribute values stringify, and edges are emitted subject->target. The
pangraph library then writes GraphML; here the conversion yields plain
DataFrames (vertex/edge tables) plus a writer reusing graphml.py, so
the "pangraph model" is inspectable and joinable instead of opaque.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _empty_map():
    return F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )


def _show_bool(col) -> F.Column:
    # toAtom Bool is Haskell `show`: "True"/"False" (PangraphSpec.hs:38)
    return F.when(col, F.lit("True")).otherwise(F.lit("False"))


def _tz_attr_map(df: DataFrame):
    """``timestampAttributes``' tz tail (Pangraph.hs:60-69): emitted
    only when the frame carries a zone."""
    if "tz_offset_min" not in df.columns:
        return _empty_map()
    return F.when(
        F.col("tz_offset_min").isNotNull(),
        F.create_map(
            F.lit("@tz_offset_min"), F.col("tz_offset_min").cast("string"),
            F.lit("@tz_summer_only"), _show_bool(F.col("tz_summer_only")),
            F.lit("@tz_name"), F.coalesce(F.col("tz_name"), F.lit("")),
        ),
    ).otherwise(_empty_map())


def make_vertices(nodes: DataFrame) -> DataFrame:
    """``makeVertex`` (Pangraph.hs:75-88): (vertex_id, attributes) with
    ``@timestamp`` (+ tz attrs) when observed, ``@is_on_boundary``
    always, then the node attributes. Nodes without a timestamp get no
    @timestamp attribute."""
    base = F.when(
        F.col("node_ts").isNotNull(),
        F.map_concat(
            F.create_map(
                F.lit("@timestamp"), F.col("node_ts").cast("string")
            ),
            _tz_attr_map(nodes),
        ),
    ).otherwise(_empty_map())
    attrs = F.map_concat(
        base,
        F.create_map(
            F.lit("@is_on_boundary"), _show_bool(F.col("is_on_boundary"))
        ),
        F.coalesce(F.col("node_attrs"), _empty_map()),
    )
    return nodes.select(
        F.col("node_id").alias("vertex_id"), attrs.alias("attributes")
    )


def make_edges(links: DataFrame) -> DataFrame:
    """``makeEdge`` (Pangraph.hs:90-103): (source, target, attributes)
    with ``@timestamp`` (+ tz attrs when carried), ``@is_directed``,
    then the link attributes."""
    attrs = F.map_concat(
        F.create_map(F.lit("@timestamp"), F.col("link_ts").cast("string")),
        _tz_attr_map(links),
        F.create_map(
            F.lit("@is_directed"), _show_bool(F.col("is_directed"))
        ),
        F.coalesce(F.col("link_attrs"), _empty_map()),
    )
    return links.select(
        F.col("source_node").alias("source"),
        F.col("dest_node").alias("target"),
        F.col("is_directed"),
        attrs.alias("attributes"),
    )


def write_pangraph(nodes: DataFrame, links: DataFrame) -> str:
    """``writePangraph``: GraphML text via the pangraph-model tables.

    Attribute typing in this path is all-string (pangraph stores
    ByteStrings), unlike graphml.write_graphml's inferred types."""
    verts = make_vertices(nodes).collect()
    edges = make_edges(links).collect()
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n',
    ]
    keys: list[str] = []
    for row in verts:
        for k in row["attributes"]:
            if ("node", k) not in [(d, n) for d, n in _pairs(keys)]:
                keys.append(f"node\x00{k}")
    for row in edges:
        for k in row["attributes"]:
            if ("edge", k) not in [(d, n) for d, n in _pairs(keys)]:
                keys.append(f"edge\x00{k}")
    key_id = {dk: f"d{i}" for i, dk in enumerate(keys)}
    for dk in keys:
        domain, name = dk.split("\x00", 1)
        parts.append(
            f'<key id="{key_id[dk]}" for="{domain}" attr.name="{_esc(name)}"'
            ' attr.type="string"/>\n'
        )
    parts.append('<graph edgedefault="directed">\n')
    for row in verts:
        parts.append(f'  <node id="{_esc(row["vertex_id"])}">\n')
        for k in sorted(row["attributes"]):
            parts.append(
                f'    <data key="{key_id["node" + chr(0) + k]}">'
                f'{_esc(row["attributes"][k])}</data>\n'
            )
        parts.append("  </node>\n")
    for row in edges:
        parts.append(
            f'  <edge source="{_esc(row["source"])}" target="{_esc(row["target"])}">\n'
        )
        for k in sorted(row["attributes"]):
            parts.append(
                f'    <data key="{key_id["edge" + chr(0) + k]}">'
                f'{_esc(row["attributes"][k])}</data>\n'
            )
        parts.append("  </edge>\n")
    parts.append("</graph>\n</graphml>\n")
    return "".join(parts)


def _pairs(keys: list[str]):
    for dk in keys:
        domain, name = dk.split("\x00", 1)
        yield domain, name


def _esc(text) -> str:
    return (
        str(text)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )
