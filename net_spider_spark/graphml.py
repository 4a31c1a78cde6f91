"""GraphML serialization of a snapshot graph.

Parity target: ``net-spider/src/NetSpider/GraphML/Writer.hs:301-349``:
``<key>`` declarations collected across all elements (ids ``d0, d1,
...`` in first-seen order), per-node ``@timestamp``/``@tz_*``/
``@is_on_boundary`` data, per-edge explicit ``directed`` attribute,
``edgedefault`` option, XML escaping (Writer.hs:354-366).

GraphML output is a single document, so the snapshot DataFrames are
collected to the driver — appropriate for the human/tool-facing export
path (a snapshot graph is the *small* end product of the query; the
100 TB side stays in Parquet). Attribute typing follows the reference's
typed scalars (GraphML/Attribute.hs:29-35): per key the narrowest of
boolean/long/double/string that fits every observed value.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame


def _escape(text: str) -> str:
    out = []
    for c in str(text):
        if c == "&":
            out.append("&amp;")
        elif c == "<":
            out.append("&lt;")
        elif c == ">":
            out.append("&gt;")
        elif c == '"':
            out.append("&quot;")
        elif c == "'":
            out.append("&apos;")
        elif c == "\n":
            out.append("&#x0a;")
        elif c == "\r":
            out.append("&#x0d;")
        else:
            out.append(c)
    return "".join(out)


def _infer_type(values: Iterable[str]) -> str:
    """Narrowest GraphML attr.type valid for EVERY value: the running
    set of types each value satisfies is intersected, so mixed inputs
    like ["true", "5"] fall back to string instead of declaring a type
    one of the data values violates."""
    possible = {"boolean", "long", "double"}
    for v in values:
        if v is None or not possible:
            continue
        sat = set()
        if v in ("true", "false"):
            sat.add("boolean")
        try:
            int(v)
            sat.add("long")
        except ValueError:
            pass
        try:
            float(v)
            sat.add("double")
        except ValueError:
            pass
        possible &= sat
    for t in ("boolean", "long", "double"):
        if t in possible:
            return t
    return "string"


class _KeyStore:
    """First-seen-ordered key registry (Writer.hs:207-246)."""

    def __init__(self) -> None:
        self._order: list[tuple[str, str]] = []  # (domain, name)
        self._index: dict[tuple[str, str], int] = {}
        self._values: dict[tuple[str, str], list] = {}

    def add(self, domain: str, name: str, value) -> None:
        key = (domain, name)
        if key not in self._index:
            self._index[key] = len(self._order)
            self._order.append(key)
            self._values[key] = []
        self._values[key].append(value)

    def key_id(self, domain: str, name: str) -> str:
        return f"d{self._index[(domain, name)]}"

    def declarations(
        self,
        forced_types: dict[str, str],
        schema_types: Optional[dict[tuple[str, str], str]] = None,
    ) -> str:
        """``forced_types``: engine meta-keys (both domains);
        ``schema_types``: per-(domain, name) types read from struct
        attr schemas — authoritative, no data inference needed."""
        out = []
        for domain, name in self._order:
            atype = (
                forced_types.get(name)
                or (schema_types or {}).get((domain, name))
                or _infer_type(
                    str(v)
                    for v in self._values[(domain, name)]
                    if v is not None
                )
            )
            out.append(
                f'<key id="{self.key_id(domain, name)}" for="{domain}"'
                f' attr.name="{_escape(name)}" attr.type="{atype}"/>\n'
            )
        return "".join(out)


_FORCED_TYPES = {
    "@timestamp": "long",
    "@tz_offset_min": "int",
    "@tz_summer_only": "boolean",
    "@tz_name": "string",
    "@is_on_boundary": "boolean",
}


def _bool_str(v) -> str:
    return "true" if v else "false"


def _attr_items(value) -> list[tuple[str, str]]:
    """Attr column cell -> sorted (key, formatted-string) pairs.
    Accepts a map (dict) or a struct (Row); a None field in a struct is
    ``Maybe`` Nothing — omitted, matching the reference's toAttributes
    dropping Nothing fields (e.g. DIO.hs:215-222)."""
    if value is None:
        return []
    d = value.asDict() if hasattr(value, "asDict") else dict(value)
    out = []
    for k in sorted(d):
        v = d[k]
        if v is None:
            continue
        if isinstance(v, bool):
            v = _bool_str(v)
        out.append((k, str(v)))
    return out


def write_graphml(
    nodes: DataFrame,
    links: DataFrame,
    default_directed: bool = True,
) -> str:
    """Serialize (snapshot_nodes, snapshot_links) DataFrames to a GraphML
    document string (``writeGraphMLWith``). Struct-typed attr columns
    declare their ``attr.type`` straight from the schema (typed scalars,
    GraphML/Attribute.hs:29-35); map attrs fall back to inference."""
    from net_spider_spark.attributes import struct_attr_types

    schema_types: dict[tuple[str, str], str] = {}
    for domain, df, col in (
        ("node", nodes, "node_attrs"),
        ("edge", links, "link_attrs"),
    ):
        declared = struct_attr_types(df, col)
        if declared:
            schema_types.update(
                {(domain, k): t for k, t in declared.items()}
            )

    node_rows = nodes.collect()
    link_rows = links.collect()

    store = _KeyStore()

    def node_data(row) -> list[tuple[str, str]]:
        data = []
        fields = row.__fields__
        if row["node_ts"] is not None:
            data.append(("@timestamp", str(row["node_ts"])))
            # tz meta-properties ride with the timestamp
            # (GraphML/Writer.hs:252-259 / Graph/Internal.hs:84-98)
            if "tz_offset_min" in fields and row["tz_offset_min"] is not None:
                data.append(("@tz_offset_min", str(row["tz_offset_min"])))
                data.append(
                    ("@tz_summer_only", _bool_str(bool(row["tz_summer_only"])))
                )
                if "tz_name" in fields and row["tz_name"] is not None:
                    data.append(("@tz_name", row["tz_name"]))
        data.append(("@is_on_boundary", _bool_str(row["is_on_boundary"])))
        data.extend(_attr_items(row["node_attrs"]))
        return data

    def link_data(row) -> list[tuple[str, str]]:
        data = [("@timestamp", str(row["link_ts"]))]
        data.extend(_attr_items(row["link_attrs"]))
        return data

    node_datas = [node_data(r) for r in node_rows]
    link_datas = [link_data(r) for r in link_rows]
    for d in node_datas:
        for k, v in d:
            store.add("node", k, v)
    for d in link_datas:
        for k, v in d:
            store.add("edge", k, v)

    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns"\n',
        ' xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"\n',
        ' xsi:schemaLocation="http://graphml.graphdrawing.org/xmlns'
        ' http://graphml.graphdrawing.org/xmlns/1.0/graphml.xsd">\n',
        store.declarations(_FORCED_TYPES, schema_types),
        f'<graph edgedefault="{"directed" if default_directed else "undirected"}">\n',
    ]
    for row, data in zip(node_rows, node_datas):
        parts.append(f'  <node id="{_escape(row["node_id"])}">\n')
        for k, v in data:
            parts.append(
                f'    <data key="{store.key_id("node", k)}">{_escape(v)}</data>\n'
            )
        parts.append("  </node>\n")
    for row, data in zip(link_rows, link_datas):
        parts.append(
            f'  <edge source="{_escape(row["source_node"])}"'
            f' target="{_escape(row["dest_node"])}"'
            f' directed="{_bool_str(row["is_directed"])}">\n'
        )
        for k, v in data:
            parts.append(
                f'    <data key="{store.key_id("edge", k)}">{_escape(v)}</data>\n'
            )
        parts.append("  </edge>\n")
    parts.append("</graph>\n</graphml>\n")
    return "".join(parts)
