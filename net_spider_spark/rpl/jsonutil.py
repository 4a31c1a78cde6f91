"""JSON wire codecs for COMBINED RPL graphs (tagged encoding).

Parity target: ``net-spider-rpl/src/NetSpider/RPL/JSONUtil.hs:24-46``
and the instances in ``Combined.hs:67-93``:

* ``CombinedNode`` (Combined.hs:43-48) encodes with ``optCombinedNode``
  (field = lowercased, "attrs" stripped): ``attrsDIO``/``attrsDAO``
  become ``{"dio": <DIONode>|null, "dao": <DAONode>|null}``; the inner
  records use ``optSnake`` — ``{"rank": N, "dio_interval": N}``
  (DIO.hs:69-75) and ``{"dao_route_num": N|null}`` (DAO.hs:51-61).
* ``CombinedLink`` (Combined.hs:76-78) encodes with ``optCombinedLink``
  — Aeson ``TaggedObject`` with ``tagFieldName = "link_type"`` and
  ``contentsFieldName = "link"``; constructor tags lowercase to
  ``"dio"``/``"dao"``. The payload is a ``MergedDIOLink``
  ``{"from_source": <DIOLink>, "from_dest": <DIOLink>|null}``
  (DIO.hs:230-235) or a ``DAOLink`` ``{"path_lifetime_sec": N}``
  (DAO.hs:93-101); ``DIOLink`` is ``{"neighbor_type": <text>,
  "neighbor_rank": N, "metric": N|null}`` (DIO.hs:167-178) with
  ``NeighborType`` as its text rendering (DIO.hs:118-122).

Spark-first: both directions are single JVM-side projections —
``to_json`` / ``from_json`` with ``ignoreNullFields=false`` so absent
``Maybe`` fields render as explicit ``null`` exactly like Aeson's
``defaultOptions`` (``omitNothingFields = False``). No Python runs per
row.

The DataFrame side of the codec is the repo's combined-graph shape
(``rpl/combined.py``): flattened ``map<string,string>`` attrs with the
reference's own key names — ``rank``/``dio_interval``/
``dao_route_num`` on nodes, ``source_*``/``dest_*``/
``path_lifetime_sec`` + the ``link_type`` discriminator on links
(disjoint by construction, Combined.hs:62-85), so family provenance is
recoverable from the names alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NO_NULLS = {"ignoreNullFields": "false"}


def _attr(name: str):
    return F.col("node_attrs").getItem(name)


def _lattr(name: str):
    return F.col("link_attrs").getItem(name)


def combined_nodes_to_json(nodes: DataFrame) -> DataFrame:
    """(node_id, ..., node_attrs) from ``combine_nodes`` ->
    (node_id, json) where ``json`` is the reference's ``CombinedNode``
    wire document. A family is present iff any of its attrs survived
    the combine (mirrors ``Maybe DIONode`` / ``Maybe DAONode``)."""
    dio = F.when(
        _attr("rank").isNotNull(),
        F.struct(
            _attr("rank").cast("long").alias("rank"),
            _attr("dio_interval").cast("long").alias("dio_interval"),
        ),
    )
    dao_present = _attr("dao_route_num").isNotNull() | _attr(
        "dao_present"
    ).isNotNull()
    dao = F.when(
        dao_present,
        F.struct(_attr("dao_route_num").cast("long").alias("dao_route_num")),
    )
    return nodes.select(
        "node_id",
        F.to_json(
            F.struct(dio.alias("dio"), dao.alias("dao")), _NO_NULLS
        ).alias("json"),
    )


_NODE_WIRE_SCHEMA = (
    "dio STRUCT<rank: BIGINT, dio_interval: BIGINT>, "
    "dao STRUCT<dao_route_num: BIGINT>"
)


def combined_nodes_from_json(df: DataFrame, json_col: str = "json") -> DataFrame:
    """Inverse of :func:`combined_nodes_to_json`: (node_id, json) ->
    (node_id, node_attrs) with the reference's flat key names.
    A present-but-empty DAONode (``dao_route_num: null``) keeps a
    ``dao_present`` marker so presence round-trips."""
    doc = F.from_json(F.col(json_col), _NODE_WIRE_SCHEMA).alias("doc")
    parsed = df.select("node_id", doc)
    entry = lambda k, v: F.struct(F.lit(k).alias("key"), v.alias("value"))  # noqa: E731
    entries = F.filter(
        F.array(
            F.when(
                F.col("doc.dio").isNotNull(),
                entry("rank", F.col("doc.dio.rank").cast("string")),
            ),
            F.when(
                F.col("doc.dio").isNotNull(),
                entry(
                    "dio_interval",
                    F.col("doc.dio.dio_interval").cast("string"),
                ),
            ),
            F.when(
                F.col("doc.dao.dao_route_num").isNotNull(),
                entry(
                    "dao_route_num",
                    F.col("doc.dao.dao_route_num").cast("string"),
                ),
            ),
            F.when(
                F.col("doc.dao").isNotNull()
                & F.col("doc.dao.dao_route_num").isNull(),
                entry("dao_present", F.lit("true")),
            ),
        ),
        lambda e: e.isNotNull(),
    )
    return parsed.select("node_id", F.map_from_entries(entries).alias("node_attrs"))


def _dio_link_side(prefix: str):
    return F.struct(
        _lattr(f"{prefix}neighbor_type").alias("neighbor_type"),
        _lattr(f"{prefix}neighbor_rank").cast("long").alias("neighbor_rank"),
        _lattr(f"{prefix}metric").cast("long").alias("metric"),
    )


def combined_links_to_json(links: DataFrame) -> DataFrame:
    """(source_node, dest_node, ..., link_attrs) from ``combine_links``
    -> endpoint columns + ``json`` holding the reference's TaggedObject
    ``{"link_type": "dio"|"dao", "link": {...}}`` document."""
    is_dio = _lattr("link_type") == F.lit("dio")
    dio_doc = F.to_json(
        F.struct(
            F.lit("dio").alias("link_type"),
            F.struct(
                _dio_link_side("source_").alias("from_source"),
                F.when(
                    _lattr("dest_neighbor_type").isNotNull(),
                    _dio_link_side("dest_"),
                ).alias("from_dest"),
            ).alias("link"),
        ),
        _NO_NULLS,
    )
    dao_doc = F.to_json(
        F.struct(
            F.lit("dao").alias("link_type"),
            F.struct(
                _lattr("path_lifetime_sec")
                .cast("long")
                .alias("path_lifetime_sec")
            ).alias("link"),
        ),
        _NO_NULLS,
    )
    return links.select(
        "source_node",
        "dest_node",
        "is_directed",
        "link_ts",
        F.when(is_dio, dio_doc).otherwise(dao_doc).alias("json"),
    )


_LINK_WIRE_SCHEMA = (
    "link_type STRING, link STRUCT<"
    "from_source: STRUCT<neighbor_type: STRING, neighbor_rank: BIGINT, metric: BIGINT>, "
    "from_dest: STRUCT<neighbor_type: STRING, neighbor_rank: BIGINT, metric: BIGINT>, "
    "path_lifetime_sec: BIGINT>"
)


def combined_links_from_json(df: DataFrame, json_col: str = "json") -> DataFrame:
    """Inverse of :func:`combined_links_to_json`: parse the tagged wire
    document back into the repo's flattened ``link_attrs`` map (with
    the ``link_type`` discriminator entry)."""
    parsed = df.select(
        "source_node",
        "dest_node",
        "is_directed",
        "link_ts",
        F.from_json(F.col(json_col), _LINK_WIRE_SCHEMA).alias("doc"),
    )
    entry = lambda k, v: F.struct(k.alias("key"), v.alias("value"))  # noqa: E731

    def side_entries(side: str, prefix: str):
        s = F.col(f"doc.link.{side}")
        return [
            F.when(
                s.isNotNull(),
                entry(
                    F.lit(f"{prefix}neighbor_type"), s.getField("neighbor_type")
                ),
            ),
            F.when(
                s.isNotNull(),
                entry(
                    F.lit(f"{prefix}neighbor_rank"),
                    s.getField("neighbor_rank").cast("string"),
                ),
            ),
            F.when(
                s.getField("metric").isNotNull(),
                entry(
                    F.lit(f"{prefix}metric"), s.getField("metric").cast("string")
                ),
            ),
        ]

    entries = F.filter(
        F.array(
            entry(F.lit("link_type"), F.col("doc.link_type")),
            *side_entries("from_source", "source_"),
            *side_entries("from_dest", "dest_"),
            F.when(
                F.col("doc.link.path_lifetime_sec").isNotNull(),
                entry(
                    F.lit("path_lifetime_sec"),
                    F.col("doc.link.path_lifetime_sec").cast("string"),
                ),
            ),
        ),
        lambda e: e.isNotNull(),
    )
    return parsed.select(
        "source_node",
        "dest_node",
        "is_directed",
        "link_ts",
        F.map_from_entries(entries).alias("link_attrs"),
    )
