"""Combining DIO and DAO snapshot graphs into one unified mesh view.

Parity target: ``net-spider-rpl/src/NetSpider/RPL/Combined.hs`` — the
combined graph is keyed by bare IPv6 (the dio://and dao:// node-ID
namespaces collapse, Combined.hs:43-48); node attributes merge
first-non-null after newest-first ordering (:99-125); links union with
a ``link_type`` discriminator attribute (:80-85, :129-141). Attribute
keys stay UNPREFIXED exactly like the reference's ``toAttributes``
concatenation (Combined.hs:62-64): the DIO family owns ``rank``/
``dio_interval``, DAO owns ``dao_route_num``, links carry
``source_*``/``dest_*`` (merged DIO) or ``path_lifetime_sec`` (DAO) —
disjoint by construction, so provenance stays recoverable from the key
names (``rpl/jsonutil.py`` relies on this for the tagged JSON wire).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from net_spider_spark.rpl.findingid import address_of


def combine_nodes(dio_nodes: DataFrame, dao_nodes: DataFrame) -> DataFrame:
    """``combineNodes``: union keyed by bare address; newest
    observation wins per attribute family; timestamps keep the max.

    Output: (node_id = bare IPv6, is_on_boundary, node_ts, node_attrs).
    """
    def prep(nodes: DataFrame) -> DataFrame:
        return nodes.select(
            address_of(F.col("node_id")).alias("node_id"),
            "is_on_boundary",
            "node_ts",
            "node_attrs",
        )

    both = prep(dio_nodes).unionByName(prep(dao_nodes))
    merged = both.groupBy("node_id").agg(
        F.min(F.col("is_on_boundary").cast("int")).cast("boolean").alias(
            "is_on_boundary"
        ),
        F.max("node_ts").alias("node_ts"),
        # First-wins after newest-first sort (Combined.hs:110-125):
        # aggregate the per-family maps, newest family first, and merge
        # (map_concat keeps the first occurrence of a key via coalesce
        # ordering below).
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.coalesce(F.col("node_ts"), F.lit(0))).alias("neg_ts"),
                        F.coalesce(
                            F.col("node_attrs"),
                            F.map_from_arrays(
                                F.array().cast("array<string>"),
                                F.array().cast("array<string>"),
                            ),
                        ).alias("m"),
                    )
                ),
                # comparator: structs holding maps aren't naturally orderable
                lambda l, r: F.when(l["neg_ts"] < r["neg_ts"], -1)
                .when(l["neg_ts"] > r["neg_ts"], 1)
                .otherwise(0),
            ),
            F.map_from_arrays(
                F.array().cast("array<string>"), F.array().cast("array<string>")
            ),
            lambda acc, e: F.map_zip_with(
                acc, e["m"], lambda k, v1, v2: F.coalesce(v1, v2)
            ),
        ).alias("node_attrs"),
    )
    return merged


def combine_links(dio_links: DataFrame, dao_links: DataFrame) -> DataFrame:
    """``combineLinks``: concatenation with a ``link_type`` attribute
    discriminator prepended (the reference's ``("link_type", "dio"|
    "dao") : toAttributes ll``, Combined.hs:80-85); endpoints collapse
    to bare addresses; payload attr keys stay as the family produced
    them (``source_*``/``dest_*`` for merged DIO, ``path_lifetime_sec``
    for DAO)."""
    def prep(links: DataFrame, link_type: str) -> DataFrame:
        return links.select(
            address_of(F.col("source_node")).alias("source_node"),
            address_of(F.col("dest_node")).alias("dest_node"),
            "is_directed",
            "link_ts",
            F.map_concat(
                F.create_map(F.lit("link_type"), F.lit(link_type)),
                F.coalesce(
                    F.col("link_attrs"),
                    F.map_from_arrays(
                        F.array().cast("array<string>"),
                        F.array().cast("array<string>"),
                    ),
                ),
            ).alias("link_attrs"),
        )

    return prep(dio_links, "dio").unionByName(prep(dao_links, "dao"))


def combine_graphs(
    dio: tuple[DataFrame, DataFrame], dao: tuple[DataFrame, DataFrame]
) -> tuple[DataFrame, DataFrame]:
    """``combineGraphs`` (Combined.hs:143-147)."""
    return combine_nodes(dio[0], dao[0]), combine_links(dio[1], dao[1])
