"""Core schemas: findings (history graph), link samples, snapshot output.

Parity targets:

* ``FoundNode``/``FoundLink``/``LinkState`` — ``net-spider/src/NetSpider/Found.hs:35-140``
* ``LinkSample`` — ``net-spider/src/NetSpider/Unify.hs:42-55``
* ``SnapshotNode``/``SnapshotLink`` — ``net-spider/src/NetSpider/Snapshot/Internal.hs:34-114``

The history graph is an append-only table of findings (FIXTURES.md §1):
one row per local observation "node X saw neighbors {...} at time T".
Attributes are an open ``map<string,string>`` by default (the
reference's type-class-open ``na``/``la`` parameters); applications
needing typed attributes can carry extra struct columns alongside.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T


class LinkState(str, Enum):
    """Link state as observed by the subject node (Found.hs:35-59)."""

    UNUSED = "unused"
    TO_TARGET = "to_target"
    TO_SUBJECT = "to_subject"
    BIDIRECTIONAL = "bidirectional"

    @classmethod
    def values(cls) -> list[str]:
        return [m.value for m in cls]


ATTRS_TYPE = T.MapType(T.StringType(), T.StringType())

# Engine-internal presence markers inside the open attrs map: they
# record that a Maybe-record was PRESENT with no fields (the
# reference's `DAONode Nothing`, the normal non-root DAO case,
# DAO.hs:55-61) — information a flat key/value map cannot otherwise
# carry. Serializers that mirror the reference's `toAttributes`
# (GraphML, pangraph) must DROP these keys (`toAttributes (DAONode
# Nothing) = []`, DAO.hs:71-75); the JSON wire codec (rpl/jsonutil.py)
# consumes them to emit `{"dao": {"dao_route_num": null}}` like Aeson.
INTERNAL_ATTR_KEYS = frozenset({"dao_present"})

NEIGHBOR_LINK_TYPE = T.StructType(
    [
        T.StructField("target_node", T.StringType(), False),
        T.StructField("link_state", T.StringType(), False),
        T.StructField("link_attrs", ATTRS_TYPE, True),
    ]
)

# The history-graph table. `finding_id` is a monotone ingest sequence used
# only as a deterministic tie-breaker (the reference breaks timestamp ties
# by Haskell-runtime list order, which is not reproducible; an explicit
# tie-break keeps the engine's output stable across partitionings).
FINDINGS_SCHEMA = T.StructType(
    [
        T.StructField("finding_id", T.LongType(), False),
        T.StructField("subject_node", T.StringType(), False),
        T.StructField("found_at", T.LongType(), False),
        T.StructField("tz_offset_min", T.IntegerType(), True),
        T.StructField("tz_summer_only", T.BooleanType(), True),
        T.StructField("tz_name", T.StringType(), True),
        T.StructField("node_attrs", ATTRS_TYPE, True),
        T.StructField("neighbor_links", T.ArrayType(NEIGHBOR_LINK_TYPE), True),
    ]
)

# Exploded companion of `findings` (= LinkSample, Unify.hs:42-55).
LINK_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("finding_id", T.LongType(), False),
        T.StructField("link_pos", T.IntegerType(), False),
        T.StructField("subject_node", T.StringType(), False),
        T.StructField("target_node", T.StringType(), False),
        T.StructField("link_state", T.StringType(), False),
        T.StructField("found_at", T.LongType(), False),
        T.StructField("link_attrs", ATTRS_TYPE, True),
    ]
)

SNAPSHOT_NODE_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("is_on_boundary", T.BooleanType(), False),
        T.StructField("node_ts", T.LongType(), True),
        T.StructField("node_attrs", ATTRS_TYPE, True),
        # Display timezone of the winning observation (optional; the
        # reference preserves tz meta-properties end to end).
        T.StructField("tz_offset_min", T.IntegerType(), True),
        T.StructField("tz_summer_only", T.BooleanType(), True),
        T.StructField("tz_name", T.StringType(), True),
    ]
)

SNAPSHOT_LINK_SCHEMA = T.StructType(
    [
        T.StructField("source_node", T.StringType(), False),
        T.StructField("dest_node", T.StringType(), False),
        T.StructField("is_directed", T.BooleanType(), False),
        T.StructField("link_ts", T.LongType(), False),
        T.StructField("link_attrs", ATTRS_TYPE, True),
    ]
)
