"""Typed attribute columns: per-application struct-typed
``node_attrs`` / ``link_attrs`` flowing through ingest -> snapshot ->
GraphML with native Spark types.

Parity targets:

* open typed attribute values — ``net-spider/src/NetSpider/
  Graph/Internal.hs:229-267`` (``NodeAttributes`` / ``LinkAttributes``
  type classes: each application declares its own attribute record);
* typed GraphML scalars — ``GraphML/Attribute.hs:29-35``
  (AttrBoolean/AttrInt/AttrDouble/AttrString);
* round-trip behavior — ``test/ServerTest/Attributes.hs:33-60``
  (typed node+link attrs survive ingest -> snapshot unchanged;
  unobserved nodes have no attributes).

The Spark-first translation of a Haskell attribute *record* is a
StructType column, not a map: fields keep native types end-to-end
(filters on ``node_attrs.rank`` push down; no string re-parsing), a
null field is ``Maybe`` Nothing, and a null struct is "never
observed". The generic ``map<string,string>`` schema stays as the
dynamic fallback (the reference's aeson-PMap analogue) for callers
that don't know their attribute shape up front.

Everything downstream is attribute-opaque — the explode, argmax,
unify, negation, and direction stages never introspect attrs — so a
typed findings DataFrame runs the SAME ``get_snapshot`` engine;
``write_graphml`` reads ``attr.type`` declarations straight from the
struct schema instead of re-inferring them from strings.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from net_spider_spark.findings import FoundNode
from net_spider_spark.model import FINDINGS_SCHEMA
from net_spider_spark.timestamp import Timestamp


def typed_findings_schema(
    node_attrs: Optional[T.StructType],
    link_attrs: Optional[T.StructType],
) -> T.StructType:
    """FINDINGS_SCHEMA with struct-typed attribute columns; pass None
    to keep the generic map form for that side."""
    fields = []
    for f in FINDINGS_SCHEMA.fields:
        if f.name == "node_attrs" and node_attrs is not None:
            fields.append(T.StructField("node_attrs", node_attrs, True))
        elif f.name == "neighbor_links" and link_attrs is not None:
            nl = T.StructType(
                [
                    T.StructField("target_node", T.StringType(), False),
                    T.StructField("link_state", T.StringType(), False),
                    T.StructField("link_attrs", link_attrs, True),
                ]
            )
            fields.append(
                T.StructField("neighbor_links", T.ArrayType(nl), True)
            )
        else:
            fields.append(f)
    return T.StructType(fields)


def _attr_tuple(attrs, schema: Optional[T.StructType]):
    """dict -> schema-ordered tuple (None fields = Maybe Nothing);
    None attrs stay None (never observed)."""
    if schema is None:
        return dict(attrs) if attrs is not None else None
    if attrs is None:
        return None
    extra = set(attrs) - {f.name for f in schema.fields}
    if extra:
        raise ValueError(f"attrs {sorted(extra)} not in schema {schema.names}")
    return tuple(attrs.get(f.name) for f in schema.fields)


def typed_findings_to_df(
    spark: SparkSession,
    findings: Iterable[FoundNode],
    node_attrs: Optional[T.StructType] = None,
    link_attrs: Optional[T.StructType] = None,
    start_finding_id: int = 0,
) -> DataFrame:
    """``findings_to_df`` twin for typed attributes: FoundNode values
    whose ``node_attrs`` / ``link_attrs`` dicts carry native Python
    values (bool/int/float/str/None) matching the given struct
    schemas."""
    schema = typed_findings_schema(node_attrs, link_attrs)
    rows = []
    for i, fn in enumerate(findings):
        ts = fn.found_at if isinstance(fn.found_at, Timestamp) else None
        rows.append(
            (
                start_finding_id + i,
                fn.subject_node,
                fn.epoch_ms,
                ts.tz_offset_min if ts else None,
                ts.tz_summer_only if ts else None,
                ts.tz_name if ts else None,
                _attr_tuple(fn.node_attrs, node_attrs),
                [
                    (
                        fl.target_node,
                        fl.state_value,
                        _attr_tuple(fl.link_attrs, link_attrs),
                    )
                    for fl in fn.neighbor_links
                ],
            )
        )
    return spark.createDataFrame(rows, schema)


def graphml_attr_type(dtype: T.DataType) -> str:
    """Spark type -> GraphML attr.type (GraphML/Attribute.hs:29-35 +
    attrTypeString, Writer.hs:150-166)."""
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    # the reference distinguishes int/long and float/double
    # (AttributeType, Writer.hs:140-170)
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(dtype, T.LongType):
        return "long"
    if isinstance(dtype, T.FloatType):
        return "float"
    if isinstance(dtype, (T.DoubleType, T.DecimalType)):
        return "double"
    return "string"


def struct_attr_types(df: DataFrame, col: str) -> Optional[dict[str, str]]:
    """attr.name -> attr.type map when ``col`` is struct-typed, else
    None (map attrs: types are inferred from the data)."""
    for f in df.schema.fields:
        if f.name == col and isinstance(f.dataType, T.StructType):
            return {
                sf.name: graphml_attr_type(sf.dataType)
                for sf in f.dataType.fields
            }
    return None
