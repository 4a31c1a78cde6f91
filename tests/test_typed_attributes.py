"""Typed attribute columns through ingest -> snapshot -> GraphML,
mirroring the reference's attribute round-trip suite
(net-spider/test/ServerTest/Attributes.hs:33-60 via typeTestCase /
attributeTestCase / timestampTestCase)."""

from pyspark.sql import types as T

from net_spider_spark.attributes import (
    graphml_attr_type,
    struct_attr_types,
    typed_findings_schema,
    typed_findings_to_df,
)
from net_spider_spark.findings import FoundLink, FoundNode
from net_spider_spark.graphml import write_graphml
from net_spider_spark.snapshot import get_snapshot_simple
from net_spider_spark.timestamp import Timestamp

NODE_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("active", T.BooleanType()),
    ]
)
LINK_SCHEMA = T.StructType(
    [
        T.StructField("weight", T.DoubleType()),
        T.StructField("metric", T.LongType()),  # Maybe: may be None
    ]
)


def _snapshot(spark, findings):
    df = typed_findings_to_df(
        spark, findings, node_attrs=NODE_SCHEMA, link_attrs=LINK_SCHEMA
    )
    return get_snapshot_simple(df, ["n1"])


def test_typed_attrs_round_trip(spark):
    # attributeTestCase "Text"/"Int" (Attributes.hs:102-104): typed node
    # and link attrs survive the full snapshot unchanged; the observed
    # target node has NO attributes (Nothing), not empty attributes.
    node_attrs = {"rank": 128, "label": "node attrs", "active": True}
    link_attrs = {"weight": 1.5, "metric": 64}
    findings = [
        FoundNode(
            "n1", 1000, [FoundLink("n2", "to_subject", link_attrs)], node_attrs
        )
    ]
    nodes, links = _snapshot(spark, findings)
    got = {r["node_id"]: r.asDict(recursive=True) for r in nodes.collect()}
    assert got["n1"]["node_attrs"] == node_attrs
    assert got["n2"]["node_attrs"] is None
    lrow = links.collect()[0].asDict(recursive=True)
    assert lrow["link_attrs"] == link_attrs
    # native types, not strings
    assert isinstance(got["n1"]["node_attrs"]["rank"], int)
    assert isinstance(lrow["link_attrs"]["weight"], float)


def test_typed_attrs_maybe_none_field(spark):
    # A None struct field is Maybe Nothing: kept as SQL NULL in the
    # snapshot, omitted from GraphML data (like DIOLink's metric).
    findings = [
        FoundNode(
            "n1",
            1000,
            [FoundLink("n2", "to_target", {"weight": 2.0, "metric": None})],
            {"rank": 1, "label": None, "active": False},
        )
    ]
    nodes, links = _snapshot(spark, findings)
    n1 = next(r for r in nodes.collect() if r["node_id"] == "n1")
    assert n1["node_attrs"]["label"] is None
    xml = write_graphml(nodes, links)
    assert "metric" not in xml.split("<edge")[1]  # no datum for Nothing
    # like the reference, a key whose every value is Nothing is never
    # emitted, so it is not declared either (Writer.hs collects keys
    # from emitted attributes)
    assert 'attr.name="label"' not in xml
    assert 'attr.name="rank" attr.type="long"' in xml


def test_typed_attrs_graphml_types_from_schema(spark):
    findings = [
        FoundNode(
            "n1",
            1000,
            [FoundLink("n2", "to_target", {"weight": 0.5, "metric": 3})],
            {"rank": 7, "label": "x", "active": True},
        )
    ]
    nodes, links = _snapshot(spark, findings)
    xml = write_graphml(nodes, links)
    assert 'attr.name="rank" attr.type="long"' in xml
    assert 'attr.name="label" attr.type="string"' in xml
    assert 'attr.name="active" attr.type="boolean"' in xml
    assert 'attr.name="weight" attr.type="double"' in xml
    assert 'attr.name="metric" attr.type="long"' in xml
    assert ">true</data>" in xml  # boolean datum rendered true/false


def test_typed_attrs_tz_meta_props(spark):
    # timestampTestCase (Attributes.hs:112-127): timezone rides through
    # with the timestamp for positive and negative offsets.
    for off, summer, name in ((540, False, "Asia/Tokyo"), (-300, True, "America/Chicago")):
        findings = [
            FoundNode(
                "n1",
                Timestamp(200, off, summer, name),
                [FoundLink("n2", "to_target", {"weight": 1.0, "metric": 1})],
                {"rank": 1, "label": "t", "active": True},
            )
        ]
        nodes, _links = _snapshot(spark, findings)
        n1 = next(r for r in nodes.collect() if r["node_id"] == "n1")
        assert n1["node_ts"] == 200
        assert n1["tz_offset_min"] == off
        assert n1["tz_summer_only"] == summer
        assert n1["tz_name"] == name


def test_typed_schema_and_helpers(spark):
    schema = typed_findings_schema(NODE_SCHEMA, LINK_SCHEMA)
    assert schema["node_attrs"].dataType == NODE_SCHEMA
    nl = schema["neighbor_links"].dataType.elementType
    assert nl["link_attrs"].dataType == LINK_SCHEMA
    assert graphml_attr_type(T.IntegerType()) == "int"
    assert graphml_attr_type(T.LongType()) == "long"
    assert graphml_attr_type(T.FloatType()) == "float"
    assert graphml_attr_type(T.DoubleType()) == "double"
    assert graphml_attr_type(T.StringType()) == "string"
    df = typed_findings_to_df(spark, [], node_attrs=NODE_SCHEMA)
    assert struct_attr_types(df, "node_attrs") == {
        "rank": "long",
        "label": "string",
        "active": "boolean",
    }
    # map fallback reports None (inference path)
    from net_spider_spark.findings import findings_to_df

    mdf = findings_to_df(spark, [])
    assert struct_attr_types(mdf, "node_attrs") is None


def test_typed_attrs_unknown_key_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="not in schema"):
        typed_findings_to_df(
            spark,
            [FoundNode("n1", 1, [], {"bogus": 1})],
            node_attrs=NODE_SCHEMA,
        )


def test_to_node_id_typed_renderings(spark):
    # ToNodeID (GraphML/Writer.hs:66-124): integral -> decimal, Bool ->
    # lowercase true/false (its special instance), Float/Double ->
    # Haskell `show` (fixed inside [0.1, 1e7), else d.ddde±n).
    from pyspark.sql import functions as F

    from net_spider_spark.graphml import haskell_show_real, to_node_id

    df = spark.createDataFrame(
        [(100, True, 0.01, 2.5), (-7, False, 123456789.0, 0.1)],
        "i int, b boolean, d double, f float",
    )
    rows = df.select(
        to_node_id(df, "i").alias("i"),
        to_node_id(df, "b").alias("b"),
        to_node_id(df, "d").alias("d"),
        to_node_id(df, "f").alias("f"),
    ).orderBy(F.col("i").cast("int").desc()).collect()
    assert [tuple(r) for r in rows] == [
        ("100", "true", "1.0e-2", "2.5"),
        ("-7", "false", "1.23456789e8", "0.1"),
    ]

    # Haskell `show` pin-set (doctest-style, incl. the scientific
    # thresholds and signed zero)
    for v, want in [
        (0.01, "1.0e-2"), (100.0, "100.0"), (1e7, "1.0e7"),
        (9999999.0, "9999999.0"), (0.0015, "1.5e-3"), (1e-5, "1.0e-5"),
        (1.5e20, "1.5e20"), (0.099, "9.9e-2"), (-2.5, "-2.5"),
        (0.0, "0.0"), (-0.0, "-0.0"), (float("inf"), "Infinity"),
    ]:
        assert haskell_show_real(v) == want, v
    # Float semantics: shortest digits for the float32 value
    assert haskell_show_real(0.1, single=True) == "0.1"
    assert haskell_show_real(16777217.0, single=True) == "1.6777216e7"

    import pytest

    with pytest.raises(TypeError):
        arr = spark.createDataFrame([([1],)], "x array<int>")
        to_node_id(arr, "x")


def test_int_node_ids_render_like_reference_golden(spark):
    # WriterSpec.hs:149-208 uses Int node IDs rendered "100"/"200";
    # to_node_id + write_graphml reproduces that id rendering.
    from pyspark.sql import functions as F

    from net_spider_spark.graphml import to_node_id, write_graphml

    nodes = spark.createDataFrame(
        [(100, False, 200), (200, True, None)],
        "nid int, is_on_boundary boolean, node_ts long",
    )
    nodes = nodes.select(
        to_node_id(nodes, "nid").alias("node_id"),
        "is_on_boundary",
        "node_ts",
        F.lit(None).cast("map<string,string>").alias("node_attrs"),
    )
    links = spark.createDataFrame(
        [(100, 200, True, 100)],
        "s int, d int, is_directed boolean, link_ts long",
    )
    links = links.select(
        to_node_id(links, "s").alias("source_node"),
        to_node_id(links, "d").alias("dest_node"),
        "is_directed",
        "link_ts",
        F.lit(None).cast("map<string,string>").alias("link_attrs"),
    )
    xml = write_graphml(nodes, links)
    assert '<node id="100">' in xml and '<node id="200">' in xml
    assert '<edge source="100" target="200"' in xml


def test_to_node_id_null_floats_propagate_null(spark):
    # review fix: a NULL double node-ID must stay null, not become a
    # node literally named "NaN" (real NaN values still render "NaN")
    from pyspark.sql import functions as F

    from net_spider_spark.graphml import to_node_id

    df = spark.createDataFrame(
        [(1.5,), (None,), (float("nan"),)], "d double"
    )
    got = [r["x"] for r in df.select(to_node_id(df, "d").alias("x")).collect()]
    assert got == ["1.5", None, "NaN"]
