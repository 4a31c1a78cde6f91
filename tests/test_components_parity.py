"""Local union-find vs distributed label-propagation parity."""

import random

from net_spider_spark.graph.components import connected_components


def test_components_local_vs_distributed(spark):
    rng = random.Random(11)
    # random graph: 40 nodes, 50 edges -> several components
    edges = [
        (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}") for _ in range(50)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    local = sorted(
        (r["node_id"], r["component"]) for r in connected_components(df).collect()
    )
    dist = sorted(
        (r["node_id"], r["component"])
        for r in connected_components(df, local_threshold=0).collect()
    )
    assert local == dist
    assert len(local) > 0
