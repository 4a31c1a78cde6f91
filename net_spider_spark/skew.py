"""Skew-aware join helpers for hot keys.

At 100 TB a handful of hot join keys (one node observed by millions of
findings, one document domain with 10^8 pages) put an entire shuffle
partition on one task. AQE's skew-join split handles sort-merge joins
it can see; ``salted_join`` is the explicit version for the cases AQE
can't rewrite (aggregations-into-join pipelines, or builds where AQE is
off): replicate the small side ``salt`` ways and scatter the big side's
rows uniformly across the replicas, so a hot key spreads over ``salt``
tasks. Result rows are identical to the unsalted join (inner/left).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side's
    hot keys scattered across ``salt`` shuffle partitions.

    The big side gets a per-row salt from ``monotonically_increasing_id()
    % salt`` — uniform within every scan partition, defined for any
    schema (hash expressions reject MapType columns such as the findings
    tables' ``node_attrs``/``link_attrs``), and it scatters even
    fully-duplicate rows, which a row-content hash would pile into one
    bucket. The salt is not stable across runs, but join *results* are
    identical either way — only task placement varies. The small side is
    exploded ``salt``× so every (key, salt) bucket finds its match.
    Small-side replication costs salt× its size — keep for genuinely
    small-vs-big joins (the broadcast-too-big, one-key-hot middle
    ground).
    """
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    b = big.withColumn(
        "_salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"),
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")
