"""Weaver: an accumulate-then-snapshot builder API.

Parity target: ``net-spider/src/NetSpider/Weaver.hs`` — the reference's
pure in-memory engine ("does not scale well", README.md:316-321). Here
it is a thin convenience wrapper: findings accumulate locally and the
snapshot itself runs through the same distributed DataFrame pipeline as
everything else, so the API survives arbitrarily large inputs when fed
a DataFrame instead (see ``get_snapshot``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

from net_spider_spark.findings import FoundNode, findings_to_df
from net_spider_spark.snapshot import (
    BOUNDARY_MARK,
    BOUNDARY_VISIT,
    POLICY_APPEND,
    POLICY_OVERWRITE,
    Query,
    get_snapshot,
)
from net_spider_spark.unify import UnifyConfig, unify_to_one


class Weaver:
    """On-memory accumulator mirroring ``Weaver`` (Weaver.hs:57-134).

    ``policy='overwrite'`` keeps only the latest finding per node for
    the snapshot; ``'append'`` keeps all (newWeaver semantics). The
    policy is applied at query time by the engine — accumulation is
    append-only either way, exactly like the history graph.
    """

    def __init__(self, spark: SparkSession, policy: str = POLICY_OVERWRITE):
        if policy not in (POLICY_OVERWRITE, POLICY_APPEND):
            raise ValueError(f"unknown policy: {policy}")
        self._spark = spark
        self._policy = policy
        self._findings: list[FoundNode] = []
        self._marked: list[str] = []

    def add_found_node(self, fn: FoundNode) -> "Weaver":
        self._findings.append(fn)
        return self

    def mark_as_visited(self, node_id: str) -> "Weaver":
        """``markAsVisited`` (Weaver.hs:93-96)."""
        self._marked.append(str(node_id))
        return self

    def is_visited(self, node_id: str) -> bool:
        return node_id in self._marked or any(
            f.subject_node == node_id for f in self._findings
        )

    def get_found_nodes(self, node_id) -> Optional[list[FoundNode]]:
        """``getFoundNodes`` (Weaver.hs:104-110): ``None`` when the
        node is not visited, ``[]`` when visited only via
        :meth:`mark_as_visited`, else the findings kept under the
        policy — overwrite keeps the latest with a TIE going to the
        most recently added (``new >= old``, Weaver.hs:81-86), append
        keeps all (newest first, the reference's ``new ++ old``)."""
        from net_spider_spark.timestamp import to_epoch_ms

        nid = str(node_id)
        mine = [f for f in self._findings if str(f.subject_node) == nid]
        if not mine:
            return [] if nid in self._marked else None
        if self._policy == POLICY_APPEND:
            return list(reversed(mine))
        best = mine[0]
        for f in mine[1:]:
            if to_epoch_ms(f.found_at) >= to_epoch_ms(best.found_at):
                best = f
        return [best]

    def visit_all_boundary_nodes(self) -> "Weaver":
        """``visitAllBoundaryNodes`` (Weaver.hs:131-134)."""
        for n in self.get_boundary_nodes():
            self.mark_as_visited(n)
        return self

    def get_boundary_nodes(self) -> list[str]:
        """Targets never visited (Weaver.hs:120-129). Note the policy
        applies first: under 'overwrite' only the latest finding's
        targets count."""
        nodes, _ = self.get_snapshot(boundary_mode=BOUNDARY_MARK)
        return [
            r["node_id"] for r in nodes.filter("is_on_boundary").collect()
        ]

    def get_snapshot(
        self,
        unify: Optional[UnifyConfig] = None,
        boundary_mode: str = BOUNDARY_VISIT,
    ):
        """Build the snapshot graph from everything added so far
        (getSnapshot', Weaver.hs:156-168). Returns (nodes_df, links_df)."""
        df = findings_to_df(self._spark, self._findings)
        q = Query(
            starts_from=None,
            found_node_policy=self._policy,
            unify=unify or unify_to_one(),
            boundary_mode=boundary_mode,
            extra_visited=list(self._marked),
        )
        return get_snapshot(df, q)
