"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship snapshot query on sf0.001.
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (plus the LLM-data-pipeline extensions); each has a
DuckDB-equivalent in ``oracle_sql()`` for the t2 correctness gate.

Column names/types are aligned pairwise (the driver compares by sorted
column name + value hash).
"""

from __future__ import annotations

import os
import re
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from net_spider_spark import demo
from net_spider_spark.interval import Interval
from net_spider_spark.pipeline import cluster as CL
from net_spider_spark.pipeline import curate as CU
from net_spider_spark.pipeline import events as EV
from net_spider_spark.pipeline import dedup as D
from net_spider_spark.pipeline import similarity as S
from net_spider_spark.pipeline import sketch as SK
from net_spider_spark.pipeline import temporal as TP
from net_spider_spark.pipeline import text as TX
from net_spider_spark.snapshot import (
    BOUNDARY_MARK,
    Query,
    get_snapshot,
    latest_findings_per_node,
    snapshot_timeline,
)
from net_spider_spark.traverse import reachable_nodes

# ---------------------------------------------------------------------------
# Shared DuckDB SQL fragments (mirror net_spider_spark/demo.py and the
# engine's snapshot semantics — keep in sync with snapshot.py).
# ---------------------------------------------------------------------------

SQL_F = f"f AS ({demo.FINDINGS_SQL_DUCKDB})"

SQL_KEPT_OVERWRITE = """kept AS (
  SELECT finding_id, subject_node, found_at, target_node, link_state FROM (
    SELECT f.*, row_number() OVER (
      PARTITION BY subject_node ORDER BY found_at DESC, finding_id DESC) AS rn
    FROM f) t WHERE rn = 1
)"""

SQL_KEPT_APPEND = """kept AS (
  SELECT finding_id, subject_node, found_at, target_node, link_state FROM f
)"""


def _links_sql(kept_cte: str) -> str:
    """Full default-unifier link pipeline: pair grouping, latest-wins
    merge, negation, direction resolution (Unify.hs/Weaver.hs semantics)."""
    return f"""
WITH {SQL_F},
{kept_cte},
node_ts AS (
  SELECT subject_node AS node_id, max(found_at) AS node_ts FROM kept GROUP BY 1
),
samples AS (
  SELECT kept.*,
         least(subject_node, target_node) AS p1,
         greatest(subject_node, target_node) AS p2
  FROM kept
),
winners AS (
  SELECT * FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY p1, p2 ORDER BY found_at DESC, finding_id DESC) AS rn2
    FROM samples s) t WHERE rn2 = 1
),
surviving AS (
  SELECT w.* FROM winners w
  LEFT JOIN node_ts t1 ON t1.node_id = w.p1
  LEFT JOIN node_ts t2 ON t2.node_id = w.p2
  WHERE NOT (t1.node_ts IS NOT NULL AND w.found_at < t1.node_ts
             AND w.subject_node <> w.p1)
    AND NOT (t2.node_ts IS NOT NULL AND w.found_at < t2.node_ts
             AND w.subject_node <> w.p2)
)
SELECT
  CASE WHEN link_state = 'to_subject' THEN target_node ELSE subject_node END
    AS source_node,
  CASE WHEN link_state = 'to_subject' THEN subject_node ELSE target_node END
    AS dest_node,
  link_state <> 'bidirectional' AS is_directed,
  found_at AS link_ts
FROM surviving
WHERE link_state <> 'unused'
"""


# Tokenization twin of pipeline.text.tokens_col / dedup.shingles_col.
SQL_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
)
SQL_TOKS_RAW = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"
SQL_SHINGLES = (
    "list_transform(range(1, greatest(len(toks) - 1, 1)),"
    " i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"
)
# Shared by graph_components (guarded path) and graph_components_dist
# (local_threshold=0, distributed label propagation): one answer contract.
SQL_COMPONENTS = f"""
WITH RECURSIVE {SQL_F},
{SQL_KEPT_OVERWRITE},
und AS (
  SELECT subject_node AS src, target_node AS dst FROM kept
  UNION
  SELECT target_node AS src, subject_node AS dst FROM kept
),
reach(a, b) AS (
  SELECT src AS a, src AS b FROM und
  UNION
  SELECT r.a, u.dst FROM reach r JOIN und u ON u.src = r.b
)
SELECT a AS node_id, min(b) AS component FROM reach GROUP BY a
"""

SQL_HEX16 = (
    "((position(substr(m, 1, 1) IN '0123456789abcdef') - 1) * 4096"
    " + (position(substr(m, 2, 1) IN '0123456789abcdef') - 1) * 256"
    " + (position(substr(m, 3, 1) IN '0123456789abcdef') - 1) * 16"
    " + (position(substr(m, 4, 1) IN '0123456789abcdef') - 1))"
)

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in TX.STOPWORDS) + "]"


def _lsh_sig_sql(n_bands: int = 4, n_planes: int = 4, dim: int = 64,
                 seed: int = 42, vec: str = "v") -> list[str]:
    """DuckDB twins of pipeline.similarity.lsh_signature, one expression
    per band, over the SAME deterministic seed-42 hyperplanes the Spark
    path draws — so candidate buckets match bit-for-bit (testdata
    embeddings are dim=64)."""
    planes = S.hyperplanes(dim, n_bands * n_planes, seed)
    exprs = []
    for b in range(n_bands):
        bits = [
            f"(CASE WHEN list_dot_product({vec}, "
            f"[{', '.join(repr(w) for w in planes[b * n_planes + j])}]"
            f") >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(n_planes)
        ]
        exprs.append("(" + " + ".join(bits) + ")")
    return exprs


def _kmeans_ctes(k: int = 8, iters: int = 2, dim: int = 64,
                 seed: str = "s42", prefix: str = "",
                 vec_sql: str = "CAST(embedding AS DOUBLE[])",
                 from_sql: str = "embeddings",
                 train_limit: int | None = None,
                 ) -> tuple[list[str], str, str]:
    """DuckDB twin of pipeline.cluster.kmeans_fit: the unrolled Lloyd's
    iteration as a list of CTE definitions (prefixed so several chains
    — e.g. one per PQ subspace — compose in one query). Returns
    (cte_parts, assign_cte, centroid_cte): assign_cte holds
    (vec_id, cid, v) after ``iters`` centroid updates, centroid_cte the
    matching (cid, cv) codebook.

    Mirrors the Spark path step for step: bottom-k-by-md5 init, squared
    L2 argmin with (dist, cid) tie-break, element-wise mean update with
    empty clusters keeping their previous centroid. ``train_limit``
    replays the bounded-sample training (kmeans_fit/pq_train train_n):
    seeds and every Lloyd's update read the bottom-train_limit rows by
    ``md5(seed:sample:id)``; only the FINAL frozen-centroid assignment
    covers the full table."""
    P = prefix
    parts = [
        f"{P}emb AS (SELECT vec_id, {vec_sql} AS v FROM {from_sql})",
    ]
    train = f"{P}emb"
    if train_limit is not None:
        parts.append(
            f"{P}tr AS (SELECT * FROM {P}emb ORDER BY"
            f" md5('{seed}:sample:' || CAST(vec_id AS VARCHAR)),"
            f" vec_id LIMIT {train_limit})"
        )
        train = f"{P}tr"
    parts += [
        f"{P}seeds AS (SELECT v, row_number() OVER (ORDER BY"
        f" md5('{seed}:' || CAST(vec_id AS VARCHAR)), vec_id) AS rn"
        f" FROM {train})",
        f"{P}c0 AS (SELECT rn - 1 AS cid, v AS cv FROM {P}seeds"
        f" WHERE rn <= {k})",
        f"{P}pos AS (SELECT unnest(generate_series(1, {dim})) AS p)",
    ]
    for i in range(iters + 1):
        # Lloyd's updates see the training sample; the final (i ==
        # iters) assignment — the one downstream CTEs consume — always
        # covers the full table, mirroring the Spark path.
        src = train if i < iters else f"{P}emb"
        parts.append(
            f"{P}el{i} AS (SELECT e.vec_id, c.cid, unnest(e.v) AS ev,"
            f" unnest(c.cv) AS cv FROM {src} e CROSS JOIN {P}c{i} c)"
        )
        parts.append(
            f"{P}d{i} AS (SELECT vec_id, cid,"
            " sum((ev - cv) * (ev - cv)) AS dist"
            f" FROM {P}el{i} GROUP BY 1, 2)"
        )
        parts.append(
            f"{P}a{i} AS (SELECT vec_id, cid, v FROM ("
            "SELECT d.vec_id, d.cid, e.v, row_number() OVER ("
            "PARTITION BY d.vec_id ORDER BY d.dist, d.cid) AS rn"
            f" FROM {P}d{i} d JOIN {P}emb e USING (vec_id)) t WHERE rn = 1)"
        )
        if i < iters:
            parts.append(
                f"{P}m{i} AS (SELECT a.cid, p.p, avg(a.v[p.p]) AS m"
                f" FROM {P}a{i} a CROSS JOIN {P}pos p GROUP BY 1, 2)"
            )
            parts.append(
                f"{P}u{i} AS (SELECT cid, list(m ORDER BY p) AS cv"
                f" FROM {P}m{i} GROUP BY 1)"
            )
            parts.append(
                f"{P}c{i + 1} AS (SELECT c.cid, COALESCE(u.cv, c.cv) AS cv"
                f" FROM {P}c{i} c LEFT JOIN {P}u{i} u USING (cid))"
            )
    return parts, f"{P}a{iters}", f"{P}c{iters}"


def _kmeans_cte_sql(k: int = 8, iters: int = 2, dim: int = 64,
                    seed: str = "s42",
                    train_limit: int | None = None) -> tuple[str, str]:
    parts, assign, _ = _kmeans_ctes(
        k=k, iters=iters, dim=dim, seed=seed, train_limit=train_limit
    )
    return "WITH " + ",\n".join(parts), assign


def _pq_chain_parts(m: int, k: int, iters: int, dim: int, seed: str,
                    prefix: str = "s_",
                    vec_sql: str = "CAST(embedding AS DOUBLE[])",
                    from_sql: str = "embeddings",
                    train_limit: int | None = None,
                    emit_codes: bool = True,
                    ) -> tuple[list[str], str, str]:
    """Fused DuckDB twin of pq_train (+ pq_encode when ``emit_codes``):
    ONE Lloyd's chain with the subspace index ``s`` as a grouping key —
    exactly the Spark shape, where ``sub`` is just another groupBy
    column. The previous builder unrolled m SEPARATE per-subspace
    chains; at m=32 that was ~10 CTEs x 32 subspaces and the
    materialized-CTE count itself became the oracle wall
    (sim_ivfpq_residual: 172.6 s of the 149-query sf0.01 sweep).
    Value-identical: same bottom-k-by-md5 seeds (slices of the same k
    rows), same (dist, cid) argmin tie-break, same per-(s, cid, pos)
    mean update with empty cells keeping their centroid.

    Returns (parts, codes_cte, books_cte): codes_cte holds
    (vec_id, s, cid) — the frozen-book argmin of EVERY from_sql row —
    and books_cte (s, cid, cv). ``train_limit`` replays pq_train's
    bounded md5 sample; Lloyd's updates see only the sample, the codes
    always cover the full table."""
    sd = dim // m
    P = prefix
    parts = [f"{P}emb AS (SELECT vec_id, {vec_sql} AS v FROM {from_sql})"]
    train = f"{P}emb"
    if train_limit is not None:
        parts.append(
            f"{P}tr AS (SELECT * FROM {P}emb ORDER BY"
            f" md5('{seed}:sample:' || CAST(vec_id AS VARCHAR)),"
            f" vec_id LIMIT {train_limit})"
        )
        train = f"{P}tr"
    parts.append(
        f"{P}sub AS (SELECT unnest(generate_series(0, {m - 1})) AS s)"
    )
    parts.append(
        f"{P}semb AS (SELECT vec_id, s,"
        f" array_slice(v, s * {sd} + 1, s * {sd} + {sd}) AS sv"
        f" FROM {P}emb CROSS JOIN {P}sub)"
    )
    strain = f"{P}semb"
    if train_limit is not None:
        parts.append(
            f"{P}strain AS (SELECT vec_id, s,"
            f" array_slice(v, s * {sd} + 1, s * {sd} + {sd}) AS sv"
            f" FROM {train} CROSS JOIN {P}sub)"
        )
        strain = f"{P}strain"
    parts += [
        f"{P}seedids AS (SELECT vec_id, row_number() OVER (ORDER BY"
        f" md5('{seed}:' || CAST(vec_id AS VARCHAR)), vec_id) AS rn"
        f" FROM {train})",
        f"{P}c0 AS (SELECT t.s, i.rn - 1 AS cid, t.sv AS cv"
        f" FROM {strain} t JOIN {P}seedids i USING (vec_id)"
        f" WHERE i.rn <= {k})",
        f"{P}pos AS (SELECT unnest(generate_series(1, {sd})) AS p)",
    ]
    last = iters if emit_codes else iters - 1
    for i in range(last + 1):
        src = strain if i < iters else f"{P}semb"
        parts.append(
            f"{P}el{i} AS (SELECT e.vec_id, e.s, c.cid, unnest(e.sv) AS"
            f" ev, unnest(c.cv) AS cv FROM {src} e"
            f" JOIN {P}c{i} c ON c.s = e.s)"
        )
        parts.append(
            f"{P}d{i} AS (SELECT vec_id, s, cid,"
            " sum((ev - cv) * (ev - cv)) AS dist"
            f" FROM {P}el{i} GROUP BY 1, 2, 3)"
        )
        if i < iters:
            # training argmin carries sv along for the mean update
            parts.append(
                f"{P}a{i} AS (SELECT vec_id, s, cid, sv FROM ("
                "SELECT d.vec_id, d.s, d.cid, e.sv, row_number() OVER ("
                "PARTITION BY d.vec_id, d.s ORDER BY d.dist, d.cid) AS rn"
                f" FROM {P}d{i} d JOIN {src} e USING (vec_id, s)) t"
                " WHERE rn = 1)"
            )
            parts.append(
                f"{P}m{i} AS (SELECT a.s, a.cid, p.p, avg(a.sv[p.p]) AS m"
                f" FROM {P}a{i} a CROSS JOIN {P}pos p GROUP BY 1, 2, 3)"
            )
            parts.append(
                f"{P}u{i} AS (SELECT s, cid, list(m ORDER BY p) AS cv"
                f" FROM {P}m{i} GROUP BY 1, 2)"
            )
            parts.append(
                f"{P}c{i + 1} AS (SELECT c.s, c.cid,"
                " COALESCE(u.cv, c.cv) AS cv"
                f" FROM {P}c{i} c LEFT JOIN {P}u{i} u USING (s, cid))"
            )
        else:
            parts.append(
                f"{P}a{i} AS (SELECT vec_id, s, cid FROM ("
                "SELECT vec_id, s, cid, row_number() OVER ("
                "PARTITION BY vec_id, s ORDER BY dist, cid) AS rn"
                f" FROM {P}d{i}) t WHERE rn = 1)"
            )
    return parts, f"{P}a{iters}", f"{P}c{iters}"


def _pq_score_parts(m: int, k: int, iters: int, dim: int,
                    seed: str, train_limit: int | None = None) -> list[str]:
    """The shared PQ scoring CTEs: the fused codebook/codes chain
    (:func:`_pq_chain_parts`), the queries' ADC lookup table, and
    ``pq_scored`` = summed lookup distances per (query, neighbor).
    Used by both the flat-ADC and the IVF-PQ oracle builders, so the
    code/LUT algebra is one definition."""
    parts, codes, books = _pq_chain_parts(
        m, k, iters, dim, seed, prefix="s_", train_limit=train_limit,
    )
    parts = list(parts)
    parts.append(
        "s_lel AS (SELECT q.vec_id AS query_id, q.s, c.cid AS code,"
        " unnest(q.sv) AS x, unnest(c.cv) AS y"
        f" FROM s_semb q JOIN {books} c ON c.s = q.s WHERE q.vec_id < 5)"
    )
    parts.append(
        "s_lut AS (SELECT query_id, s, code,"
        " sum((x - y) * (x - y)) AS d FROM s_lel GROUP BY 1, 2, 3)"
    )
    parts.append(
        "pq_scored AS (SELECT l.query_id, a.vec_id AS neighbor_id,"
        f" sum(l.d) AS adist FROM {codes} a"
        " JOIN s_lut l ON l.s = a.s AND l.code = a.cid GROUP BY 1, 2)"
    )
    return parts


_PQ_TOPK_TAIL = """
SELECT query_id, neighbor_id, adist, rank FROM (
  SELECT query_id, neighbor_id, adist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adist, neighbor_id) AS rank
  FROM {src}) t
WHERE rank <= {n}
"""


def _with_materialized(parts: list[str], tail: str) -> str:
    """Assemble ``WITH <parts> <tail>`` with every CTE head marked
    MATERIALIZED: DuckDB inlines CTEs referenced more than once, so
    the chained Lloyd's-iteration CTEs re-execute multiplicatively
    with depth — the residual oracle ran >570 s inlined vs 23 s
    materialized at sf0.01. Materialization is semantically
    transparent; every reference reads the same rows. Each ``parts``
    entry is exactly one CTE definition, so the rewrite is anchored on
    the head itself — the leading ``name AS (`` token — never a
    string literal or alias later in the body that happens to contain
    ``' AS ('``."""
    head = re.compile(r"^(\s*[A-Za-z_][A-Za-z0-9_]*\s+AS)\s+\(")
    marked = []
    for p in parts:
        rewritten, n = head.subn(r"\1 MATERIALIZED (", p, count=1)
        if not n:
            raise ValueError(
                f"CTE part does not start with a 'name AS (' head: {p[:80]!r}"
            )
        marked.append(rewritten)
    return "WITH " + ",\n".join(marked) + tail


def _pq_topk_sql(m: int = 32, k: int = 256, iters: int = 1, dim: int = 64,
                 n_neighbors: int = 3, seed: str = "s42",
                 train_limit: int | None = None) -> str:
    """DuckDB twin of pipeline.pq.pq_topk: flat ADC over every code."""
    parts = _pq_score_parts(m, k, iters, dim, seed, train_limit)
    return _with_materialized(
        parts, _PQ_TOPK_TAIL.format(src="pq_scored", n=n_neighbors)
    )


def _ivf_topk_sql(n_cells: int = 8, iters: int = 2, dim: int = 64,
                  n_probe: int = 6, n_neighbors: int = 3,
                  seed: str = "s42",
                  train_limit: int | None = 100_000) -> str:
    """DuckDB twin of pipeline.similarity.ivf_topk since its coarse
    quantizer became the deterministic md5-seeded Lloyd's: the chain
    replays cell training and assignment over the corpus half
    (vec_id >= 5), each query keeps its n_probe nearest final
    centroids ((dist, cell) tie-break — the same Spark window), and
    cosine top-k is computed WITHIN probed cells only, so the oracle
    attests the inverted-file pruning itself (the previous MLlib
    coarse step was engine-private, which forced n_probe=n_centroids
    exhaustive probing and left the pruning untested)."""
    parts, cassign, ccents = _kmeans_ctes(
        k=n_cells, iters=iters, dim=dim, seed=seed, prefix="iv_",
        from_sql="(SELECT vec_id, embedding FROM embeddings"
                 " WHERE vec_id >= 5)",
        train_limit=train_limit,
    )
    parts = list(parts)
    parts += [
        "iv_q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings WHERE vec_id < 5)",
        "iv_qel AS (SELECT q.vec_id AS query_id, c.cid AS cell,"
        " unnest(q.v) AS x, unnest(c.cv) AS y"
        f" FROM iv_q q CROSS JOIN {ccents} c)",
        "iv_qd AS (SELECT query_id, cell,"
        " sum((x - y) * (x - y)) AS dist FROM iv_qel GROUP BY 1, 2)",
        "iv_probes AS (SELECT query_id, cell FROM ("
        "SELECT query_id, cell, row_number() OVER (PARTITION BY"
        " query_id ORDER BY dist, cell) AS pr FROM iv_qd) t"
        f" WHERE pr <= {n_probe})",
        f"iv_cellof AS (SELECT vec_id AS neighbor_id, cid AS cell"
        f" FROM {cassign})",
        "iv_el AS (SELECT q.vec_id AS query_id, cf.neighbor_id,"
        " unnest(q.v) AS qe, unnest(e.v) AS ce"
        " FROM iv_q q JOIN iv_probes p ON p.query_id = q.vec_id"
        " JOIN iv_cellof cf ON cf.cell = p.cell"
        " JOIN iv_emb e ON e.vec_id = cf.neighbor_id)",
        "iv_scored AS (SELECT query_id, neighbor_id,"
        " sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce)))"
        " AS cos FROM iv_el GROUP BY 1, 2)",
    ]
    tail = (
        " SELECT query_id, neighbor_id, rank FROM ("
        "SELECT query_id, neighbor_id, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)"
        f" AS rank FROM iv_scored) t WHERE rank <= {n_neighbors}"
    )
    return _with_materialized(parts, tail)


def _ivfpq_topk_sql(m: int = 32, k: int = 256, iters: int = 1,
                    dim: int = 64, n_neighbors: int = 3,
                    n_cells: int = 8, coarse_iters: int = 2,
                    n_probe: int = 6, seed: str = "s42",
                    residual: bool = False,
                    train_limit: int | None = None) -> str:
    """DuckDB twin of pipeline.pq.ivfpq_topk: the coarse Lloyd's chain
    assigns every corpus vector a cell, each query keeps its n_probe
    nearest final centroids ((dist, cell) tie-break, exactly the Spark
    window), and the ADC scores are filtered to probed cells —
    value-identical to Spark's compute-only-probed plan because the
    per-pair ADC sum doesn't depend on which other pairs are scored.

    ``residual=True`` replays Jégou IVF-ADC: subspace chains train on
    r = x - centroid(cell(x)) (the res_emb CTE feeds the same Lloyd's
    builder via from_sql), and the lookup tables are per (query,
    probed cell) against the query's residual to that cell."""
    parts, cassign, ccents = _kmeans_ctes(
        k=n_cells, iters=coarse_iters, dim=dim, seed=seed, prefix="cq_",
        train_limit=train_limit,
    )
    parts = list(parts)
    parts.append(
        "cq_qel AS (SELECT e.vec_id AS query_id, c.cid AS cell,"
        " unnest(e.v) AS x, unnest(c.cv) AS y"
        f" FROM cq_emb e CROSS JOIN {ccents} c WHERE e.vec_id < 5)"
    )
    parts.append(
        "cq_qd AS (SELECT query_id, cell, sum((x - y) * (x - y)) AS dist"
        " FROM cq_qel GROUP BY 1, 2)"
    )
    parts.append(
        "probes AS (SELECT query_id, cell FROM ("
        "SELECT query_id, cell, row_number() OVER (PARTITION BY query_id"
        " ORDER BY dist, cell) AS pr FROM cq_qd) t"
        f" WHERE pr <= {n_probe})"
    )
    parts.append(
        f"cellof AS (SELECT vec_id AS neighbor_id, cid AS cell"
        f" FROM {cassign})"
    )
    if not residual:
        parts.extend(_pq_score_parts(m, k, iters, dim, seed, train_limit))
        parts.append(
            "ivf_scored AS (SELECT s.query_id, s.neighbor_id, s.adist"
            " FROM pq_scored s JOIN cellof c USING (neighbor_id)"
            " JOIN probes p ON p.query_id = s.query_id"
            " AND p.cell = c.cell)"
        )
        return _with_materialized(
            parts, _PQ_TOPK_TAIL.format(src="ivf_scored", n=n_neighbors)
        )

    sub_dim = dim // m
    parts.append(
        "res_emb AS (SELECT a.vec_id,"
        f" list_transform(generate_series(1, {dim}),"
        " i -> a.v[i] - c.cv[i]) AS v"
        f" FROM {cassign} a JOIN {ccents} c USING (cid))"
    )
    parts.append(
        "qres AS (SELECT p.query_id, p.cell,"
        f" list_transform(generate_series(1, {dim}),"
        " i -> e.v[i] - c.cv[i]) AS v"
        " FROM probes p JOIN cq_emb e ON e.vec_id = p.query_id"
        f" JOIN {ccents} c ON c.cid = p.cell)"
    )
    chain_parts, codes, books = _pq_chain_parts(
        m, k, iters, dim, seed, prefix="r_", vec_sql="v",
        from_sql="res_emb", train_limit=train_limit,
    )
    parts.extend(chain_parts)
    parts.append(
        "r_lel AS (SELECT q.query_id, q.cell, c.s, c.cid AS code,"
        f" unnest(array_slice(q.v, c.s * {sub_dim} + 1,"
        f" c.s * {sub_dim} + {sub_dim})) AS x, unnest(c.cv) AS y"
        f" FROM qres q CROSS JOIN {books} c)"
    )
    parts.append(
        "r_lut AS (SELECT query_id, cell, s, code,"
        " sum((x - y) * (x - y)) AS d FROM r_lel GROUP BY 1, 2, 3, 4)"
    )
    parts.append(
        "rpq_scored AS (SELECT l.query_id, a.vec_id AS neighbor_id,"
        f" sum(l.d) AS adist FROM {codes} a"
        " JOIN cellof cf ON cf.neighbor_id = a.vec_id"
        " JOIN r_lut l ON l.s = a.s AND l.code = a.cid"
        " AND l.cell = cf.cell GROUP BY 1, 2)"
    )
    return _with_materialized(
        parts, _PQ_TOPK_TAIL.format(src="rpq_scored", n=n_neighbors)
    )


def _ivfpq_add_sql(m: int = 32, k: int = 256, iters: int = 1,
                   dim: int = 64, n_neighbors: int = 3,
                   n_cells: int = 8, coarse_iters: int = 2,
                   n_probe: int = 6, seed: str = "s42",
                   train_pred: str = "vec_id % 2 = 0",
                   train_limit: int | None = None) -> str:
    """DuckDB twin of ivfpq_build(train half) + ivfpq_add(rest) +
    ivfpq_search: the coarse and subspace Lloyd's chains train ONLY on
    ``train_pred`` rows (via from_sql; ``train_limit`` additionally
    replays the bounded md5 sample within that half), then the FULL
    corpus is assigned and encoded against those frozen final
    centroids / codebooks — exactly the union the Spark incremental
    add produces, since both halves end up argmin'd against the same
    parameters."""
    train_sql = f"(SELECT * FROM embeddings WHERE {train_pred})"
    parts, _, ccents = _kmeans_ctes(
        k=n_cells, iters=coarse_iters, dim=dim, seed=seed, prefix="cq_",
        from_sql=train_sql, train_limit=train_limit,
    )
    parts = list(parts)
    parts.append(
        "full_emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)"
    )
    # every corpus vector (both halves) against the FINAL trained
    # centroids — the frozen-parameter assignment of ivfpq_add
    parts.append(
        "fa_el AS (SELECT e.vec_id, c.cid, unnest(e.v) AS x,"
        f" unnest(c.cv) AS y FROM full_emb e CROSS JOIN {ccents} c)"
    )
    parts.append(
        "fa_d AS (SELECT vec_id, cid, sum((x - y) * (x - y)) AS dist"
        " FROM fa_el GROUP BY 1, 2)"
    )
    parts.append(
        "cellof AS (SELECT vec_id AS neighbor_id, cid AS cell FROM ("
        "SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id"
        " ORDER BY dist, cid) AS rn FROM fa_d) t WHERE rn = 1)"
    )
    parts.append(
        "cq_qel AS (SELECT e.vec_id AS query_id, c.cid AS cell,"
        " unnest(e.v) AS x, unnest(c.cv) AS y"
        f" FROM full_emb e CROSS JOIN {ccents} c WHERE e.vec_id < 5)"
    )
    parts.append(
        "cq_qd AS (SELECT query_id, cell, sum((x - y) * (x - y)) AS dist"
        " FROM cq_qel GROUP BY 1, 2)"
    )
    parts.append(
        "probes AS (SELECT query_id, cell FROM ("
        "SELECT query_id, cell, row_number() OVER (PARTITION BY query_id"
        " ORDER BY dist, cell) AS pr FROM cq_qd) t"
        f" WHERE pr <= {n_probe})"
    )
    sub_dim = dim // m
    # fused codebook chain on the train half (emit_codes=False: the
    # frozen encode below covers the FULL corpus, so the chain's own
    # train-half codes would be dead weight)
    chain_parts, _, books = _pq_chain_parts(
        m, k, iters, dim, seed, prefix="s_", from_sql=train_sql,
        train_limit=train_limit, emit_codes=False,
    )
    parts.extend(chain_parts)
    parts.append(
        "full_semb AS (SELECT vec_id, s,"
        f" array_slice(v, s * {sub_dim} + 1, s * {sub_dim} + {sub_dim})"
        " AS sv FROM full_emb CROSS JOIN s_sub)"
    )
    # frozen-codebook codes for the FULL corpus (both halves)
    parts.append(
        "f_el AS (SELECT e.vec_id, e.s, c.cid, unnest(e.sv) AS x,"
        f" unnest(c.cv) AS y FROM full_semb e"
        f" JOIN {books} c ON c.s = e.s)"
    )
    parts.append(
        "f_d AS (SELECT vec_id, s, cid, sum((x - y) * (x - y)) AS dist"
        " FROM f_el GROUP BY 1, 2, 3)"
    )
    parts.append(
        "f_a AS (SELECT vec_id, s, cid FROM ("
        "SELECT vec_id, s, cid, row_number() OVER (PARTITION BY vec_id,"
        " s ORDER BY dist, cid) AS rn FROM f_d) t WHERE rn = 1)"
    )
    parts.append(
        "s_qlel AS (SELECT e.vec_id AS query_id, e.s, c.cid AS code,"
        " unnest(e.sv) AS x, unnest(c.cv) AS y"
        f" FROM full_semb e JOIN {books} c ON c.s = e.s"
        " WHERE e.vec_id < 5)"
    )
    parts.append(
        "s_qlut AS (SELECT query_id, s, code,"
        " sum((x - y) * (x - y)) AS d FROM s_qlel GROUP BY 1, 2, 3)"
    )
    parts.append(
        "add_scored AS (SELECT l.query_id, a.vec_id AS neighbor_id,"
        " sum(l.d) AS adist FROM f_a a"
        " JOIN s_qlut l ON l.s = a.s AND l.code = a.cid"
        " JOIN cellof c ON c.neighbor_id = a.vec_id"
        " JOIN probes p ON p.query_id = l.query_id AND p.cell = c.cell"
        " GROUP BY 1, 2)"
    )
    return _with_materialized(
        parts, _PQ_TOPK_TAIL.format(src="add_scored", n=n_neighbors)
    )


# 10 planes/band: random-pair collision 0.5^10 per band (~0.4% of all
# pairs across 4 bands) vs 6% at 6 planes — candidate volume, not
# recall, is the scale limit (near-dups at cos>0.9 still hit ~60%+
# any-band agreement; raise further as the corpus grows).
_EMB_SIG_SQL = _lsh_sig_sql(n_planes=10)


def _marker_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in TX.LANG_MARKERS[lang]) + "]"


# ---------------------------------------------------------------------------
# Spark-side query callables
# ---------------------------------------------------------------------------

def _snapshot_links(spark: SparkSession, sf_dir: str, policy: str) -> DataFrame:
    findings = demo.events_findings(spark, sf_dir)
    _, links = get_snapshot(findings, Query(found_node_policy=policy))
    return links.select("source_node", "dest_node", "is_directed", "link_ts")


def q_snapshot_links_overwrite(spark, sf_dir):
    return _snapshot_links(spark, sf_dir, "overwrite")


def q_snapshot_links_append(spark, sf_dir):
    return _snapshot_links(spark, sf_dir, "append")


def q_snapshot_nodes_overwrite(spark, sf_dir):
    findings = demo.events_findings(spark, sf_dir)
    nodes, _ = get_snapshot(findings, Query(boundary_mode=BOUNDARY_MARK))
    return nodes.select("node_id", "is_on_boundary", "node_ts")


def q_a1_latest_finding_per_node(spark, sf_dir):
    findings = demo.events_findings(spark, sf_dir)
    return latest_findings_per_node(findings).select(
        "subject_node", "found_at", "finding_id"
    )


def q_f1_interval_filter(spark, sf_dir):
    # Interval upper bound = midpoint of the data's time range (computed,
    # so the query is meaningful at every scale factor); inclusive upper,
    # open lower — then compiled through Interval.predicate.
    ls = demo.events_link_samples(spark, sf_dir)
    lo, hi = ls.agg(F.min("found_at"), F.max("found_at")).collect()[0]
    mid = lo + (hi - lo) // 2
    iv = Interval.until(mid, inclusive=True)
    return ls.filter(iv.predicate(F.col("found_at"))).select(
        "finding_id", "subject_node", "target_node", "link_state", "found_at"
    )


def q_f2_node_lookup(spark, sf_dir):
    # F2 gHasNodeID: point lookup of one node's history (equality
    # predicate pushed to the scan; pairs with subject-clustered layout).
    ls = demo.events_link_samples(spark, sf_dir)
    return ls.where(F.col("subject_node") == "7").select(
        "finding_id", "subject_node", "target_node", "link_state", "found_at"
    )


def q_j5_reachability(spark, sf_dir):
    findings = demo.events_findings(spark, sf_dir)
    kept = latest_findings_per_node(
        findings.filter(Interval.always().predicate())
    )
    from net_spider_spark.findings import explode_link_samples

    samples = explode_link_samples(kept)
    edges = samples.select(
        F.col("subject_node").alias("src"), F.col("target_node").alias("dst")
    )
    starts = spark.createDataFrame([("1",), ("2",)], "node_id string")
    return reachable_nodes(edges, starts)


def q_j6_boundary_nodes(spark, sf_dir):
    findings = demo.events_findings(spark, sf_dir)
    nodes, _ = get_snapshot(findings, Query(boundary_mode=BOUNDARY_MARK))
    return nodes.where("is_on_boundary").select("node_id")


def q_a4_pair_group_stats(spark, sf_dir):
    ls = demo.events_link_samples(spark, sf_dir)
    return (
        ls.select(
            F.least("subject_node", "target_node").alias("p1"),
            F.greatest("subject_node", "target_node").alias("p2"),
            "found_at",
        )
        .groupBy("p1", "p2")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.max("found_at").alias("max_ts"),
        )
    )


def q_a7_graph_timestamp(spark, sf_dir):
    ls = demo.events_link_samples(spark, sf_dir)
    return ls.agg(F.max("found_at").alias("graph_ts"))


def q_a10_degree(spark, sf_dir):
    links = _snapshot_links(spark, sf_dir, "overwrite")
    return links.groupBy(F.col("source_node").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )


def q_j9_combine_nodes(spark, sf_dir):
    ls = demo.events_link_samples(spark, sf_dir)
    dio = (
        ls.where(F.col("finding_id") % 2 == 0)
        .groupBy("subject_node")
        .agg(F.max("found_at").alias("dio_ts"))
    )
    dao = (
        ls.where(F.col("finding_id") % 2 == 1)
        .groupBy("subject_node")
        .agg(F.max("found_at").alias("dao_ts"))
    )
    return (
        dio.withColumnRenamed("subject_node", "node_id")
        .join(dao.withColumnRenamed("subject_node", "node_id"), "node_id", "full_outer")
        .select(
            "node_id",
            "dio_ts",
            "dao_ts",
            F.greatest(
                F.coalesce("dio_ts", F.lit(0)), F.coalesce("dao_ts", F.lit(0))
            ).alias("combined_ts"),
        )
    )


def q_c8_direction_resolution(spark, sf_dir):
    ls = demo.events_link_samples(spark, sf_dir)
    return ls.where(F.col("link_state") != "unused").select(
        F.when(F.col("link_state") == "to_subject", F.col("target_node"))
        .otherwise(F.col("subject_node"))
        .alias("source_node"),
        F.when(F.col("link_state") == "to_subject", F.col("subject_node"))
        .otherwise(F.col("target_node"))
        .alias("dest_node"),
        (F.col("link_state") != "bidirectional").alias("is_directed"),
        F.col("found_at").alias("link_ts"),
    )


# --- TPC-H-style relational breadth ----------------------------------------

def q_tpch_q1(spark, sf_dir):
    li = demo.read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_tpch_q3_topk(spark, sf_dir):
    cu = demo.read_table(spark, sf_dir, "customer")
    od = demo.read_table(spark, sf_dir, "orders")
    li = demo.read_table(spark, sf_dir, "lineitem")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_tpch_region_revenue(spark, sf_dir):
    re = demo.read_table(spark, sf_dir, "region")
    na = demo.read_table(spark, sf_dir, "nation")
    cu = demo.read_table(spark, sf_dir, "customer")
    od = demo.read_table(spark, sf_dir, "orders")
    li = demo.read_table(spark, sf_dir, "lineitem")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q9_nation_profit(spark, sf_dir):
    # TPC-H Q9-style profit rollup by supplier nation and part type —
    # exercises the two remaining testdata dims (part, supplier), both
    # broadcast against the lineitem fact: the star-join shape that
    # never shuffles the fact table by a dimension key.
    pa = demo.read_table(spark, sf_dir, "part")
    su = demo.read_table(spark, sf_dir, "supplier")
    na = demo.read_table(spark, sf_dir, "nation")
    li = demo.read_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy("n_name", "p_type")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- LLM-data-pipeline operators -------------------------------------------

def q_dedup_exact(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return D.exact_duplicates(docs)


def q_dedup_minhash(spark, sf_dir):
    # persist the narrow set table: the candidate self-join reads the
    # signature pipeline on BOTH sides, and without a materialization
    # barrier the compute-bound tokenize+shingle+md5 chain re-runs per
    # side (the old exploded path got this for free from its groupBy
    # shuffle; the narrow path must cache instead).
    docs = demo.read_table(spark, sf_dir, "documents")
    sets = D.doc_shingle_sets(docs).persist()
    return D.minhash_candidates(D.minhash_signatures_sets(sets))


def q_dedup_jaccard(spark, sf_dir):
    # The scale path: MinHash-banded candidates, then exact Jaccard
    # verification restricted to those pairs (never the full
    # inverted-index self-join). All on per-doc shingle SETS: the
    # signatures are narrow array expressions and the verify is two
    # equi-joins + array_intersect -- the exploded (doc, shingle)
    # table is never built, so the only shuffles are the joins'.
    docs = demo.read_table(spark, sf_dir, "documents")
    # the set table feeds 3 consumers (signatures, both verify join
    # sides) -- persist it once instead of re-shingling
    sets = D.doc_shingle_sets(docs).persist()
    cand = D.minhash_candidates(D.minhash_signatures_sets(sets))
    return D.jaccard_verify_sets(cand, sets, threshold=0.2)


def q_dedup_span_removal(spark, sf_dir):
    # Cross-document duplicated-SPAN removal (Lee et al. 2021 shape):
    # any 8-token run occurring in >= 2 docs is dropped from every doc;
    # survivors re-join in order. All Catalyst expressions -- the
    # n-gram table is the only explode, coverage is equi-join + bounded
    # sequence, reconstruction is one groupBy.
    docs = demo.read_table(spark, sf_dir, "documents")
    return D.remove_duplicate_spans(docs, n=8, min_docs=2)


def q_dedup_simhash(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return D.simhash16(docs)


def q_dedup_representatives(spark, sf_dir):
    # End-to-end dedup as a training-data run executes it: candidates
    # -> exact verify -> components -> keep min-ID doc per cluster.
    docs = demo.read_table(spark, sf_dir, "documents")
    return D.dedup_representatives(docs, threshold=0.2)


def q_snapshot_timeline(spark, sf_dir):
    # As-of snapshot evolution: latest-per-node at 4 evenly-spaced
    # timeline points across the data's time range (computed, so the
    # query is meaningful at every scale factor).
    f = demo.events_findings(spark, sf_dir)
    lo, hi = f.agg(F.min("found_at"), F.max("found_at")).collect()[0]
    pts = [lo + (hi - lo) * i // 4 for i in range(1, 5)]
    return snapshot_timeline(f, pts)


def q_text_token_stats(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.token_stats(docs)


def q_text_quality(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.quality_scores(docs)


def q_text_lang_id(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.lang_id(docs)


def q_text_fingerprint(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.fingerprint(docs)


def _structured_docs(spark, sf_dir):
    # Line-structured documents synthesized from doc_id arithmetic
    # (the same device as the WARC/sitemap queries): the parquet corpus
    # is flat word soup — no newlines, bullets, ellipses, braces — so
    # the line-level Gopher/C4 rule paths would be degenerate on it.
    # Each rule gets both passing and failing documents; the oracles
    # replay the identical synthesis in SQL.
    docs = demo.read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    text = F.concat(
        F.col("text"),
        F.lit(" end."),
        F.when(d % 4 == 0, F.lit("\n- bullet point item")).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.lit("\nto be continued...")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("\n#### chart ####")).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("\nenable javascript and cookie support."))
        .otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("\nint main() { return 0; }"))
        .otherwise(F.lit("")),
    )
    return docs.select("doc_id", text.alias("text"))


# The CASE-chain twin of _structured_docs, shared by both rule oracles.
SQL_STRUCTURED = """
structured AS (
  SELECT doc_id,
    text || ' end.'
    || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '- bullet point item' ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'to be continued...' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN chr(10) || '#### chart ####' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'enable javascript and cookie support.' ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'int main() { return 0; }' ELSE '' END
    AS text
  FROM documents
)
"""


def q_text_gopher_rules(spark, sf_dir):
    # Gopher rule-based filtering (Rae et al. 2021) over synthesized
    # line-structured docs; thresholds tuned so every rule is binding
    # for some documents (ellipsis 0.25 splits on line count, required
    # hits 2 splits on whether the 'to be' line is present, symbol
    # ratio 0.1 fails the '####' docs). The oracle recomputes every
    # signal and the keep verdict from the same synthesis.
    return TX.gopher_rules(
        _structured_docs(spark, sf_dir),
        min_words=10, max_words=100_000,
        min_mean_word_len=3.0, max_mean_word_len=10.0,
        max_symbol_word_ratio=0.1, max_bullet_line_frac=0.9,
        max_ellipsis_line_frac=0.25, min_alpha_word_frac=0.8,
        min_required_hits=2,
    )


def q_text_c4_clean(spark, sf_dir):
    # C4 line-level cleaning (Raffel et al. 2020 §2.2) over the same
    # synthesized docs: terminal-punctuation + min-words line keeps,
    # javascript/cookie/brace line drops, lorem-ipsum/brace doc drops.
    # The oracle rebuilds clean_text line by line with the identical
    # predicate.
    return TX.c4_clean(
        _structured_docs(spark, sf_dir), min_line_words=3, min_kept_lines=1
    )


def q_curate_repetition(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.repetition_stats(docs)


def q_curate_pack(spark, sf_dir):
    # Small window so every scale factor produces multiple packs per group.
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.pack_documents(docs, window_tokens=256, n_groups=32)


def q_curate_pack_bpe(spark, sf_dir):
    # Packing driven by LEARNED-BPE token counts instead of the
    # whitespace counter — the point of r8's bpe_learn: the window
    # budget is denominated in the tokens a trainer actually sees.
    # The oracle replays the BPE learning (unrolled CTEs), re-encodes
    # every doc, and packs with the same window math.
    docs = demo.read_table(spark, sf_dir, "documents")
    merges = TX.bpe_learn(docs, n_merges=BPE_N_MERGES)
    counts = TX.bpe_encode_stats(docs, merges).select("doc_id", "n_tokens")
    return CU.pack_documents(
        docs, window_tokens=256, n_groups=32, token_counts=counts
    )


def q_curate_hash_sample(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.hash_sample(docs, fraction=0.25).select("doc_id", "n_chars")


def q_curate_stratified_sample(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.stratified_sample(docs, "lang", k=25).select(
        "doc_id", "lang", F.col("sample_rank").cast("long").alias("sample_rank")
    )


def q_curate_pii_scrub(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.pii_scrub(docs)


def q_curate_shuffle_shards(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.shuffle_shards(docs, n_shards=8).select("doc_id", "shard", "sort_key")


def q_curate_chunks(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.chunk_documents(docs, chunk_chars=200, overlap=50)


def q_curate_decontaminate(spark, sf_dir):
    # Train/eval split by doc_id residue; the synthetic corpus's
    # near-duplicate families guarantee real 8-gram overlap.
    docs = demo.read_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 5 != 0)
    eval_df = docs.where(F.col("doc_id") % 5 == 0)
    return CU.decontaminate(train, eval_df, n=8)


def q_curate_decontaminate_fuzzy(spark, sf_dir):
    # Near-duplicate benchmark leakage: the synthetic corpus's
    # near-duplicate families straddle the train/eval split, so banded
    # candidates + exact Jaccard find real cross-split overlap the
    # exact-8-gram decontaminate would undercount.
    docs = demo.read_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 5 != 0)
    eval_df = docs.where(F.col("doc_id") % 5 == 0)
    return CU.decontaminate_fuzzy(train, eval_df, n=3, threshold=0.5)


def q_dedup_exact_incremental(spark, sf_dir):
    # "today's batch" = doc_id % 4 == 0 probed against the rest.
    docs = demo.read_table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 4 == 0)
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    return D.exact_duplicates_against(new, corpus)


def q_dedup_minhash_incremental(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 4 == 0)
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    new_sigs = D.minhash_signatures(D.doc_shingles(new))
    corpus_sigs = D.minhash_signatures(D.doc_shingles(corpus))
    return D.minhash_candidates_against(new_sigs, corpus_sigs)


def q_graph_triangles(spark, sf_dir):
    from net_spider_spark.findings import explode_link_samples
    from net_spider_spark.graph.triangles import triangle_stats

    findings = demo.events_findings(spark, sf_dir)
    kept = latest_findings_per_node(findings)
    edges = explode_link_samples(kept).select(
        F.col("subject_node").alias("src"), F.col("target_node").alias("dst")
    )
    return triangle_stats(edges)


def q_graph_triangles_dist(spark, sf_dir):
    # Same computation as graph_triangles but pinned to the
    # DISTRIBUTED path (local_threshold=0): the degree-ordered
    # orientation + wedge joins that run at corpus scale, where the
    # edge list no longer fits the driver-local fast path. Oracle is
    # identical — both paths must agree with the same SQL.
    from net_spider_spark.findings import explode_link_samples
    from net_spider_spark.graph.triangles import triangle_stats

    findings = demo.events_findings(spark, sf_dir)
    kept = latest_findings_per_node(findings)
    edges = explode_link_samples(kept).select(
        F.col("subject_node").alias("src"), F.col("target_node").alias("dst")
    )
    return triangle_stats(edges, local_threshold=0)


def _kept_edges(spark, sf_dir):
    """Directed distinct link edges from the latest-findings graph —
    the shared input of the pagerank/kcore contract queries."""
    from net_spider_spark.findings import explode_link_samples

    findings = demo.events_findings(spark, sf_dir)
    kept = latest_findings_per_node(findings)
    return explode_link_samples(kept).select(
        F.col("subject_node").alias("src"), F.col("target_node").alias("dst")
    )


def q_graph_pagerank(spark, sf_dir):
    from net_spider_spark.graph.pagerank import pagerank

    return pagerank(_kept_edges(spark, sf_dir), n_iter=10)


def q_graph_kcore(spark, sf_dir):
    from net_spider_spark.graph.kcore import kcore

    return kcore(_kept_edges(spark, sf_dir), k=2, max_rounds=15)


def _pagerank_sql(n_iter: int = 10, damping: float = 0.85,
                  edges_sql: str | None = None) -> str:
    """DuckDB twin of graph.pagerank: the fixed-point power-method
    rounds unrolled as CTE stages. Pure integer arithmetic (micro-unit
    ranks, floor division) — bit-exact across engines regardless of
    aggregation order, unlike any floating formulation.

    ``edges_sql`` swaps the default findings-graph edge source for any
    (src, dst) SELECT (self-loop-free, deduplicated by the caller or by
    DISTINCT inside it) — the power-method chain is edge-source
    agnostic, which is how graph_host_rank reuses it over the crawl
    link graph."""
    d_num = int(round(damping * 1000))
    base_int = (1_000_000 * (1000 - d_num)) // 1000
    if edges_sql is None:
        head = f"WITH {SQL_F},\n{SQL_KEPT_OVERWRITE},\n"
        first = """e AS MATERIALIZED (
  SELECT DISTINCT subject_node AS src, target_node AS dst
  FROM kept WHERE subject_node <> target_node
)"""
    else:
        head = "WITH "
        first = f"e AS MATERIALIZED ({edges_sql})"
    ctes = [
        first,
        """n AS MATERIALIZED (
  SELECT src AS v FROM e UNION SELECT dst AS v FROM e
)""",
        """ew AS MATERIALIZED (
  SELECT src, dst, count(*) OVER (PARTITION BY src) AS od FROM e
)""",
        "pr0 AS MATERIALIZED (SELECT v, CAST(1000000 AS BIGINT) AS pr FROM n)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT ew.dst AS v, sum(p.pr // ew.od) AS s
  FROM ew JOIN pr{i - 1} p ON p.v = ew.src GROUP BY 1
)"""
        )
        ctes.append(
            f"""pr{i} AS MATERIALIZED (
  SELECT n.v, CAST({base_int} + ({d_num} * coalesce(c.s, 0)) // 1000
              AS BIGINT) AS pr
  FROM n LEFT JOIN c{i} c ON c.v = n.v
)"""
        )
    return (
        head
        + ",\n".join(ctes)
        + f"\nSELECT v AS node_id, pr / 1000000.0 AS pagerank FROM pr{n_iter}"
    )


def _kcore_sql(k: int = 2, rounds: int = 15) -> str:
    """DuckDB twin of graph.kcore: ``rounds`` peel iterations unrolled.
    Once the peel reaches its fixpoint further rounds are no-ops, so a
    fixed unroll >= the Spark loop's max_rounds replays it exactly."""
    ctes = [
        """e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT subject_node AS src, target_node AS dst FROM kept
    UNION ALL
    SELECT target_node AS src, subject_node AS dst FROM kept
  ) WHERE src <> dst
)""",
        "a0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM e)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT e.src AS v, count(*) AS deg FROM e
  JOIN a{i - 1} s ON s.v = e.src
  JOIN a{i - 1} t ON t.v = e.dst
  GROUP BY 1
)"""
        )
        ctes.append(f"a{i} AS MATERIALIZED (SELECT v FROM d{i} WHERE deg >= {k})")
    return (
        f"WITH {SQL_F},\n{SQL_KEPT_OVERWRITE},\n"
        + ",\n".join(ctes)
        + f"""
SELECT e.src AS node_id, CAST(count(*) AS BIGINT) AS degree FROM e
JOIN a{rounds} s ON s.v = e.src
JOIN a{rounds} t ON t.v = e.dst
GROUP BY 1"""
    )


def _bm25_sql(terms, top_k=10, k1=1.2, b=0.75):
    """DuckDB twin of text.bm25_search: identical constants via repr
    (so 1.0-b etc. are the same doubles) and identical operation order
    in every float expression."""
    tfs = ",\n         ".join(
        f"CAST(len(list_filter(toks, x -> x = '{w}')) AS DOUBLE) AS tf{i}"
        for i, w in enumerate(terms)
    )
    dfs = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    score = "0.0"
    for i in range(len(terms)):
        idf = (
            f"ln(1.0 + (CAST(n AS DOUBLE) - df{i} + 0.5) / (df{i} + 0.5))"
        )
        norm = (
            f"{k1!r} * ({1.0 - b!r} + {b!r} * CAST(dl AS DOUBLE)"
            f" / (CAST(dlsum AS DOUBLE) / CAST(n AS DOUBLE)))"
        )
        score += (
            f"\n      + {idf} * (tf{i} * {k1 + 1.0!r}) / (tf{i} + {norm})"
        )
    return f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKS} AS toks FROM documents
),
per AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         {tfs}
  FROM t
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(dl) AS dlsum,
         {dfs}
  FROM per
),
scored AS (
  SELECT doc_id,
    {score} AS score
  FROM per CROSS JOIN s
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT)
         AS rank
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id ASC LIMIT {top_k}
"""


def _events_ms(spark, sf_dir):
    ev = demo.read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", "user_id", demo.ts_epoch_ms(ev).alias("ts_ms")
    )


def q_events_sessionize(spark, sf_dir):
    return EV.sessionize(_events_ms(spark, sf_dir)).select(
        "event_id", "user_id", "ts_ms", "session_idx", "session_id"
    )


def q_events_session_stats(spark, sf_dir):
    return EV.session_stats(EV.sessionize(_events_ms(spark, sf_dir)))


def q_curate_mixture_sample(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.mixture_sample(
        docs, {"src0": 2.0, "src1": 1.0, "src2": 1.0}
    ).select("doc_id", "source", "mix_rank")


def q_sim_topk(spark, sf_dir):
    emb = demo.read_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    corpus = emb.where(F.col("vec_id") >= 5)
    return S.brute_force_topk(queries_df, corpus, k=3)


def q_sim_lsh_topk(spark, sf_dir):
    # Approximate variant (sign-LSH buckets); no SQL oracle — the
    # driver's rows-only check applies. Exactness is pinned separately
    # by tests/test_pipeline_ops.py recall assertions vs brute force.
    emb = demo.read_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    corpus = emb.where(F.col("vec_id") >= 5)
    return S.lsh_bucket_topk(queries_df, corpus, dim=64, k=3, n_planes=2)


def q_snapshot_links_append_interval(spark, sf_dir):
    # policy x interval interplay (ServerTest/Snapshot.hs:244-265):
    # append over the lower half of the observed time range.
    findings = demo.events_findings(spark, sf_dir)
    lo, hi = findings.agg(F.min("found_at"), F.max("found_at")).collect()[0]
    iv = Interval.until(lo + (hi - lo) // 2, inclusive=True)
    _, links = get_snapshot(
        findings, Query(found_node_policy="append", time_interval=iv)
    )
    return links.select("source_node", "dest_node", "is_directed", "link_ts")


def q_u2_union_links(spark, sf_dir):
    # U2 combineLinks: concat two link families with a discriminator.
    ls = demo.events_link_samples(spark, sf_dir)
    dio = ls.where(F.col("finding_id") % 2 == 0).withColumn(
        "link_type", F.lit("dio")
    )
    dao = ls.where(F.col("finding_id") % 2 == 1).withColumn(
        "link_type", F.lit("dao")
    )
    return dio.unionByName(dao).select(
        "finding_id", "subject_node", "target_node", "link_type"
    )


def q_c1_timestamp_format(spark, sf_dir):
    # C1 showTimestamp: epoch-ms -> ISO-8601 text (UTC).
    ls = demo.events_link_samples(spark, sf_dir)
    return ls.select(
        "finding_id",
        F.date_format(
            F.timestamp_millis(F.col("found_at")), "yyyy-MM-dd'T'HH:mm:ss"
        ).alias("iso_ts"),
    )


def q_text_bpe_tokens(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.bpe_token_stats(docs)


# Learned-BPE contract size: small enough that the DuckDB oracle can
# unroll the merge loop as a CTE chain, large enough to exercise
# multi-character merges (rank-6 'mer' merges a rank-2 output).
BPE_N_MERGES = 10


def q_text_bpe_learned(spark, sf_dir):
    # Sennrich-style BPE learned as grouped aggregates over the
    # (pretoken, freq) table — one corpus scan, then per-merge
    # vocabulary-sized jobs (pipeline/text.py bpe_learn). Output is
    # the merge table itself; the oracle replays the identical
    # algorithm as an unrolled DuckDB CTE chain.
    docs = demo.read_table(spark, sf_dir, "documents")
    merges = TX.bpe_learn(docs, n_merges=BPE_N_MERGES)
    return spark.createDataFrame(
        merges, "rank long, lhs string, rhs string, merged string, pair_count long"
    )


def q_text_bpe_encode(spark, sf_dir):
    # Per-doc token stats under the LEARNED vocabulary — the honest
    # token counter behind curation budgets. Encoding is a chain of
    # literal replaces (codegen, no UDF) applied per pretoken.
    docs = demo.read_table(spark, sf_dir, "documents")
    merges = TX.bpe_learn(docs, n_merges=BPE_N_MERGES)
    return TX.bpe_encode_stats(docs, merges)


def q_text_quality_model(spark, sf_dir):
    # Model-based quality scoring (r6 item 7): logistic-style
    # classifier distilled from the heuristic gate, trained by 8
    # full-batch gradient aggregates with fixed-point (1/2^20) gradient
    # quantization so the run is bit-reproducible on any partitioning
    # — the DuckDB oracle replays the identical training as unrolled
    # CTEs and must land on the same weights, scores, and labels.
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.quality_model_scores(docs)


def q_text_quality_filter(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.quality_filter(
        docs, min_chars=100, max_punct_ratio=0.2, min_alpha_ratio=0.5
    ).select("doc_id", "lang", "n_chars")


def q_graph_components(spark, sf_dir):
    from net_spider_spark.graph.components import connected_components

    findings = demo.events_findings(spark, sf_dir)
    kept = latest_findings_per_node(findings)
    from net_spider_spark.findings import explode_link_samples

    edges = explode_link_samples(kept).select(
        F.col("subject_node").alias("src"), F.col("target_node").alias("dst")
    )
    return connected_components(edges)


def q_graph_components_dist(spark, sf_dir):
    # Same computation as graph_components but pinned to the
    # DISTRIBUTED path (local_threshold=0): the iterative
    # min-label-propagation join loop that runs at 100x scale, where
    # the edge list no longer fits the driver-local fast path. Oracle
    # is identical -- both paths must agree with the recursive SQL.
    from net_spider_spark.findings import explode_link_samples
    from net_spider_spark.graph.components import connected_components

    findings = demo.events_findings(spark, sf_dir)
    kept = latest_findings_per_node(findings)
    edges = explode_link_samples(kept).select(
        F.col("subject_node").alias("src"), F.col("target_node").alias("dst")
    )
    return connected_components(edges, local_threshold=0)


def q_j5_reachability_dist(spark, sf_dir):
    # BFS pinned to the distributed frontier loop (local_threshold=0):
    # one broadcast-join job per level against the pre-partitioned
    # edges -- the plan that runs when the graph outgrows the driver.
    findings = demo.events_findings(spark, sf_dir)
    kept = latest_findings_per_node(
        findings.filter(Interval.always().predicate())
    )
    from net_spider_spark.findings import explode_link_samples

    samples = explode_link_samples(kept)
    edges = samples.select(
        F.col("subject_node").alias("src"), F.col("target_node").alias("dst")
    )
    starts = spark.createDataFrame([("1",), ("2",)], "node_id string")
    return reachable_nodes(edges, starts, local_threshold=0)


def q_graph_pagerank_dist(spark, sf_dir):
    # Distributed-path pin: the integer fixed-point power iteration as
    # repeated joins (graph/pagerank.py), never the driver fast path.
    from net_spider_spark.graph.pagerank import pagerank

    return pagerank(_kept_edges(spark, sf_dir), n_iter=10, local_threshold=0)


def q_graph_sssp_dist(spark, sf_dir):
    # Distributed-path pin of the bounded Bellman-Ford relaxation loop.
    from net_spider_spark.graph.sssp import shortest_paths

    ls = demo.events_link_samples(spark, sf_dir)
    edges = ls.select(
        F.col("subject_node").alias("src"),
        F.col("target_node").alias("dst"),
        (F.col("finding_id") % 10 + 1).alias("weight"),
    )
    return shortest_paths(edges, ["1", "2"], max_hops=6, local_threshold=0)


def q_graph_kcore_dist(spark, sf_dir):
    # Distributed-path pin of the iterative degree-peel loop.
    from net_spider_spark.graph.kcore import kcore

    return kcore(
        _kept_edges(spark, sf_dir), k=2, max_rounds=15, local_threshold=0
    )


def q_snapshot_links_multilink(spark, sf_dir):
    # Multi-link findings (one observation = whole neighbor set, the
    # reference's natural shape) through the full default pipeline.
    findings = demo.events_findings_multilink(spark, sf_dir)
    _, links = get_snapshot(findings, Query(found_node_policy="overwrite"))
    return links.select("source_node", "dest_node", "is_directed", "link_ts")


def q_typed_attrs_links(spark, sf_dir):
    # Struct-typed attribute columns (attributes.py) through the
    # DEFAULT snapshot pipeline: native long/double/Maybe fields ride
    # the same engine and come out typed — no string re-parsing.
    ev = demo.read_table(spark, sf_dir, "events")
    findings = ev.select(
        F.col("event_id").alias("finding_id"),
        F.col("user_id").cast("string").alias("subject_node"),
        demo.ts_epoch_ms(ev).alias("found_at"),
        F.lit(None).cast("int").alias("tz_offset_min"),
        F.lit(None).cast("boolean").alias("tz_summer_only"),
        F.lit(None).cast("string").alias("tz_name"),
        F.struct(
            (F.col("user_id") % 100).cast("long").alias("rank")
        ).alias("node_attrs"),
        F.array(
            F.struct(
                ((F.col("user_id") * 7 + F.col("event_id")) % 50)
                .cast("string")
                .alias("target_node"),
                F.expr(demo.LINK_STATE_CASE).alias("link_state"),
                F.struct(
                    F.col("value").cast("double").alias("weight"),
                    F.when(
                        F.col("event_id") % 4 != 0, F.col("event_id") % 50
                    ).cast("long").alias("metric"),
                ).alias("link_attrs"),
            )
        ).alias("neighbor_links"),
    )
    _, links = get_snapshot(findings, Query())
    return links.select(
        "source_node",
        "dest_node",
        "is_directed",
        "link_ts",
        F.col("link_attrs.weight").alias("weight"),
        F.coalesce(F.col("link_attrs.metric"), F.lit(-1)).alias("metric"),
    )


def q_rpl_dio_merged(spark, sf_dir):
    # The shipped DIO unifier (rpl/dio.py, DIO.hs:254-288) end-to-end:
    # custom applyInPandas merge_samples producing MergedDIOLink-style
    # source_/dest_ prefixed attrs — closes the A6 oracle gap. Attr
    # values come out as typed columns so the oracle compares scalars.
    from net_spider_spark.rpl.dio import dio_def_query

    findings = demo.events_findings_dio(spark, sf_dir)
    _, links = get_snapshot(findings, dio_def_query())
    a = F.col("link_attrs")

    def attr(k):
        # absent Maybe fields -> '' so every output column is a
        # non-null scalar (stable cross-engine sort/hash)
        return F.coalesce(a.getItem(k), F.lit("")).alias(k)

    return links.select(
        "source_node",
        "dest_node",
        "is_directed",
        "link_ts",
        attr("source_neighbor_type"),
        attr("source_neighbor_rank"),
        attr("source_metric"),
        attr("dest_neighbor_type"),
        attr("dest_neighbor_rank"),
        attr("dest_metric"),
    )


def q_dedup_embedding(spark, sf_dir):
    # Embedding-cosine near-dup groups via the scale path: banded
    # sign-LSH candidates (seed=42, mirrored exactly by the oracle)
    # + exact cosine verify — no all-pairs join.
    emb = demo.read_table(spark, sf_dir, "embeddings")
    return D.embedding_near_dup_groups(emb, threshold=0.5, n_planes=10)


def q_dedup_embedding_incremental(spark, sf_dir):
    # Daily-batch embedding dedup: new vectors (vec_id % 4 == 0) probe
    # the corpus signature index; only (band, sig) candidates get the
    # exact cosine. Same plane family as dedup_embedding (seed=42,
    # n_planes=10) so the oracle reuses its signature SQL.
    emb = demo.read_table(spark, sf_dir, "embeddings")
    new = emb.where(F.col("vec_id") % 4 == 0)
    corpus = emb.where(F.col("vec_id") % 4 != 0)
    return D.embedding_near_dup_against(
        new, corpus, threshold=0.5, n_planes=10
    )


def _events_typed(spark, sf_dir):
    ev = demo.read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        demo.ts_epoch_ms(ev).alias("ts_ms"),
    )


def q_temporal_asof(spark, sf_dir):
    # Each click event annotated with the user's most recent error
    # event at-or-before it (one union + one window pass — no join).
    ev = _events_typed(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_ms"
    )
    # dedupe equal-(user, ts) errors so backward tie-break is shared
    # with the SQL ASOF oracle (which needs a unique ref timestamp).
    errors = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts_ms")
        .agg(
            F.max("event_id").alias("err_id"),
            F.max_by("value", "event_id").alias("err_value"),
        )
    )
    out = TP.asof_join(
        clicks,
        errors,
        on="ts_ms",
        by=["user_id"],
        ref_cols=["err_id", "err_value"],
        ref_order="err_id",
    )
    # no-match sentinels: the driver compare sorts rows, and NULLs in a
    # sort column are engine-dependent — pin them to -1 on both sides.
    return out.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.coalesce("asof_ts_ms", F.lit(-1)).alias("asof_ts_ms"),
        F.coalesce("asof_err_id", F.lit(-1)).alias("asof_err_id"),
        F.coalesce("asof_err_value", F.lit(-1.0)).alias("asof_err_value"),
    )


def q_temporal_interval_join(spark, sf_dir):
    # Range join: click events (any user) falling inside global error
    # "incident windows" — sessionized error bursts padded by 10 min.
    # Unkeyed, so without bucket chunking Spark would plan an all-pairs
    # BroadcastNestedLoopJoin.
    ev = _events_typed(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_ms"
    )
    incidents = (
        EV.session_stats(
            EV.sessionize(
                ev.where(F.col("event_type") == "error").withColumn(
                    "g", F.lit(0)
                ),
                user_col="g",
            ),
            user_col="g",
        )
        .select(
            F.col("session_id").alias("incident_id"),
            (F.col("session_start") - F.lit(600_000)).alias("w_start"),
            (F.col("session_end") + F.lit(600_000)).alias("w_end"),
        )
    )
    return TP.interval_join(
        clicks,
        incidents,
        point_ts="ts_ms",
        start_col="w_start",
        end_col="w_end",
        bucket=3_600_000,
    ).select("event_id", "user_id", "ts_ms", "incident_id")


def q_temporal_rollup(spark, sf_dir):
    # Hypertable-style continuous aggregate: hourly + daily per-type
    # rollups, coarser levels re-aggregated from the finest partials.
    return TP.time_rollup(
        _events_typed(spark, sf_dir),
        resolutions=(3_600_000, 86_400_000),
    )


def q_sim_knn_join(spark, sf_dir):
    # Exact self-KNN over a deterministic corpus slice: every vector's
    # top-3 cosine neighbors (blocked BLAS matmul against the
    # broadcast corpus — see similarity.knn_join).
    emb = demo.read_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % 4 == 0
    )
    return S.knn_join(emb, k=3)


def q_embed_quantize_int8(spark, sf_dir):
    # int8 symmetric quantization; the array is pinned through scalar
    # projections (sum / L1 / max + scale) so the row compare stays on
    # hashable scalars.
    emb = demo.read_table(spark, sf_dir, "embeddings")
    q = S.quantize_int8(emb)
    acc = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
    )
    return q.select(
        "vec_id",
        "scale",
        acc(F.col("qvec")).alias("q_sum"),
        acc(F.transform("qvec", lambda x: F.abs(x))).alias("q_l1"),
        F.array_max("qvec").alias("q_max"),
    )


BM25_TERMS = ["spark", "query", "join"]


def q_text_common_ngrams(spark, sf_dir):
    # corpus boilerplate detection: top-20 trigrams by document freq
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.common_ngrams(docs, n=3, top_k=20)


def q_text_bm25(spark, sf_dir):
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.bm25_search(docs, BM25_TERMS, top_k=10)


def q_events_quantiles(spark, sf_dir):
    return EV.value_quantiles(_events_typed(spark, sf_dir))


def q_curate_weighted_sample(spark, sf_dir):
    # Efraimidis-Spirakis weighted sample: longer docs upweighted,
    # membership a pure function of (doc_id, seed).
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.weighted_sample(docs, k=50, weight_col="n_chars").select(
        "doc_id", "es_key", "wr_rank"
    )


def q_events_quantiles_sketch(spark, sf_dir):
    # Mergeable deterministic quantile sketch (bottom-k row sample by
    # md5 hash of event_id): the scale-safe reproducible fallback for
    # exact per-group quantiles when one group's values no longer fit
    # a single aggregation buffer. k=64 so the sampling path actually
    # runs; merge==direct and small-group exactness are pinned in
    # tests/test_sketch.py.
    ev = _events_typed(spark, sf_dir)
    sk = SK.quantile_sketch(ev, ["event_type"], "value", "event_id", k=64)
    return SK.quantile_sketch_estimate(sk, (0.5, 0.9)).select(
        "event_type", "n_kept", "p50", "p90"
    )


def q_sketch_cms_counts(spark, sf_dir):
    # Count-min sketch frequency estimation: depth-4 x width-256 cells
    # over event user_ids (width << distinct users, so collisions are
    # real and the min-over-rows estimator actually earns its keep);
    # probe the sub-50 user ids. Post-combine sketch state is <= 1024
    # cells however large the corpus; the one-sided (never-under)
    # guarantee and shard-merge == direct are pinned in test_sketch.py.
    ev = demo.read_table(spark, sf_dir, "events")
    cells = SK.cms_build(ev, "user_id", depth=4, width=256)
    probes = ev.where(F.col("user_id") < 50).select("user_id").distinct()
    return SK.cms_estimate(cells, probes, "user_id", depth=4, width=256)


def q_sketch_bloom_membership(spark, sf_dir):
    # Bloom-filter membership pre-screen: filter built over the text
    # digests of even-id documents, probed with every distinct digest.
    # No false negatives ever; the bits table is bounded by m_bits, so
    # at 100 TB it broadcasts and the probe corpus never shuffles —
    # the scale path for decontamination / incremental exact dedup.
    docs = demo.read_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 2 == 0).select(
        F.md5("text").alias("digest")
    )
    bits = SK.bloom_build(train, "digest", n_hashes=5, m_bits=1 << 16)
    probes = docs.select(F.md5("text").alias("digest"))
    return SK.bloom_contains(bits, probes, "digest", n_hashes=5, m_bits=1 << 16)


def q_text_divergence(spark, sf_dir):
    # Token-distribution drift between the even- and odd-id halves of
    # the corpus: add-1-smoothed unigram probabilities over the union
    # vocabulary, top-20 tokens by probability gap with per-token KL
    # contributions (no cross-token float sum — engine-reproducible).
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.token_divergence(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
    )


def q_events_retention(spark, sf_dir):
    # Daily retention cohorts over the event stream: first-seen day x
    # day offset, n_active / cohort_size. Hash aggregates + one
    # equi-join — no windows, no sort; the division is one IEEE op on
    # exact integers, so the oracle matches bit-for-bit.
    return EV.retention_cohorts(_events_typed(spark, sf_dir))


def q_layout_zorder(spark, sf_dir):
    # Z-order (Morton) layout key over (user_id, value): quantize both
    # onto 256-cell grids between their observed extents and interleave
    # the bits — the deterministic sort key write_zordered lays files
    # out by so min/max pruning works on BOTH columns. Pure codegen bit
    # arithmetic; the oracle recomputes identical codes in DuckDB.
    from net_spider_spark import layout as LY

    ev = demo.read_table(spark, sf_dir, "events")
    return LY.zorder_value(ev, ["user_id", "value"], bits=8).select(
        "event_id", "z_value"
    )


def q_graph_host_rank(spark, sf_dir):
    # Host authority: the crawl link graph (q_graph_host_links'
    # synthesis) fed into the fixed-point integer PageRank — the
    # CommonCrawl-style composition that turns raw HTML into a
    # quality prior per host. The oracle reuses the SAME unrolled
    # power-method chain as graph_pagerank over the analytic host
    # edge list (self-loops dropped by pagerank's edge normalizer).
    # Only hosts 0-2 place the cross link, so the graph is IRREGULAR
    # and ranks genuinely differ — a uniform-rank bug cannot pass.
    from net_spider_spark.graph.pagerank import pagerank
    from net_spider_spark.pipeline import url as URL

    docs = demo.read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    html = F.concat(
        F.lit('<p><a href="http://host'), ((d + 1) % 5).cast("string"),
        F.lit('.test/p'), d.cast("string"), F.lit('">next</a>'),
        F.lit('<a href="/local/'), d.cast("string"), F.lit('">rel</a>'),
        F.when(
            (d % 3 == 0) & (d % 5 < 3),
            F.concat(
                F.lit('<a href="HTTPS://WWW.Host'),
                ((d + 2) % 5).cast("string"),
                F.lit('.test:443/x">cross</a>'),
            ),
        ).otherwise(F.lit("")),
    )
    pages = docs.select(
        "doc_id",
        html.alias("html"),
        F.concat(
            F.lit("http://www.host"), (d % 5).cast("string"),
            F.lit(".test:80/doc/"), d.cast("string"),
        ).alias("url"),
    )
    edges = URL.host_link_graph(URL.extract_links(pages)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return pagerank(edges, n_iter=10)


def q_pipeline_crawl_frontier(spark, sf_dir):
    # The crawl FRONT-END pipeline as one query: sitemap frontier
    # expansion -> URL canonicalization + dedup -> robots.txt filtering
    # -> per-host quota. Every stage is binding: the first sitemap URL
    # is messy (WWW./:80/uppercase must canonicalize), the second
    # carries entity-escaped tracking params (sorted + stripped), the
    # third (every third doc) lands under a Disallow prefix. doc_id %
    # 20 drives ~8x URL-level duplication, and the quota of 5 per host
    # cuts the surviving frontier again. The oracle generates the
    # distinct canonical frontier directly from the residues.
    from net_spider_spark.pipeline import url as URL

    docs = demo.read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    h = (d % 5).cast("string")
    k = (d % 20).cast("string")
    xml = F.concat(
        F.lit("<urlset><url><loc>http://WWW.Host"), h,
        F.lit(".test:80/page/"), k, F.lit("</loc></url>"),
        F.lit("<url><loc>http://host"), h,
        F.lit(".test/private/ok/"), k,
        F.lit("?utm_source=x&amp;b=2&amp;a=1</loc></url>"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("<url><loc>http://host"), h,
                F.lit(".test/private/x"), k, F.lit("</loc></url>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</urlset>"),
    )
    frontier = URL.sitemap_urls(
        docs.select(F.col("doc_id").alias("sitemap_id"),
                    xml.alias("sitemap_xml"))
    )
    canon = (
        frontier.select(URL.canonical_url(F.col("url")).alias("url"))
        .distinct()
        .select(F.col("url").alias("cid"), "url")
    )
    rules = URL.robots_rules(_robots_corpus(spark, sf_dir), agent="*")
    allowed = URL.robots_filter(
        canon, rules, url_col="url", id_col="cid"
    ).where(F.col("allowed")).select("url")
    return URL.host_quota(
        allowed, max_per_host=5, url_col="url", id_col="url"
    ).select("url", "host")


def q_stream_url_dedup(spark, sf_dir):
    # URL-level dedup IN-FLIGHT (streaming/dedup.py stream_url_dedup):
    # the messy URL variants of curate_url_dedup arriving on a file
    # stream collapse onto their canonical forms before any fetch.
    # Emits only the canonical set (deterministic under replay); the
    # oracle computes the distinct canonical URLs directly from doc_id
    # arithmetic — the same rules attestation as the batch query, now
    # through the state store.
    from net_spider_spark.streaming.dedup import stream_url_dedup

    docs = demo.read_table(spark, sf_dir, "documents")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    d = F.col("doc_id")
    messy = stream.select(
        F.concat(
            F.lit("HTTP://WWW.Site"), (d % 5).cast("string"),
            F.lit(".com:80/page/"), (d % 40).cast("string"),
            F.when(d % 3 == 0, F.lit("?utm_source=x&b=2&a=1"))
            .when(d % 3 == 1, F.lit("?a=1&b=2"))
            .otherwise(F.lit("")),
            F.when(d % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
        ).alias("url"),
    )
    out = stream_url_dedup(messy)
    return _run_available_now(out, "stream_url_dedup_sink", "append",
                              source_bytes=_table_bytes(sf_dir, "documents"))


def q_stream_c4_clean(spark, sf_dir):
    # Rule-based cleaning AS A STREAM: c4_clean is a stateless
    # projection, so it drops into a streaming plan unchanged (no state
    # store, append mode) — documents arriving on a file stream are
    # cleaned in-flight. The availableNow replay must hash-match the
    # SAME oracle as the batch text_c4_clean.
    docs = demo.read_table(spark, sf_dir, "documents")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    d = F.col("doc_id")
    text = F.concat(
        F.col("text"),
        F.lit(" end."),
        F.when(d % 4 == 0, F.lit("\n- bullet point item")).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.lit("\nto be continued...")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("\n#### chart ####")).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("\nenable javascript and cookie support."))
        .otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("\nint main() { return 0; }"))
        .otherwise(F.lit("")),
    )
    structured = stream.select("doc_id", text.alias("text"))
    out = TX.c4_clean(structured, min_line_words=3, min_kept_lines=1)
    return _run_available_now(out, "stream_c4_sink", "append",
                              source_bytes=_table_bytes(sf_dir, "documents"))


def q_pipeline_curation(spark, sf_dir):
    # The END-TO-END curation pipeline as one query — the composition a
    # real training-data run executes: C4 line cleaning -> Gopher rule
    # filter on the CLEANED text -> exact dedup (keep-min per digest)
    # -> greedy context-window packing of the keepers. The synthesized
    # corpus makes every stage binding: doc_id % 11 plants brace docs
    # (C4 doc-drop), % 7 plants javascript lines (C4 line-drop), % 3
    # plants ellipsis lines (Gopher frac_ellipsis kill), and the
    # surviving cleaned texts collide on (doc_id % 13, doc_id % 5) so
    # dedup removes real mass before packing. The oracle derives the
    # survivor set, keeper set, and pack layout analytically.
    from net_spider_spark.pipeline import dedup as DD

    docs = demo.read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    line1 = F.concat(
        F.lit("the section "), (d % 13).cast("string"),
        F.lit(" covers area "), (d % 5).cast("string"), F.lit(" fully."),
    )
    text = F.concat(
        line1,
        F.when(d % 3 == 0, F.lit("\nto be continued...")).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("\nenable javascript now."))
        .otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("\nbad code { here }")).otherwise(F.lit("")),
    )
    raw = docs.select("doc_id", text.alias("text"))
    cleaned = TX.c4_clean(raw, min_line_words=3, min_kept_lines=1)
    kept = cleaned.where(F.col("keep")).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    g = TX.gopher_rules(
        kept, min_words=5, max_words=100, min_mean_word_len=3.0,
        max_mean_word_len=10.0, max_symbol_word_ratio=0.1,
        max_bullet_line_frac=0.9, max_ellipsis_line_frac=0.25,
        min_alpha_word_frac=0.6, min_required_hits=1,
    )
    good = kept.join(g.where(F.col("keep")).select("doc_id"), "doc_id")
    keepers = good.join(
        DD.exact_duplicates(good).select(
            F.col("keeper_id").alias("doc_id")
        ),
        "doc_id",
    )
    return CU.pack_documents(keepers, window_tokens=64, n_groups=8)


def _wordpiece_vocab_ctes(vocab_size: int, max_piece_len: int) -> str:
    """Shared CTE chain: word frequencies -> weighted substring counts
    -> top-V multi-char pieces + all single chars. Twin of
    text.wordpiece_vocab."""
    return f"""tok AS (SELECT doc_id, {SQL_TOKS_RAW} AS toks FROM documents),
w AS (SELECT unnest(toks) AS word FROM tok),
wf AS (SELECT word, count(*) AS freq FROM w GROUP BY 1),
sub AS (
  SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece, freq
  FROM wf,
       unnest(range(1, length(word) + 1)) AS ti(i),
       unnest(range(2, {max_piece_len + 1})) AS tl(l)
  WHERE i + l - 1 <= length(word)
),
multi AS (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS n_occurrences,
         false AS is_char
  FROM sub GROUP BY 1
  ORDER BY n_occurrences DESC, piece ASC LIMIT {vocab_size}
),
ch AS (
  SELECT substr(word, CAST(i AS INT), 1) AS piece, freq
  FROM wf, unnest(range(1, length(word) + 1)) AS ti(i)
),
chars AS (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS n_occurrences,
         true AS is_char
  FROM ch GROUP BY 1
)"""


def _wordpiece_encode_sql(vocab_size: int, max_piece_len: int,
                          steps: int = 12) -> str:
    """Twin of text.wordpiece_encode_stats: the greedy longest-match
    loop unrolled as ``steps`` CTE stages. Every greedy step consumes
    >= 1 character, so ``steps`` >= the longest corpus word guarantees
    the unroll drains; the ``enc`` CTE ERRORS (DuckDB ``error()``) on
    any undrained remainder instead of silently counting leftover
    characters one piece each — a corpus with longer words fails the
    gate loudly rather than hash-mismatching."""
    ctes = [
        "vocab AS (SELECT piece FROM chars UNION ALL"
        " SELECT piece FROM multi)",
        "dw AS (SELECT DISTINCT word FROM w)",
        "g0 AS (SELECT word, word AS rem, 0 AS np FROM dw)",
    ]
    for i in range(1, steps + 1):
        p = f"g{i - 1}"
        ctes.append(f"""g{i} AS (
  SELECT word,
    CASE WHEN rem = '' THEN ''
         ELSE substr(rem, coalesce(
           (SELECT max(length(piece)) FROM vocab v
            WHERE starts_with({p}.rem, v.piece)), 1) + 1)
    END AS rem,
    np + CASE WHEN rem = '' THEN 0 ELSE 1 END AS np
  FROM {p})""")
    return (
        f"WITH {_wordpiece_vocab_ctes(vocab_size, max_piece_len)},\n"
        + ",\n".join(ctes)
        + f""",
enc AS (
  SELECT word,
         np + CASE WHEN rem = '' THEN 0
                   ELSE CAST(error('wordpiece unroll undrained: raise steps='
                                   || '{steps} above the longest corpus word')
                        AS INT) END AS n_pieces
  FROM g{steps}),
agg AS (SELECT doc_id, len(toks) AS n_words FROM tok),
wd AS (SELECT doc_id, unnest(toks) AS word FROM tok),
sums AS (
  SELECT wd.doc_id, sum(e.n_pieces) AS s
  FROM wd JOIN enc e USING (word) GROUP BY 1
)
SELECT a.doc_id, CAST(a.n_words AS BIGINT) AS n_words,
       CAST(coalesce(s.s, 0) AS BIGINT) AS n_pieces
FROM agg a LEFT JOIN sums s USING (doc_id)"""
    )


def q_text_corpus_stats(spark, sf_dir):
    # The corpus card: doc count, token totals/extremes, exact distinct
    # tokens, type-token ratio — integer aggregates plus one exact
    # division.
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.corpus_stats(docs)


def q_text_length_histogram(spark, sf_dir):
    # Length distribution in 16-token bins — one hash aggregate on the
    # bounded bin key.
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.token_length_histogram(docs, bucket=16)


def q_text_wordpiece_vocab(spark, sf_dir):
    # WordPiece-style vocabulary selection: all corpus characters plus
    # the top-32 weighted substrings (length 2-4) — the deterministic
    # frequency simplification of Wu et al. 2016, rank ties broken by
    # piece so the LIMIT boundary is engine-stable.
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.wordpiece_vocab(docs, vocab_size=32, max_piece_len=4)


def q_text_wordpiece_encode(spark, sf_dir):
    # Greedy longest-match WordPiece encoding under the learned vocab
    # (the standard WordPiece/BERT inference rule), per-doc word and
    # piece counts. The oracle relearns the same vocab and unrolls the
    # greedy loop as 12 CTE stages — every (vocab selection, longest
    # match, char fallback) decision is attested.
    docs = demo.read_table(spark, sf_dir, "documents")
    vocab = [
        r["piece"]
        for r in TX.wordpiece_vocab(
            docs, vocab_size=32, max_piece_len=4
        ).collect()
    ]
    return TX.wordpiece_encode_stats(docs, vocab)


def q_layout_bucketed_join(spark, sf_dir):
    # Bucketed co-located join (layout.write_bucketed): orders and
    # lineitem land bucketed by orderkey into the SAME bucket count at
    # write time, so the fact-table join runs with zero Exchange on
    # either side (pinned in tests/test_layout.py with broadcast
    # disabled) — the write-once-join-many layout that amortizes the
    # big join's shuffle at 100 TB. The oracle is the plain SQL
    # join+agg: bucketing must change the PLAN, never the answer.
    from net_spider_spark import layout as LY

    # table names/paths are suffixed per sf_dir: two concurrent runs
    # (a bench sweep + an oracle sweep) sharing the metastore would
    # otherwise race on DROP TABLE + overwrite and read each other's
    # data
    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.strip("/"))
    orders = demo.read_table(spark, sf_dir, "orders")
    li = demo.read_table(spark, sf_dir, "lineitem")
    # The two bucketed writes are independent jobs — overlap them from
    # a 2-thread pool (guide §2.6) so the small table's write and its
    # catalog DDL hide inside the fact table's write instead of
    # serializing after it (measured 2.2 -> 1.7 s at sf0.1; at scale
    # the win is the whole small-side write). Distinct tables, so the
    # metastore transactions don't contend.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fo = pool.submit(
            LY.write_bucketed,
            orders, f"nss_bucketed_orders_{tag}", ["o_orderkey"], 8,
            ["o_orderkey"], f"/tmp/nss_bucketed_{tag}/orders",
        )
        fl = pool.submit(
            LY.write_bucketed,
            li, f"nss_bucketed_lineitem_{tag}", ["l_orderkey"], 8,
            ["l_orderkey"], f"/tmp/nss_bucketed_{tag}/lineitem",
        )
        o, l = fo.result(), fl.result()
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


def _zorder_sql_terms(qa: str, qb: str, bits: int) -> str:
    """DuckDB bit-interleave expression mirroring layout.zorder_interleave."""
    terms = []
    for i in range(bits):
        terms.append(f"((({qa} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({qb} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def q_stream_cms_cells(spark, sf_dir):
    # Streaming-maintained count-min sketch: the cells table is one
    # count aggregate over (r, c), so Structured Streaming maintains
    # it incrementally with bounded state (<= depth*width rows forever,
    # however long the stream runs — the mergeable-sketch property as
    # a streaming-state bound). The availableNow replay must equal the
    # batch cells bit-for-bit; the oracle rebuilds them in DuckDB.
    ev, stream = _events_stream(spark, sf_dir)
    cells = SK.cms_build(stream, "user_id", depth=4, width=256)
    return _run_available_now(cells, "stream_cms_sink", "complete",
                              source_bytes=_table_bytes(sf_dir, "events"))


def q_stream_hll_distinct(spark, sf_dir):
    # Streaming-maintained HyperLogLog: the register table is ONE
    # grouped max over (event_type, bucket), so Structured Streaming
    # maintains it incrementally with state bounded by groups x 2^p
    # rows forever — the same mergeable-sketch state bound as
    # stream_cms_cells, now for distinct counting. Max is
    # replay-insensitive, so the availableNow replay's registers equal
    # the batch registers bit-for-bit and the DENSE batch oracle
    # (_hll_sql) applies verbatim to the estimate off the sink.
    ev, stream = _events_stream(spark, sf_dir)
    typed = stream.select("event_type", "user_id")
    regs = SK.hll_register_table(typed, ["event_type"], "user_id", p=6)
    sink = _run_available_now(regs, "stream_hll_sink", "complete",
                              source_bytes=_table_bytes(sf_dir, "events"))
    sketch = SK.hll_from_registers(sink, ["event_type"], p=6)
    return SK.hll_estimate(sketch, p=6).drop("hll")


def q_temporal_gap_fill(spark, sf_dir):
    # Densify the hourly rollup per event_type: ~5% of buckets are
    # genuinely absent at sf0.01; counts zero-fill, and the synthetic
    # rows carry is_gap. The dense grid is output-sized (calendar span
    # / step), never corpus-sized.
    hourly = TP.time_rollup(
        _events_typed(spark, sf_dir), resolutions=(3_600_000,)
    ).select("event_type", "bucket_start", "n_events", "value_sum")
    return TP.gap_fill(
        hourly,
        ["event_type"],
        step=3_600_000,
        value_cols=["n_events", "value_sum"],
        fill="zero",
    )


def q_curate_mixture_repeat(spark, sf_dir):
    # Upsampled mixture: target 1000 rows at 2:1:1 over the three
    # sources (quotas 500/250/250 against ~170-row sources, so every
    # doc repeats and the md5-rank boundary slice gets one extra copy).
    # The only exact rank is over the quota%count boundary slice —
    # same bucket-distributed shape as curate_mixture_sample.
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.mixture_sample_with_repetition(
        docs, {"src0": 2.0, "src1": 1.0, "src2": 1.0}, target_total=1000
    ).select("doc_id", "source", "epoch")


def q_dedup_boilerplate_lines(spark, sf_dir):
    # Cross-document boilerplate-line removal (RefinedWeb/CCNet-style):
    # the synthetic corpus has no naturally repeated lines, so the
    # query stages deterministic ones — a universal footer on every
    # doc and a second banner on every third — exactly as the oracle
    # does; the operator must strip them and keep the unique lines.
    docs = demo.read_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("subscribe to our newsletter"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("cookie notice: accept all")
            ).otherwise(F.concat(F.lit("ref "), F.col("doc_id"))),
        ).alias("text"),
    )
    return D.remove_boilerplate_lines(staged, min_docs=5)


def q_cluster_kmeans(spark, sf_dir):
    # Deterministic Lloyd's k-means (bottom-k-by-hash init, min-struct
    # argmin, posexplode mean update) — every step engine-reproducible,
    # so the approximate-looking operator has an EXACT DuckDB oracle
    # (the unrolled 2-iteration CTE chain in oracle_sql()).
    emb = demo.read_table(spark, sf_dir, "embeddings")
    return CL.kmeans_assign(emb, k=8, iters=2, train_n=1024)


def q_dedup_semantic(spark, sf_dir):
    # SemDeDup (arXiv:2303.09540): cluster, then flag vectors dominated
    # by a smaller-id same-cluster neighbor at cosine >= 0.3. The pair
    # space is the cluster-keyed self-join, never the full n^2.
    emb = demo.read_table(spark, sf_dir, "embeddings")
    return CL.semantic_dedup(emb, k=8, iters=2, threshold=0.3,
                             train_n=1024)


def q_sim_pq_topk(spark, sf_dir):
    # Product quantization ANN: per-subspace deterministic k-means
    # codebooks, 32-byte codes, ADC top-3. Every training/encode/score
    # step is deterministic, so the compressed index has an exact
    # oracle (ONE fused Lloyd's chain with the subspace as a grouping
    # key + lookup-table sum).
    # m=32/k=256 are the recall-first defaults (recall@10 = 0.83 on
    # the isotropic test corpus vs 0.16 at the old m=4/k=16 demo
    # params — RECALL_r11.json); train_n=1024 bounds codebook training
    # to the deterministic md5 sample the oracle replays.
    from net_spider_spark.pipeline import pq as PQ

    emb = demo.read_table(spark, sf_dir, "embeddings")
    books = PQ.pq_train(emb, dim=64, m=32, k=256, iters=1, train_n=1024)
    codes = PQ.pq_encode(emb, books)
    return PQ.pq_topk(emb.where(F.col("vec_id") < 5), codes, books, k=3)


def q_sim_ivfpq_topk(spark, sf_dir):
    # IVF-PQ (Jégou et al. 2011), composed deterministic: the coarse
    # quantizer is the md5-seeded Lloyd's (pipeline/cluster.py), the
    # fine quantizer the PQ subspace codebooks, so the ENTIRE index —
    # cells, codes, probes, ADC sums — replays exactly in DuckDB
    # (unlike sim_ivf_topk, whose MLlib coarse step forces exhaustive
    # probing in its oracle). n_probe=7 of 8 cells: the oracle attests
    # the pruning itself, not just the scoring. train_n=1024 trains
    # both quantizers on the bounded md5 sample (the FAISS recipe; the
    # oracle replays the same sample), and the config holds recall@10
    # = 0.80 (RECALL_r11.json; 0.16 at the old m=4/k=16/probe-2 demo
    # params).
    from net_spider_spark.pipeline import pq as PQ

    emb = demo.read_table(spark, sf_dir, "embeddings")
    return PQ.ivfpq_topk(
        emb.where(F.col("vec_id") < 5), emb, dim=64, k=3,
        n_cells=8, n_probe=7, coarse_iters=2, m=32, k_codes=256,
        pq_iters=1, train_n=1024,
    )


def q_sim_ivfpq_residual(spark, sf_dir):
    # Jégou IVF-ADC proper: PQ codebooks train on the within-cell
    # RESIDUALS r = x - centroid(cell(x)), and each query builds a
    # per-probed-cell lookup table against its residual to that cell.
    # Same deterministic pieces, so the oracle replays the residual
    # table, the residual-trained subspace chains, and the
    # (query, cell)-keyed ADC exactly. pq_iters=2: residual codebooks
    # start from raw-vector slices, so they need one extra Lloyd
    # iteration to center on the residual distribution. train_n=1024
    # bounds both quantizers' training to the md5 sample; recall@10 =
    # 0.80 at these defaults (RECALL_r11.json; 0.15 at the old
    # m=4/k=16/probe-2 demo params).
    from net_spider_spark.pipeline import pq as PQ

    emb = demo.read_table(spark, sf_dir, "embeddings")
    return PQ.ivfpq_topk(
        emb.where(F.col("vec_id") < 5), emb, dim=64, k=3,
        n_cells=8, n_probe=7, coarse_iters=2, m=32, k_codes=256,
        pq_iters=2, residual=True, train_n=1024,
    )


def q_sim_ivfpq_add(spark, sf_dir):
    # Incremental index maintenance: build on the even-id half, add
    # the odd-id half with FROZEN centroids/codebooks (pq.ivfpq_add —
    # the day's-batch shape), search the incremented index. The oracle
    # trains its chains on the same half via from_sql and then
    # assigns/encodes the FULL corpus against the frozen parameters —
    # equal to the Spark union because both halves end up argmin'd
    # against identical params.
    from net_spider_spark.pipeline import pq as PQ

    emb = demo.read_table(spark, sf_dir, "embeddings")
    idx = PQ.ivfpq_build(
        emb.where(F.col("vec_id") % 2 == 0), dim=64, n_cells=8,
        coarse_iters=2, m=32, k_codes=256, pq_iters=1, train_n=1024,
    )
    idx = PQ.ivfpq_add(idx, emb.where(F.col("vec_id") % 2 == 1))
    return PQ.ivfpq_search(
        idx, emb.where(F.col("vec_id") < 5), k=3, n_probe=7
    )


def q_multimodal_warc_extract(spark, sf_dir):
    # WARC front door (pipeline/warc.py): one single-record WARC/1.0
    # archive is synthesized PER DOCUMENT in pure expressions (headers
    # + HTTP 200 response wrapping the text, Content-Length =
    # octet_length — the same synthesize-then-decode pattern as the
    # image/audio queries), parsed back through the mapInPandas record
    # parser, and text-extracted. The oracle predicts every output
    # analytically from the same columns. Both sides exclude texts
    # containing '<' so the tag-stripping chain (Java-regex
    # backreferences RE2 can't express) is provably a no-op.
    from net_spider_spark.pipeline import warc as W

    docs = demo.read_table(spark, sf_dir, "documents").where(
        ~F.col("text").contains("<")
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
        F.col("text"),
    )
    head = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\n"
              "WARC-Target-URI: http://crawl.test/"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
              "Content-Type: application/http; msgtype=response\r\n"
              "Content-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
    )
    archives = docs.select(
        F.col("doc_id").alias("file_id"),
        F.concat(head, http, F.lit("\r\n\r\n")).cast("binary")
        .alias("content"),
    )
    return W.warc_text_documents(archives)


def q_curate_host_quota(spark, sf_dir):
    # Per-host quota (pipeline/url.py host_quota): cap docs per
    # canonical host so giant sites can't dominate the corpus; the
    # max_per_host smallest ids per host survive. URLs synthesized
    # from doc_id arithmetic (5 hosts), so the oracle is a plain
    # row_number over doc_id % 5.
    from net_spider_spark.pipeline import url as URL

    docs = demo.read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW.Host"), (d % 5).cast("string"),
            F.lit(".com:80/doc/"), d.cast("string"),
        ).alias("url"),
    )
    return URL.host_quota(urls, max_per_host=30).select(
        "doc_id", "host"
    )


def q_curate_sitemap_urls(spark, sf_dir):
    # Sitemap frontier expansion (pipeline/url.py sitemap_urls): a
    # two-entry <urlset> sitemap synthesized per document explodes
    # into its URL rows — regexp extraction kept in codegen, oracle
    # generates the frontier directly from doc_id arithmetic.
    from net_spider_spark.pipeline import url as URL

    docs = demo.read_table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit("<?xml version=\"1.0\"?><urlset><url><loc>"
              "http://crawl.test/"), d, F.lit("/a</loc></url>"
              "<url><loc>http://crawl.test/"), d,
        F.lit("/b</loc><priority>0.5</priority></url></urlset>"),
    )
    return URL.sitemap_urls(
        docs.select(F.col("doc_id").alias("sitemap_id"),
                    xml.alias("sitemap_xml"))
    )


def q_stream_warc_extract(spark, sf_dir):
    # The crawl front door AS A STREAM: WARC archives arriving on a
    # file stream, exploded + text-extracted in-flight (stateless
    # mapInPandas + codegen expressions, so it drops into a streaming
    # plan unchanged — no state store at all). availableNow replay
    # must hash-match the same analytic oracle as the batch
    # multimodal_warc_extract.
    from net_spider_spark.pipeline import warc as W

    docs = demo.read_table(spark, sf_dir, "documents")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    ).where(~F.col("text").contains("<"))
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
        F.col("text"),
    )
    head = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\n"
              "WARC-Target-URI: http://crawl.test/"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
              "Content-Type: application/http; msgtype=response\r\n"
              "Content-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
    )
    archives = stream.select(
        F.col("doc_id").alias("file_id"),
        F.concat(head, http, F.lit("\r\n\r\n")).cast("binary")
        .alias("content"),
    )
    out = W.warc_text_documents(archives)
    return _run_available_now(out, "stream_warc_sink", "append",
                              source_bytes=_table_bytes(sf_dir, "documents"))


def q_curate_url_dedup(spark, sf_dir):
    # URL-level dedup (pipeline/url.py): messy URL variants are
    # synthesized per document in expressions — uppercase scheme/host,
    # www. prefix, explicit :80, tracking params, permuted query
    # order, fragments — and url_dedup must collapse them onto the
    # canonical forms the oracle computes DIRECTLY, attesting every
    # canonicalization rule (lowercasing, www/port stripping,
    # tracking-param removal, param sorting, fragment dropping).
    from net_spider_spark.pipeline import url as URL

    docs = demo.read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    messy = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW.Site"), (d % 5).cast("string"),
            F.lit(".com:80/page/"), (d % 40).cast("string"),
            F.when(d % 3 == 0, F.lit("?utm_source=x&b=2&a=1"))
            .when(d % 3 == 1, F.lit("?a=1&b=2"))
            .otherwise(F.lit("")),
            F.when(d % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
        ).alias("url"),
    )
    return URL.url_dedup(messy)


def _robots_corpus(spark, sf_dir):
    # One robots.txt per synthesized host (doc_id % 5): hosts 0-3 carry
    # a badbot group (must be ignored for agent '*'), a '*' group with
    # disallow/allow/disallow rules plus three RFC 9309 wildcard rules
    # (mid-pattern *, a $ anchor, and a query-targeting /*?sid=), an
    # inline comment, an EMPTY
    # Disallow (must be dropped: empty = allow all), and a Crawl-delay
    # line (not a rule); host 4 has ONLY the badbot group, so every
    # URL on it falls through to allowed-by-default.
    docs = demo.read_table(spark, sf_dir, "documents")
    hosts = docs.select(
        (F.col("doc_id") % 5).cast("long").alias("h")
    ).distinct()
    body = F.when(
        F.col("h") == 4, F.lit("User-agent: badbot\nDisallow: /")
    ).otherwise(
        F.lit(
            "User-agent: badbot\nDisallow: /\n"
            "User-Agent: *\nDisallow: /private/   # staff only\n"
            "Allow: /private/ok/\nDisallow: /tmp\nDisallow:\n"
            "Disallow: /*.json$\nDisallow: /sea*rch$\n"
            "Disallow: /*?sid=\nCrawl-delay: 3"
        )
    )
    return hosts.select(
        F.concat(F.lit("host"), F.col("h").cast("string"), F.lit(".test"))
        .alias("host"),
        body.alias("robots_txt"),
    )


def q_curate_robots_rules(spark, sf_dir):
    # robots.txt parsing (pipeline/url.py robots_rules): group
    # detection, agent matching, comment stripping, empty-rule
    # dropping — the oracle knows exactly which (host, allow, prefix)
    # rows the synthesized corpus must produce, so the whole parser is
    # attested end-to-end.
    from net_spider_spark.pipeline import url as URL

    return URL.robots_rules(_robots_corpus(spark, sf_dir), agent="*")


def q_curate_robots_filter(spark, sf_dir):
    # RFC 9309 longest-match-wins filtering over a synthesized URL
    # frontier: /doc/ no rule match, /private/ disallowed,
    # /private/ok/ re-allowed by the LONGER allow rule, /tmp
    # disallowed, *.json$ disallowed by the wildcard-anchor rule,
    # .jsonx NOT matched (the $ anchor holds), /search?q= ALLOWED —
    # patterns match path+query, so the $-anchored /sea*rch$ must NOT
    # match once the query is kept — /item?sid= disallowed by the
    # query-targeting /*?sid= wildcard, the bare authority matched as
    # the root path '/', and every URL on the rule-less host 4
    # allowed by default. The oracle predicts allowed analytically
    # per doc_id.
    from net_spider_spark.pipeline import url as URL

    docs = demo.read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    path = (
        F.when(d % 8 == 0, F.concat(F.lit("/doc/"), d.cast("string")))
        .when(d % 8 == 1, F.concat(F.lit("/private/p"), d.cast("string")))
        .when(d % 8 == 2, F.concat(F.lit("/private/ok/q"), d.cast("string")))
        .when(d % 8 == 3, F.concat(F.lit("/tmp"), d.cast("string")))
        .when(d % 8 == 4, F.concat(F.lit("/data/"), d.cast("string"),
                                   F.lit(".json")))
        .when(d % 8 == 5, F.concat(F.lit("/files/f"), d.cast("string"),
                                   F.lit(".jsonx")))
        .when(d % 16 == 6, F.concat(F.lit("/search?q="), d.cast("string")))
        .when(d % 16 == 14, F.concat(F.lit("/item"), d.cast("string"),
                                     F.lit("?sid=track")))
        .otherwise(F.lit(""))  # bare authority: path must match as '/'
    )
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://host"), (d % 5).cast("string"), F.lit(".test"),
            path,
        ).alias("url"),
    )
    # host0 additionally disallows '/', so the bare-authority case
    # attests the RFC root-path rule (an empty extracted path must
    # match as '/'); the row is unioned rather than parsed so the
    # rules/frontier queries that share _robots_corpus stay unchanged.
    rules = URL.robots_rules(_robots_corpus(spark, sf_dir), agent="*")
    rules = rules.unionByName(
        spark.createDataFrame(
            [("host0.test", False, "/")],
            "host string, allow boolean, path_prefix string",
        )
    )
    return URL.robots_filter(urls, rules)


def q_graph_host_links(spark, sf_dir):
    # Host-level web graph from raw HTML (pipeline/url.py
    # extract_links + host_link_graph): each synthesized page carries
    # an absolute link, a relative link (same-host edge), and — every
    # third doc — a messy-cased absolute link whose host must
    # canonicalize (lowercase, www./:443 stripped). The oracle builds
    # the same edge list analytically and aggregates it.
    from net_spider_spark.pipeline import url as URL

    docs = demo.read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    html = F.concat(
        F.lit('<p><a href="http://host'), ((d + 1) % 5).cast("string"),
        F.lit('.test/p'), d.cast("string"), F.lit('">next</a>'),
        F.lit('<a href="/local/'), d.cast("string"), F.lit('">rel</a>'),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit('<a href="HTTPS://WWW.Host'),
                ((d + 2) % 5).cast("string"),
                F.lit('.test:443/x">cross</a>'),
            ),
        ).otherwise(F.lit("")),
    )
    pages = docs.select(
        "doc_id",
        html.alias("html"),
        F.concat(
            F.lit("http://www.host"), (d % 5).cast("string"),
            F.lit(".test:80/doc/"), d.cast("string"),
        ).alias("url"),
    )
    return URL.host_link_graph(URL.extract_links(pages))


def q_sketch_kmv_distinct(spark, sf_dir):
    # Approximate distinct users per event type via the portable KMV
    # sketch (k=16 so the estimator path actually runs — every event
    # type has more than 16 distinct users at every sf).
    return SK.kmv_distinct(
        _events_typed(spark, sf_dir), ["event_type"], "user_id", k=16
    )


def q_sketch_hll_distinct(spark, sf_dir):
    # HyperLogLog distinct-user estimate per event type, p=6 (64
    # registers). Everything engine-portable: md5-derived 60-bit hash,
    # rho from the binary-digits length (no libm clz), indicator sum
    # as exact dyadic terms 1/(1<<M) — the oracle replays the whole
    # construction and must match to the rounded 4 dp.
    return SK.hll_distinct(
        _events_typed(spark, sf_dir), ["event_type"], "user_id", p=6
    )


def q_sketch_hll_sparse(spark, sf_dir):
    # The SPARSE HLL representation (pipeline/sketch.py
    # hll_sketch_sparse + hll_estimate_sparse): same registers as the
    # dense path stored as a map of non-zero entries, estimate taken
    # straight off the map. Same construction as sketch_hll_distinct,
    # so the dense oracle applies verbatim — a hash mismatch here
    # means the sparse representation diverged from dense.
    sk = SK.hll_sketch_sparse(
        _events_typed(spark, sf_dir), ["event_type"], "user_id", p=6
    )
    return SK.hll_estimate_sparse(sk, p=6).drop("hll_sparse")


def q_text_bpe_encode_arrow(spark, sf_dir):
    # The ARROW encode path (pipeline/text.py _bpe_encode_stats_arrow,
    # method="arrow" forced): rank-based greedy encoder inside
    # mapInPandas with a per-partition distinct-word cache — the plan
    # whose depth is independent of vocabulary size (the expr chain is
    # one nested replace per merge, unusable at a real 32k-merge
    # vocab). Same oracle as text_bpe_encode: the Arrow encoder must
    # reproduce the unrolled-CTE replay byte-for-byte.
    docs = demo.read_table(spark, sf_dir, "documents")
    merges = TX.bpe_learn(docs, n_merges=BPE_N_MERGES)
    return TX.bpe_encode_stats(docs, merges, method="arrow")


def q_text_bpe_learned_dist(spark, sf_dir):
    # The DISTRIBUTED batched BPE round loop (driver fast path forced
    # off via driver_max_words=0): exact top-K pair table per round,
    # provably-sequential batch acceptance, chained literal replaces.
    # Must equal the sequential-spec oracle merge-for-merge — the same
    # unrolled-CTE oracle as text_bpe_learned, attesting that the
    # batching rules never deviate from the argmax sequence.
    docs = demo.read_table(spark, sf_dir, "documents")
    merges = TX.bpe_learn(
        docs, n_merges=BPE_N_MERGES, driver_max_words=0
    )
    return spark.createDataFrame(
        merges, "rank long, lhs string, rhs string, merged string, pair_count long"
    )


def q_sim_ivf_topk(spark, sf_dir):
    # IVF ANN with the deterministic md5-seeded coarse quantizer
    # (cluster.kmeans_fit — replaced MLlib KMeans, whose kmeans||
    # init drifts run to run and forced the old oracle to probe
    # exhaustively). n_probe=6 of 8: the oracle replays cells, probe
    # ranking, and the PRUNED result exactly, so the driver gate
    # attests the inverted-file pruning itself, like sim_ivfpq_topk.
    emb = demo.read_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    corpus = emb.where(F.col("vec_id") >= 5)
    return S.ivf_topk(
        queries_df, corpus, k=3, n_centroids=8, n_probe=6, iters=2
    )


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full snapshot-link query on sf0.001."""
    return q_snapshot_links_overwrite(spark, "/root/testdata/sf0.001")


def q_curate_topk_per_source(spark, sf_dir):
    # Per-source selection: keep each source's top-3 largest docs
    # (window row_number with a deterministic tie-break) — the
    # quota-per-domain pattern a curation run applies before mixing.
    # Scale note: the window partitions by source; one shuffle, no
    # global sort, skew bounded by per-source volume.
    from pyspark.sql import Window

    docs = demo.read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select(
            "doc_id", "source", "n_chars", F.row_number().over(w).alias("rk")
        )
        .where(F.col("rk") <= 3)
        .select("doc_id", "source", "n_chars", F.col("rk").cast("long").alias("rk"))
    )


def q_tpch_q18(spark, sf_dir):
    # TPC-H Q18 (large-volume customer): orders whose total lineitem
    # quantity exceeds 300, joined back to customer. The HAVING
    # aggregate runs once over lineitem (map-side partial sum), and the
    # tiny qualifying-order set then drives broadcast joins — the
    # aggregate-then-semi-join shape that survives a 100 TB lineitem.
    li = demo.read_table(spark, sf_dir, "lineitem")
    orders = demo.read_table(spark, sf_dir, "orders")
    cust = demo.read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.round("sum_qty", 4).alias("sum_qty"),
        )
    )


def q_graph_sssp(spark, sf_dir):
    # Weighted shortest paths (bounded Bellman-Ford, graph/sssp.py):
    # integer edge weights derived per link sample, min-aggregated per
    # directed edge; distances over paths of <= 6 hops from {'1','2'}.
    # The DuckDB oracle is a hop-bounded recursive CTE — identical
    # contract, bit-exact integer distances.
    from net_spider_spark.graph.sssp import shortest_paths

    ls = demo.events_link_samples(spark, sf_dir)
    edges = ls.select(
        F.col("subject_node").alias("src"),
        F.col("target_node").alias("dst"),
        (F.col("finding_id") % 10 + 1).alias("weight"),
    )
    return shortest_paths(edges, ["1", "2"], max_hops=6)


def q_snapshot_incremental_nodes(spark, sf_dir):
    # Incremental materialized-view maintenance (incremental.py): split
    # the findings into two "daily" batches, reduce batch 1 to the
    # latest-per-node state, then fold batch 2 into the STATE (never
    # re-touching batch 1's raw rows). Equality with the full-history
    # reduction is exactly what the oracle checks (a1's full-recompute
    # SQL) — the associativity proof, hash-verified.
    from net_spider_spark.incremental import fold_latest_nodes

    f = demo.events_findings(spark, sf_dir)
    b1 = f.where(F.col("finding_id") % 2 == 0)
    b2 = f.where(F.col("finding_id") % 2 == 1)
    state = fold_latest_nodes(None, b1)
    state = fold_latest_nodes(state, b2)
    return state.select("subject_node", "found_at", "finding_id")


def q_snapshot_incremental_links(spark, sf_dir):
    # Links-side incremental maintenance: per-pair winner state folded
    # over two batches (incremental.fold_latest_links) must equal the
    # full-history per-pair argmax — the same window-ranked oracle the
    # streaming view is checked against.
    from net_spider_spark.incremental import fold_latest_links

    f = demo.events_findings(spark, sf_dir)
    b1 = f.where(F.col("finding_id") % 2 == 0)
    b2 = f.where(F.col("finding_id") % 2 == 1)
    state = fold_latest_links(None, b1)
    state = fold_latest_links(state, b2)
    return state.select(
        "p1", "p2", "subject_node", "target_node", "link_state", "found_at"
    )


def q_text_lm_score(spark, sf_dir):
    # Self-trained bigram LM quality score (pipeline/text.ngram_lm_score,
    # the CCNet/KenLM-style signal): mean add-1-smoothed conditional
    # log-prob over each doc's distinct bigrams.
    docs = demo.read_table(spark, sf_dir, "documents")
    return TX.ngram_lm_score(docs)


def q_curate_split(spark, sf_dir):
    # Deterministic 80/10/10 train/val/test split: one codegen CASE
    # over md5-key hash ranges, zero shuffle; membership is a pure
    # function of (doc_id, seed), so a document can never migrate
    # between train and test across runs.
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.train_val_test_split(docs).select("doc_id", "split")


def q_sketch_kmv_merged(spark, sf_dir):
    # Sketch MERGEABILITY, hash-verified: per-event-type KMV sketches
    # merged n-way (sketch.kmv_merge_all) must equal the sketch built
    # directly over all events — the oracle computes the direct global
    # sketch, so any merge bug (truncation order, dedup, k-boundary)
    # breaks the match. This is the property that lets executors sketch
    # shards independently at 100 TB.
    ev = _events_typed(spark, sf_dir)
    per_group = SK.kmv_sketch(ev, ["event_type"], "user_id", k=16)
    merged = SK.kmv_merge_all(per_group, k=16)
    return SK.kmv_estimate(merged, k=16).select("n_kept", "est_distinct")


def q_sketch_kmv_setops(spark, sf_dir):
    # Audience overlap between event types WITHOUT joining the raw
    # events: per-type KMV user sketches (k=16 so the estimator path
    # runs), paired, and sketch.kmv_set_estimates derives the
    # union / intersection / Jaccard estimates from the sketch arrays
    # alone. The pair join touches only the sketch table (one row of
    # 16 longs per event type), so it is broadcast-trivial at any
    # corpus size — the whole point of sketch algebra at 100 TB.
    # The pair join is an INEQUALITY join (type_a < type_b), which
    # plans as BroadcastNestedLoop over two non-exchange-reusable
    # copies of the sketch subtree — r11 persisted the sketch table to
    # stop the double execution, but the pair plan still carried 23
    # Exchanges for a handful of rows. The sketch table is ONE row of
    # k longs per event type at ANY corpus size, so the round-12 shape
    # collects it (bounded, guarded) and crosses the pairs on the
    # driver: the aggregation chain runs exactly once during the
    # collect, the returned plan is a zero-exchange projection over a
    # local relation, and no persist lingers in the session.
    # Equivalence: UTF-8 byte order (Spark's string <) equals code
    # point order (Python's), and kmv arrays are exact longs, so the
    # pair set and every estimate expression are identical to the join
    # formulation — the guarded fallback below keeps the join path for
    # unbounded group counts.
    from net_spider_spark import sizing

    sk = SK.kmv_sketch(
        _events_typed(spark, sf_dir), ["event_type"], "user_id", k=16
    )
    max_types = 256
    rows = sk.limit(max_types + 1).collect()
    local = len(rows) <= max_types
    sizing._log_decision(
        "sketch_kmv_setops", len(rows), len(rows) * 16 * 8, local
    )
    if local:
        by_type = sorted(rows, key=lambda r: r["event_type"])
        pair_rows = [
            (ra["event_type"], ra["kmv"], rb["event_type"], rb["kmv"])
            for i, ra in enumerate(by_type)
            for rb in by_type[i + 1 :]
        ]
        pairs = spark.createDataFrame(
            pair_rows,
            "type_a string, kmv_a array<bigint>, "
            "type_b string, kmv_b array<bigint>",
        )
    else:  # unbounded group count: keep the distributed pair join
        sk = sk.persist()
        a = sk.select(
            F.col("event_type").alias("type_a"), F.col("kmv").alias("kmv_a")
        )
        b = sk.select(
            F.col("event_type").alias("type_b"), F.col("kmv").alias("kmv_b")
        )
        pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    return SK.kmv_set_estimates(pairs, k=16).drop("kmv_a", "kmv_b")


def q_curate_temperature_mixture(spark, sf_dir):
    # Temperature mixing at alpha=0.5: weight per source = sqrt(count).
    # Every quota operation is IEEE correctly-rounded (no normalizing
    # sum), so DuckDB derives bit-identical quotas from the counts.
    docs = demo.read_table(spark, sf_dir, "documents")
    return CU.temperature_mixture_sample(docs, alpha=0.5).select(
        "doc_id", "source", "mix_rank"
    )


def q_events_funnel(spark, sf_dir):
    # Ordered funnel over the event stream: users completing
    # signup -> click -> purchase in order (min-timestamp chaining,
    # pipeline/events.funnel). Levels shrink monotonically, so every
    # join after the first is broadcast-sized at corpus scale.
    return EV.funnel(
        _events_typed(spark, sf_dir), stages=("signup", "click", "purchase")
    )


def q_embed_truncate(spark, sf_dir):
    # Matryoshka truncation: first-16-dims unit vectors + retention
    # metrics (similarity.matryoshka_truncate). One codegen projection;
    # the oracle recomputes the norms with DuckDB list lambdas.
    emb = demo.read_table(spark, sf_dir, "embeddings")
    return S.matryoshka_truncate(emb, k=16).select(
        "vec_id", "norm_full", "norm_k", "retention"
    )


def q_temporal_asof_forward(spark, sf_dir):
    # The forward as-of variant with the full option surface: each
    # click gains the user's NEXT purchase strictly after it
    # (allow_exact_matches=False) and only within a 1-hour tolerance —
    # time-to-conversion. Same union+window plan as backward: no range
    # join, no explosion.
    ev = _events_typed(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_ms"
    )
    # dedupe equal-(user, ts) purchases; forward tie-break keeps the
    # LEAST ref_order, so collapse to min event_id per timestamp.
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_ms")
        .agg(
            F.min("event_id").alias("p_id"),
            F.min_by("value", "event_id").alias("p_value"),
        )
    )
    out = TP.asof_join(
        clicks,
        purchases,
        on="ts_ms",
        by=["user_id"],
        ref_cols=["p_id", "p_value"],
        direction="forward",
        allow_exact_matches=False,
        tolerance=3_600_000,
        ref_order="p_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.coalesce("asof_ts_ms", F.lit(-1)).alias("asof_ts_ms"),
        F.coalesce("asof_p_id", F.lit(-1)).alias("asof_p_id"),
        F.coalesce("asof_p_value", F.lit(-1.0)).alias("asof_p_value"),
    )


def q_multimodal_audio_decode(spark, sf_dir):
    # REAL WAV decode through the Spark plumbing: synthesize PCM WAV
    # payloads (numpy, parameterized per event), run them through
    # pipeline.multimodal.audio_features (mapInPandas decode), and emit
    # the decoded container facts. The oracle predicts those facts
    # analytically from the generation parameters — so a decode bug
    # (chunk walk, fmt parse, frame math) breaks the hash match.
    import math
    import struct

    import numpy as np
    import pandas as pd

    from net_spider_spark.pipeline import multimodal as MM

    ev = _spread_ids(
        _events_typed(spark, sf_dir)
        .where(F.col("event_id") % 20 == 0)
        .select("event_id"),
        n_rows=_events_rows_hint(sf_dir, 20),
    )

    def synth(batches):
        for pdf in batches:
            payloads = []
            for eid in pdf["event_id"]:
                eid = int(eid)
                rate = 8000
                n = 400 + eid % 100
                channels = 1 + eid % 2
                freq = 200.0 + (eid % 10) * 50.0
                t = np.arange(n) / rate
                x = np.repeat(
                    (np.sin(2 * math.pi * freq * t) * 32767).astype("<i2"),
                    channels,
                ).tobytes()
                fmt = struct.pack(
                    "<HHIIHH", 1, channels, rate, rate * channels * 2,
                    channels * 2, 16,
                )
                body = (
                    b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(x)) + x
                )
                payloads.append(b"RIFF" + struct.pack("<I", len(body)) + body)
            yield pd.DataFrame(
                {
                    "media_id": pdf["event_id"],
                    "mime": "audio/wav",
                    "payload": payloads,
                    "meta": [None] * len(pdf),
                }
            )

    media = ev.mapInPandas(
        synth,
        schema="media_id bigint, mime string, payload binary, "
        "meta map<string,string>",
    )
    return MM.audio_features(media).select(
        "media_id", "sample_rate", "n_frames", "n_channels", "duration_s"
    )


def q_multimodal_image_decode(spark, sf_dir):
    # REAL BMP decode through image_features: synthesize solid-color
    # 24-bit BMPs (width/height/color parameterized per event, with the
    # 4-byte row padding the decoder must skip), decode, and emit
    # dimensions + channel means — all analytically predictable by the
    # oracle, so a stride/channel-order bug fails the hash match.
    import struct

    import numpy as np
    import pandas as pd

    from net_spider_spark.pipeline import multimodal as MM

    ev = _spread_ids(
        _events_typed(spark, sf_dir)
        .where(F.col("event_id") % 25 == 0)
        .select("event_id"),
        n_rows=_events_rows_hint(sf_dir, 25),
    )

    def synth(batches):
        for pdf in batches:
            payloads = []
            for eid in pdf["event_id"]:
                eid = int(eid)
                w = 5 + eid % 7  # exercises every stride-padding case
                h = 3 + eid % 5
                r, g, b = eid % 256, (eid * 7) % 256, (eid * 13) % 256
                px = np.zeros((h, w, 3), dtype=np.uint8)
                px[:, :, 0], px[:, :, 1], px[:, :, 2] = r, g, b
                stride = ((w * 3) + 3) & ~3
                rows = np.zeros((h, stride), dtype=np.uint8)
                rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
                data = rows.tobytes()
                header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
                info = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0
                )
                payloads.append(header + info + data)
            yield pd.DataFrame(
                {
                    "media_id": pdf["event_id"],
                    "mime": "image/bmp",
                    "payload": payloads,
                    "meta": [None] * len(pdf),
                }
            )

    media = ev.mapInPandas(
        synth,
        schema="media_id bigint, mime string, payload binary, "
        "meta map<string,string>",
    )
    return MM.image_features(media).select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b"
    )


def q_multimodal_png_decode(spark, sf_dir):
    # REAL PNG decode through image_features: synthesize 8-bit PNGs
    # (zlib deflate + per-row filter) with a vertical gradient so the
    # Up/Sub/Average/Paeth unfilter paths all reconstruct non-trivial
    # predictions, cycling color type (gray/RGB/RGBA) and filter type
    # per event. Width/height/channel means are analytically
    # predictable, so any unfilter or channel-order bug fails the hash.
    import numpy as np
    import pandas as pd

    from net_spider_spark.pipeline import multimodal as MM

    ev = _spread_ids(
        _events_typed(spark, sf_dir)
        .where(F.col("event_id") % 25 == 13)
        .select("event_id"),
        n_rows=_events_rows_hint(sf_dir, 25),
    )

    def synth(batches):
        for pdf in batches:
            payloads = []
            for eid in pdf["event_id"]:
                eid = int(eid)
                w, h = 4 + eid % 6, 3 + eid % 5
                base = eid % 199
                channels = (1, 3, 4)[eid % 3]
                y = np.arange(h, dtype=np.uint8)[:, None, None]
                c = np.arange(channels, dtype=np.uint8)[None, None, :]
                img = np.broadcast_to(
                    base + 10 * c + y, (h, w, channels)
                ).astype(np.uint8)
                payloads.append(MM.encode_png(img, filter_type=eid % 5))
            yield pd.DataFrame(
                {
                    "media_id": pdf["event_id"],
                    "mime": "image/png",
                    "payload": payloads,
                    "meta": [None] * len(pdf),
                }
            )

    media = ev.mapInPandas(
        synth,
        schema="media_id bigint, mime string, payload binary, "
        "meta map<string,string>",
    )
    return MM.image_features(media).select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b"
    )


def q_multimodal_gif_decode(spark, sf_dir):
    # REAL GIF decode through image_features: synthesize solid-color
    # single-palette GIFs with a degenerate-but-valid LZW stream (clear
    # code before every pixel code keeps the code width constant), so
    # decode_gif's LZW + palette + dimensions run under the oracle;
    # richer dictionary-growth streams are pinned by the pytest
    # round-trip against a real LZW encoder.
    import struct as _struct

    import pandas as pd

    from net_spider_spark.pipeline import multimodal as MM

    ev = _spread_ids(
        _events_typed(spark, sf_dir)
        .where(F.col("event_id") % 25 == 7)
        .select("event_id"),
        n_rows=_events_rows_hint(sf_dir, 25),
    )

    def solid_gif(w, h, rgb):
        pal = bytes(rgb) + b"\x00\x00\x00" * 3  # 4-entry table, mcs 2
        hdr = b"GIF89a" + _struct.pack("<HHBBB", w, h, 0x81, 0, 0) + pal
        img = b"\x2C" + _struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        codes = [4]
        for _ in range(w * h - 1):
            codes += [0, 4]
        codes += [0, 5]  # last pixel + end code, all 3-bit
        acc = bits = 0
        data = bytearray()
        for c in codes:
            acc |= c << bits
            bits += 3
            while bits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                bits -= 8
        if bits:
            data.append(acc & 0xFF)
        sub = b""
        for i in range(0, len(data), 255):
            chunk = bytes(data[i : i + 255])
            sub += bytes([len(chunk)]) + chunk
        return hdr + img + b"\x02" + sub + b"\x00" + b"\x3B"

    def synth(batches):
        for pdf in batches:
            payloads = []
            for eid in pdf["event_id"]:
                eid = int(eid)
                payloads.append(
                    solid_gif(
                        3 + eid % 5,
                        2 + eid % 4,
                        (eid % 256, (eid * 11) % 256, (eid * 17) % 256),
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["event_id"],
                    "mime": "image/gif",
                    "payload": payloads,
                    "meta": [None] * len(pdf),
                }
            )

    media = ev.mapInPandas(
        synth,
        schema="media_id bigint, mime string, payload binary, "
        "meta map<string,string>",
    )
    return MM.image_features(media).select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b"
    )


def q_multimodal_media_metadata(spark, sf_dir):
    # REAL MP3/MP4 container-metadata extraction (no decode): even ids
    # synthesize CBR MPEG1-L3 header streams (duration = n*1152/rate,
    # bitrate from the frame header table), odd ids ISO-BMFF skeletons
    # (mvhd duration/timescale, tkhd 16.16 dims, per-track hdlr). All
    # outputs are analytic functions of event_id, so DuckDB reproduces
    # them bit-for-bit — including the IEEE double divisions.
    import pandas as pd

    from net_spider_spark.pipeline import multimodal as MM

    ev = _spread_ids(
        _events_typed(spark, sf_dir)
        .where(F.col("event_id") % 25 == 3)
        .select("event_id"),
        n_rows=_events_rows_hint(sf_dir, 25),
    )

    def synth(batches):
        for pdf in batches:
            payloads = []
            for eid in pdf["event_id"]:
                eid = int(eid)
                if eid % 2 == 0:
                    payloads.append(
                        MM.encode_mp3_frames(
                            10 + eid % 20,
                            bitrate_idx=1 + eid % 3,
                            rate_idx=eid % 3,
                            channels=1 if eid % 4 == 0 else 2,
                            id3_bytes=eid % 100,
                        )
                    )
                else:
                    payloads.append(
                        MM.encode_mp4_skeleton(
                            16 * (1 + eid % 8),
                            16 * (1 + eid % 6),
                            1000 + eid % 5000,
                            with_audio=bool(eid % 4 == 1),
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["event_id"],
                    "mime": None,
                    "payload": payloads,
                    "meta": [None] * len(pdf),
                }
            )

    media = ev.mapInPandas(
        synth,
        schema="media_id bigint, mime string, payload binary, "
        "meta map<string,string>",
    )
    meta = MM.media_metadata(media)
    # Not-applicable fields are NULL in the operator; the contract
    # output coalesces them to -1 so row sorting/hashing never
    # compares NULL against a value (the nullability itself is pinned
    # by tests/test_multimodal_ingest.py).
    def nn(c, t):
        return F.coalesce(F.col(c), F.lit(-1).cast(t)).alias(c)

    return meta.select(
        "media_id", "format", nn("duration_s", "double"),
        nn("bitrate_kbps", "double"), nn("sample_rate", "bigint"),
        nn("channels", "int"), nn("n_frames", "bigint"),
        nn("width", "int"), nn("height", "int"), nn("n_tracks", "int"),
    )


def q_multimodal_jpeg_progressive(spark, sf_dir):
    # REAL progressive (SOF2) decode through image_features: the full
    # spectral-selection + successive-approximation scan script runs
    # under the oracle. Solid grayscale at quality 100 reconstructs
    # exactly (unit quantization, DC-only — the refinement scans
    # restore every DC bit), so dimensions and channel means are
    # analytic; general-image fidelity is pinned by the pytest
    # bit-exact-vs-baseline assertion.
    import pandas as pd

    from net_spider_spark.pipeline import multimodal as MM
    from net_spider_spark.pipeline.jpeg import encode_jpeg_progressive

    ev = _spread_ids(
        _events_typed(spark, sf_dir)
        .where(F.col("event_id") % 25 == 11)
        .select("event_id"),
        n_rows=_events_rows_hint(sf_dir, 25),
    )

    def synth(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            for eid in pdf["event_id"]:
                eid = int(eid)
                w, h = 3 + eid % 6, 2 + eid % 5
                img = np.full((h, w, 3), eid % 256, dtype=np.uint8)
                payloads.append(
                    encode_jpeg_progressive(
                        img, quality=100, subsample=bool(eid % 2)
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["event_id"],
                    "mime": "image/jpeg",
                    "payload": payloads,
                    "meta": [None] * len(pdf),
                }
            )

    media = ev.mapInPandas(
        synth,
        schema="media_id bigint, mime string, payload binary, "
        "meta map<string,string>",
    )
    return MM.image_features(media).select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b"
    )


def q_multimodal_jpeg_decode(spark, sf_dir):
    # REAL baseline-JPEG decode through image_features: solid GRAYSCALE
    # images at quality 100 (unit quantization) reconstruct EXACTLY —
    # cb=cr=0 and a DC-only luma plane survive the DCT round trip bit
    # for bit — so dimensions AND channel means are analytically
    # predictable despite JPEG being lossy in general. Subsampling and
    # restart intervals cycle per event to cover the MCU/RSTn paths
    # under the oracle; lossy-path fidelity is pinned by PSNR tests.
    import pandas as pd

    from net_spider_spark.pipeline import multimodal as MM
    from net_spider_spark.pipeline.jpeg import encode_jpeg

    ev = _spread_ids(
        _events_typed(spark, sf_dir)
        .where(F.col("event_id") % 25 == 19)
        .select("event_id"),
        n_rows=_events_rows_hint(sf_dir, 25),
    )

    def synth(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            for eid in pdf["event_id"]:
                eid = int(eid)
                w, h = 3 + eid % 6, 2 + eid % 5
                img = np.full((h, w, 3), eid % 256, dtype=np.uint8)
                payloads.append(
                    encode_jpeg(
                        img,
                        quality=100,
                        subsample=bool(eid % 2),
                        restart_interval=eid % 3,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["event_id"],
                    "mime": "image/jpeg",
                    "payload": payloads,
                    "meta": [None] * len(pdf),
                }
            )

    media = ev.mapInPandas(
        synth,
        schema="media_id bigint, mime string, payload binary, "
        "meta map<string,string>",
    )
    return MM.image_features(media).select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b"
    )


def _spread_ids(df, n_rows=None):
    """Round-robin a parameter-only projection across the session's
    cores before a heavy per-row mapInPandas synthesis/decode stage.
    The sf tables are single parquet files — ONE scan split at every
    scale factor — so without this the entire payload render+decode
    runs in a single task regardless of core count (measured 8.5 s ->
    3.6 s on dedup_image_phash at sf0.1, identical output). Only the
    id/parameter rows cross the exchange; the heavy bytes come into
    existence after it (the §8 move-small-rows shape). Works on batch
    and streaming DataFrames alike.

    ``n_rows``: optional row-count hint (parquet-footer arithmetic, see
    :func:`_table_rows`) capping the width at
    ceil(n_rows / sizing.SPREAD_ROWS_PER_TASK) — an unconditional
    defaultParallelism spread put 32 tasks under a few thousand rows
    and several of these queries ran FASTER at 8 cores than 32
    (round-11 verdict item 3). At corpus scale the cap never binds."""
    from net_spider_spark import sizing

    spark = df.sparkSession
    return df.repartition(sizing.spread_width(spark, n_rows))


def _table_rows(sf_dir: str, table: str):
    """Row count of one sf table from parquet FOOTERS only — no Spark
    job. Used as a spread-width hint (scheduling only, never results);
    returns None when unknowable."""
    import pyarrow.parquet as _pq

    p = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(p):
            return sum(
                _pq.ParquetFile(os.path.join(r, f)).metadata.num_rows
                for r, _, fs in os.walk(p)
                for f in fs
                if f.endswith(".parquet")
            )
        return _pq.ParquetFile(p).metadata.num_rows
    except Exception:
        return None


def _events_rows_hint(sf_dir: str, divisor: int):
    """Width hint for the media queries' ``event_id % divisor`` spreads:
    the events row count scaled by the filter's selectivity."""
    nr = _table_rows(sf_dir, "events")
    return None if nr is None else max(1, nr // divisor)


def _synth_class_media(ev, n_rows=None):
    ev = _spread_ids(ev, n_rows=n_rows)
    # Shared media synthesizer for the perceptual-dedup queries (batch
    # AND streaming — the mapInPandas is stateless): each event renders
    # one of 6 fixed photo-like pictures (class = event_id % 6),
    # encoded LOSSLESSLY as BMP / PNG / PPM by event_id % 3, so
    # same-class payloads have different bytes but identical pixels ->
    # identical pHash (Hamming 0), while inter-class pHash distances
    # are >> any tight threshold (smoothed-noise pictures; measured
    # 26-38 bits). The dup structure is therefore analytically
    # predictable from event_id alone — which is what lets plain SQL
    # oracle a perceptual-hash operator without image math.
    import pandas as pd

    from net_spider_spark.pipeline import multimodal as MM

    def synth(batches):
        import struct

        import numpy as np
        from numpy.lib.stride_tricks import sliding_window_view

        def picture(cls: int) -> "np.ndarray":
            # smoothed random noise: photo-like spectrum, so the pHash
            # low-frequency block is well-populated (no near-median
            # coefficient instability)
            r = np.random.RandomState(cls)
            n = r.rand(12, 16) * 255
            big = np.kron(n, np.ones((4, 4)))
            pad = np.pad(big, 2, mode="edge")
            k = np.ones(25) / 25
            sm = sliding_window_view(pad, (5, 5)).reshape(48, 64, 25) @ k
            return (
                np.stack([sm, sm * 0.9 + 10, 255 - sm * 0.5], axis=2)
                .clip(0, 255)
                .astype(np.uint8)
            )

        def to_bmp(px: "np.ndarray") -> bytes:
            h, w = px.shape[:2]
            stride = ((w * 3) + 3) & ~3
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
            data = rows.tobytes()
            header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
            info = struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0
            )
            return header + info + data

        def to_ppm(px: "np.ndarray") -> bytes:
            h, w = px.shape[:2]
            return b"P6 %d %d 255\n" % (w, h) + px.tobytes()

        pics = {c: picture(c) for c in range(6)}
        for pdf in batches:
            payloads, mimes = [], []
            for eid in pdf["event_id"]:
                eid = int(eid)
                px = pics[eid % 6]
                fmt = eid % 3
                if fmt == 0:
                    payloads.append(to_bmp(px))
                    mimes.append("image/bmp")
                elif fmt == 1:
                    payloads.append(MM.encode_png(px, filter_type=eid % 5))
                    mimes.append("image/png")
                else:
                    payloads.append(to_ppm(px))
                    mimes.append("image/x-portable-pixmap")
            yield pd.DataFrame(
                {
                    "media_id": pdf["event_id"],
                    "mime": mimes,
                    "payload": payloads,
                    "meta": [None] * len(pdf),
                }
            )

    return ev.mapInPandas(
        synth,
        schema="media_id bigint, mime string, payload binary, "
        "meta map<string,string>",
    )


def q_dedup_image_phash(spark, sf_dir):
    # Perceptual image dedup over RE-ENCODED copies — the case byte
    # digests cannot catch. See _synth_class_media for why the dup
    # structure is analytic: a media row is a duplicate iff it is not
    # the smallest event_id of its class, which the oracle computes
    # with one window function.
    from net_spider_spark.pipeline import dedup as DD
    from net_spider_spark.pipeline import multimodal as MM

    ev = (
        _events_typed(spark, sf_dir)
        .where(F.col("event_id") % 25 == 21)
        .select("event_id")
    )
    # _synth_class_media spreads the ids itself
    hashes = MM.image_phash(
        _synth_class_media(ev, n_rows=_events_rows_hint(sf_dir, 25))
    )
    return DD.image_phash_dedup(hashes, max_hamming=2).select(
        "media_id", "is_dup"
    )


def q_stream_dedup_phash(spark, sf_dir):
    # Streaming perceptual dedup: the same class corpus arriving as a
    # stream; stream_dedup_phash keeps min(media_id) per pHash in
    # update mode (state = one row per distinct picture). The final
    # per-hash minimum over the replay equals the smallest event_id of
    # each class — 6 keeper rows the oracle computes from event_id
    # arithmetic alone.
    from net_spider_spark.streaming.dedup import stream_dedup_phash

    _, stream = _events_stream(spark, sf_dir)
    ev = stream.where(F.col("event_id") % 25 == 21).select("event_id")
    out = stream_dedup_phash(
        _synth_class_media(ev, n_rows=_events_rows_hint(sf_dir, 25))
    )
    res = _run_available_now(out, "stream_phash_sink", "update",
                             source_bytes=_table_bytes(sf_dir, "events"))
    # update-mode sink holds every intermediate per-key emission; the
    # final state per hash is the min across them.
    return (
        res.groupBy("phash")
        .agg(F.min("keeper_id").alias("keeper_id"))
        .select("keeper_id")
    )


def q_stream_dedup_phash_near(spark, sf_dir):
    # Streaming NEAR-duplicate perceptual dedup (streaming/dedup.py
    # _phash_near_stream): band-sliced applyInPandasWithState so a
    # hash within max_hamming of an EARLIER arrival is flagged
    # in-stream — the case the exact-hash keeper misses. Hashes are
    # synthesized analytically: 8 classes in 4 families, each family
    # a base constant (pairwise hamming >= 31) and its 1-bit
    # perturbation, so the dominated verdict is pure event-id
    # arithmetic for the oracle: dup iff a smaller id exists in the
    # same family.
    from net_spider_spark.streaming.dedup import (
        _phash_near_stream,
        phash_near_keepers,
    )

    _, stream = _events_stream(spark, sf_dir)
    bases = [
        0x0123456789ABCDEF,
        0x7EDCBA9876543210,
        0x5555AAAA3333CCCC,
        0x0F0F0F0FF0F0F0F0,
    ]
    ev = stream.where(F.col("event_id") % 25 == 3)
    hashes = ev.select(
        F.col("event_id").alias("media_id"),
        (
            F.element_at(
                F.array(*[F.lit(b) for b in bases]),
                (F.floor((F.col("event_id") % 8) / 2) + 1).cast("int"),
            ).bitwiseXOR((F.col("event_id") % 2).cast("long"))
        ).alias("phash"),
    )
    out = _phash_near_stream(hashes, max_hamming=2, bands=4)
    sink = _run_available_now(out, "stream_phash_near_sink", "append",
                              source_bytes=_table_bytes(sf_dir, "events"))
    return (
        phash_near_keepers(sink)
        .select("media_id", "is_dup")
        .orderBy("media_id")
    )


def _table_bytes(sf_dir: str, table: str):
    """On-disk bytes of one sf table (single file or directory)."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(p):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(p)
                for f in fs
            )
        return os.path.getsize(p)
    except OSError:
        return None


def _replay_state_partitions(spark, source_bytes) -> int:
    """Stateful-shuffle width for an availableNow replay, sized by the
    SOURCE bytes instead of inherited cluster width: each state
    partition costs a store open + per-batch commit, so 32 stores for
    kilobytes of state is pure spin-up (measured ~2x the whole replay
    wall at sf0.1). ~64 MB of source per partition, floored at
    min(8, cores) to keep the stateful operator's compute parallel,
    capped at the session's parallelism — at corpus scale the byte
    term dominates and the cap binds, so this never narrows a real
    cluster. SPARK_GRAFT_STREAM_STATE_PARTS overrides for deployment
    tuning. Partitioning never changes the emitted rows — only where
    each key's state lives."""
    import math

    env = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS")
    if env:
        return max(1, int(env))
    dp = spark.sparkContext.defaultParallelism
    if source_bytes is None:
        return min(32, dp)
    by_size = max(1, math.ceil(source_bytes / (64 << 20)))
    return max(min(8, dp), min(dp, by_size))


def _run_available_now(
    stream_df, name: str, output_mode: str, source_bytes=None
):
    """Run a streaming DataFrame to completion with availableNow into a
    memory sink and return the sink contents as a batch DataFrame.

    The state-store count of a new streaming query is fixed by
    ``spark.sql.shuffle.partitions`` at its first micro-batch, so set
    it for the stream's lifetime from the replayed source's size
    (:func:`_replay_state_partitions`) and restore it after. Results
    are identical at any width — this is spin-up cost only.
    """
    import shutil
    import tempfile

    spark = stream_df.sparkSession
    ckpt = tempfile.mkdtemp(prefix=f"nss_ckpt_{name}_")
    conf_key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(conf_key)
    try:
        parts = _replay_state_partitions(spark, source_bytes)
        if int(old) != parts:
            spark.conf.set(conf_key, str(parts))
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, old)
    out = spark.table(name)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def _events_stream(spark, sf_dir):
    """The events table as a file-source structured stream (the batch
    read only supplies the schema)."""
    ev = demo.read_table(spark, sf_dir, "events")
    # events.parquet is a single file; the file-stream source wants a
    # directory, so stream the sf dir filtered down to that one file.
    stream = (
        spark.readStream.schema(ev.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return ev, stream


def q_stream_dedup_digests(spark, sf_dir):
    # Streaming exact dedup: the documents table replayed as a stream,
    # first occurrence per content digest kept by dropDuplicates state
    # (state = one row per distinct digest — the streaming face of
    # pipeline.dedup.exact_duplicates, forever mode: streaming/dedup.py
    # documents the RocksDB state-store + watermark-TTL lifecycle).
    # Emitting only the digest keeps the result deterministic (which
    # doc_id survives a within-batch tie depends on partition order;
    # the digest set does not).
    from net_spider_spark.streaming.dedup import stream_dedup_digests

    docs = demo.read_table(spark, sf_dir, "documents")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    res = _run_available_now(
        stream_dedup_digests(stream), "stream_dd_sink", "append",
        source_bytes=_table_bytes(sf_dir, "documents"),
    )
    return res.select("digest").distinct()


def q_stream_sessionize(spark, sf_dir):
    # Native Structured-Streaming session windows (the streaming face
    # of pipeline.events.sessionize): per-user sessions close after 30
    # minutes of inactivity; append mode emits a session once the 2h
    # watermark passes its end (last event + gap). The oracle rebuilds
    # the same sessions with gaps-and-islands SQL and applies the same
    # closed-session rule explicitly.
    ev, stream = _events_stream(spark, sf_dir)
    evs = stream.select(
        "user_id",
        F.timestamp_millis(demo.ts_epoch_ms(stream)).alias("event_time"),
    )
    agg = (
        evs.withWatermark("event_time", "2 hours")
        .groupBy(
            "user_id", F.session_window("event_time", "30 minutes").alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    res = _run_available_now(agg, "stream_sess_sink", "append",
                             source_bytes=_table_bytes(sf_dir, "events"))
    return res.select(
        "user_id",
        F.unix_millis("sw.start").alias("session_start_ms"),
        F.unix_millis("sw.end").alias("session_end_ms"),
        "n_events",
    )


def q_stream_stream_join(spark, sf_dir):
    # Stream-stream inner join with event-time bounds: clicks joined to
    # the same user's purchases within the following 4 hours, both
    # sides replayed as watermarked streams. The time-range predicate
    # is what lets Spark bound the join state (state retention derives
    # from watermark + range); with availableNow every qualifying pair
    # emits, so the oracle is the equivalent batch interval join.
    ev, stream = _events_stream(spark, sf_dir)
    base = stream.select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_millis(demo.ts_epoch_ms(stream)).alias("event_time"),
    )
    clicks = (
        base.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("event_time").alias("c_time"),
        )
        .withWatermark("c_time", "2 hours")
    )
    purchases = (
        base.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("event_time").alias("p_time"),
        )
        .withWatermark("p_time", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_time") > F.col("c_time"))
        & (F.col("p_time") <= F.col("c_time") + F.expr("INTERVAL 4 HOURS")),
    )
    res = _run_available_now(joined, "stream_ssj_sink", "append",
                             source_bytes=_table_bytes(sf_dir, "events"))
    return res.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        F.unix_millis("c_time").alias("click_ms"),
        F.unix_millis("p_time").alias("purchase_ms"),
    )


def q_stream_windowed_stats(spark, sf_dir):
    # Structured-Streaming face of the hourly rollup (windows.py:30):
    # watermarked tumbling windows over the events file stream, append
    # mode — only windows the 2h watermark has closed are emitted,
    # which the oracle mirrors with an explicit max(ts)-7200000 bound.
    from net_spider_spark.streaming.windows import stream_windowed_stats

    ev, stream = _events_stream(spark, sf_dir)
    evs = stream.select(
        "event_type",
        "value",
        F.timestamp_millis(demo.ts_epoch_ms(stream)).alias("event_time"),
    )
    out = stream_windowed_stats(
        evs,
        ts_col="event_time",
        group_cols=("event_type",),
        value_col="value",
        window="1 hour",
        watermark="2 hours",
    )
    res = _run_available_now(out, "stream_ws_sink", "append",
                             source_bytes=_table_bytes(sf_dir, "events"))
    return res.select(
        "event_type",
        F.unix_millis("window_start").alias("window_start_ms"),
        F.unix_millis("window_end").alias("window_end_ms"),
        "n_events",
        F.round("value_sum", 4).alias("value_sum"),
        "value_min",
        "value_max",
    )


def q_stream_latest_per_node(spark, sf_dir):
    # A1 (latest-per-node) maintained incrementally by
    # applyInPandasWithState (streaming/ingest.py:162), replayed over
    # the sf events parquet with availableNow. The update-mode sink
    # holds one row per key per micro-batch in which it improved; the
    # final state is the per-key maximum, which must equal the batch
    # groupBy-max the oracle runs.
    from net_spider_spark.streaming.ingest import stream_latest_per_node

    ev, stream = _events_stream(spark, sf_dir)
    findings = demo.events_findings_from(stream)
    out = stream_latest_per_node(findings)
    res = _run_available_now(out, "stream_lpn_sink", "update",
                             source_bytes=_table_bytes(sf_dir, "events"))
    return res.groupBy("subject_node").agg(
        F.max("found_at").alias("found_at")
    )


def q_stream_latest_link_per_pair(spark, sf_dir):
    # A3 (latestLinkSample) as a stream (streaming/ingest.py:236):
    # explode links, key by unordered endpoint pair, keep the winner
    # under the batch unify ordering (found_at, finding_id, link_pos).
    # Every finding here has exactly one link (link_pos=0), so the
    # oracle's (found_at, finding_id) window ordering is identical.
    from net_spider_spark.streaming.ingest import stream_latest_link_per_pair

    ev, stream = _events_stream(spark, sf_dir)
    findings = demo.events_findings_from(stream)
    out = stream_latest_link_per_pair(findings)
    res = _run_available_now(out, "stream_llp_sink", "update",
                             source_bytes=_table_bytes(sf_dir, "events"))
    # Reduce update-mode emissions under the full batch-unify ordering
    # (found_at, finding_id, link_pos), not found_at alone: with >1
    # micro-batch (maxFilesPerTrigger, multi-file table), two emissions
    # for a pair can tie on found_at and the winner must not depend on
    # batch boundaries.
    return (
        res.groupBy("p1", "p2")
        .agg(
            F.max_by(
                F.struct(
                    "subject_node", "target_node", "link_state", "found_at"
                ),
                F.struct("found_at", "finding_id", "link_pos"),
            ).alias("s")
        )
        .select("p1", "p2", "s.*")
    )


def q_stream_rpl_dio_merged(spark, sf_dir):
    # The reference's flagship CUSTOM unifier (dioUnifierConf two-
    # endpoint merge, DIO.hs:255-279) maintained incrementally
    # (streaming/ingest.py stream_unified_link_per_pair): state = each
    # side's latest sample, re-merged per micro-batch. Emissions are
    # reduced by the monotone _state_ord key (the merged row's found_at
    # is NOT monotone — a winner flip can adopt the other side's older
    # timestamp). Oracle = the batch rpl_dio_merged SQL WITHOUT the
    # overwrite `kept` CTE: the stream folds over every sample in the
    # history (per-side latest across all findings — append policy),
    # not just each node's newest finding.
    from net_spider_spark.rpl.dio import dio_unifier_conf
    from net_spider_spark.streaming.ingest import stream_unified_link_per_pair

    ev, stream = _events_stream(spark, sf_dir)
    findings = demo.events_findings_dio_from(stream)
    out = stream_unified_link_per_pair(findings, dio_unifier_conf())
    res = _run_available_now(out, "stream_dio_sink", "update",
                             source_bytes=_table_bytes(sf_dir, "events"))
    final = (
        res.groupBy("p1", "p2")
        .agg(
            F.max_by(
                F.struct(
                    "subject_node", "target_node", "link_state",
                    "found_at", "link_attrs",
                ),
                F.col("_state_ord"),
            ).alias("s")
        )
        .select("s.*")
        .where(F.col("link_state") == "to_target")
    )
    a = F.col("link_attrs")

    def attr(k):
        return F.coalesce(a.getItem(k), F.lit("")).alias(k)

    return final.select(
        F.col("subject_node").alias("source_node"),
        F.col("target_node").alias("dest_node"),
        F.lit(True).alias("is_directed"),
        F.col("found_at").alias("link_ts"),
        attr("source_neighbor_type"),
        attr("source_neighbor_rank"),
        attr("source_metric"),
        attr("dest_neighbor_type"),
        attr("dest_neighbor_rank"),
        attr("dest_metric"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordered stalest-evidence-first for the time-budgeted driver gate
    # (first ~50 keys). Recomputed at r12 close by tools/attestation.py
    # from the CORRECTNESS_r{N}.json history; see ATTESTATION.md. The
    # r12 gate lands on the never-attested graph_triangles_dist twin
    # plus the 49 cheapest last-green-r10 queries; the remaining
    # r10-green next, r11-green last — cheapest-first within each
    # group.
    return {
        "graph_triangles_dist": q_graph_triangles_dist,
        "text_lang_id": q_text_lang_id,
        "text_gopher_rules": q_text_gopher_rules,
        "curate_chunks": q_curate_chunks,
        "text_c4_clean": q_text_c4_clean,
        "text_corpus_stats": q_text_corpus_stats,
        "curate_host_quota": q_curate_host_quota,
        "text_length_histogram": q_text_length_histogram,
        "sketch_hll_sparse": q_sketch_hll_sparse,
        "dedup_simhash": q_dedup_simhash,
        "curate_robots_filter": q_curate_robots_filter,
        "graph_host_links": q_graph_host_links,
        "sketch_hll_distinct": q_sketch_hll_distinct,
        "dedup_embedding_incremental": q_dedup_embedding_incremental,
        "multimodal_warc_extract": q_multimodal_warc_extract,
        "events_funnel": q_events_funnel,
        "temporal_interval_join": q_temporal_interval_join,
        "curate_robots_rules": q_curate_robots_rules,
        "sim_topk": q_sim_topk,
        "text_wordpiece_vocab": q_text_wordpiece_vocab,
        "tpch_q18": q_tpch_q18,
        "text_bpe_encode": q_text_bpe_encode,
        "multimodal_png_decode": q_multimodal_png_decode,
        "curate_url_dedup": q_curate_url_dedup,
        "stream_c4_clean": q_stream_c4_clean,
        "text_bpe_encode_arrow": q_text_bpe_encode_arrow,
        "text_wordpiece_encode": q_text_wordpiece_encode,
        "tpch_region_revenue": q_tpch_region_revenue,
        "curate_decontaminate_fuzzy": q_curate_decontaminate_fuzzy,
        "text_bpe_learned": q_text_bpe_learned,
        "stream_url_dedup": q_stream_url_dedup,
        "curate_pack_bpe": q_curate_pack_bpe,
        "stream_warc_extract": q_stream_warc_extract,
        "text_quality_model": q_text_quality_model,
        "graph_host_rank": q_graph_host_rank,
        "snapshot_nodes_overwrite": q_snapshot_nodes_overwrite,
        "dedup_minhash": q_dedup_minhash,
        "stream_dedup_phash_near": q_stream_dedup_phash_near,
        "text_bpe_learned_dist": q_text_bpe_learned_dist,
        "sketch_kmv_distinct": q_sketch_kmv_distinct,
        "sim_ivfpq_topk": q_sim_ivfpq_topk,
        "pipeline_crawl_frontier": q_pipeline_crawl_frontier,
        "pipeline_curation": q_pipeline_curation,
        "sim_ivfpq_add": q_sim_ivfpq_add,
        "layout_bucketed_join": q_layout_bucketed_join,
        "stream_hll_distinct": q_stream_hll_distinct,
        "dedup_image_phash": q_dedup_image_phash,
        "snapshot_links_overwrite": q_snapshot_links_overwrite,
        "sim_ivfpq_residual": q_sim_ivfpq_residual,
        "stream_dedup_phash": q_stream_dedup_phash,
        "curate_shuffle_shards": q_curate_shuffle_shards,
        "curate_decontaminate": q_curate_decontaminate,
        "dedup_boilerplate_lines": q_dedup_boilerplate_lines,
        "sketch_bloom_membership": q_sketch_bloom_membership,
        "sketch_cms_counts": q_sketch_cms_counts,
        "a4_pair_group_stats": q_a4_pair_group_stats,
        "layout_zorder": q_layout_zorder,
        "temporal_rollup": q_temporal_rollup,
        "temporal_gap_fill": q_temporal_gap_fill,
        "dedup_span_removal": q_dedup_span_removal,
        "text_divergence": q_text_divergence,
        "a10_degree": q_a10_degree,
        "c1_timestamp_format": q_c1_timestamp_format,
        "c8_direction_resolution": q_c8_direction_resolution,
        "cluster_kmeans": q_cluster_kmeans,
        "curate_mixture_sample": q_curate_mixture_sample,
        "curate_temperature_mixture": q_curate_temperature_mixture,
        "curate_topk_per_source": q_curate_topk_per_source,
        "dedup_minhash_incremental": q_dedup_minhash_incremental,
        "embed_truncate": q_embed_truncate,
        "events_quantiles_sketch": q_events_quantiles_sketch,
        "j6_boundary_nodes": q_j6_boundary_nodes,
        "multimodal_jpeg_progressive": q_multimodal_jpeg_progressive,
        "multimodal_media_metadata": q_multimodal_media_metadata,
        "sim_pq_topk": q_sim_pq_topk,
        "snapshot_links_append_interval": q_snapshot_links_append_interval,
        "snapshot_links_multilink": q_snapshot_links_multilink,
        "stream_cms_cells": q_stream_cms_cells,
        "stream_dedup_digests": q_stream_dedup_digests,
        "stream_latest_per_node": q_stream_latest_per_node,
        "stream_sessionize": q_stream_sessionize,
        "text_fingerprint": q_text_fingerprint,
        "text_lm_score": q_text_lm_score,
        "typed_attrs_links": q_typed_attrs_links,
        "tpch_q3_topk": q_tpch_q3_topk,
        "dedup_semantic": q_dedup_semantic,
        "multimodal_audio_decode": q_multimodal_audio_decode,
        "events_retention": q_events_retention,
        "curate_mixture_repeat": q_curate_mixture_repeat,
        "graph_sssp": q_graph_sssp,
        "snapshot_links_append": q_snapshot_links_append,
        "snapshot_timeline": q_snapshot_timeline,
        "graph_components": q_graph_components,
        "graph_kcore": q_graph_kcore,
        "graph_pagerank": q_graph_pagerank,
        "stream_windowed_stats": q_stream_windowed_stats,
        "sketch_kmv_setops": q_sketch_kmv_setops,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_embedding": q_dedup_embedding,
        "dedup_representatives": q_dedup_representatives,
        "curate_pii_scrub": q_curate_pii_scrub,
        "curate_pack": q_curate_pack,
        "text_quality": q_text_quality,
        "events_sessionize": q_events_sessionize,
        "text_token_stats": q_text_token_stats,
        "embed_quantize_int8": q_embed_quantize_int8,
        "curate_sitemap_urls": q_curate_sitemap_urls,
        "temporal_asof": q_temporal_asof,
        "dedup_exact": q_dedup_exact,
        "curate_repetition": q_curate_repetition,
        "tpch_q1": q_tpch_q1,
        "a1_latest_finding_per_node": q_a1_latest_finding_per_node,
        "a7_graph_timestamp": q_a7_graph_timestamp,
        "curate_hash_sample": q_curate_hash_sample,
        "curate_split": q_curate_split,
        "curate_stratified_sample": q_curate_stratified_sample,
        "curate_weighted_sample": q_curate_weighted_sample,
        "dedup_exact_incremental": q_dedup_exact_incremental,
        "events_quantiles": q_events_quantiles,
        "events_session_stats": q_events_session_stats,
        "f1_interval_filter": q_f1_interval_filter,
        "f2_node_lookup": q_f2_node_lookup,
        "graph_components_dist": q_graph_components_dist,
        "graph_kcore_dist": q_graph_kcore_dist,
        "graph_pagerank_dist": q_graph_pagerank_dist,
        "graph_sssp_dist": q_graph_sssp_dist,
        "j5_reachability_dist": q_j5_reachability_dist,
        "j9_combine_nodes": q_j9_combine_nodes,
        "multimodal_gif_decode": q_multimodal_gif_decode,
        "multimodal_image_decode": q_multimodal_image_decode,
        "multimodal_jpeg_decode": q_multimodal_jpeg_decode,
        "sim_lsh_topk": q_sim_lsh_topk,
        "sketch_kmv_merged": q_sketch_kmv_merged,
        "snapshot_incremental_links": q_snapshot_incremental_links,
        "snapshot_incremental_nodes": q_snapshot_incremental_nodes,
        "stream_latest_link_per_pair": q_stream_latest_link_per_pair,
        "stream_rpl_dio_merged": q_stream_rpl_dio_merged,
        "stream_stream_join": q_stream_stream_join,
        "temporal_asof_forward": q_temporal_asof_forward,
        "text_bm25": q_text_bm25,
        "text_bpe_tokens": q_text_bpe_tokens,
        "text_common_ngrams": q_text_common_ngrams,
        "text_quality_filter": q_text_quality_filter,
        "tpch_q9_nation_profit": q_tpch_q9_nation_profit,
        "u2_union_links": q_u2_union_links,
        "sim_knn_join": q_sim_knn_join,
        "sim_ivf_topk": q_sim_ivf_topk,
        "j5_reachability": q_j5_reachability,
        "graph_triangles": q_graph_triangles,
        "rpl_dio_merged": q_rpl_dio_merged,
    }

def _bpe_oracle_ctes(n: int) -> str:
    """DuckDB CTE chain replaying bpe_learn's merge loop, unrolled:
    w0 = (pretoken-seq, freq); per merge i: p{i} = adjacent-pair
    counts, b{i} = argmax with the (count desc, lhs, rhs) tie-break,
    w{i} = the greedy left-to-right merge via literal string replace
    on the double-chr(31)-boundary symbol sequence — byte-identical
    semantics to pipeline/text.py (same double-separator encoding:
    the merge pattern SEP+s1+SEP+SEP+s2+SEP consumes only the inner
    half of each flanking boundary, so adjacent occurrences in runs
    like 'aaaa' stay matchable and the replace reproduces the greedy
    non-overlapping Sennrich merge exactly; same replace scan)."""
    sep = "chr(31)"
    sep2 = f"({sep} || {sep})"
    parts = [
        f"""toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text,
    '''(?:s|d|m|t|ll|ve|re)| ?\\p{{L}}+| ?\\p{{N}}+| ?[^\\s\\p{{L}}\\p{{N}}]+',
    0)) AS w
  FROM documents
),
w0 AS (
  SELECT {sep2} || regexp_replace(w, '(.)', '\\1' || {sep2}, 'g') AS seq,
         count(*) AS freq
  FROM toks WHERE w NOT LIKE '%' || {sep} || '%' GROUP BY 1
)"""
    ]
    for i in range(1, n + 1):
        parts.append(
            f"""p{i} AS (
  SELECT list_extract(l, i) AS s1, list_extract(l, i+1) AS s2,
         sum(freq) AS c
  FROM (SELECT list_filter(str_split(seq, {sep}), x -> x <> '') AS l,
               freq FROM w{i - 1}),
       unnest(range(1, len(l))) AS u(i)
  GROUP BY 1, 2
),
b{i} AS (SELECT s1, s2, c FROM p{i} ORDER BY c DESC, s1 ASC, s2 ASC LIMIT 1),
w{i} AS (
  SELECT replace(seq, {sep} || s1 || {sep} || {sep} || s2 || {sep},
                      {sep} || s1 || s2 || {sep}) AS seq, freq
  FROM w{i - 1}, b{i}
)"""
        )
    return ",\n".join(parts)


def _bpe_learn_sql(n: int) -> str:
    sel = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, s1 AS lhs, s2 AS rhs, s1 || s2 AS merged,"
        f" CAST(c AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, n + 1)
    )
    return f"WITH {_bpe_oracle_ctes(n)}\n{sel}"


def _bpe_encode_core(n: int) -> str:
    """Learning CTEs + per-doc re-encode under the learned merges,
    through an ``agg`` CTE of (doc_id, n_tokens, n_distinct_tokens)."""
    sep = "chr(31)"
    sep2 = f"({sep} || {sep})"
    expr = f"{sep2} || regexp_replace(w, '(.)', '\\1' || {sep2}, 'g')"
    for i in range(1, n + 1):
        expr = (
            f"replace({expr},"
            f" {sep} || b{i}.s1 || {sep} || {sep} || b{i}.s2 || {sep},"
            f" {sep} || b{i}.s1 || b{i}.s2 || {sep})"
        )
    froms = ", ".join(f"b{i}" for i in range(1, n + 1))
    return f"""{_bpe_oracle_ctes(n)},
enc AS (
  SELECT doc_id,
         CASE WHEN w LIKE '%' || {sep} || '%' THEN [w]
              ELSE list_filter(str_split({expr}, {sep}), x -> x <> '')
         END AS tl
  FROM toks, {froms}
),
agg AS (
  SELECT doc_id, sum(len(tl)) AS n_tokens,
         len(list_distinct(flatten(list(tl)))) AS n_distinct_tokens
  FROM enc GROUP BY doc_id
)"""


def _bpe_encode_sql(n: int) -> str:
    return f"""WITH {_bpe_encode_core(n)}
SELECT d.doc_id,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.n_distinct_tokens, 0) AS BIGINT) AS n_distinct_tokens
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"""


def _bpe_pack_sql(n: int, window_tokens: int = 256, n_groups: int = 32) -> str:
    return f"""WITH {_bpe_encode_core(n)},
t AS (
  SELECT d.doc_id,
         CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         d.doc_id % {n_groups} AS grp
  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
),
c AS (
  SELECT doc_id, n_tokens, grp,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY grp ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(grp * 1099511627776 + cumb // {window_tokens} AS BIGINT) AS pack_id,
       CAST(cumb % {window_tokens} AS BIGINT) AS pack_pos
FROM c"""


def _qmodel_sql(n_steps: int = 8, lr: float = 2.0) -> str:
    """DuckDB replay of quality_model_train + quality_model_scores as
    unrolled CTEs: feat = the quality_scores features + heuristic-gate
    label; per step k: s{k} = EXACT integer sums of the 1/2^20-floored
    per-row gradients, w{k} = the weight update in the same arithmetic
    order as the Spark driver loop. Bit-identical by construction: the
    sigmoid is rational (no libm exp), the only sums are of integers,
    and every double op is IEEE correctly-rounded in both engines."""
    feat = f"""feat AS (
  SELECT doc_id,
         1.0 AS x0,
         CAST(length(text) AS DOUBLE) / 1000.0 AS x1,
         (length(text) - length(regexp_replace(text, '[,.!?;:]', '', 'g')))
           / greatest(length(text), 1) AS x2,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
           / greatest(length(text), 1) AS x3,
         len(list_filter({SQL_TOKS_RAW}, t -> list_contains({_STOP_SQL}, lower(t))))
           / greatest(len({SQL_TOKS_RAW}), 1) AS x4,
         CAST(length(text) >= 100
              AND (length(text) - length(regexp_replace(text, '[,.!?;:]', '', 'g')))
                  / greatest(length(text), 1) <= 0.2
              AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                  / greatest(length(text), 1) >= 0.5 AS DOUBLE) AS y
  FROM documents
),
w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4,
              (SELECT count(*) FROM feat) AS n)"""
    parts = [feat]
    for k in range(1, n_steps + 1):
        t = " + ".join(f"w{k - 1}.w{i} * x{i}" for i in range(5))
        sig = f"(0.5 + 0.5 * ({t}) / (1.0 + abs({t})))"
        gs = ", ".join(
            f"sum(CAST(floor((({sig}) - y) * x{i} * 1048576.0) AS BIGINT))"
            f" AS g{i}"
            for i in range(5)
        )
        parts.append(f"s{k} AS (SELECT {gs} FROM feat, w{k - 1})")
        ws = ", ".join(
            f"w{k - 1}.w{i} - {lr!r} * ((CAST(g{i} AS DOUBLE) / 1048576.0)"
            f" / CAST(n AS DOUBLE)) AS w{i}"
            for i in range(5)
        )
        parts.append(f"w{k} AS (SELECT {ws}, n FROM w{k - 1}, s{k})")
    t = " + ".join(f"w{n_steps}.w{i} * x{i}" for i in range(5))
    sig = f"(0.5 + 0.5 * ({t}) / (1.0 + abs({t})))"
    body = ",\n".join(parts)
    return (
        "WITH " + body
        + "\nSELECT doc_id, round(" + sig + ", 6) AS quality_score, "
        + sig + " >= 0.5 AS pred_good\nFROM feat, w" + str(n_steps)
    )


def _hll_sql(p: int = 6) -> str:
    """DuckDB replay of hll_distinct over (event_type, user_id): same
    60-bit hash, bucket split, rho-from-bin-length registers, exact
    dyadic indicator sum, and the same raw/linear-counting branch —
    branch selection compares identical doubles, so it never
    diverges."""
    from net_spider_spark.pipeline.sketch import hash60_sql

    m = 1 << p
    w_bits = 60 - p
    w_mod = 1 << w_bits
    alpha_m2 = repr((0.7213 / (1.0 + 1.079 / m)) * m * m)
    return f"""
WITH h AS (
  SELECT event_type, {hash60_sql("user_id")} AS h60 FROM events
),
b AS (
  SELECT event_type,
         h60 // {w_mod} AS bkt,
         h60 % {w_mod} AS w
  FROM h
),
regs AS (
  SELECT event_type, bkt,
         max(CASE WHEN w = 0 THEN {w_bits + 1}
                  ELSE {w_bits} - length(bin(w)) + 1 END) AS mj
  FROM b GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         CAST({m} - count(*) AS BIGINT) AS n_zero_regs,
         ({m} - count(*)) * 1.0
           + sum(1.0 / (CAST(1 AS BIGINT) << mj)) AS inv_sum
  FROM regs GROUP BY 1
)
SELECT event_type, n_zero_regs,
       round(CASE WHEN {alpha_m2} / inv_sum <= {2.5 * m}
                   AND n_zero_regs > 0
                  THEN {float(m)} * ln({float(m)} / CAST(n_zero_regs AS DOUBLE))
                  ELSE {alpha_m2} / inv_sum END, 4) AS est_distinct
FROM agg
"""


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    d["text_quality_model"] = _qmodel_sql()
    d["text_bpe_learned"] = _bpe_learn_sql(BPE_N_MERGES)
    # same oracle: the distributed batched loop must produce the
    # identical merge sequence
    d["text_bpe_learned_dist"] = _bpe_learn_sql(BPE_N_MERGES)
    d["text_bpe_encode"] = _bpe_encode_sql(BPE_N_MERGES)
    d["text_bpe_encode_arrow"] = _bpe_encode_sql(BPE_N_MERGES)
    # same analytic oracle: the availableNow replay of the WARC
    # extraction must equal the batch path row for row
    d["stream_warc_extract"] = d["multimodal_warc_extract"]
    # stateless rule cleaning: the streaming replay answers to the
    # batch oracle verbatim.
    d["stream_c4_clean"] = d["text_c4_clean"]
    # streaming URL dedup: the canonical-set output is the DISTINCT of
    # the batch canonicalization — computed analytically like
    # curate_url_dedup's oracle.
    d["stream_url_dedup"] = """
SELECT DISTINCT
       'http://site' || CAST(doc_id % 5 AS VARCHAR)
         || '.com/page/' || CAST(doc_id % 40 AS VARCHAR)
         || CASE WHEN doc_id % 3 = 2 THEN '' ELSE '?a=1&b=2' END
         AS canonical_url
FROM documents
"""
    d["text_wordpiece_vocab"] = (
        f"WITH {_wordpiece_vocab_ctes(32, 4)}\n"
        "SELECT * FROM chars UNION ALL SELECT * FROM multi"
    )
    d["text_wordpiece_encode"] = _wordpiece_encode_sql(32, 4, steps=12)
    d["curate_pack_bpe"] = _bpe_pack_sql(BPE_N_MERGES)
    # Fuzzy decontamination: same banded-probe + verify algebra as the
    # incremental minhash + jaccard oracles, across the train/eval
    # split, folded to a per-train-doc max.
    d["curate_decontaminate_fuzzy"] = f"""
WITH tok AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest({SQL_SHINGLES}) AS shingle FROM tok),
mh AS (
  SELECT doc_id, b.band, min(md5(CAST(b.band AS VARCHAR) || '|' || shingle)) AS sig
  FROM sh CROSS JOIN (VALUES (1), (2), (3), (4)) b(band)
  GROUP BY doc_id, b.band
),
cand AS (
  SELECT DISTINCT t.doc_id AS new_id, e.doc_id AS corpus_id
  FROM mh t JOIN mh e ON t.band = e.band AND t.sig = e.sig
  WHERE t.doc_id % 5 <> 0 AND e.doc_id % 5 = 0 AND t.doc_id <> e.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
shared AS (
  SELECT cd.new_id, cd.corpus_id, count(*) AS shared
  FROM cand cd
  JOIN sh a ON a.doc_id = cd.new_id
  JOIN sh b ON b.doc_id = cd.corpus_id AND b.shingle = a.shingle
  GROUP BY 1, 2
),
jacc AS (
  SELECT new_id AS doc_id,
         round(max(shared / (nt.n + ne.n - shared)), 9) AS max_eval_jaccard
  FROM shared
  JOIN sizes nt ON nt.doc_id = new_id
  JOIN sizes ne ON ne.doc_id = corpus_id
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(j.max_eval_jaccard, 0.0) AS max_eval_jaccard,
       coalesce(j.max_eval_jaccard, 0.0) >= 0.5 AS contaminated
FROM documents d LEFT JOIN jacc j ON j.doc_id = d.doc_id
WHERE d.doc_id % 5 <> 0
"""
    # Perceptual dedup oracle: the synthesized corpus makes the dup
    # structure analytic (class = event_id % 6; lossless re-encodes
    # share pixels -> pHash Hamming 0; inter-class distance >> the
    # threshold), so the oracle is pure window SQL with no image math.
    d["dedup_image_phash"] = """
WITH m AS (
  SELECT event_id AS media_id, event_id % 6 AS cls
  FROM events WHERE event_id % 25 = 21
)
SELECT media_id,
       media_id > min(media_id) OVER (PARTITION BY cls) AS is_dup
FROM m
"""
    # Streaming twin: the replay's final min(media_id) per pHash is the
    # smallest event_id of each picture class.
    d["stream_dedup_phash"] = """
SELECT min(event_id) AS keeper_id
FROM events WHERE event_id % 25 = 21
GROUP BY event_id % 6
"""
    # Near-dup streaming keeper: families of hashes 1 bit apart ->
    # dominated iff a smaller id shares the family (pure id math).
    d["stream_dedup_phash_near"] = """
WITH h AS (
  SELECT event_id AS media_id, (event_id % 8) // 2 AS fam
  FROM events WHERE event_id % 25 = 3
)
SELECT media_id,
       media_id > min(media_id) OVER (PARTITION BY fam) AS is_dup
FROM h
"""
    d["sketch_hll_distinct"] = _hll_sql(p=6)
    # same oracle: sparse representation == dense registers
    d["sketch_hll_sparse"] = _hll_sql(p=6)
    # same oracle: the streamed register table replayed availableNow
    # must reproduce the batch registers (max is replay-insensitive)
    d["stream_hll_distinct"] = _hll_sql(p=6)
    # Incremental embedding near-dup: new (vec_id % 4 = 0) probes the
    # corpus signature index — same seeded planes as dedup_embedding.
    d["dedup_embedding_incremental"] = f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
sigs AS (
  SELECT vec_id,
         unnest([0, 1, 2, 3]) AS band,
         unnest([{", ".join(_EMB_SIG_SQL)}]) AS sig
  FROM emb
),
cand AS (
  SELECT DISTINCT n.vec_id AS new_id, c.vec_id AS corpus_id
  FROM sigs n JOIN sigs c ON n.band = c.band AND n.sig = c.sig
  WHERE n.vec_id % 4 = 0 AND c.vec_id % 4 <> 0 AND n.vec_id <> c.vec_id
),
el AS (
  SELECT cd.new_id, cd.corpus_id, unnest(a.v) AS ea, unnest(b.v) AS eb
  FROM cand cd
  JOIN emb a ON a.vec_id = cd.new_id
  JOIN emb b ON b.vec_id = cd.corpus_id
),
scored AS (
  SELECT new_id, corpus_id,
         sum(ea * eb) / (sqrt(sum(ea * ea)) * sqrt(sum(eb * eb))) AS cos
  FROM el GROUP BY 1, 2
),
near AS (
  SELECT new_id, count(*) AS n_near_corpus
  FROM scored WHERE cos >= 0.5 GROUP BY 1
)
SELECT e.vec_id,
       CAST(coalesce(n.n_near_corpus, 0) AS BIGINT) AS n_near_corpus,
       coalesce(n.n_near_corpus, 0) > 0 AS is_near_dup
FROM embeddings e LEFT JOIN near n ON n.new_id = e.vec_id
WHERE e.vec_id % 4 = 0
"""
    # Distributed-path pins share their base query's answer contract:
    # both plans must agree with the same SQL.
    for dist, base in (
        ("graph_components_dist", "graph_components"),
        ("j5_reachability_dist", "j5_reachability"),
        ("graph_pagerank_dist", "graph_pagerank"),
        ("graph_sssp_dist", "graph_sssp"),
        ("graph_kcore_dist", "graph_kcore"),
        ("graph_triangles_dist", "graph_triangles"),
    ):
        d[dist] = d[base]
    return d


def _oracle_sql_base() -> dict[str, str]:
    return {
        "snapshot_links_overwrite": _links_sql(SQL_KEPT_OVERWRITE),
        "snapshot_links_append": _links_sql(SQL_KEPT_APPEND),
        "snapshot_nodes_overwrite": f"""
WITH {SQL_F},
{SQL_KEPT_OVERWRITE},
vis AS (
  SELECT subject_node AS node_id, false AS is_on_boundary,
         max(found_at) AS node_ts
  FROM kept GROUP BY 1
)
SELECT * FROM vis
UNION ALL
SELECT DISTINCT target_node AS node_id, true AS is_on_boundary,
       CAST(NULL AS BIGINT) AS node_ts
FROM kept
WHERE target_node NOT IN (SELECT node_id FROM vis)
""",
        "a1_latest_finding_per_node": f"""
WITH {SQL_F}, {SQL_KEPT_OVERWRITE}
SELECT subject_node, found_at, finding_id FROM kept
""",
        "f1_interval_filter": f"""
WITH {SQL_F},
b AS (SELECT min(found_at) + (max(found_at) - min(found_at)) // 2 AS mid FROM f)
SELECT finding_id, subject_node, target_node, link_state, found_at
FROM f, b WHERE found_at <= b.mid
""",
        "f2_node_lookup": f"""
WITH {SQL_F}
SELECT finding_id, subject_node, target_node, link_state, found_at
FROM f WHERE subject_node = '7'
""",
        "j5_reachability": f"""
WITH RECURSIVE {SQL_F},
{SQL_KEPT_OVERWRITE},
edges AS (SELECT DISTINCT subject_node AS src, target_node AS dst FROM kept),
reach(node_id) AS (
  SELECT node_id FROM (VALUES ('1'), ('2')) v(node_id)
  UNION
  SELECT e.dst FROM reach r JOIN edges e ON e.src = r.node_id
)
SELECT node_id FROM reach
""",
        "j6_boundary_nodes": f"""
WITH {SQL_F}, {SQL_KEPT_OVERWRITE}
SELECT DISTINCT target_node AS node_id FROM kept
WHERE target_node NOT IN (SELECT subject_node FROM kept)
""",
        "a4_pair_group_stats": f"""
WITH {SQL_F}
SELECT least(subject_node, target_node) AS p1,
       greatest(subject_node, target_node) AS p2,
       count(*) AS n_samples,
       max(found_at) AS max_ts
FROM f GROUP BY 1, 2
""",
        "a7_graph_timestamp": f"""
WITH {SQL_F} SELECT max(found_at) AS graph_ts FROM f
""",
        "a10_degree": f"""
WITH links AS ({_links_sql(SQL_KEPT_OVERWRITE)})
SELECT source_node AS node_id, count(*) AS out_degree
FROM links GROUP BY 1
""",
        "j9_combine_nodes": f"""
WITH {SQL_F},
dio AS (SELECT subject_node AS node_id, max(found_at) AS dio_ts
        FROM f WHERE finding_id % 2 = 0 GROUP BY 1),
dao AS (SELECT subject_node AS node_id, max(found_at) AS dao_ts
        FROM f WHERE finding_id % 2 = 1 GROUP BY 1)
SELECT coalesce(dio.node_id, dao.node_id) AS node_id, dio_ts, dao_ts,
       greatest(coalesce(dio_ts, 0), coalesce(dao_ts, 0)) AS combined_ts
FROM dio FULL OUTER JOIN dao ON dio.node_id = dao.node_id
""",
        "c8_direction_resolution": f"""
WITH {SQL_F}
SELECT
  CASE WHEN link_state = 'to_subject' THEN target_node ELSE subject_node END
    AS source_node,
  CASE WHEN link_state = 'to_subject' THEN subject_node ELSE target_node END
    AS dest_node,
  link_state <> 'bidirectional' AS is_directed,
  found_at AS link_ts
FROM f WHERE link_state <> 'unused'
""",
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       avg(l_quantity) AS avg_qty,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "tpch_q3_topk": """
SELECT o_orderkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
        "tpch_q9_nation_profit": """
SELECT n_name, p_type,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       sum(l_quantity) AS sum_qty,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, p_type
""",
        "tpch_region_revenue": """
SELECT r_name, n_name,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
        "dedup_exact": """
SELECT md5(text) AS digest, min(doc_id) AS keeper_id, count(*) AS n_dups
FROM documents GROUP BY 1
""",
        "dedup_minhash": f"""
WITH tok AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest({SQL_SHINGLES}) AS shingle FROM tok),
mh AS (
  SELECT doc_id, b.band, min(md5(CAST(b.band AS VARCHAR) || '|' || shingle)) AS sig
  FROM sh CROSS JOIN (VALUES (1), (2), (3), (4)) b(band)
  GROUP BY doc_id, b.band
)
SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
FROM mh a JOIN mh c ON a.band = c.band AND a.sig = c.sig AND a.doc_id < c.doc_id
""",
        "dedup_jaccard": f"""
WITH tok AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest({SQL_SHINGLES}) AS shingle FROM tok),
mh AS (
  SELECT doc_id, b.band, min(md5(CAST(b.band AS VARCHAR) || '|' || shingle)) AS sig
  FROM sh CROSS JOIN (VALUES (1), (2), (3), (4)) b(band)
  GROUP BY doc_id, b.band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM mh a JOIN mh c ON a.band = c.band AND a.sig = c.sig AND a.doc_id < c.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
shared AS (
  SELECT cd.doc_a, cd.doc_b, count(*) AS shared
  FROM cand cd
  JOIN sh a ON a.doc_id = cd.doc_a
  JOIN sh b ON b.doc_id = cd.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       shared / (na.n + nb.n - shared) AS jaccard
FROM shared
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE shared / (na.n + nb.n - shared) >= 0.2
""",
        "dedup_simhash": f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({SQL_TOKS}) AS t FROM documents
),
hashed AS (
  SELECT doc_id, {SQL_HEX16} AS h FROM (SELECT doc_id, md5(t) AS m FROM tok) q
),
agg AS (
  SELECT doc_id, count(*) AS n_tok,
         {", ".join(f"sum((h >> {i}) & 1) AS b{i}" for i in range(16))}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id,
       CAST({" + ".join(f"(CASE WHEN b{i} * 2 > n_tok THEN 1 ELSE 0 END) * {1 << i}" for i in range(16))}
            AS BIGINT) AS simhash
FROM agg
""",
        "text_token_stats": f"""
WITH tok AS (SELECT doc_id, {SQL_TOKS_RAW} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
       list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT)))
         / greatest(len(toks), 1) AS avg_token_len
FROM tok
""",
        "text_quality": f"""
WITH tok AS (SELECT doc_id, text, {SQL_TOKS_RAW} AS toks FROM documents)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       (length(text) - length(regexp_replace(text, '[,.!?;:]', '', 'g')))
         / greatest(length(text), 1) AS punct_ratio,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
         / greatest(length(text), 1) AS alpha_ratio,
       len(list_filter(toks, t -> list_contains({_STOP_SQL}, lower(t))))
         / greatest(len(toks), 1) AS stopword_ratio
FROM tok
""",
        "text_lang_id": f"""
WITH tok AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
sc AS (
  SELECT doc_id,
         len(list_filter(toks, t -> list_contains({_marker_sql('en')}, t))) AS n_en,
         len(list_filter(toks, t -> list_contains({_marker_sql('de')}, t))) AS n_de,
         len(list_filter(toks, t -> list_contains({_marker_sql('fr')}, t))) AS n_fr,
         len(list_filter(toks, t -> list_contains({_marker_sql('es')}, t))) AS n_es
  FROM tok
)
SELECT doc_id,
  CASE WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es AND n_en > 0 THEN 'en'
       WHEN n_de >= n_fr AND n_de >= n_es AND n_de > 0 THEN 'de'
       WHEN n_fr >= n_es AND n_fr > 0 THEN 'fr'
       WHEN n_es > 0 THEN 'es'
       ELSE 'unknown' END AS pred_lang
FROM sc
""",
        "text_fingerprint": f"""
WITH tok AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents)
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint
FROM tok
""",
        "text_corpus_stats": f"""
WITH tok AS (SELECT doc_id, {SQL_TOKS_RAW} AS toks FROM documents),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
         CAST(min(len(toks)) AS BIGINT) AS min_tokens,
         CAST(max(len(toks)) AS BIGINT) AS max_tokens
  FROM tok
),
d AS (
  SELECT CAST(count(DISTINCT t) AS BIGINT) AS distinct_tokens
  FROM (SELECT unnest(toks) AS t FROM tok)
)
SELECT n_docs, total_tokens, min_tokens, max_tokens, distinct_tokens,
       distinct_tokens / greatest(total_tokens, 1) AS type_token_ratio
FROM base, d
""",
        "text_length_histogram": f"""
WITH tok AS (
  SELECT CAST(len({SQL_TOKS_RAW}) AS BIGINT) AS n FROM documents
)
SELECT CAST((n // 16) * 16 AS BIGINT) AS bucket_start,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens
FROM tok GROUP BY 1
""",
        "text_gopher_rules": f"""
WITH {SQL_STRUCTURED},
tok AS (
  SELECT doc_id, text,
         len({SQL_TOKS_RAW}) AS n_words,
         ' ' || regexp_replace(text, '\\s', '  ', 'g') || ' ' AS spread
  FROM structured
),
m AS (
  SELECT doc_id,
    n_words,
    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
      / greatest(n_words, 1) AS mean_word_len,
    ((length(text) - length(replace(text, '#', '')))
      + (length(text) - length(replace(text, '...', ''))) / 3)
      / greatest(n_words, 1) AS symbol_word_ratio,
    len(regexp_extract_all(text, '(?m)^(- |\\* )'))
      / greatest(len(string_split(text, chr(10))), 1) AS frac_bullet_lines,
    len(regexp_extract_all(text, '(?m)\\.\\.\\.$'))
      / greatest(len(string_split(text, chr(10))), 1) AS frac_ellipsis_lines,
    (n_words - len(regexp_extract_all(spread, ' [^A-Za-z ]+ ')))
      / greatest(n_words, 1) AS frac_alpha_words,
    ({" + ".join(
        f"CASE WHEN contains(lower(spread), ' {w} ') THEN 1 ELSE 0 END"
        for w in TX.GOPHER_REQUIRED_WORDS
    )}) AS n_required_hits
  FROM tok
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
       symbol_word_ratio, frac_bullet_lines, frac_ellipsis_lines,
       frac_alpha_words, CAST(n_required_hits AS BIGINT) AS n_required_hits,
       (n_words BETWEEN 10 AND 100000)
         AND (mean_word_len BETWEEN 3.0 AND 10.0)
         AND symbol_word_ratio <= 0.1
         AND frac_bullet_lines <= 0.9
         AND frac_ellipsis_lines <= 0.25
         AND frac_alpha_words >= 0.8
         AND n_required_hits >= 2 AS keep
FROM m
""",
        "text_c4_clean": f"""
WITH {SQL_STRUCTURED},
k AS (
  SELECT doc_id, text,
    list_filter(string_split(text, chr(10)), l ->
      regexp_matches(l, '[.!?"]$')
      AND len(list_filter(string_split_regex(l, '\\s+'), t -> t <> '')) >= 3
      AND NOT contains(lower(l), 'javascript')
      AND NOT contains(lower(l), 'cookie')
      AND NOT contains(l, '{{')) AS kept
  FROM structured
)
SELECT doc_id,
       array_to_string(kept, chr(10)) AS clean_text,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       (NOT (contains(lower(text), 'lorem ipsum') OR contains(text, '{{')))
         AND len(kept) >= 1 AS keep
FROM k
""",
        "sim_topk": """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
el AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         unnest(q.embedding) AS qe, unnest(c.embedding) AS ce
  FROM q CROSS JOIN c
),
scored AS (
  SELECT query_id, neighbor_id,
         sum(CAST(qe AS DOUBLE) * CAST(ce AS DOUBLE))
           / (sqrt(sum(CAST(qe AS DOUBLE) * CAST(qe AS DOUBLE)))
              * sqrt(sum(CAST(ce AS DOUBLE) * CAST(ce AS DOUBLE)))) AS cos
  FROM el GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= 3
""",
        # sim_lsh_topk: the hyperplanes are deterministic (seed=42), so
        # the approximate operator HAS an exact oracle — same planes ->
        # same buckets -> exact top-k within matching buckets.
        "sim_lsh_topk": f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
bucketed AS (
  SELECT vec_id, v, {_lsh_sig_sql(n_bands=1, n_planes=2)[0]} AS bucket
  FROM emb
),
q AS (SELECT vec_id, v, bucket FROM bucketed WHERE vec_id < 5),
c AS (SELECT vec_id, v, bucket FROM bucketed WHERE vec_id >= 5),
el AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         unnest(q.v) AS qe, unnest(c.v) AS ce
  FROM q JOIN c ON q.bucket = c.bucket
),
scored AS (
  SELECT query_id, neighbor_id,
         sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce))) AS cos
  FROM el GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM scored) t
WHERE rank <= 3
""",
        "snapshot_links_append_interval": f"""
WITH {SQL_F},
b AS (SELECT min(found_at) + (max(found_at) - min(found_at)) // 2 AS mid FROM f),
bounded AS (SELECT f.* FROM f, b WHERE f.found_at <= b.mid),
node_ts AS (
  SELECT subject_node AS node_id, max(found_at) AS node_ts FROM bounded GROUP BY 1
),
samples AS (
  SELECT bounded.*, least(subject_node, target_node) AS p1,
         greatest(subject_node, target_node) AS p2
  FROM bounded
),
winners AS (
  SELECT * FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY p1, p2 ORDER BY found_at DESC, finding_id DESC) AS rn2
    FROM samples s) t WHERE rn2 = 1
),
surviving AS (
  SELECT w.* FROM winners w
  LEFT JOIN node_ts t1 ON t1.node_id = w.p1
  LEFT JOIN node_ts t2 ON t2.node_id = w.p2
  WHERE NOT (t1.node_ts IS NOT NULL AND w.found_at < t1.node_ts
             AND w.subject_node <> w.p1)
    AND NOT (t2.node_ts IS NOT NULL AND w.found_at < t2.node_ts
             AND w.subject_node <> w.p2)
)
SELECT
  CASE WHEN link_state = 'to_subject' THEN target_node ELSE subject_node END
    AS source_node,
  CASE WHEN link_state = 'to_subject' THEN subject_node ELSE target_node END
    AS dest_node,
  link_state <> 'bidirectional' AS is_directed,
  found_at AS link_ts
FROM surviving
WHERE link_state <> 'unused'
""",
        "u2_union_links": f"""
WITH {SQL_F}
SELECT finding_id, subject_node, target_node, 'dio' AS link_type
FROM f WHERE finding_id % 2 = 0
UNION ALL
SELECT finding_id, subject_node, target_node, 'dao' AS link_type
FROM f WHERE finding_id % 2 = 1
""",
        "c1_timestamp_format": f"""
WITH {SQL_F}
SELECT finding_id,
       strftime(make_timestamp(found_at * 1000), '%Y-%m-%dT%H:%M:%S') AS iso_ts
FROM f
""",
        "snapshot_links_multilink": f"""
WITH fm AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         epoch_ms(ts) // 3600000 AS hour_idx,
         CAST((user_id * 7 + event_id) % {demo.N_TARGET_NODES} AS VARCHAR)
           AS target_node,
         {demo.LINK_STATE_CASE} AS link_state
  FROM events
),
b AS (
  SELECT user_id, hour_idx, user_id * 1000000 + hour_idx AS finding_id,
         max(ts_ms) AS found_at
  FROM fm GROUP BY 1, 2
),
kept_b AS (
  SELECT * FROM (
    SELECT b.*, row_number() OVER (
      PARTITION BY user_id ORDER BY found_at DESC, finding_id DESC) AS rn
    FROM b) t WHERE rn = 1
),
node_ts AS (
  SELECT CAST(user_id AS VARCHAR) AS node_id, found_at AS node_ts FROM kept_b
),
samples AS (
  SELECT kb.finding_id, CAST(kb.user_id AS VARCHAR) AS subject_node,
         kb.found_at, fm.target_node, fm.link_state,
         row_number() OVER (PARTITION BY kb.user_id, kb.hour_idx
                            ORDER BY fm.event_id) - 1 AS link_pos,
         least(CAST(kb.user_id AS VARCHAR), fm.target_node) AS p1,
         greatest(CAST(kb.user_id AS VARCHAR), fm.target_node) AS p2
  FROM kept_b kb JOIN fm
    ON fm.user_id = kb.user_id AND fm.hour_idx = kb.hour_idx
),
winners AS (
  SELECT * FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY p1, p2
      ORDER BY found_at DESC, finding_id DESC, link_pos DESC) AS rn2
    FROM samples s) t WHERE rn2 = 1
),
surviving AS (
  SELECT w.* FROM winners w
  LEFT JOIN node_ts t1 ON t1.node_id = w.p1
  LEFT JOIN node_ts t2 ON t2.node_id = w.p2
  WHERE NOT (t1.node_ts IS NOT NULL AND w.found_at < t1.node_ts
             AND w.subject_node <> w.p1)
    AND NOT (t2.node_ts IS NOT NULL AND w.found_at < t2.node_ts
             AND w.subject_node <> w.p2)
)
SELECT
  CASE WHEN link_state = 'to_subject' THEN target_node ELSE subject_node END
    AS source_node,
  CASE WHEN link_state = 'to_subject' THEN subject_node ELSE target_node END
    AS dest_node,
  link_state <> 'bidirectional' AS is_directed,
  found_at AS link_ts
FROM surviving
WHERE link_state <> 'unused'
""",
        # The default-unifier link pipeline with typed attrs carried
        # through: the winner's (weight, metric) survive unchanged.
        "typed_attrs_links": f"""
WITH f AS (
  SELECT event_id AS finding_id,
         CAST(user_id AS VARCHAR) AS subject_node,
         epoch_ms(ts) AS found_at,
         CAST((user_id * 7 + event_id) % 50 AS VARCHAR) AS target_node,
         {demo.LINK_STATE_CASE} AS link_state,
         value AS weight,
         CASE WHEN event_id % 4 <> 0 THEN CAST(event_id % 50 AS BIGINT) END AS metric
  FROM events
),
kept AS (
  SELECT * FROM (
    SELECT f.*, row_number() OVER (
      PARTITION BY subject_node ORDER BY found_at DESC, finding_id DESC) AS rn
    FROM f) t WHERE rn = 1
),
node_ts AS (
  SELECT subject_node AS node_id, max(found_at) AS node_ts FROM kept GROUP BY 1
),
samples AS (
  SELECT kept.*,
         least(subject_node, target_node) AS p1,
         greatest(subject_node, target_node) AS p2
  FROM kept
),
winners AS (
  SELECT * FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY p1, p2 ORDER BY found_at DESC, finding_id DESC) AS rn2
    FROM samples s) t WHERE rn2 = 1
),
surviving AS (
  SELECT w.* FROM winners w
  LEFT JOIN node_ts t1 ON t1.node_id = w.p1
  LEFT JOIN node_ts t2 ON t2.node_id = w.p2
  WHERE NOT (t1.node_ts IS NOT NULL AND w.found_at < t1.node_ts
             AND w.subject_node <> w.p1)
    AND NOT (t2.node_ts IS NOT NULL AND w.found_at < t2.node_ts
             AND w.subject_node <> w.p2)
)
SELECT
  CASE WHEN link_state = 'to_subject' THEN target_node ELSE subject_node END
    AS source_node,
  CASE WHEN link_state = 'to_subject' THEN subject_node ELSE target_node END
    AS dest_node,
  link_state <> 'bidirectional' AS is_directed,
  found_at AS link_ts,
  weight,
  coalesce(metric, -1) AS metric
FROM surviving
WHERE link_state <> 'unused'
""",
        # Full dioUnifierConf pipeline in SQL: kept findings (overwrite)
        # -> pair groups -> per-side latest -> neighbor-type precedence
        # pick (left endpoint breaks ties) -> source_/dest_ attr split
        # -> drop unused. Mirrors demo.events_findings_dio + rpl/dio.py.
        "stream_rpl_dio_merged": """
WITH f AS (
  SELECT event_id AS finding_id,
         CAST(user_id % 50 AS VARCHAR) AS subject_node,
         CAST(CASE WHEN user_id % 50 < 30
              THEN CASE WHEN user_id % 50 % 2 = 0
                   THEN user_id % 50 + 1 ELSE user_id % 50 - 1 END
              ELSE (user_id % 50 + 1 + (event_id * 7) % 49) % 50
              END AS VARCHAR) AS target_node,
         epoch_ms(ts) AS found_at,
         CASE (user_id + event_id) % 3
           WHEN 0 THEN 'preferred_parent'
           WHEN 1 THEN 'parent_candidate'
           ELSE 'other_neighbor' END AS neighbor_type,
         CAST((user_id + 2 * event_id) % 1024 AS VARCHAR) AS neighbor_rank,
         CASE WHEN event_id % 3 <> 0 THEN CAST(event_id % 100 AS VARCHAR) END AS metric
  FROM events
),
s AS (
  SELECT *,
         CASE WHEN neighbor_type = 'preferred_parent'
              THEN 'to_target' ELSE 'unused' END AS link_state,
         least(subject_node, target_node) AS p1,
         greatest(subject_node, target_node) AS p2
  FROM f
),
latest AS (
  SELECT * FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY p1, p2, subject_node
      ORDER BY found_at DESC, finding_id DESC) AS side_rn
    FROM s) q
  WHERE side_rn = 1
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY p1, p2
    ORDER BY CASE neighbor_type
               WHEN 'preferred_parent' THEN 0
               WHEN 'parent_candidate' THEN 1
               ELSE 2 END ASC,
             CASE WHEN subject_node = p1 THEN 0 ELSE 1 END ASC
  ) AS mrank
  FROM latest
)
SELECT m.subject_node AS source_node,
       m.target_node AS dest_node,
       true AS is_directed,
       m.found_at AS link_ts,
       m.neighbor_type AS source_neighbor_type,
       m.neighbor_rank AS source_neighbor_rank,
       coalesce(m.metric, '') AS source_metric,
       coalesce(d.neighbor_type, '') AS dest_neighbor_type,
       coalesce(d.neighbor_rank, '') AS dest_neighbor_rank,
       coalesce(d.metric, '') AS dest_metric
FROM (SELECT * FROM ranked WHERE mrank = 1) m
LEFT JOIN (SELECT * FROM ranked WHERE mrank = 2) d
  ON d.p1 = m.p1 AND d.p2 = m.p2
WHERE m.link_state = 'to_target'
""",
        "rpl_dio_merged": """
WITH f AS (
  SELECT event_id AS finding_id,
         CAST(user_id % 50 AS VARCHAR) AS subject_node,
         CAST(CASE WHEN user_id % 50 < 30
              THEN CASE WHEN user_id % 50 % 2 = 0
                   THEN user_id % 50 + 1 ELSE user_id % 50 - 1 END
              ELSE (user_id % 50 + 1 + (event_id * 7) % 49) % 50
              END AS VARCHAR) AS target_node,
         epoch_ms(ts) AS found_at,
         CASE (user_id + event_id) % 3
           WHEN 0 THEN 'preferred_parent'
           WHEN 1 THEN 'parent_candidate'
           ELSE 'other_neighbor' END AS neighbor_type,
         CAST((user_id + 2 * event_id) % 1024 AS VARCHAR) AS neighbor_rank,
         CASE WHEN event_id % 3 <> 0 THEN CAST(event_id % 100 AS VARCHAR) END AS metric
  FROM events
),
kept AS (
  SELECT * FROM (
    SELECT f.*, row_number() OVER (
      PARTITION BY subject_node ORDER BY found_at DESC, finding_id DESC) AS rn
    FROM f) q
  WHERE rn = 1
),
s AS (
  SELECT *,
         CASE WHEN neighbor_type = 'preferred_parent'
              THEN 'to_target' ELSE 'unused' END AS link_state,
         least(subject_node, target_node) AS p1,
         greatest(subject_node, target_node) AS p2
  FROM kept
),
latest AS (
  SELECT * FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY p1, p2, subject_node
      ORDER BY found_at DESC, finding_id DESC) AS side_rn
    FROM s) q
  WHERE side_rn = 1
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY p1, p2
    ORDER BY CASE neighbor_type
               WHEN 'preferred_parent' THEN 0
               WHEN 'parent_candidate' THEN 1
               ELSE 2 END ASC,
             CASE WHEN subject_node = p1 THEN 0 ELSE 1 END ASC
  ) AS mrank
  FROM latest
)
SELECT m.subject_node AS source_node,
       m.target_node AS dest_node,
       true AS is_directed,
       m.found_at AS link_ts,
       m.neighbor_type AS source_neighbor_type,
       m.neighbor_rank AS source_neighbor_rank,
       coalesce(m.metric, '') AS source_metric,
       coalesce(d.neighbor_type, '') AS dest_neighbor_type,
       coalesce(d.neighbor_rank, '') AS dest_neighbor_rank,
       coalesce(d.metric, '') AS dest_metric
FROM (SELECT * FROM ranked WHERE mrank = 1) m
LEFT JOIN (SELECT * FROM ranked WHERE mrank = 2) d
  ON d.p1 = m.p1 AND d.p2 = m.p2
WHERE m.link_state = 'to_target'
""",
        "dedup_embedding": f"""
WITH RECURSIVE emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
sigs AS (
  SELECT vec_id,
         unnest([0, 1, 2, 3]) AS band,
         unnest([{", ".join(_EMB_SIG_SQL)}]) AS sig
  FROM emb
),
cand AS (
  SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
  WHERE a.vec_id < b.vec_id
),
el AS (
  SELECT c.ida, c.idb, unnest(a.v) AS ea, unnest(b.v) AS eb
  FROM cand c
  JOIN emb a ON a.vec_id = c.ida
  JOIN emb b ON b.vec_id = c.idb
),
scored AS (
  SELECT ida, idb,
         sum(ea * eb)
           / (sqrt(sum(ea * ea)) * sqrt(sum(eb * eb))) AS cos
  FROM el GROUP BY 1, 2
),
edges AS (SELECT ida, idb FROM scored WHERE cos >= 0.5),
und AS (
  SELECT ida AS src, idb AS dst FROM edges
  UNION SELECT idb AS src, ida AS dst FROM edges
),
reach(a, b) AS (
  SELECT src AS a, src AS b FROM und
  UNION
  SELECT r.a, u.dst FROM reach r JOIN und u ON u.src = r.b
),
comp AS (SELECT a AS vec_id, min(b) AS group_id FROM reach GROUP BY a)
SELECT e.vec_id,
       coalesce(c.group_id, e.vec_id) AS group_id,
       e.vec_id = coalesce(c.group_id, e.vec_id) AS is_keeper
FROM embeddings e LEFT JOIN comp c ON c.vec_id = e.vec_id
""",
        # IVF probing every cell is exact -> same oracle as brute force.
        "sim_ivf_topk": _ivf_topk_sql(n_cells=8, iters=2, dim=64,
                                      n_probe=6, n_neighbors=3),
        "text_bpe_tokens": f"""
WITH tok AS (
  SELECT doc_id,
         regexp_extract_all(text,
           '''(?:s|d|m|t|ll|ve|re)| ?\\p{{L}}+| ?\\p{{N}}+| ?[^\\s\\p{{L}}\\p{{N}}]+')
           AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_distinct(list_transform(toks, t -> trim(t)))) AS BIGINT)
         AS n_distinct_bpe_tokens
FROM tok
""",
        "text_quality_filter": f"""
WITH tok AS (SELECT doc_id, text, lang, n_chars AS n_chars_col,
                    {SQL_TOKS_RAW} AS toks FROM documents),
sc AS (
  SELECT doc_id, lang,
         CAST(length(text) AS BIGINT) AS n_chars,
         (length(text) - length(regexp_replace(text, '[,.!?;:]', '', 'g')))
           / greatest(length(text), 1) AS punct_ratio,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
           / greatest(length(text), 1) AS alpha_ratio
  FROM tok
)
SELECT doc_id, lang, n_chars FROM sc
WHERE n_chars >= 100 AND punct_ratio <= 0.2 AND alpha_ratio >= 0.5
""",
        "graph_components": SQL_COMPONENTS,
        "dedup_span_removal": f"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKS} AS toks
  FROM documents
),
grams AS (
  -- gkey mirrors the engine's 16-hex md5 prefix of the gram text: the
  -- Spark side never shuffles gram strings, and grouping by the same
  -- key here keeps even a hash collision value-identical on both sides
  SELECT doc_id, i AS start,
         substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 16) AS gkey
  FROM tok, unnest(range(1, len(toks) - 6)) AS r(i)
),
dup AS (SELECT gkey FROM grams GROUP BY gkey HAVING count(DISTINCT doc_id) >= 2),
covered AS (
  SELECT DISTINCT g.doc_id, g.start + u.o AS pos
  FROM grams g JOIN dup USING (gkey), unnest(range(0, 8)) AS u(o)
),
pos AS (
  SELECT doc_id, i AS pos, toks[i] AS tok
  FROM tok, unnest(range(1, len(toks) + 1)) AS r(i)
),
kept AS (
  SELECT p.doc_id, p.pos, p.tok
  FROM pos p ANTI JOIN covered c ON p.doc_id = c.doc_id AND p.pos = c.pos
),
reb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         count(*) AS kept_n
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       len(t.toks) AS n_tokens,
       len(t.toks) - coalesce(r.kept_n, 0) AS n_removed
FROM tok t LEFT JOIN reb r USING (doc_id)
""",
        "dedup_representatives": f"""
WITH RECURSIVE tok AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest({SQL_SHINGLES}) AS shingle FROM tok),
mh AS (
  SELECT doc_id, b.band, min(md5(CAST(b.band AS VARCHAR) || '|' || shingle)) AS sig
  FROM sh CROSS JOIN (VALUES (1), (2), (3), (4)) b(band)
  GROUP BY doc_id, b.band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM mh a JOIN mh c ON a.band = c.band AND a.sig = c.sig AND a.doc_id < c.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
shared AS (
  SELECT cd.doc_a, cd.doc_b, count(*) AS shared
  FROM cand cd
  JOIN sh a ON a.doc_id = cd.doc_a
  JOIN sh b ON b.doc_id = cd.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
ver AS (
  SELECT doc_a, doc_b
  FROM shared
  JOIN sizes na ON na.doc_id = doc_a
  JOIN sizes nb ON nb.doc_id = doc_b
  WHERE shared / (na.n + nb.n - shared) >= 0.2
),
und AS (
  SELECT doc_a AS src, doc_b AS dst FROM ver
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM ver
),
reach(a, b) AS (
  SELECT src AS a, src AS b FROM und
  UNION
  SELECT r.a, u.dst FROM reach r JOIN und u ON u.src = r.b
),
comp AS (SELECT a AS node_id, min(b) AS component FROM reach GROUP BY a),
clusters AS (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
)
SELECT d.doc_id,
       CAST(coalesce(cl.cluster_size, 1) AS BIGINT) AS cluster_size
FROM documents d
LEFT JOIN clusters cl ON cl.component = d.doc_id
WHERE d.doc_id NOT IN (SELECT node_id FROM comp WHERE node_id <> component)
""",
        "snapshot_timeline": f"""
WITH {SQL_F},
fd AS (SELECT DISTINCT finding_id, subject_node, found_at FROM f),
b AS (SELECT min(found_at) AS lo, max(found_at) AS hi FROM fd),
tl AS (
  SELECT lo + (hi - lo) * v.i // 4 AS ts
  FROM b CROSS JOIN (VALUES (1), (2), (3), (4)) v(i)
)
SELECT ts, subject_node AS node_id, found_at AS node_ts, finding_id
FROM (
  SELECT tl.ts, fd.*, row_number() OVER (
    PARTITION BY tl.ts, fd.subject_node
    ORDER BY fd.found_at DESC, fd.finding_id DESC) AS rn
  FROM tl JOIN fd ON fd.found_at <= tl.ts) q
WHERE rn = 1
""",
        "curate_repetition": f"""
WITH lines AS (
  SELECT doc_id, trim(l) AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents)
  WHERE trim(l) <> ''
),
lc AS (
  SELECT doc_id, line, count(*) AS cnt, length(line) AS ln
  FROM lines GROUP BY 1, 2
),
ls AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_lines,
         (sum(cnt) - count(*)) / greatest(sum(cnt), 1) AS dup_line_frac,
         sum(CASE WHEN cnt > 1 THEN cnt * ln ELSE 0 END)
           / greatest(sum(cnt * ln), 1) AS dup_line_char_frac
  FROM lc GROUP BY 1
),
toks AS (SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents),
tc AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
tstat AS (
  SELECT doc_id, max(cnt) / greatest(sum(cnt), 1) AS top_token_frac
  FROM tc GROUP BY 1
)
SELECT d.doc_id,
       coalesce(ls.n_lines, 0) AS n_lines,
       coalesce(ls.dup_line_frac, 0.0) AS dup_line_frac,
       coalesce(ls.dup_line_char_frac, 0.0) AS dup_line_char_frac,
       coalesce(tstat.top_token_frac, 0.0) AS top_token_frac
FROM documents d
LEFT JOIN ls ON ls.doc_id = d.doc_id
LEFT JOIN tstat ON tstat.doc_id = d.doc_id
""",
        "curate_pack": f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({SQL_TOKS_RAW}) AS BIGINT) AS n_tokens,
         doc_id % 32 AS grp
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens, grp,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY grp ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(grp * 1099511627776 + cumb // 256 AS BIGINT) AS pack_id,
       CAST(cumb % 256 AS BIGINT) AS pack_pos
FROM c
""",
        "curate_hash_sample": """
SELECT doc_id, n_chars FROM documents
WHERE substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
""",
        "curate_stratified_sample": """
SELECT doc_id, lang, CAST(rk AS BIGINT) AS sample_rank FROM (
  SELECT doc_id, lang, row_number() OVER (
    PARTITION BY lang
    ORDER BY md5('s42:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents) t
WHERE rk <= 25
""",
        "curate_pii_scrub": f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{CU.EMAIL_PATTERN}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{CU.IPV4_PATTERN}')) AS BIGINT)
         AS n_ips,
       CAST(len(regexp_extract_all(text, '{CU.PHONE_PATTERN}')) AS BIGINT)
         AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{CU.EMAIL_PATTERN}', '<EMAIL>', 'g'),
           '{CU.IPV4_PATTERN}', '<IP>', 'g'),
         '{CU.PHONE_PATTERN}', '<PHONE>', 'g') AS scrubbed_text
FROM documents
""",
        "curate_shuffle_shards": """
WITH s AS (
  SELECT doc_id, md5('s42:' || CAST(doc_id AS VARCHAR)) AS sort_key
  FROM documents
)
SELECT doc_id,
       CAST(((position(substr(sort_key, 1, 1) IN '0123456789abcdef') - 1) * 16
             + position(substr(sort_key, 2, 1) IN '0123456789abcdef') - 1)
            % 8 AS BIGINT) AS shard,
       sort_key
FROM s
""",
        "curate_chunks": """
WITH s AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
           CAST(greatest(length(text) - 1, 0) AS BIGINT), 150)) AS start
  FROM documents
)
SELECT doc_id,
       CAST(start // 150 AS BIGINT) AS chunk_idx,
       substr(text, CAST(start + 1 AS INT), 200) AS chunk_text,
       CAST(length(substr(text, CAST(start + 1 AS INT), 200)) AS BIGINT)
         AS chunk_len
FROM s
""",
        "curate_decontaminate": f"""
WITH tk AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           range(1, greatest(len(toks) - 7, 0) + 1),
           i -> md5(array_to_string(list_slice(toks, i, i + 7), ' '))
         )) AS gram_hash
  FROM tk
),
tg AS (SELECT * FROM grams WHERE doc_id % 5 <> 0),
eh AS (SELECT DISTINCT gram_hash FROM grams WHERE doc_id % 5 = 0),
pd AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY 1),
hc AS (
  SELECT doc_id, count(*) AS n_hit_grams
  FROM tg WHERE gram_hash IN (SELECT gram_hash FROM eh) GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(pd.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(hc.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
       coalesce(hc.n_hit_grams, 0) * 1.0
         / greatest(coalesce(pd.n_grams, 0), 1) AS hit_ratio,
       (coalesce(hc.n_hit_grams, 0) * 1.0
         / greatest(coalesce(pd.n_grams, 0), 1)) > 0.0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0) d
LEFT JOIN pd ON pd.doc_id = d.doc_id
LEFT JOIN hc ON hc.doc_id = d.doc_id
""",
        "dedup_exact_incremental": """
WITH nd AS (
  SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 4 = 0
),
cd AS (
  SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 4 <> 0
)
SELECT doc_id, digest,
       digest IN (SELECT digest FROM cd) AS is_duplicate
FROM nd
""",
        "dedup_minhash_incremental": f"""
WITH tok AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest({SQL_SHINGLES}) AS shingle FROM tok),
mh AS (
  SELECT doc_id, b.band, min(md5(CAST(b.band AS VARCHAR) || '|' || shingle)) AS sig
  FROM sh CROSS JOIN (VALUES (1), (2), (3), (4)) b(band)
  GROUP BY doc_id, b.band
)
SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
FROM mh n JOIN mh c ON n.band = c.band AND n.sig = c.sig
WHERE n.doc_id % 4 = 0 AND c.doc_id % 4 <> 0 AND n.doc_id <> c.doc_id
""",
        "graph_triangles": f"""
WITH {SQL_F},
{SQL_KEPT_OVERWRITE},
e AS (
  SELECT DISTINCT least(subject_node, target_node) AS p,
                  greatest(subject_node, target_node) AS q
  FROM kept WHERE subject_node <> target_node
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT p AS v FROM e UNION ALL SELECT q AS v FROM e) GROUP BY 1
),
o AS (
  SELECT CASE WHEN dp.deg < dq.deg OR (dp.deg = dq.deg AND e.p < e.q)
              THEN e.p ELSE e.q END AS a,
         CASE WHEN dp.deg < dq.deg OR (dp.deg = dq.deg AND e.p < e.q)
              THEN e.q ELSE e.p END AS b
  FROM e JOIN deg dp ON dp.v = e.p JOIN deg dq ON dq.v = e.q
),
tri AS (
  SELECT o1.a, o1.b AS m, o2.b AS c
  FROM o o1
  JOIN o o2 ON o2.a = o1.b
  JOIN o o3 ON o3.a = o1.a AND o3.b = o2.b
),
cc AS (
  SELECT v, CAST(count(*) AS BIGINT) AS triangles FROM (
    SELECT a AS v FROM tri
    UNION ALL SELECT m AS v FROM tri
    UNION ALL SELECT c AS v FROM tri) GROUP BY 1
)
SELECT deg.v AS node_id, deg.deg AS degree,
       coalesce(cc.triangles, 0) AS triangles,
       CASE WHEN deg.deg >= 2
            THEN 2.0 * coalesce(cc.triangles, 0) / (deg.deg * (deg.deg - 1))
            ELSE 0.0 END AS clustering_coeff
FROM deg LEFT JOIN cc ON cc.v = deg.v
""",
        "events_sessionize": """
WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
m AS (
  SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
                   OR ts_ms - lag(ts_ms) OVER w > 1800000
            THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
)
SELECT event_id, user_id, ts_ms,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
            ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx,
       CAST(user_id * 1048576
            + sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
              ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
FROM m
""",
        "events_session_stats": """
WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
m AS (
  SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
                   OR ts_ms - lag(ts_ms) OVER w > 1800000
            THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
),
s AS (
  SELECT user_id, ts_ms,
         CAST(user_id * 1048576
              + sum(is_new) OVER (PARTITION BY user_id
                ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) - 1
              AS BIGINT) AS session_id
  FROM m
)
SELECT session_id, any_value(user_id) AS user_id,
       min(ts_ms) AS session_start, max(ts_ms) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       max(ts_ms) - min(ts_ms) AS duration_ms
FROM s GROUP BY 1
""",
        "temporal_asof": """
WITH e AS (SELECT event_id, user_id, event_type, value,
                  epoch_ms(ts) AS ts_ms FROM events),
clicks AS (SELECT event_id, user_id, ts_ms FROM e
           WHERE event_type = 'click'),
errors AS (
  SELECT user_id, ts_ms, max(event_id) AS err_id,
         arg_max(value, event_id) AS err_value
  FROM e WHERE event_type = 'error' GROUP BY 1, 2
)
SELECT c.event_id, c.user_id, c.ts_ms,
       coalesce(r.ts_ms, -1) AS asof_ts_ms,
       coalesce(r.err_id, -1) AS asof_err_id,
       coalesce(r.err_value, -1.0) AS asof_err_value
FROM clicks c ASOF LEFT JOIN errors r
  ON c.user_id = r.user_id AND c.ts_ms >= r.ts_ms
""",
        "snapshot_incremental_nodes": f"""
WITH {SQL_F}, {SQL_KEPT_OVERWRITE}
SELECT subject_node, found_at, finding_id FROM kept
""",
        "snapshot_incremental_links": f"""
WITH {SQL_F},
s AS (
  SELECT least(subject_node, target_node) AS p1,
         greatest(subject_node, target_node) AS p2,
         subject_node, target_node, link_state, found_at, finding_id
  FROM f
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY p1, p2 ORDER BY found_at DESC, finding_id DESC) AS rn
  FROM s
)
SELECT p1, p2, subject_node, target_node, link_state, found_at
FROM r WHERE rn = 1
""",
        "events_funnel": """
WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
r1 AS (SELECT user_id, min(ts_ms) AS t FROM e
       WHERE event_type = 'signup' GROUP BY 1),
r2 AS (SELECT e.user_id, min(e.ts_ms) AS t
       FROM e JOIN r1 ON e.user_id = r1.user_id AND e.ts_ms >= r1.t
       WHERE e.event_type = 'click' GROUP BY 1),
r3 AS (SELECT e.user_id, min(e.ts_ms) AS t
       FROM e JOIN r2 ON e.user_id = r2.user_id AND e.ts_ms >= r2.t
       WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT CAST(1 AS INT) AS stage_idx, 'signup' AS stage,
       CAST(count(*) AS BIGINT) AS n_users FROM r1
UNION ALL
SELECT 2, 'click', count(*) FROM r2
UNION ALL
SELECT 3, 'purchase', count(*) FROM r3
""",
        "embed_truncate": """
WITH n AS (
  SELECT vec_id,
         sqrt(list_sum(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n_full,
         sqrt(list_sum(list_transform(embedding[1:16],
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n_k
  FROM embeddings
)
SELECT vec_id, round(n_full, 4) AS norm_full, round(n_k, 4) AS norm_k,
       round(CASE WHEN n_full > 0 THEN n_k / n_full ELSE 0 END, 4)
         AS retention
FROM n
""",
        "temporal_asof_forward": """
WITH e AS (SELECT event_id, user_id, event_type, value,
                  epoch_ms(ts) AS ts_ms FROM events),
clicks AS (SELECT event_id, user_id, ts_ms FROM e
           WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, ts_ms, min(event_id) AS p_id,
         arg_min(value, event_id) AS p_value
  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.event_id, c.user_id, c.ts_ms,
       CASE WHEN r.ts_ms IS NOT NULL AND r.ts_ms - c.ts_ms <= 3600000
            THEN r.ts_ms ELSE -1 END AS asof_ts_ms,
       CASE WHEN r.ts_ms IS NOT NULL AND r.ts_ms - c.ts_ms <= 3600000
            THEN r.p_id ELSE -1 END AS asof_p_id,
       CASE WHEN r.ts_ms IS NOT NULL AND r.ts_ms - c.ts_ms <= 3600000
            THEN r.p_value ELSE -1.0 END AS asof_p_value
FROM clicks c ASOF LEFT JOIN purchases r
  ON c.user_id = r.user_id AND c.ts_ms < r.ts_ms
""",
        "temporal_interval_join": """
WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
           FROM events),
err AS (SELECT * FROM e WHERE event_type = 'error'),
m AS (
  SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
                   OR ts_ms - lag(ts_ms) OVER w > 1800000
            THEN 1 ELSE 0 END AS is_new
  FROM err WINDOW w AS (ORDER BY ts_ms, event_id)
),
s AS (
  SELECT ts_ms,
         CAST(sum(is_new) OVER (ORDER BY ts_ms, event_id
              ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS incident_id
  FROM m
),
st AS (
  SELECT incident_id,
         min(ts_ms) - 600000 AS w_start,
         max(ts_ms) + 600000 AS w_end
  FROM s GROUP BY 1
)
SELECT c.event_id, c.user_id, c.ts_ms, st.incident_id
FROM e c JOIN st ON c.ts_ms BETWEEN st.w_start AND st.w_end
WHERE c.event_type = 'click'
""",
        "curate_topk_per_source": """
WITH r AS (
  SELECT doc_id, source, n_chars,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
         ) AS BIGINT) AS rk
  FROM documents
)
SELECT doc_id, source, n_chars, rk FROM r WHERE rk <= 3
""",
        "tpch_q18": """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 4) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       o.o_totalprice AS totalprice, b.sum_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
        "graph_sssp": f"""
WITH RECURSIVE {SQL_F},
e AS (
  SELECT subject_node AS src, target_node AS dst,
         min(finding_id % 10 + 1) AS w
  FROM f GROUP BY 1, 2
),
walk(node_id, dist, hops) AS (
  SELECT node_id, CAST(0 AS BIGINT) AS dist, 0 AS hops
  FROM (VALUES ('1'), ('2')) v(node_id)
  UNION
  SELECT e.dst, w.dist + e.w, w.hops + 1
  FROM walk w JOIN e ON e.src = w.node_id
  WHERE w.hops < 6
)
SELECT node_id, min(dist) AS dist FROM walk GROUP BY 1
""",
        "multimodal_media_metadata": """
SELECT event_id AS media_id,
  CASE WHEN event_id % 2 = 0 THEN 'mp3' ELSE 'mp4' END AS format,
  CASE WHEN event_id % 2 = 0 THEN
    CAST((10 + event_id % 20) * 1152 AS DOUBLE) /
      (CASE event_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END)
  ELSE CAST(1000 + event_id % 5000 AS DOUBLE) / 1000 END AS duration_s,
  CASE WHEN event_id % 2 = 0 THEN
    CAST(CASE event_id % 3 WHEN 0 THEN 32 WHEN 1 THEN 40 ELSE 48 END AS DOUBLE)
  ELSE CAST(-1 AS DOUBLE) END AS bitrate_kbps,
  CASE WHEN event_id % 2 = 0 THEN
    CAST(CASE event_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
         AS BIGINT)
  ELSE CAST(-1 AS BIGINT) END AS sample_rate,
  CASE WHEN event_id % 2 = 0 THEN
    CAST(CASE WHEN event_id % 4 = 0 THEN 1 ELSE 2 END AS INT)
  ELSE CAST(-1 AS INT) END AS channels,
  CASE WHEN event_id % 2 = 0 THEN CAST(10 + event_id % 20 AS BIGINT)
  ELSE CAST(-1 AS BIGINT) END AS n_frames,
  CASE WHEN event_id % 2 = 1 THEN CAST(16 * (1 + event_id % 8) AS INT)
  ELSE CAST(-1 AS INT) END AS width,
  CASE WHEN event_id % 2 = 1 THEN CAST(16 * (1 + event_id % 6) AS INT)
  ELSE CAST(-1 AS INT) END AS height,
  CASE WHEN event_id % 2 = 1 THEN
    CAST(CASE WHEN event_id % 4 = 1 THEN 2 ELSE 1 END AS INT)
  ELSE CAST(-1 AS INT) END AS n_tracks
FROM events WHERE event_id % 25 = 3
""",
        "multimodal_jpeg_progressive": """
SELECT event_id AS media_id,
       CAST(3 + event_id % 6 AS INT) AS width,
       CAST(2 + event_id % 5 AS INT) AS height,
       CAST(event_id % 256 AS DOUBLE) AS mean_r,
       CAST(event_id % 256 AS DOUBLE) AS mean_g,
       CAST(event_id % 256 AS DOUBLE) AS mean_b
FROM events WHERE event_id % 25 = 11
""",
        "multimodal_jpeg_decode": """
SELECT event_id AS media_id,
       CAST(3 + event_id % 6 AS INT) AS width,
       CAST(2 + event_id % 5 AS INT) AS height,
       CAST(event_id % 256 AS DOUBLE) AS mean_r,
       CAST(event_id % 256 AS DOUBLE) AS mean_g,
       CAST(event_id % 256 AS DOUBLE) AS mean_b
FROM events WHERE event_id % 25 = 19
""",
        "multimodal_gif_decode": """
SELECT event_id AS media_id,
       CAST(3 + event_id % 5 AS INT) AS width,
       CAST(2 + event_id % 4 AS INT) AS height,
       CAST(event_id % 256 AS DOUBLE) AS mean_r,
       CAST((event_id * 11) % 256 AS DOUBLE) AS mean_g,
       CAST((event_id * 17) % 256 AS DOUBLE) AS mean_b
FROM events WHERE event_id % 25 = 7
""",
        "multimodal_png_decode": """
SELECT event_id AS media_id,
       CAST(4 + event_id % 6 AS INT) AS width,
       CAST(3 + event_id % 5 AS INT) AS height,
       (event_id % 199) + ((3 + event_id % 5) - 1) / 2.0 AS mean_r,
       (event_id % 199)
         + CASE WHEN event_id % 3 = 0 THEN 0 ELSE 10 END
         + ((3 + event_id % 5) - 1) / 2.0 AS mean_g,
       (event_id % 199)
         + CASE WHEN event_id % 3 = 0 THEN 0 ELSE 20 END
         + ((3 + event_id % 5) - 1) / 2.0 AS mean_b
FROM events WHERE event_id % 25 = 13
""",
        "multimodal_image_decode": """
SELECT event_id AS media_id,
       CAST(5 + event_id % 7 AS INT) AS width,
       CAST(3 + event_id % 5 AS INT) AS height,
       CAST(event_id % 256 AS DOUBLE) AS mean_r,
       CAST((event_id * 7) % 256 AS DOUBLE) AS mean_g,
       CAST((event_id * 13) % 256 AS DOUBLE) AS mean_b
FROM events WHERE event_id % 25 = 0
""",
        "stream_dedup_digests": """
SELECT DISTINCT md5(text) AS digest FROM documents
""",
        "stream_stream_join": """
WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
           FROM events)
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       c.user_id, c.ts_ms AS click_ms, p.ts_ms AS purchase_ms
FROM e c JOIN e p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts_ms > c.ts_ms AND p.ts_ms <= c.ts_ms + 14400000
""",
        "stream_sessionize": """
WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
m AS (SELECT max(ts_ms) AS mx FROM e),
s AS (
  SELECT user_id, ts_ms,
         CASE WHEN lag(ts_ms) OVER w IS NULL
                OR ts_ms - lag(ts_ms) OVER w >= 1800000
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)
),
i AS (
  SELECT user_id, ts_ms,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM s
),
g AS (
  SELECT user_id,
         min(ts_ms) AS session_start_ms,
         max(ts_ms) + 1800000 AS session_end_ms,
         CAST(count(*) AS BIGINT) AS n_events
  FROM i GROUP BY user_id, island
)
SELECT user_id, session_start_ms, session_end_ms, n_events
FROM g, m WHERE session_end_ms <= mx - 7200000
""",
        "multimodal_audio_decode": """
SELECT event_id AS media_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(400 + event_id % 100 AS BIGINT) AS n_frames,
       CAST(1 + event_id % 2 AS INT) AS n_channels,
       (400 + event_id % 100) / 8000.0 AS duration_s
FROM events WHERE event_id % 20 = 0
""",
        "stream_windowed_stats": """
WITH e AS (SELECT event_type, epoch_ms(ts) AS ts_ms, value FROM events),
m AS (SELECT max(ts_ms) AS mx FROM e),
w AS (
  SELECT event_type,
         (ts_ms // 3600000) * 3600000 AS window_start_ms,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 4) AS value_sum,
         min(value) AS value_min, max(value) AS value_max
  FROM e GROUP BY 1, 2
)
SELECT event_type, window_start_ms,
       window_start_ms + 3600000 AS window_end_ms,
       n_events, value_sum, value_min, value_max
FROM w, m
WHERE window_start_ms + 3600000 <= m.mx - 7200000
""",
        "stream_latest_per_node": f"""
WITH {SQL_F}
SELECT subject_node, max(found_at) AS found_at FROM f GROUP BY 1
""",
        "stream_latest_link_per_pair": f"""
WITH {SQL_F},
s AS (
  SELECT least(subject_node, target_node) AS p1,
         greatest(subject_node, target_node) AS p2,
         subject_node, target_node, link_state, found_at, finding_id
  FROM f
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY p1, p2 ORDER BY found_at DESC, finding_id DESC) AS rn
  FROM s
)
SELECT p1, p2, subject_node, target_node, link_state, found_at
FROM r WHERE rn = 1
""",
        "temporal_rollup": """
WITH e AS (SELECT event_type, epoch_ms(ts) AS ts_ms, value FROM events),
r1 AS (
  SELECT event_type, CAST(3600000 AS BIGINT) AS resolution,
         (ts_ms // 3600000) * 3600000 AS bucket_start,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 4) AS value_sum,
         min(value) AS value_min, max(value) AS value_max,
         round(sum(value), 4) / count(*) AS value_avg
  FROM e GROUP BY 1, 3
),
r2 AS (
  SELECT event_type, CAST(86400000 AS BIGINT) AS resolution,
         (ts_ms // 86400000) * 86400000 AS bucket_start,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 4) AS value_sum,
         min(value) AS value_min, max(value) AS value_max,
         round(sum(value), 4) / count(*) AS value_avg
  FROM e GROUP BY 1, 3
)
SELECT * FROM r1 UNION ALL SELECT * FROM r2
""",
        "graph_pagerank": _pagerank_sql(n_iter=10),
        "graph_kcore": _kcore_sql(k=2, rounds=15),
        "text_common_ngrams": f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKS} AS toks FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, unnest({SQL_SHINGLES}) AS ngram
  FROM t WHERE len(toks) >= 3
),
counts AS (
  SELECT ngram, CAST(count(*) AS BIGINT) AS doc_freq FROM grams GROUP BY 1
)
SELECT ngram, doc_freq,
       CAST(row_number() OVER (ORDER BY doc_freq DESC, ngram ASC) AS BIGINT)
         AS rank
FROM counts ORDER BY doc_freq DESC, ngram ASC LIMIT 20
""",
        "text_bm25": _bm25_sql(BM25_TERMS, top_k=10),
        "curate_weighted_sample": f"""
WITH h AS (
  SELECT doc_id,
         CAST({SK.hex15_to_long_sql(SK.md5_sql('doc_id'))} AS DOUBLE)
           / 1152921504606846976.0 AS u,
         CAST(n_chars AS DOUBLE) AS w
  FROM documents
),
keyed AS (
  SELECT doc_id, CASE WHEN w > 0 THEN ln(u) / w END AS es_key FROM h
)
SELECT doc_id, es_key,
       CAST(row_number() OVER (ORDER BY es_key DESC, doc_id ASC) AS BIGINT)
         AS wr_rank
FROM keyed WHERE es_key IS NOT NULL
ORDER BY es_key DESC, doc_id ASC LIMIT 50
""",
        "events_quantiles": """
WITH e AS (SELECT event_type, value FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       min(value) AS value_min,
       max(value) AS value_max,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99
FROM e GROUP BY 1
""",
        "sim_knn_join": """
WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0),
el AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         unnest(a.embedding) AS qe, unnest(b.embedding) AS ce
  FROM s a CROSS JOIN s b WHERE a.vec_id <> b.vec_id
),
scored AS (
  SELECT query_id, neighbor_id,
         sum(CAST(qe AS DOUBLE) * CAST(ce AS DOUBLE))
           / (sqrt(sum(CAST(qe AS DOUBLE) * CAST(qe AS DOUBLE)))
              * sqrt(sum(CAST(ce AS DOUBLE) * CAST(ce AS DOUBLE)))) AS cos
  FROM el GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= 3
""",
        "embed_quantize_int8": """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM e
),
q AS (
  SELECT vec_id, scale,
         CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
         END AS qvec
  FROM s
)
SELECT vec_id, scale,
       CAST(list_sum(qvec) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(qvec, x -> abs(x))) AS BIGINT) AS q_l1,
       CAST(list_max(qvec) AS INT) AS q_max
FROM q
""",
        # cluster_kmeans / dedup_semantic: the Lloyd's chain is fully
        # deterministic (md5 init, (dist, cid) tie-break), so the
        # clustering has an EXACT oracle — the same iterations unrolled
        # as CTEs by _kmeans_cte_sql, training on the same bounded
        # md5 sample (train_n=1024) the Spark side uses; the final
        # frozen-centroid assignment covers every row.
        "cluster_kmeans": (
            _kmeans_cte_sql(k=8, iters=2, train_limit=1024)[0]
            + f"""
SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id
FROM {_kmeans_cte_sql(k=8, iters=2, train_limit=1024)[1]}
"""
        ),
        "dedup_semantic": (
            _kmeans_cte_sql(k=8, iters=2, train_limit=1024)[0]
            + f""",
pairs AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb, a.v AS va, b.v AS vb
  FROM {_kmeans_cte_sql(k=8, iters=2, train_limit=1024)[1]} a
  JOIN {_kmeans_cte_sql(k=8, iters=2, train_limit=1024)[1]} b
    ON a.cid = b.cid AND b.vec_id < a.vec_id
),
elp AS (
  SELECT ida, idb, unnest(va) AS xa, unnest(vb) AS xb FROM pairs
),
cosp AS (
  SELECT ida, idb,
         sum(xa * xb) / (sqrt(sum(xa * xa)) * sqrt(sum(xb * xb))) AS cos
  FROM elp GROUP BY 1, 2
),
dups AS (SELECT DISTINCT ida AS vec_id FROM cosp WHERE cos >= 0.3)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster_id,
       (d.vec_id IS NOT NULL) AS is_dup
FROM {_kmeans_cte_sql(k=8, iters=2)[1]} a LEFT JOIN dups d USING (vec_id)
"""
        ),
        "sim_pq_topk": _pq_topk_sql(m=32, k=256, iters=1, dim=64,
                                    n_neighbors=3, train_limit=1024),
        "sim_ivfpq_topk": _ivfpq_topk_sql(m=32, k=256, iters=1, dim=64,
                                          n_neighbors=3, n_cells=8,
                                          coarse_iters=2, n_probe=7,
                                          train_limit=1024),
        "sim_ivfpq_residual": _ivfpq_topk_sql(m=32, k=256, iters=2,
                                              dim=64, n_neighbors=3,
                                              n_cells=8, coarse_iters=2,
                                              n_probe=7, residual=True,
                                              train_limit=1024),
        "sim_ivfpq_add": _ivfpq_add_sql(m=32, k=256, iters=1, dim=64,
                                        n_neighbors=3, n_cells=8,
                                        coarse_iters=2, n_probe=7,
                                        train_limit=1024),
        # warc extract: the archive round-trips the text, so every
        # output is an analytic function of the documents columns;
        # the text chain replays html_to_text minus the script/style
        # rule, a no-op under the shared no-'<' guard.
        "multimodal_warc_extract": """
SELECT doc_id * 100000 AS doc_id,
       'http://crawl.test/' || CAST(doc_id AS VARCHAR) AS target_uri,
       trim(regexp_replace(
         replace(replace(replace(replace(replace(replace(
           regexp_replace(text, '<[^>]*>', ' ', 'g'),
           '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
           '&quot;', '"'), chr(38) || chr(35) || '39;', chr(39)),
           '&nbsp;', ' '),
         '\\s+', ' ', 'g')) AS text
FROM documents
WHERE text NOT LIKE '%<%'
""",
        # url dedup: the oracle computes the canonical form DIRECTLY
        # from doc_id arithmetic — matching forces every Spark-side
        # canonicalization rule to land exactly there.
        "curate_url_dedup": """
WITH c AS (
  SELECT doc_id,
         'http://site' || CAST(doc_id % 5 AS VARCHAR)
           || '.com/page/' || CAST(doc_id % 40 AS VARCHAR)
           || CASE WHEN doc_id % 3 = 2 THEN '' ELSE '?a=1&b=2' END
           AS canonical_url
  FROM documents
),
k AS (SELECT canonical_url, min(doc_id) AS keeper_id FROM c GROUP BY 1)
SELECT c.doc_id, c.canonical_url, k.keeper_id,
       c.doc_id <> k.keeper_id AS is_dup
FROM c JOIN k USING (canonical_url)
""",
        "curate_host_quota": """
SELECT doc_id,
       'host' || CAST(doc_id % 5 AS VARCHAR) || '.com' AS host
FROM (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id % 5
                            ORDER BY doc_id) AS rk
  FROM documents) t
WHERE rk <= 30
""",
        "curate_sitemap_urls": """
SELECT doc_id AS sitemap_id,
       'http://crawl.test/' || CAST(doc_id AS VARCHAR) || '/' || s
         AS url,
       false AS is_index
FROM documents, (SELECT unnest(['a', 'b']) AS s)
""",
        # robots rules: the oracle KNOWS which (host, allow, prefix)
        # rows the synthesized corpus must parse into — hosts 0-3 get
        # exactly the three '*'-group rules (badbot group ignored,
        # comment stripped, empty Disallow and Crawl-delay dropped),
        # host 4 none.
        "curate_robots_rules": """
WITH h AS (
  SELECT DISTINCT doc_id % 5 AS h FROM documents WHERE doc_id % 5 <> 4
),
r(allow, path_prefix) AS (
  VALUES (false, '/private/'), (true, '/private/ok/'), (false, '/tmp'),
         (false, '/*.json$'), (false, '/sea*rch$'), (false, '/*?sid=')
)
SELECT 'host' || CAST(h AS VARCHAR) || '.test' AS host,
       allow, path_prefix
FROM h CROSS JOIN r
""",
        # robots filter: allowed is an analytic function of doc_id —
        # host 4 has no '*' rules (default allow); elsewhere /doc/ has
        # no matching prefix, /private/ok/ wins by longest match,
        # /private/ + /tmp are disallowed, and patterns match
        # path+query (the kept ?q= defeats the $ anchor; ?sid= is
        # caught by the query-targeting wildcard).
        "curate_robots_filter": """
SELECT doc_id,
       'http://host' || CAST(doc_id % 5 AS VARCHAR) || '.test'
         || CASE WHEN doc_id % 8 = 0 THEN '/doc/' || CAST(doc_id AS VARCHAR)
                 WHEN doc_id % 8 = 1 THEN '/private/p' || CAST(doc_id AS VARCHAR)
                 WHEN doc_id % 8 = 2 THEN '/private/ok/q' || CAST(doc_id AS VARCHAR)
                 WHEN doc_id % 8 = 3 THEN '/tmp' || CAST(doc_id AS VARCHAR)
                 WHEN doc_id % 8 = 4 THEN '/data/' || CAST(doc_id AS VARCHAR) || '.json'
                 WHEN doc_id % 8 = 5 THEN '/files/f' || CAST(doc_id AS VARCHAR) || '.jsonx'
                 WHEN doc_id % 16 = 6 THEN '/search?q=' || CAST(doc_id AS VARCHAR)
                 WHEN doc_id % 16 = 14 THEN '/item' || CAST(doc_id AS VARCHAR) || '?sid=track'
                 ELSE '' END AS url,
       'host' || CAST(doc_id % 5 AS VARCHAR) || '.test' AS host,
       -- host 4: no '*' rules at all; cases 0/5/7 match no rule except
       -- host0's Disallow '/'; case 2's long Allow wins everywhere;
       -- case 6 (mod 16): /sea*rch$ must NOT match path+query, so
       -- allowed off host0; case 14 (mod 16): /*?sid= disallows
       (doc_id % 5 = 4) OR (doc_id % 8 = 2)
         OR (doc_id % 8 IN (0, 5, 7) AND doc_id % 5 <> 0)
         OR (doc_id % 16 = 6 AND doc_id % 5 <> 0) AS allowed
FROM documents
""",
        # host authority: the same unrolled integer power method as
        # graph_pagerank, over the analytic host edge list (every host
        # links to (h+1)%5; only hosts 0-2 also link to (h+2)%5, so
        # the graph is irregular and ranks differ; the relative
        # self-link is a self-loop pagerank drops).
        "graph_host_rank": _pagerank_sql(
            n_iter=10,
            edges_sql="""
  SELECT DISTINCT
         'host' || CAST(h AS VARCHAR) || '.test' AS src,
         'host' || CAST((h + o) % 5 AS VARCHAR) || '.test' AS dst
  FROM (SELECT DISTINCT doc_id % 5 AS h FROM documents) hs,
       (SELECT unnest([1, 2]) AS o) os
  WHERE o = 1 OR h < 3
""",
        ),
        # crawl frontier pipeline: the distinct canonical frontier is a
        # function of the doc_id % 20 residues (all present at every
        # sf) — /page/ and the re-allowed /private/ok/ survive robots,
        # /private/x survives only on the rule-less host 4; then the
        # same row_number quota as curate_host_quota at 5.
        "pipeline_crawl_frontier": """
WITH k AS (SELECT DISTINCT doc_id % 20 AS k20 FROM documents),
u AS (
  SELECT 'http://host' || CAST(k20 % 5 AS VARCHAR) || '.test/page/'
           || CAST(k20 AS VARCHAR) AS url,
         'host' || CAST(k20 % 5 AS VARCHAR) || '.test' AS host,
         true AS allowed
  FROM k
  UNION ALL
  SELECT 'http://host' || CAST(k20 % 5 AS VARCHAR) || '.test/private/ok/'
           || CAST(k20 AS VARCHAR) || '?a=1&b=2',
         'host' || CAST(k20 % 5 AS VARCHAR) || '.test',
         true
  FROM k
  UNION ALL
  SELECT 'http://host' || CAST(k20 % 5 AS VARCHAR) || '.test/private/x'
           || CAST(k20 AS VARCHAR),
         'host' || CAST(k20 % 5 AS VARCHAR) || '.test',
         (k20 % 5 = 4)
  FROM k
),
a AS (SELECT url, host FROM u WHERE allowed),
q AS (
  SELECT url, host,
         row_number() OVER (PARTITION BY host ORDER BY url) AS rk
  FROM a
)
SELECT url, host FROM q WHERE rk <= 5
""",
        # end-to-end curation pipeline: every stage's effect is an
        # analytic function of doc_id — survivors are the docs no rule
        # killed (% 11 brace docs fail C4, % 3 ellipsis docs fail
        # Gopher), keepers are min-id per colliding cleaned text
        # ((doc_id % 13, doc_id % 5) classes), every keeper has exactly
        # 7 whitespace tokens, and the pack layout is the same
        # per-group running-sum window as curate_pack at window 64.
        "pipeline_curation": """
WITH surv AS (
  SELECT doc_id FROM documents
  WHERE doc_id % 11 <> 0 AND doc_id % 3 <> 0
),
ded AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY doc_id % 13, doc_id % 5)
             AS keeper
    FROM surv) q
  WHERE doc_id = keeper
),
t AS (
  SELECT doc_id, CAST(7 AS BIGINT) AS n_tokens, doc_id % 8 AS grp
  FROM ded
),
c AS (
  SELECT doc_id, n_tokens, grp,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY grp ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(grp * 1099511627776 + cumb // 64 AS BIGINT) AS pack_id,
       CAST(cumb % 64 AS BIGINT) AS pack_pos
FROM c
""",
        # bucketed join: bucketing changes the plan, never the answer —
        # the oracle is the plain join+agg.
        "layout_bucketed_join": """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       sum(l_quantity) AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
""",
        # host link graph: the edge list is an analytic function of
        # doc_id (absolute link to (d+1)%5, relative link = self edge,
        # every third doc a messy-cased link to (d+2)%5 whose host
        # must canonicalize), then one aggregate.
        "graph_host_links": """
WITH e AS (
  SELECT 'host' || CAST(doc_id % 5 AS VARCHAR) || '.test' AS src_host,
         'host' || CAST((doc_id + 1) % 5 AS VARCHAR) || '.test' AS dst_host
  FROM documents
  UNION ALL
  SELECT 'host' || CAST(doc_id % 5 AS VARCHAR) || '.test',
         'host' || CAST(doc_id % 5 AS VARCHAR) || '.test'
  FROM documents
  UNION ALL
  SELECT 'host' || CAST(doc_id % 5 AS VARCHAR) || '.test',
         'host' || CAST((doc_id + 2) % 5 AS VARCHAR) || '.test'
  FROM documents WHERE doc_id % 3 = 0
)
SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
FROM e GROUP BY 1, 2
""",
        "events_quantiles_sketch": f"""
WITH d AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v,
         {SK.md5_sql('event_id')} AS m5 FROM events
),
h AS (
  SELECT event_type, v, {SK.hex15_to_long_sql('m5')} AS h60 FROM d
),
r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY h60, v) AS rn
  FROM h
),
g AS (
  SELECT event_type, list(v ORDER BY v) AS vals,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM r WHERE rn <= 64 GROUP BY 1
),
p AS (
  SELECT event_type, n_kept, vals,
         CAST(n_kept - 1 AS DOUBLE) * 0.5 AS pos50,
         CAST(n_kept - 1 AS DOUBLE) * 0.9 AS pos90
  FROM g
)
SELECT event_type, n_kept,
  vals[CAST(floor(pos50) AS INT) + 1]
    + (pos50 - floor(pos50))
      * (vals[LEAST(CAST(floor(pos50) AS INT) + 2, CAST(n_kept AS INT))]
         - vals[CAST(floor(pos50) AS INT) + 1]) AS p50,
  vals[CAST(floor(pos90) AS INT) + 1]
    + (pos90 - floor(pos90))
      * (vals[LEAST(CAST(floor(pos90) AS INT) + 2, CAST(n_kept AS INT))]
         - vals[CAST(floor(pos90) AS INT) + 1]) AS p90
FROM p
""",
        "sketch_kmv_distinct": f"""
WITH d AS (
  SELECT DISTINCT event_type, {SK.md5_sql('user_id')} AS m5 FROM events
),
h AS (
  SELECT DISTINCT event_type, {SK.hex15_to_long_sql('m5')} AS h60 FROM d
),
r AS (
  SELECT event_type, h60,
         row_number() OVER (PARTITION BY event_type ORDER BY h60) AS rn
  FROM h
),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
         CAST(max(h60) AS DOUBLE) AS hk
  FROM r WHERE rn <= 16 GROUP BY 1
)
SELECT event_type, n_kept,
       CASE WHEN n_kept < 16 THEN n_kept
            ELSE CAST(round(15.0 * 1152921504606846976.0 / hk) AS BIGINT)
       END AS est_distinct
FROM g
""",
        "sketch_kmv_setops": f"""
WITH d AS (
  SELECT DISTINCT event_type, {SK.md5_sql('user_id')} AS m5 FROM events
),
h AS (
  SELECT DISTINCT event_type, {SK.hex15_to_long_sql('m5')} AS h60 FROM d
),
r AS (
  SELECT event_type, h60,
         row_number() OVER (PARTITION BY event_type ORDER BY h60) AS rn
  FROM h
),
s AS (
  SELECT event_type, list_sort(list(h60)) AS kmv
  FROM r WHERE rn <= 16 GROUP BY 1
),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.kmv AS ka, b.kmv AS kb,
         list_slice(list_sort(list_distinct(a.kmv || b.kmv)), 1, 16) AS mk
  FROM s a JOIN s b ON a.event_type < b.event_type
),
c AS (
  SELECT type_a, type_b,
         CAST(len(mk) AS BIGINT) AS n_merged,
         CAST(mk[len(mk)] AS DOUBLE) AS hk,
         len(list_filter(mk, x -> list_contains(ka, x)
                                  AND list_contains(kb, x))) AS n_both,
         len(list_filter(mk, x -> list_contains(ka, x)
                                  AND NOT list_contains(kb, x))) AS n_a,
         len(list_filter(mk, x -> list_contains(kb, x)
                                  AND NOT list_contains(ka, x))) AS n_b
  FROM p
),
u AS (
  SELECT *, CASE WHEN n_merged < 16 THEN n_merged
                 ELSE CAST(round(15.0 * 1152921504606846976.0 / hk)
                           AS BIGINT)
            END AS est_union
  FROM c
)
SELECT type_a, type_b, n_merged, est_union,
  CAST(round(CAST(n_both AS DOUBLE) / CAST(n_merged AS DOUBLE)
             * CAST(est_union AS DOUBLE)) AS BIGINT) AS est_intersection,
  CAST(round(CAST(n_a AS DOUBLE) / CAST(n_merged AS DOUBLE)
             * CAST(est_union AS DOUBLE)) AS BIGINT) AS est_only_a,
  CAST(round(CAST(n_b AS DOUBLE) / CAST(n_merged AS DOUBLE)
             * CAST(est_union AS DOUBLE)) AS BIGINT) AS est_only_b,
  round(CAST(n_both AS DOUBLE) / CAST(n_merged AS DOUBLE), 6) AS jaccard_est
FROM u
""",
        "text_divergence": f"""
WITH ta AS (
  SELECT unnest(toks) AS token FROM
    (SELECT {SQL_TOKS} AS toks FROM documents WHERE doc_id % 2 = 0)
),
tb AS (
  SELECT unnest(toks) AS token FROM
    (SELECT {SQL_TOKS} AS toks FROM documents WHERE doc_id % 2 = 1)
),
ca AS (SELECT token, CAST(count(*) AS BIGINT) AS c_a FROM ta GROUP BY 1),
cb AS (SELECT token, CAST(count(*) AS BIGINT) AS c_b FROM tb GROUP BY 1),
j AS (
  SELECT token, coalesce(c_a, 0) AS cnt_a, coalesce(c_b, 0) AS cnt_b
  FROM ca FULL JOIN cb USING (token)
),
t AS (
  SELECT sum(cnt_a) AS na, sum(cnt_b) AS nb,
         CAST(count(*) AS BIGINT) AS v
  FROM j
),
s AS (
  SELECT j.token, j.cnt_a, j.cnt_b,
         CAST(j.cnt_a + 1 AS DOUBLE) / CAST(t.na + t.v AS DOUBLE) AS p_a,
         CAST(j.cnt_b + 1 AS DOUBLE) / CAST(t.nb + t.v AS DOUBLE) AS p_b
  FROM j, t
)
SELECT token, cnt_a, cnt_b, p_a, p_b, p_a - p_b AS prob_gap,
       round(p_a * ln(p_a / p_b), 6) AS kl_term
FROM s ORDER BY abs(p_a - p_b) DESC, token LIMIT 20
""",
        "events_retention": """
WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
act AS (
  SELECT DISTINCT user_id AS u,
         (ts_ms // 86400000) * 86400000 AS b
  FROM e
),
fs AS (SELECT u, min(b) AS cohort FROM act GROUP BY 1),
cells AS (
  SELECT fs.cohort AS cohort_start,
         (act.b - fs.cohort) // 86400000 AS day_offset,
         CAST(count(DISTINCT act.u) AS BIGINT) AS n_active
  FROM act JOIN fs USING (u)
  WHERE (act.b - fs.cohort) // 86400000 <= 30
  GROUP BY 1, 2
),
sz AS (
  SELECT cohort AS cohort_start, CAST(count(*) AS BIGINT) AS cohort_size
  FROM fs GROUP BY 1
)
SELECT c.cohort_start, c.day_offset, c.n_active, s.cohort_size,
       CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
FROM cells c JOIN sz s USING (cohort_start)
""",
        "layout_zorder": f"""
WITH ext AS (
  SELECT min(CAST(user_id AS DOUBLE)) AS a_lo, max(CAST(user_id AS DOUBLE)) AS a_hi,
         min(value) AS b_lo, max(value) AS b_hi
  FROM events
),
q AS (
  SELECT event_id,
         CAST(floor((CAST(user_id AS DOUBLE) - a_lo) * 255.0
                    / (a_hi - a_lo)) AS BIGINT) AS qa,
         CAST(floor((value - b_lo) * 255.0 / (b_hi - b_lo)) AS BIGINT) AS qb
  FROM events, ext
)
SELECT event_id,
       CAST({_zorder_sql_terms('qa', 'qb', 8)} AS BIGINT) AS z_value
FROM q
""",
        "stream_cms_cells": f"""
WITH ri AS (SELECT unnest(range(4)) AS r),
v AS (SELECT cast(user_id AS STRING) AS val FROM events),
c0 AS (
  SELECT ri.r,
         md5(concat('s42', ':r', cast(ri.r as string), ':',
                    cast(val as string))) AS m5
  FROM v CROSS JOIN ri
)
SELECT r, {SK.hex15_to_long_sql('m5')} % 256 AS c,
       CAST(count(*) AS BIGINT) AS cnt
FROM c0 GROUP BY 1, 2
""",
        "temporal_gap_fill": """
WITH e AS (SELECT event_type, epoch_ms(ts) AS ts_ms, value FROM events),
hourly AS (
  SELECT event_type, (ts_ms // 3600000) * 3600000 AS bucket_start,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 4) AS value_sum
  FROM e GROUP BY 1, 2
),
ext AS (
  SELECT event_type, min(bucket_start) AS lo, max(bucket_start) AS hi
  FROM hourly GROUP BY 1
),
dense AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, 3600000)) AS bucket_start
  FROM ext
)
SELECT d.event_type, d.bucket_start,
       coalesce(h.n_events, 0) AS n_events,
       coalesce(h.value_sum, 0) AS value_sum,
       h.n_events IS NULL AS is_gap
FROM dense d LEFT JOIN hourly h USING (event_type, bucket_start)
""",
        "curate_mixture_repeat": """
WITH w(source, wt) AS (VALUES ('src0', 0.5), ('src1', 0.25), ('src2', 0.25)),
cnt AS (
  SELECT source, count(*) AS c FROM documents
  WHERE source IN (SELECT source FROM w) GROUP BY 1
),
q AS (
  SELECT source, CAST(floor(1000 * wt) AS BIGINT) AS quota, c
  FROM w JOIN cnt USING (source)
),
r AS (
  SELECT doc_id, source, CAST(row_number() OVER (
    PARTITION BY source
    ORDER BY md5('s42:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents WHERE source IN (SELECT source FROM w)
),
n AS (
  SELECT r.doc_id, r.source,
         (q.quota // q.c)
           + CASE WHEN r.rk <= q.quota % q.c THEN 1 ELSE 0 END AS nc
  FROM r JOIN q USING (source)
)
SELECT doc_id, source, CAST(u.i AS BIGINT) AS epoch
FROM n, unnest(range(nc)) AS u(i)
WHERE nc > 0
""",
        "dedup_boilerplate_lines": """
WITH staged AS (
  SELECT doc_id,
         text || chr(10) || 'subscribe to our newsletter' || chr(10) ||
         CASE WHEN doc_id % 3 = 0 THEN 'cookie notice: accept all'
              ELSE 'ref ' || CAST(doc_id AS VARCHAR) END AS text
  FROM documents
),
base AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM staged),
lx AS (
  SELECT doc_id, u.i - 1 AS idx, ls[u.i] AS ln, trim(ls[u.i]) AS tln
  FROM base, unnest(range(1, len(ls) + 1)) AS u(i)
),
freq AS (
  SELECT tln, count(DISTINCT doc_id) AS dfreq FROM lx
  WHERE tln <> '' GROUP BY 1
),
bp AS (SELECT tln FROM freq WHERE dfreq >= 5),
m AS (
  SELECT lx.doc_id, lx.idx, lx.ln,
         (lx.tln <> '' AND bp.tln IS NOT NULL) AS is_bp
  FROM lx LEFT JOIN bp ON lx.tln = bp.tln
)
SELECT doc_id,
       coalesce(string_agg(ln, chr(10) ORDER BY idx)
                  FILTER (WHERE NOT is_bp), '') AS clean_text,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (WHERE is_bp) AS BIGINT) AS n_removed
FROM m GROUP BY 1
""",
        # Count-min cells rebuilt bit-identically: same seeded digest
        # text as sketch._cms_cell_col, same positional hex-to-long.
        "sketch_cms_counts": f"""
WITH ri AS (SELECT unnest(range(4)) AS r),
v AS (SELECT cast(user_id AS STRING) AS val FROM events),
c0 AS (
  SELECT ri.r,
         md5(concat('s42', ':r', cast(ri.r as string), ':',
                    cast(val as string))) AS m5
  FROM v CROSS JOIN ri
),
cells AS (
  SELECT r, {SK.hex15_to_long_sql('m5')} % 256 AS c,
         CAST(count(*) AS BIGINT) AS cnt
  FROM c0 GROUP BY 1, 2
),
probes AS (
  SELECT DISTINCT cast(user_id AS STRING) AS val FROM events
  WHERE user_id < 50
),
p0 AS (
  SELECT val, ri.r,
         md5(concat('s42', ':r', cast(ri.r as string), ':',
                    cast(val as string))) AS m5
  FROM probes CROSS JOIN ri
),
p AS (SELECT val, r, {SK.hex15_to_long_sql('m5')} % 256 AS c FROM p0),
j AS (
  SELECT p.val, coalesce(cells.cnt, 0) AS cnt
  FROM p LEFT JOIN cells USING (r, c)
)
SELECT val AS user_id, CAST(min(cnt) AS BIGINT) AS est_count
FROM j GROUP BY 1
""",
        "sketch_bloom_membership": f"""
WITH ix AS (SELECT unnest(range(5)) AS i),
train AS (SELECT md5(text) AS v FROM documents WHERE doc_id % 2 = 0),
b0 AS (
  SELECT md5(concat('s42', ':b', cast(ix.i as string), ':',
             cast(v as string))) AS m5
  FROM train CROSS JOIN ix
),
bits AS (SELECT DISTINCT {SK.hex15_to_long_sql('m5')} % 65536 AS pos FROM b0),
probes AS (SELECT DISTINCT md5(text) AS v FROM documents),
p0 AS (
  SELECT v, md5(concat('s42', ':b', cast(ix.i as string), ':',
                cast(v as string))) AS m5
  FROM probes CROSS JOIN ix
),
p AS (SELECT v, {SK.hex15_to_long_sql('m5')} % 65536 AS pos FROM p0),
hits AS (
  SELECT p.v, CAST(count(*) AS BIGINT) AS n
  FROM p JOIN bits USING (pos) GROUP BY 1
)
SELECT probes.v AS digest, coalesce(hits.n, 0) = 5 AS maybe_present
FROM probes LEFT JOIN hits ON hits.v = probes.v
""",
        "text_lm_score": f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i+1])
         ELSE [] END AS bigrams,
         toks
  FROM t
),
uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(toks) AS tok FROM bg) GROUP BY 1
),
big AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS c2
  FROM (SELECT unnest(bigrams) AS bigram FROM bg) GROUP BY 1
),
v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
db AS (
  SELECT DISTINCT doc_id, bigram FROM
    (SELECT doc_id, unnest(bigrams) AS bigram FROM bg)
),
lp AS (
  SELECT db.doc_id,
         ln(CAST(big.c2 + 1 AS DOUBLE) / CAST(uni.c1 + v.v AS DOUBLE)) AS l
  FROM db
  JOIN big USING (bigram)
  JOIN uni ON uni.tok = string_split(db.bigram, ' ')[1]
  CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(l), 4) AS lm_score
FROM lp GROUP BY 1
""",
        "curate_split": """
SELECT doc_id,
       CASE WHEN substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
              THEN 'train'
            WHEN substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
              THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
        "sketch_kmv_merged": f"""
WITH d AS (
  SELECT DISTINCT {SK.md5_sql('user_id')} AS m5 FROM events
),
h AS (
  SELECT DISTINCT {SK.hex15_to_long_sql('m5')} AS h60 FROM d
),
r AS (
  SELECT h60, row_number() OVER (ORDER BY h60) AS rn FROM h
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_kept,
         CAST(max(h60) AS DOUBLE) AS hk
  FROM r WHERE rn <= 16
)
SELECT n_kept,
       CASE WHEN n_kept < 16 THEN n_kept
            ELSE CAST(round(15.0 * 1152921504606846976.0 / hk) AS BIGINT)
       END AS est_distinct
FROM g
""",
        "curate_temperature_mixture": """
WITH cnt AS (
  SELECT source, count(*) AS c FROM documents
  WHERE source IS NOT NULL GROUP BY 1
),
w AS (SELECT source, c, sqrt(CAST(c AS DOUBLE)) AS wt FROM cnt),
sc AS (SELECT min(c / wt) AS scale FROM w),
q AS (SELECT source, CAST(floor(sc.scale * wt) AS BIGINT) AS quota FROM w, sc),
r AS (
  SELECT doc_id, source, CAST(row_number() OVER (
    PARTITION BY source
    ORDER BY md5('s42:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
    AS mix_rank
  FROM documents WHERE source IS NOT NULL
)
SELECT doc_id, source, mix_rank
FROM r JOIN q USING (source)
WHERE mix_rank <= quota
""",
        "curate_mixture_sample": """
WITH w(source, wt) AS (VALUES ('src0', 0.5), ('src1', 0.25), ('src2', 0.25)),
cnt AS (
  SELECT source, count(*) AS c FROM documents
  WHERE source IN (SELECT source FROM w) GROUP BY 1
),
sc AS (SELECT min(c / wt) AS scale FROM cnt JOIN w USING (source)),
q AS (SELECT source, CAST(floor(sc.scale * wt) AS BIGINT) AS quota FROM w, sc),
r AS (
  SELECT doc_id, source, CAST(row_number() OVER (
    PARTITION BY source
    ORDER BY md5('s42:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS mix_rank
  FROM documents WHERE source IN (SELECT source FROM w)
)
SELECT doc_id, source, mix_rank
FROM r JOIN q USING (source)
WHERE mix_rank <= quota
""",
    }
