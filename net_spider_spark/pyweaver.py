"""Pure-Python executable specification of the snapshot semantics.

A tiny, direct transcription of the reference's algorithm
(``Weaver.hs:156-203`` + ``Unify.hs:169-217``) over plain dicts — no
Spark. It exists to *check* the distributed engine, not to run
workloads: property tests generate random findings and assert the
DataFrame pipeline and this spec agree row-for-row (the same
two-implementations strategy the reference uses between Weaver and the
Gremlin server, WeaverSpec.hs:170-180).

Deliberately mirrors the engine's deterministic tie-breaks
((found_at, finding_id) for nodes; (found_at, finding_id, link_pos)
for samples) so agreement is exact, not probabilistic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence


@dataclass(frozen=True)
class PyLink:
    target: str
    state: str = "to_target"  # unused|to_target|to_subject|bidirectional
    attrs: tuple = ()


@dataclass(frozen=True)
class PyFinding:
    finding_id: int
    subject: str
    found_at: int
    links: Sequence[PyLink] = ()
    attrs: tuple = ()


def snapshot(
    findings: Sequence[PyFinding],
    policy: str = "overwrite",
    interval=None,
    starts_from: Optional[Sequence[str]] = None,
    negation: bool = True,
    negates=None,
    max_hops=None,
):
    """Returns (nodes, links): nodes = {node_id: (is_boundary=False,
    node_ts|None, attrs|None)}; links = set of (source, dest,
    is_directed, link_ts) tuples. Whole-graph visit-mode semantics
    unless starts_from is given (then Spider traversal semantics)."""
    kept = [
        f for f in findings if interval is None or interval.contains(f.found_at)
    ]
    if policy == "overwrite":
        best: dict[str, PyFinding] = {}
        for f in kept:
            cur = best.get(f.subject)
            if cur is None or (f.found_at, f.finding_id) > (cur.found_at, cur.finding_id):
                best[f.subject] = f
        kept = list(best.values())

    if starts_from is not None:
        universe = {f.subject for f in findings} | {
            l.target for f in findings for l in f.links
        }
        by_subject: dict[str, list[PyFinding]] = {}
        for f in kept:
            by_subject.setdefault(f.subject, []).append(f)
        visited = set()
        frontier = {s for s in starts_from if s in universe}
        visited |= frontier
        hops = 0
        while frontier and (max_hops is None or hops < max_hops):
            nxt = set()
            for n in frontier:
                for f in by_subject.get(n, ()):
                    for l in f.links:
                        if l.target not in visited:
                            nxt.add(l.target)
            visited |= nxt
            frontier = nxt
            hops += 1
        kept = [f for f in kept if f.subject in visited]
        # past-bound targets are boundary nodes (observed, not
        # visited) so the graph stays closed over its links — with an
        # unbounded traversal this set is empty by closure
        boundary = {
            l.target for f in kept for l in f.links
        } - visited
        node_ids = set(visited) | boundary
    else:
        boundary = set()
        node_ids = {f.subject for f in kept} | {
            l.target for f in kept for l in f.links
        }

    # node states: latest kept finding per node
    node_state: dict[str, PyFinding] = {}
    for f in kept:
        cur = node_state.get(f.subject)
        if cur is None or (f.found_at, f.finding_id) > (cur.found_at, cur.finding_id):
            node_state[f.subject] = f
    nodes = {
        n: (
            n in boundary,
            node_state[n].found_at if n in node_state else None,
            node_state[n].attrs if n in node_state else None,
        )
        for n in node_ids
    }

    # link samples, grouped by swap-insensitive pair; default sub-id
    samples = []
    for f in kept:
        for pos, l in enumerate(f.links):
            samples.append((f.subject, l.target, l.state, f.found_at, f.finding_id, pos))
    groups: dict[tuple, list] = {}
    for s in samples:
        pair = tuple(sorted((s[0], s[1])))
        groups.setdefault(pair, []).append(s)

    links = set()
    for pair, grp in groups.items():
        winner = max(grp, key=lambda s: (s[3], s[4], s[5]))
        subject, target, state, ts, _, _ = winner
        if negation:
            # negates: optional custom rule (the spec-side analogue of
            # unify.NegatesExpr), called as (end_id, end_ts, sample_subject,
            # sample_found_at) -> bool; None = defNegatesLinkSample.
            negated = False
            for end in pair:
                end_ts = nodes.get(end, (False, None, None))[1]
                if negates is not None:
                    if negates(end, end_ts, subject, ts):
                        negated = True
                elif end_ts is not None and ts < end_ts and subject != end:
                    negated = True
            if negated:
                continue
        if state == "unused":
            continue
        if state == "to_subject":
            links.add((target, subject, True, ts))
        elif state == "to_target":
            links.add((subject, target, True, ts))
        else:
            links.add((subject, target, False, ts))
    return nodes, links
