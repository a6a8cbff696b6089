"""Motif finding — a GraphFrames-style structural pattern DSL compiled to
DataFrame joins.

The query surface popularized by GraphFrames' ``find()``: a motif is a
``;``-separated list of edge terms

    (a)-[]->(b)       a directed edge from vertex a to vertex b
    (b)-[]->(c)       terms sharing a name share the vertex
    !(a)-[]->(c)      negated term: no such edge may exist
    ()-[]->(a)        anonymous vertex: joined on, not returned

and the result is one row per binding of the NAMED vertices.  Compilation
is pure Catalyst: every positive term is the edge table self-joined on
the shared vertex names (Spark picks broadcast/SMJ per stats, AQE
re-plans at runtime), every negated term is a ``left_anti`` join — the
declarative route, so predicate pushdown and join reordering come free,
exactly how a motif should run at 100 TB (vs a hand-scheduled BFS).

Semantics notes (matching GraphFrames):
  * named vertices are NOT required to be distinct — add explicit
    ``where(col("a") != col("c"))`` filters for that;
  * a negated term may only reference vertices bound by positive terms
    (checked, clear error);
  * duplicate edge rows in the input produce duplicate bindings — pass a
    deduplicated edge table (``dropDuplicates(["src","dst"])``) for set
    semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(r"^(!?)\s*\((\w*)\)\s*-\s*\[(\w*)\]\s*->\s*\((\w*)\)$")


def _parse(motif: str) -> list[tuple[bool, str, str]]:
    terms = []
    anon = 0
    for raw in motif.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(
                f"bad motif term {raw!r} — expected '(a)-[]->(b)' or '!(a)-[]->(b)'"
            )
        neg, a, edge_name, b = m.groups()
        if edge_name:
            raise ValueError(
                f"named edges ([{edge_name}]) are not supported — use '[]'"
            )
        if not a:
            anon += 1
            a = f"__anon{anon}"
        if not b:
            anon += 1
            b = f"__anon{anon}"
        if neg and (a.startswith("__anon") or b.startswith("__anon")):
            raise ValueError(f"negated term {raw!r} may not use anonymous vertices")
        terms.append((bool(neg), a, b))
    if not terms:
        raise ValueError("empty motif")
    if all(neg for neg, _, _ in terms):
        raise ValueError("motif needs at least one positive term")
    return terms


def find(edges: DataFrame, motif: str) -> DataFrame:
    """One row per binding of the motif's named vertices over the directed
    edge table (src, dst); columns are the vertex names in first-mention
    order.  See module docstring for the grammar and semantics."""
    terms = _parse(motif)
    e = edges.select("src", "dst")

    bound: list[str] = []
    out: DataFrame | None = None
    for neg, a, b in terms:
        if neg:
            continue
        if a == b:
            # self-referential term '(a)-[]->(a)': a self-loop binding —
            # compile as a src==dst filter on ONE aliased column, never two
            # columns under the same name
            step = e.where(F.col("src") == F.col("dst")).select(F.col("src").alias(a))
        else:
            step = e.select(F.col("src").alias(a), F.col("dst").alias(b))
        if out is None:
            out = step
        else:
            keys = [v for v in {a, b} if v in bound]
            out = out.join(step, keys) if keys else out.crossJoin(step)
        for v in (a, b):
            if v not in bound:
                bound.append(v)

    for neg, a, b in terms:
        if not neg:
            continue
        missing = [v for v in {a, b} if v not in bound]
        if missing:
            raise ValueError(
                f"negated term references unbound vertex name(s) {missing}"
            )
        if a == b:
            anti = e.where(F.col("src") == F.col("dst")).select(F.col("src").alias(a))
            out = out.join(anti, [a], "left_anti")
        else:
            out = out.join(
                e.select(F.col("src").alias(a), F.col("dst").alias(b)),
                [a, b],
                "left_anti",
            )

    named = [v for v in bound if not v.startswith("__anon")]
    return out.select(*named)
