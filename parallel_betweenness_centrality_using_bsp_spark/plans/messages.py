"""Generic message-passing primitive — the aggregateMessages API
(GraphFrames/GraphX's core operator) that every BSP kernel in this engine
is an instance of.

``aggregate_messages`` runs ONE round: each edge optionally sends an
expression to its destination and/or its source, and messages are combined
per receiving vertex with the given aggregate.  Degrees, PageRank
contributions, LPA votes, sigma sums, HITS updates are all single calls;
the iterative kernels stay hand-fused (they persist the edge table across
rounds and carry kernel-specific frontier state), but new algorithms can
be prototyped against this primitive and promoted to a fused kernel only
when profiles demand it.

Plan shape: at most two joins (state onto edges, once per direction) + one
hash aggregation keyed by receiving vertex — map-side combined, the same
balanced shuffle every kernel here uses.  Expressions are plain Columns,
so the whole round stays inside whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def aggregate_messages(
    edges: DataFrame,
    vertex_state: DataFrame | None = None,
    *,
    to_dst: Column | None = None,
    to_src: Column | None = None,
    agg: Column,
) -> DataFrame:
    """One message round.  Returns (vertex, agg) — one row per vertex that
    received ≥ 1 message.

    ``edges`` is (src, dst, ...edge attrs...).  ``vertex_state`` (optional)
    is (vertex, ...attrs...); it is joined onto the SENDING endpoint of
    each direction, exposed to the message expressions as columns named
    ``src_<attr>`` / ``dst_<attr>`` respectively (plus the edge's own
    columns unprefixed).  ``to_dst`` / ``to_src`` are Column expressions
    evaluated per edge; the non-null ones become messages named ``msg``.
    ``agg`` is an aggregate over ``F.col("msg")`` (e.g. ``F.sum("msg")``,
    ``F.max("msg")``) applied per receiving vertex.

    Example — out-weighted-degree and PageRank contribution in one round::

        aggregate_messages(e, ranks,
                           to_dst=F.col("src_pr") / F.col("src_outdeg"),
                           agg=F.sum("msg"))
    """
    if to_dst is None and to_src is None:
        raise ValueError("aggregate_messages: pass to_dst and/or to_src")
    legs = []
    if to_dst is not None:
        leg = edges
        if vertex_state is not None:
            st = vertex_state.select(
                F.col("vertex").alias("src"),
                *[
                    F.col(c).alias(f"src_{c}")
                    for c in vertex_state.columns
                    if c != "vertex"
                ],
            )
            leg = leg.join(st, "src")
        legs.append(
            leg.select(F.col("dst").alias("vertex"), to_dst.alias("msg"))
        )
    if to_src is not None:
        leg = edges
        if vertex_state is not None:
            st = vertex_state.select(
                F.col("vertex").alias("dst"),
                *[
                    F.col(c).alias(f"dst_{c}")
                    for c in vertex_state.columns
                    if c != "vertex"
                ],
            )
            leg = leg.join(st, "dst")
        legs.append(
            leg.select(F.col("src").alias("vertex"), to_src.alias("msg"))
        )
    msgs = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
    return msgs.where(F.col("msg").isNotNull()).groupBy("vertex").agg(
        agg.alias("agg")
    )
