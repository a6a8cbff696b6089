"""Stream-static enrichment — joining an unbounded event stream against a
slowly-changing dimension table, the third of the three Structured
Streaming join shapes the engine covers (windowed aggregation:
``events.py``; stateful per-key: ``sessions.py``; stream-static: here).

The static side is re-read per micro-batch by Spark (so a dimension
refreshed in place is picked up batch-over-batch) and is broadcast when
small — the classic 100 TB enrichment plan: the stream shuffles nothing,
each executor holds the dimension.  The same function works on a batch
DataFrame (identical plan minus the streaming source), which is how the
test pins stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    *,
    broadcast_dim: bool = True,
    how: str = "left",
) -> DataFrame:
    """Events + the dimension's columns (left join on ``on`` by default —
    an unknown key must not drop the event, it flows through with nulls
    for downstream repair)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, on, how)
