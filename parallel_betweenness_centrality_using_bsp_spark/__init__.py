"""PySpark-native link-graph analytics engine.

Brand-new implementation (not a port) of the capabilities of the reference
BSP betweenness-centrality project (``/root/reference`` — empty checkout; see
SURVEY.md §0): BSP-superstep Brandes betweenness centrality re-expressed as
iterative DataFrame joins and Arrow/pandas UDFs, alongside PageRank,
connected components, label propagation and triangle counting, over an edge
table derived from a source-code ``repo_files`` table
``(repo, path, commit, lang, content)``.

Design rules (BASELINE.json north_rule):
  * DataFrame + vectorized pandas/Arrow UDFs only — no per-row Python UDFs,
    no RDD API in the hot path.
  * Explicit hash partitioning of the edge table; hub salting; broadcast of
    small frontier deltas.
  * Every superstep checkpoints state + per-partition lineage/metrics so a
    run resumes mid-iteration.
"""

from parallel_betweenness_centrality_using_bsp_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
