"""The shared BSP superstep driver.

One BSP superstep == one Spark job wave: the shuffle inside ``step_fn``'s
plan is the communication phase, and the materialization at the end of each
iteration is the barrier (the reference's ``bsp_sync()`` analogue — see
SURVEY.md §3.1; the reference checkout is empty so no file:line citations
are possible, per SURVEY.md §0).

Responsibilities handled once, here, for every iterative algorithm
(connected components, PageRank, label propagation, betweenness):

* **Lineage control** — iterative DataFrame loops grow the logical plan
  without bound; every superstep either writes state to parquet and reads it
  back (``checkpoint_dir`` set: reliable + resumable) or eagerly
  ``localCheckpoint``s (fast path for tests).
* **Resumability** — with ``checkpoint_dir`` set, state lands at
  ``{dir}/{algo}/{run_id}/superstep={k}/`` and ``latest_checkpoint`` finds
  the newest complete superstep so a crashed run restarts mid-iteration.
* **Metrics + lineage rows** — per superstep (optionally per partition) a
  metrics row ``(run_id, algo, superstep, partition_id, rows, wall_ms)`` is
  appended to ``{dir}/_metrics`` (parquet), satisfying the north_rule's
  "per-partition lineage + metrics" requirement.

At 100 TB the parquet checkpoint is the only viable option — localCheckpoint
pins executor memory/disk and is lost on executor failure; the parquet state
is partitioned by superstep so partition pruning makes resume reads cheap.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SuperstepRun:
    """Result of a superstep loop: final state + per-superstep metrics."""

    state: DataFrame
    supersteps: int
    run_id: str
    converged: bool
    metrics: list[dict] = field(default_factory=list)

    @property
    def wall_ms_total(self) -> float:
        return sum(m["wall_ms"] for m in self.metrics)


def _state_path(checkpoint_dir: str, algo: str, run_id: str, step: int) -> str:
    return f"{checkpoint_dir}/{algo}/{run_id}/superstep={step}"


def _bucket_table_name(algo: str, run_id: str, step: int) -> str:
    safe = "".join(c if c.isalnum() else "_" for c in run_id)
    return f"ss_{algo}_{safe}_{step}"


def _materialize(
    spark: SparkSession,
    df: DataFrame,
    checkpoint_dir: str | None,
    algo: str,
    run_id: str,
    step: int,
    count_rows: bool = True,
    bucket_state_by: list[str] | None = None,
) -> tuple[DataFrame, int]:
    """Barrier: force computation, cut lineage, return (state, row_count).

    With ``bucket_state_by`` (and a checkpoint_dir), state lands as a
    BUCKETED+SORTED parquet table on those columns instead of a plain
    parquet directory: the next superstep's join/aggregation on the state
    keys then reads the bucketing metadata and skips the state-side
    exchange AND sort entirely (plan-tested) — the layout a 100 TB run
    wants, since the state is rewritten every superstep anyway and the
    exchange it saves is state-sized.  The files still live under the
    same ``superstep=k`` path, so ``latest_checkpoint`` resume is
    unchanged (a resumed first read is merely unbucketed).
    """
    if checkpoint_dir is not None:
        path = _state_path(checkpoint_dir, algo, run_id, step)
        if bucket_state_by:
            n = int(spark.conf.get("spark.sql.shuffle.partitions"))
            name = _bucket_table_name(algo, run_id, step)
            (
                df.write.mode("overwrite")
                .format("parquet")
                .option("path", path)
                .bucketBy(n, *bucket_state_by)
                .sortBy(*bucket_state_by)
                .saveAsTable(name)
            )
            out = spark.table(name)
            return out, out.count()
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        return out, out.count()
    out = guard_stats(df.localCheckpoint(eager=True))
    return out, (out.count() if count_rows else -1)


# Catalyst's simple size estimate (sizeInBytes) multiplies through joins as
# an unbounded BigInt and SURVIVES localCheckpoint (the LogicalRDD inherits
# the child plan's stats).  A step plan that references the checkpointed
# state k>=2 times therefore multiplies k state-sized estimates every
# superstep: the estimate's DIGIT COUNT grows k× per round, and planner
# time goes exponential — profiled to BigInteger.multiplyToomCook3 eating
# whole seconds per superstep by round ~20 of a 2-reference kernel, with
# logical plan and RDD lineage both perfectly flat.  Single-reference
# kernels grow ~3 digits/round (linear, harmless), so a high digit
# threshold distinguishes the two.
_STATS_DIGIT_CAP = 2000
# the same cap in bits (digits / log10(2)) — compared via int.bit_length(),
# which has no conversion limit at any size
_STATS_BIT_CAP = 6644


def _stats_healthy(read_size) -> bool:
    """True iff the plan-size estimate produced by the zero-arg callable
    ``read_size`` is below the pathological-growth cap.

    bit_length, not len(str(..)): CPython 3.11 caps int->str conversion at
    4300 digits, and a plan whose estimate grows 3x per round LEAPFROGS the
    2000..4300-digit window in one step — str() then raises, the old
    catch-all returned the frame UNGUARDED, and the estimate compounded to
    millions of digits (minutes of BigInteger.toString per py4j read: the
    measured sf0.001 weighted-Brandes stall).  The py4j transfer itself
    parses a decimal string, so past the same limit ``read_size()`` raises
    before bit_length can run — that ValueError IS the pathological
    verdict, not an excuse to skip the rebuild."""
    try:
        return int(read_size()).bit_length() <= _STATS_BIT_CAP
    except ValueError:
        return False


def guard_stats(out: DataFrame) -> DataFrame:
    """Rebuild ``out`` over its own checkpointed rows when its inherited
    size estimate has gone pathological, resetting stats to the default.
    The rebuilt frame loses partitioning metadata (one state-side exchange
    in the next superstep's join — re-established at the following
    materialization), which is why this fires only past the cap and not on
    every superstep.  Chain as ``.localCheckpoint(eager=True)
    .transform(guard_stats)`` on any state that re-enters its own next
    round's plan."""
    try:
        jqe = out._jdf.queryExecution()
        if _stats_healthy(lambda: jqe.optimizedPlan().stats().sizeInBytes()):
            return out
        fresh = out.sparkSession._jsparkSession.internalCreateDataFrame(
            jqe.toRdd(), out._jdf.schema(), False
        )
        return DataFrame(fresh, out.sparkSession)
    except Exception:
        # non-classic sessions (Connect) expose no plan internals; the
        # checkpointed frame itself is always correct
        return out


def _partition_metrics(df: DataFrame) -> list[tuple[int, int]]:
    """(partition_id, rows) per non-empty partition of the materialized state."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    return [(r["partition_id"], r["rows"]) for r in rows]


def superstep_loop(
    spark: SparkSession,
    initial_state: DataFrame,
    step_fn: Callable[[DataFrame, int], DataFrame],
    *,
    algo: str,
    max_supersteps: int = 100,
    converged_fn: Callable[[DataFrame, DataFrame], bool] | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
    start_step: int = 0,
    metrics_per_partition: bool = False,
    count_rows: bool = True,
    bucket_state_by: list[str] | None = None,
) -> SuperstepRun:
    """Run ``state <- step_fn(state, k)`` until convergence or max_supersteps.

    ``converged_fn(old, new) -> bool`` runs after each superstep; both
    arguments are already materialized, so actions on them are cheap scans.
    ``start_step`` > 0 resumes counting from a checkpoint (see
    ``latest_checkpoint``).  ``count_rows=False`` skips the per-superstep
    row-count job (rows recorded as -1): the count is one extra Spark job of
    pure serial floor per superstep, which matters when supersteps are short;
    checkpointed runs always count (the write already scans the data).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    if start_step > 0 and checkpoint_dir is not None:
        # Resuming: initial_state IS the superstep=start_step checkpoint —
        # rewriting its own source path would delete files mid-read.
        state = initial_state
    else:
        state, _ = _materialize(
            spark, initial_state, checkpoint_dir, algo, run_id, start_step,
            bucket_state_by=bucket_state_by,
        )
    metrics: list[dict] = []
    converged = False
    step = start_step

    for step in range(start_step + 1, start_step + max_supersteps + 1):
        t0 = time.monotonic()
        new_state = step_fn(state, step)
        new_state, n_rows = _materialize(
            spark,
            new_state,
            checkpoint_dir,
            algo,
            run_id,
            step,
            count_rows=count_rows or checkpoint_dir is not None,
            bucket_state_by=bucket_state_by,
        )
        wall_ms = (time.monotonic() - t0) * 1000.0

        step_metrics = {
            "run_id": run_id,
            "algo": algo,
            "superstep": step,
            "rows": n_rows,
            "wall_ms": wall_ms,
        }
        metrics.append(step_metrics)
        if checkpoint_dir is not None:
            part_rows = (
                _partition_metrics(new_state) if metrics_per_partition else [(-1, n_rows)]
            )
            mdf = spark.createDataFrame(
                [
                    (run_id, algo, step, pid, int(rows), float(wall_ms))
                    for pid, rows in part_rows
                ],
                "run_id string, algo string, superstep int, partition_id int, "
                "rows long, wall_ms double",
            )
            # lineage payload serialized IN-PLAN (to_json over a struct), so
            # the same expression works for arbitrarily many partition rows
            # without driver-side string building
            parent = (
                F.lit(_state_path(checkpoint_dir, algo, run_id, step - 1))
                if step > start_step
                else F.lit(None).cast("string")
            )
            mdf = mdf.withColumn(
                "lineage",
                F.to_json(
                    # ignoreNullFields=false: the first superstep's
                    # parent_path is null and consumers json.loads()[key] it —
                    # the default would omit the key entirely
                    F.struct(
                        F.col("algo"),
                        F.col("run_id"),
                        F.col("superstep"),
                        F.col("partition_id"),
                        F.lit(_state_path(checkpoint_dir, algo, run_id, step)).alias(
                            "state_path"
                        ),
                        parent.alias("parent_path"),
                    ),
                    {"ignoreNullFields": "false"},
                ),
            )
            mdf.write.mode("append").parquet(f"{checkpoint_dir}/_metrics")

        conv = converged_fn is not None and converged_fn(state, new_state)
        if bucket_state_by and checkpoint_dir is not None:
            # The previous superstep's bucket table is an EXTERNAL table:
            # dropping it removes only the metastore entry (unbounded growth
            # across long/repeated runs otherwise) while the parquet files
            # under superstep=k-1 stay on disk for latest_checkpoint resume.
            # Safe only now — converged_fn above was the last reader of the
            # old state.  The FINAL step's table survives: run.state is a
            # catalog read so downstream joins still see the bucketing.
            spark.sql(
                "DROP TABLE IF EXISTS "
                f"`{_bucket_table_name(algo, run_id, step - 1)}`"
            )
        state = new_state
        if conv:
            converged = True
            break

    return SuperstepRun(
        state=state,
        supersteps=step - start_step,
        run_id=run_id,
        converged=converged,
        metrics=metrics,
    )


class IncrementalVisited:
    """Incrementally-grown membership set for frontier anti-joins.

    BFS-style loops must anti-join each new frontier against *everything seen
    so far*.  Re-unioning all L prior levels every superstep costs O(L) plan
    nodes and cached scans per step — O(L²) total, a scale-killer on
    long-diameter graphs (road networks, chains).  This keeps one
    materialized ``base`` plus at most ``fold_every`` pending level
    DataFrames (which the caller has already checkpointed, so appending is
    free); every ``fold_every`` appends the union folds into a fresh
    checkpointed base.  Per-superstep plan size and scan count are then
    O(fold_every) = O(1) regardless of depth, and fold work totals
    O(L/fold_every) extra materializations.
    """

    def __init__(self, first: DataFrame, cols: list[str], fold_every: int = 8):
        self._cols = cols
        self._fold_every = fold_every
        self._base = first.select(*cols)
        self._pending: list[DataFrame] = []

    def df(self) -> DataFrame:
        """The current membership set (anti-join target)."""
        out = self._base
        for lv in self._pending:
            out = out.unionByName(lv.select(*self._cols))
        return out

    def add(self, level: DataFrame) -> None:
        """Append a newly-materialized frontier; fold when due."""
        self._pending.append(level)
        if len(self._pending) >= self._fold_every:
            self._base = self.df().localCheckpoint(eager=True)
            self._pending = []


def latest_checkpoint(
    spark: SparkSession, checkpoint_dir: str, algo: str, run_id: str
) -> tuple[int, DataFrame] | None:
    """Newest complete superstep for (algo, run_id), or None.

    Completeness = parquet commit marker (_SUCCESS) present, so a superstep
    that died mid-write is never resumed from.  Listing goes through the
    Hadoop FileSystem API, so resume works on any supported store (s3a://,
    gs://, hdfs://, file://), not just the local filesystem.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    base = jvm.org.apache.hadoop.fs.Path(f"{checkpoint_dir}/{algo}/{run_id}")
    fs = base.getFileSystem(conf)
    if not fs.exists(base):
        return None
    steps = []
    for status in fs.listStatus(base):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("superstep="):
            marker = jvm.org.apache.hadoop.fs.Path(status.getPath(), "_SUCCESS")
            if fs.exists(marker):
                steps.append(int(name.split("=", 1)[1]))
    if not steps:
        return None
    k = max(steps)
    return k, spark.read.parquet(_state_path(checkpoint_dir, algo, run_id, k))
