import os

from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.components import connected_components
from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize
from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import (
    latest_checkpoint,
    superstep_loop,
)
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

from tests.oracles import df_to_dict, oracle_components


def _cc_step(und):
    def step(state, _k):
        msgs = state.join(und, state.vertex == und.src).select(
            und.dst.alias("vertex"), "label"
        )
        return (
            state.select("vertex", "label")
            .unionByName(msgs)
            .groupBy("vertex")
            .agg(F.min("label").alias("label"))
        )

    return step


def test_checkpointed_run_writes_state_and_metrics(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    edges = [(i, i + 1) for i in range(8)]
    run = connected_components(
        spark, edge_df(spark, edges), checkpoint_dir=ckpt, run_id="run1"
    )
    assert run.converged
    base = os.path.join(ckpt, "connected_components", "run1")
    steps = [d for d in os.listdir(base) if d.startswith("superstep=")]
    assert len(steps) == run.supersteps + 1  # + initial state
    metrics = spark.read.parquet(f"{ckpt}/_metrics")
    assert metrics.count() == run.supersteps
    assert set(metrics.columns) == {
        "run_id", "algo", "superstep", "partition_id", "rows", "wall_ms", "lineage",
    }
    import json

    rows = metrics.orderBy("superstep").collect()
    lin = json.loads(rows[-1]["lineage"])
    assert lin["algo"] == "connected_components" and lin["state_path"].endswith(
        f"superstep={run.supersteps}"
    )
    assert lin["parent_path"].endswith(f"superstep={run.supersteps - 1}")
    # first superstep's parent is the initial-state checkpoint; the key must
    # be PRESENT (to_json is configured not to drop null fields, so the
    # lineage schema is stable for consumers that index it unconditionally)
    first = json.loads(rows[0]["lineage"])
    assert first["parent_path"].endswith("superstep=0")


def test_resume_mid_iteration_identical_result(spark, tmp_path):
    """Kill after superstep k, relaunch from the checkpoint, final labels
    identical to an uninterrupted run (north_rule resumability)."""
    ckpt = str(tmp_path / "ckpt2")
    edges = [(i, i + 1) for i in range(12)]  # path: needs many min-label rounds
    und = symmetrize(edge_df(spark, edges)).persist()
    vertices = und.select(F.col("src").alias("vertex")).distinct()
    initial = vertices.withColumn("label", F.col("vertex"))

    # uninterrupted reference run
    full = superstep_loop(
        spark, initial, _cc_step(und), algo="cc", max_supersteps=30, run_id="full",
        converged_fn=lambda old, new: df_to_dict(old, "vertex", "label")
        == df_to_dict(new, "vertex", "label"),
    )

    # interrupted run: only 3 supersteps, checkpointed
    superstep_loop(
        spark, initial, _cc_step(und), algo="cc", max_supersteps=3,
        checkpoint_dir=ckpt, run_id="crash",
    )
    found = latest_checkpoint(spark, ckpt, "cc", "crash")
    assert found is not None
    k, state = found
    assert k == 3

    resumed = superstep_loop(
        spark, state, _cc_step(und), algo="cc", max_supersteps=30,
        checkpoint_dir=ckpt, run_id="crash", start_step=k,
        converged_fn=lambda old, new: df_to_dict(old, "vertex", "label")
        == df_to_dict(new, "vertex", "label"),
    )
    assert df_to_dict(resumed.state, "vertex", "label") == df_to_dict(
        full.state, "vertex", "label"
    ) == oracle_components(edges)
    und.unpersist()


def test_stats_healthy_survives_int_str_conversion_cap():
    """Regression: the stats guard must classify estimates PAST CPython's
    4300-digit int->str limit as pathological instead of dying inside its
    own health check.  A 2-reference kernel's estimate triples its digit
    count per round, leapfrogging the 2000..4300 window in one superstep —
    the old len(str(..)) check raised ValueError there and the catch-all
    returned the frame unguarded (the measured sf0.001 weighted-Brandes
    stall)."""
    from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import (
        _STATS_BIT_CAP,
        _stats_healthy,
    )

    assert _stats_healthy(lambda: 10**100)
    assert _stats_healthy(lambda: (1 << _STATS_BIT_CAP) - 1)
    # one bit past the cap -> rebuild
    assert not _stats_healthy(lambda: 1 << _STATS_BIT_CAP)
    # 5778 digits: str() would raise ValueError here; bit_length must not
    assert not _stats_healthy(lambda: 10**5777)
    # the py4j read itself raising (decimal parse past the same cap) IS the
    # pathological verdict
    def boom():
        raise ValueError("Exceeds the limit (4300 digits) for integer string conversion")

    assert not _stats_healthy(boom)
