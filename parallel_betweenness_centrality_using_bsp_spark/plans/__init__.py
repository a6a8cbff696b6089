from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import (  # noqa: F401
    SuperstepRun,
    latest_checkpoint,
    superstep_loop,
)
