from parallel_betweenness_centrality_using_bsp_spark.sources.repo_files import (  # noqa: F401
    expected_import_edges,
    generate_repo_files,
)
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import (  # noqa: F401
    edge_df,
    random_power_law_graph,
    random_uniform_graph,
)
