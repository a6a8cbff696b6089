from parallel_betweenness_centrality_using_bsp_spark.operators.edges import (  # noqa: F401
    degrees,
    densify_vertices,
    derive_edges,
    symmetrize,
)
from parallel_betweenness_centrality_using_bsp_spark.operators.components import (  # noqa: F401
    connected_components,
)
from parallel_betweenness_centrality_using_bsp_spark.operators.pagerank import pagerank  # noqa: F401
from parallel_betweenness_centrality_using_bsp_spark.operators.labelprop import (  # noqa: F401
    label_propagation,
)
from parallel_betweenness_centrality_using_bsp_spark.operators.triangles import (  # noqa: F401
    triangle_count,
    triangles_per_vertex,
)
from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness import (  # noqa: F401
    betweenness_bsp,
    betweenness_csr,
)
from parallel_betweenness_centrality_using_bsp_spark.operators.bfs import (  # noqa: F401
    bfs_distances,
    double_sweep_diameter,
)
from parallel_betweenness_centrality_using_bsp_spark.operators.sssp import sssp, sssp_run  # noqa: F401
from parallel_betweenness_centrality_using_bsp_spark.operators.kcore import k_core, k_core_run  # noqa: F401
from parallel_betweenness_centrality_using_bsp_spark.operators.hits import hits  # noqa: F401
from parallel_betweenness_centrality_using_bsp_spark.operators.scc import (  # noqa: F401
    condense,
    dag_longest_path_layers,
    strongly_connected_components,
)
from parallel_betweenness_centrality_using_bsp_spark.operators.linkpred import (  # noqa: F401
    adamic_adar_scores,
)
from parallel_betweenness_centrality_using_bsp_spark.operators.labelprop import modularity  # noqa: F401
from parallel_betweenness_centrality_using_bsp_spark.operators.triangles import (  # noqa: F401
    local_clustering_coefficients,
)
from parallel_betweenness_centrality_using_bsp_spark.operators.walks import (  # noqa: F401
    random_walks,
    random_walks_run,
)
