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
