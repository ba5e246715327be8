from onetl_spark.operators.graph import (
    bfs_hops,
    connected_components,
    label_propagation,
    pagerank_fixed_point,
    random_walks,
    triangle_count,
)
from onetl_spark.operators.ranking import (
    exact_cume_dist,
    exact_ntile,
    exact_percent_rank,
    global_row_index,
)
from onetl_spark.operators.temporal import asof_join, range_join

__all__ = [
    "asof_join",
    "range_join",
    "bfs_hops",
    "connected_components",
    "label_propagation",
    "pagerank_fixed_point",
    "random_walks",
    "triangle_count",
    "exact_cume_dist",
    "exact_ntile",
    "exact_percent_rank",
    "global_row_index",
]
