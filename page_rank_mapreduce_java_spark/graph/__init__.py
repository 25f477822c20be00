from page_rank_mapreduce_java_spark.graph.generators import chain_edges, random_edges
from page_rank_mapreduce_java_spark.graph.pagerank import (
    pagerank,
    reference_init_state,
)
from page_rank_mapreduce_java_spark.graph.ops import (
    out_degrees,
    in_degrees,
    invert_edges,
    dangling_nodes,
    degree_histogram,
    top_k_ranks,
)

__all__ = [
    "chain_edges",
    "random_edges",
    "pagerank",
    "reference_init_state",
    "out_degrees",
    "in_degrees",
    "invert_edges",
    "dangling_nodes",
    "degree_histogram",
    "top_k_ranks",
]
