from pgd_spark.operators.graphlets import (
    edge_graphlet_counts,
    macro_counts,
    micro_counts,
    release_internal_caches,
)
from pgd_spark.operators.pregel import (
    connected_components,
    label_propagation,
    pagerank,
    pagerank_prepare,
)
from pgd_spark.operators.approximate import approximate_macro_counts
from pgd_spark.operators.kcore import degeneracy_order, kcore, max_core
from pgd_spark.operators.ordering import edge_ordering
from pgd_spark.operators.stats import assortativity, degree_stats, univar_stats
from pgd_spark.operators.vertex_micro import vertex_micro_counts

__all__ = [
    "edge_graphlet_counts",
    "macro_counts",
    "release_internal_caches",
    "micro_counts",
    "vertex_micro_counts",
    "approximate_macro_counts",
    "pagerank",
    "pagerank_prepare",
    "connected_components",
    "label_propagation",
    "kcore",
    "max_core",
    "degeneracy_order",
    "edge_ordering",
    "assortativity",
    "degree_stats",
    "univar_stats",
]
