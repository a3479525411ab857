from pgd_spark.operators.graphlets import (
    edge_graphlet_counts,
    macro_counts,
    micro_counts,
)
from pgd_spark.operators.pregel import (
    connected_components,
    label_propagation,
    pagerank,
)
from pgd_spark.operators.kcore import kcore

__all__ = [
    "edge_graphlet_counts",
    "macro_counts",
    "micro_counts",
    "pagerank",
    "connected_components",
    "label_propagation",
    "kcore",
]
