from pgd_spark.sources.readers import read_edge_list, read_graph, read_mtx
from pgd_spark.sources.transcripts import (
    edges_from_transcripts,
    generate_transcripts,
)

__all__ = [
    "read_graph",
    "read_edge_list",
    "read_mtx",
    "generate_transcripts",
    "edges_from_transcripts",
]
