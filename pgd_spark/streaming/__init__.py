from pgd_spark.streaming.edges import streaming_edge_ingest

__all__ = ["streaming_edge_ingest"]
