from pgd_spark.plans.skew import salted_join, top_degree_vertices

__all__ = ["salted_join", "top_degree_vertices"]
