import pytest

from pgd_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pgd_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


def make_graph(spark, edge_pairs):
    from pgd_spark.graph import Graph

    df = spark.createDataFrame([(int(a), int(b)) for a, b in edge_pairs], "src long, dst long")
    return Graph.from_edges(df)
