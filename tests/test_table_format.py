"""Durable-table format indirection (plans.tables): the dispatch the
pregel checkpoints / streaming store / micro sink write through.

The sandbox ships no Delta/Iceberg jars, so the non-parquet branches
run only where the package is importable (skip otherwise) — the
dispatch path itself (env var → format string → writer) is exercised
either way.
"""

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

from pgd_spark.plans.tables import read_table, table_format, write_table


def test_parquet_default_roundtrip(spark, tmp_path):
    assert table_format() == "parquet"
    df = spark.range(100).select("id", (F.col("id") * 2).alias("x"))
    path = str(tmp_path / "t")
    write_table(df, path)
    got = read_table(spark, path)
    assert got.count() == 100
    assert {r["x"] for r in got.collect()} == {2 * i for i in range(100)}


def test_bad_format_rejected(monkeypatch):
    monkeypatch.setenv("PGD_SPARK_TABLE_FORMAT", "orcish")
    with pytest.raises(ValueError, match="orcish"):
        table_format()


def test_format_env_reaches_writer(spark, tmp_path, monkeypatch):
    """With a bogus-but-shaped format the dispatch must reach Spark's
    DataSource resolution (proving the env var actually steers the
    writer, not just the string)."""
    monkeypatch.setenv("PGD_SPARK_TABLE_FORMAT", "delta")
    if importlib.util.find_spec("delta") is not None:
        pytest.skip("delta available — covered by the real roundtrip below")
    df = spark.range(5)
    with pytest.raises(Exception) as ei:
        write_table(df, str(tmp_path / "d"))
    # Spark fails at source lookup — the format string got through
    assert "delta" in str(ei.value).lower()


@pytest.mark.skipif(
    importlib.util.find_spec("delta") is None, reason="delta-spark not installed"
)
def test_delta_roundtrip(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("PGD_SPARK_TABLE_FORMAT", "delta")
    df = spark.range(50)
    path = str(tmp_path / "t")
    write_table(df, path)
    assert read_table(spark, path).count() == 50


def test_pregel_checkpoint_honors_format(spark, tmp_path, monkeypatch):
    """_cut_lineage writes through the indirection; parquet default
    produces the _SUCCESS-marked iter dirs resume depends on."""
    from pgd_spark.operators.pregel import connected_components
    from pgd_spark.sources.synthetic import random_graph

    monkeypatch.delenv("PGD_SPARK_TABLE_FORMAT", raising=False)
    g = random_graph(spark, 200, 800, seed=3)
    ck = str(tmp_path / "ck")
    connected_components(g, checkpoint_dir=ck)
    iters = [d for d in os.listdir(os.path.join(ck, "cc")) if d.startswith("iter=")]
    assert iters
    assert all(
        os.path.exists(os.path.join(ck, "cc", d, "_SUCCESS")) for d in iters
    )
