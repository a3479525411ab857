"""Durable-table format indirection.

Every durable write in the engine (pregel checkpoints, the streaming
edge store, distributed micro output) goes through this module, so the
"identical layout on Iceberg/Delta" claim is executable, not prose:

    PGD_SPARK_TABLE_FORMAT=parquet   (default)
    PGD_SPARK_TABLE_FORMAT=delta     path-based Delta table
    PGD_SPARK_TABLE_FORMAT=iceberg   requires a configured catalog;
                                     path writes use the hadoop-table
                                     layout

The sandbox ships neither catalog jar, so the non-parquet branches are
exercised by a test that SKIPS unless the jar is importable
(tests/test_table_format.py) — the dispatch itself (format string,
options, mode) runs either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_format() -> str:
    fmt = os.environ.get("PGD_SPARK_TABLE_FORMAT", "parquet").lower()
    if fmt not in ("parquet", "delta", "iceberg"):
        raise ValueError(f"PGD_SPARK_TABLE_FORMAT={fmt!r}: use parquet|delta|iceberg")
    return fmt


def write_table(df: DataFrame, path: str, mode: str = "overwrite", fmt: str | None = None) -> None:
    """Write ``df`` as a durable table at ``path`` in the configured
    format (or an explicit ``fmt`` override).  Layout contract:
    whatever the format, a follow-up :func:`read_table` on the same
    path returns the same rows."""
    fmt = fmt or table_format()
    w = df.write.mode(mode)
    if fmt == "parquet":
        w.parquet(path)
    else:
        w.format(fmt).save(path)


def read_table(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    fmt = table_format()
    if fmt == "parquet":
        r = spark.read
        if schema:
            r = r.schema(schema)
        return r.parquet(path)
    return spark.read.format(fmt).load(path)
