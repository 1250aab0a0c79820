"""ORC source/sink (Spark-native columnar alternative to parquet).

Some lakehouse estates standardize on ORC (Hive lineage); the engine
reads and writes it with the same pushdown/pruning properties as the
parquet path — predicate pushdown and column pruning reach the ORC
scan exactly like parquet's (`spark.sql.orc.filterPushdown` is on by
default), so the catalog's scale posture carries over unchanged.

No DuckDB oracle (DuckDB has no ORC reader) — the pytest roundtrip
asserts lossless read-back and pushdown plan shape instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar ORC sink (snappy, the Spark default)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Lazy ORC scan — filters/projections push down like parquet."""
    return spark.read.orc(path)
