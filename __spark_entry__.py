"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``patientdataintegration_spark``; this file
only adapts the suite registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's full
    experiment lifecycle (SURVEY.md §3.1) as ONE lazy DAG — cohort
    union → imputation → encoding → stratified folds → seeded
    sampling → fact join → grouped scoring → per-set balanced
    accuracy + AUROC."""
    from patientdataintegration_spark.suite.core import q45_full_pipeline

    return q45_full_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from patientdataintegration_spark.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query.
    Keys absent here (streaming / pandas-UDF lanes) get the driver's
    weaker rows-only check."""
    from patientdataintegration_spark.suite import ORACLES

    return dict(ORACLES)
