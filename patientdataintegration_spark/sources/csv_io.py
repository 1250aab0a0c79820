"""CSV source/sink (SURVEY.md §2.1 S1/K1; reference
`pd.read_csv(lab_csv)` at `ExperimentSetup_v2.py:57,59` and the
`folds.csv` sink at `functions_v2.py:132-138`).

Schema is EXPLICIT (never inferSchema on a big scan — inference
reads the data twice and guesses types per-file; the reference's
implicit pandas inference is exactly the non-determinism we're
removing). The metadata schema mirrors FIXTURES.md F1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# FIXTURES.md F1 / `ExperimentSetup_v2.py:63-71`
SLIDE_METADATA_SCHEMA = StructType(
    [
        StructField("slide_name", StringType(), nullable=False),
        StructField("label", IntegerType(), nullable=False),
        StructField("age", DoubleType(), nullable=True),
        StructField("gender", IntegerType(), nullable=True),
        StructField("location", IntegerType(), nullable=True),
        StructField("UV", IntegerType(), nullable=True),
    ]
)


def read_cohort_csv(
    spark: SparkSession, path: str, lab: int, schema: StructType = SLIDE_METADATA_SCHEMA
) -> DataFrame:
    """S1 + P1: one cohort CSV + constant `lab` provenance column
    (`ExperimentSetup_v2.py:57-60`)."""
    return (
        spark.read.option("header", True).schema(schema).csv(path).withColumn("lab", F.lit(lab))
    )


def union_cohorts(*cohorts: DataFrame) -> DataFrame:
    """U1 (`ExperimentSetup_v2.py:63-71`): column-aligned union of
    per-lab tables. `unionByName` so column order can never silently
    mis-align (the reference relies on list order)."""
    out = cohorts[0]
    for c in cohorts[1:]:
        out = out.unionByName(c)
    return out


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """K1 sink (`functions_v2.py:132-138`). `single_file` coalesces to
    one partition — only for dimension-sized outputs like folds.csv;
    large facts keep their parallelism."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
