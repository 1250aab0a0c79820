"""Table catalog over the driver's parquet star schema (TESTDATA.md).

The reference's sources are per-cohort CSVs and a recursive file
walk (SURVEY.md §2.1 S1/S2, `ExperimentSetup_v2.py:57-60`,
`dataset_classes_v1.py:32-54`); our engine's canonical source is
columnar parquet so scans get predicate pushdown, column pruning and
row-group skipping for free. CSV and binary-file sources live in
their own modules (`csv_io`, `binaryfile`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough that any join against them should be a
# broadcast hash join at EVERY scale factor. Only region/nation truly
# qualify (fixed cardinality, like TPC-H's); supplier grows slowly
# enough (10k rows/SF, a few MB at SF100) to stay broadcastable.
# customer/part deliberately NOT listed: they scale linearly with SF
# (15M customers at SF100) — joins against them should let AQE pick
# broadcast from runtime stats at small SF and shuffle at large SF.
SMALL_DIMS = frozenset({"region", "nation", "supplier"})


def enable_nanos_read(spark: SparkSession) -> None:
    """Make this session able to read INT64 TIMESTAMP(NANOS) parquet.

    Runtime-settable on any session (including a vanilla one the
    driver builds): without it Spark rejects events.parquet with
    PARQUET_TYPE_ILLEGAL; with it, nanos surface as bigint and are
    normalized to microsecond timestamps by the readers."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one catalog table.

    Timestamp normalization: some tables carry nanosecond-precision
    parquet timestamps, which Spark's reader only surfaces as long
    nanos (`spark.sql.legacy.parquet.nanosAsLong`). Those columns
    are converted to proper microsecond timestamps here (floor/
    truncation — the same narrowing DuckDB applies), so every
    downstream operator sees `TimestampType` and pushdown-friendly
    literals.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    # Runtime-settable on any session (including the driver's vanilla
    # one): without it Spark rejects INT64 TIMESTAMP(NANOS) columns
    # (events.parquet) with PARQUET_TYPE_ILLEGAL. With it, nanos
    # surface as bigint and are normalized to timestamps below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # pin the session timezone so date_trunc/year/unix_timestamp match
    # the (timezone-naive) DuckDB oracle on any host, not just UTC ones
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name in ("ts",) and field.dataType.simpleString() == "bigint":
            # integer DIV, not `/`: epoch-nanos ≈ 1.7e18 exceeds double's
            # 2^53 exact range, so floating division drifts by ~hundreds
            # of ns and the floor lands on the wrong microsecond
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"{field.name} DIV 1000")),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so `spark.sql` queries run
    against the same scans (one logical catalog for DataFrame + SQL)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
