"""XML source/sink (Spark 4 native `xml` format — the spark-xml
package folded into core).

Enterprise/clinical interchange still ships XML (HL7-adjacent
exports, registry dumps); the engine reads and writes it with the
same lazy-scan posture as the other sources. Two scale caveats the
API encodes:

- **Always pass an explicit schema on read.** Schema inference for
  XML samples the whole input (a full extra pass at 100 TB) and can
  type the same column differently between runs; `read_xml` therefore
  requires a schema, like `jsonl_io.read_jsonl`.
- **Malformed records quarantine, not crash**: PERMISSIVE mode with
  `columnNameOfCorruptRecord` keeps bad rows inspectable — the same
  quarantine lane as the JSONL source.

No DuckDB oracle for the format itself (DuckDB has no XML reader);
losslessness is proven the q107 way — round-trip then aggregate,
oracle on the original parquet (q159).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """XML sink; `n_files` caps output shard count (XML is for
    interchange — consumers want few, named files, not one per
    shuffle partition)."""
    out = df.coalesce(n_files) if n_files else df
    (
        out.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType,
    row_tag: str = "row",
) -> DataFrame:
    """Schema-enforced lazy XML scan with a quarantine column:
    well-formed rows parse into the declared columns; malformed rows
    land with the raw text in `_corrupt_record` and NULLs elsewhere.
    Filter `quarantined(df)` / `healthy(df)` downstream."""
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(full)
        .load(path)
    )


def healthy(df: DataFrame) -> DataFrame:
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def quarantined(df: DataFrame) -> DataFrame:
    return df.filter(F.col(CORRUPT_COL).isNotNull())
