"""Recursive binary-file tile scan (SURVEY.md §2.1 S2/S3; reference
`CustomizedDataset*.get_tile_paths`, `dataset_classes_v1.py:32-54`).

The reference os.walks slide directories and parses each tile's
(slide_name, col, row) out of its file path. Spark-first: the
`binaryFile` source lists recursively IN PARALLEL on executors, and
the path fields become native string expressions over
`input_file_name()`-equivalent `path` column — so partition pruning /
filters on slide or tile coordinates happen before any bytes are
read (`content` is only materialized for rows that survive, thanks
to column pruning on the binaryFile relation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TILE_PATTERN = r"_(\d+)_(\d+)\.[A-Za-z]+$"


def scan_tiles(
    spark: SparkSession,
    base_dir: str,
    glob: str = "*.jpg",
    with_content: bool = True,
) -> DataFrame:
    """tiles(path, slide_name, tile_col, tile_row[, content]).

    `slide_name` = second-to-last path segment
    (`dataset_classes_v1.py:62`); `tile_col`/`tile_row` = the two
    `_`-separated trailing integer tokens (`:70-71`).
    """
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(base_dir)
    )
    parts = F.split(F.col("path"), "/")
    out = df.select(
        F.col("path"),
        F.element_at(parts, -2).alias("slide_name"),
        F.regexp_extract(F.col("path"), TILE_PATTERN, 1).cast("int").alias("tile_col"),
        F.regexp_extract(F.col("path"), TILE_PATTERN, 2).cast("int").alias("tile_row"),
        *([F.col("content")] if with_content else []),
    )
    return out


def join_tiles_to_metadata(tiles: DataFrame, metadata: DataFrame, key: str = "slide_name") -> DataFrame:
    """J1/J2 lookup join (`dataset_classes_v1.py:62-64`): tile fact ⋈
    slide dimension. The metadata side is dimension-sized (hundreds
    of slides per cohort) → broadcast hash join, no shuffle of the
    (wide, binary-bearing) tile side."""
    return tiles.join(F.broadcast(metadata), on=key, how="inner")
