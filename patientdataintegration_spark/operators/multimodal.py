"""Multimodal (image/audio/video) column lane (north-star extension;
reference analogues: tile decode `dataset_classes_v1.py:60-61` S3,
image transforms `ExperimentSetup_v2.py:106-127` M3, batch inference
`functions_v2.py:321-325` M2).

Media ride through the engine as opaque `binary` content columns
with typed metadata columns alongside — the multimodal-column model.
Per-item compute (decode, resize, feature-extract) runs in
Arrow-batched pandas iterators via `mapInPandas`: the ONLY sanctioned
Python hot path in the engine, because it moves whole record batches
across the JVM↔Python boundary instead of rows.

The actual pixel decode requires image libraries not present in this
container, so `decode_image` is a clearly-marked STUB with a
deterministic fake implementation (derived from the bytes) — the
Spark-side plumbing (schema contract, batch iteration, partition
sizing) is real and tested. Swap `_fake_decode` for PIL/torchvision
in production.

Scale notes: binary columns make wide rows — keep
`spark.sql.files.maxPartitionBytes` bounded and NEVER aggregate or
shuffle the content column itself (project it away before any wide
operation; sample/filter on path metadata BEFORE decode, the
reference's own "sample below decode" pushdown, SURVEY.md §4.1).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int, float]:
    """STUB decode: deterministic pseudo-dimensions/intensity from the
    byte payload. Replace with `PIL.Image.open(io.BytesIO(content))`
    where image libs exist; raise NotImplementedError there if you
    need a hard failure instead of fake values."""
    digest = hashlib.md5(content or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    mean_intensity = digest[2] / 255.0
    return width, height, mean_intensity


def image_features(df: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """Decode + featurize a binary image column via mapInPandas.

    Input: any DataFrame with (path string, content binary). Output:
    IMAGE_FEATURES_SCHEMA. The iterator-of-batches form keeps memory
    at one Arrow batch per task regardless of partition size.
    """
    cols = df.select(F.col(path_col).alias("path"), F.col(content_col).alias("content"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(c if c is not None else b"") for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "mean_intensity": [d[2] for d in decoded],
                }
            )

    return cols.mapInPandas(decode_batches, IMAGE_FEATURES_SCHEMA)


def synthetic_tiles(df: DataFrame, key_col: str, name_col: str) -> DataFrame:
    """Build a (path, content) tile relation from any table — gives the
    multimodal lane a deterministic test input without real files:
    path mimics the reference's `<base>/<slide>/<name>_<col>_<row>.jpg`
    layout (`dataset_classes_v1.py:62,70-71`), content is the
    utf-8 bytes of the name (opaque payload)."""
    path = F.concat(
        F.lit("/synthetic/"),
        F.col(name_col),
        F.lit("/t_"),
        (F.col(key_col) % 16).cast("string"),
        F.lit("_"),
        (F.col(key_col) % 23).cast("string"),
        F.lit(".jpg"),
    )
    return df.select(path.alias("path"), F.encode(F.col(name_col), "utf-8").alias("content"))
