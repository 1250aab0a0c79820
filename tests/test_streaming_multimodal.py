"""Streaming lane equals its batch twin; multimodal lane produces the
contracted schema through real binaryFile scans and mapInPandas."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from patientdataintegration_spark.operators.multimodal import (
    image_features,
    synthetic_tiles,
)
from patientdataintegration_spark.sources.binaryfile import (
    join_tiles_to_metadata,
    scan_tiles,
)
from patientdataintegration_spark.sources.catalog import load_table
from patientdataintegration_spark.streaming.events import (
    run_tumbling_counts_stream,
    tumbling_counts,
)


def test_stream_equals_batch(spark, sf_dir):
    batch = tumbling_counts(
        load_table(spark, sf_dir, "events"), streaming=False
    )
    stream = run_tumbling_counts_stream(spark, sf_dir, table_name="t_stream_eq")
    b = {(r["bucket"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch.collect()}
    s = {(r["bucket"], r["event_type"]): (r["n"], r["sum_value"]) for r in stream.collect()}
    assert b == s


def test_multimodal_feature_schema_and_determinism(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    tiles = synthetic_tiles(p, "p_partkey", "p_name")
    feats = image_features(tiles)
    assert [f.name for f in feats.schema.fields] == [
        "path",
        "width",
        "height",
        "n_bytes",
        "mean_intensity",
    ]
    a = sorted(map(tuple, feats.collect()))
    b = sorted(map(tuple, image_features(tiles.repartition(7)).collect()))
    assert a == b  # decode stub is content-deterministic
    assert all(64 <= r[1] < 256 for r in a)


def test_binaryfile_scan_parses_reference_layout(spark):
    # reference layout: <base>/<slide_name>/<name>_<col>_<row>.jpg
    # (dataset_classes_v1.py:62,70-71)
    with tempfile.TemporaryDirectory() as base:
        for slide in ("slideA", "slideB"):
            os.makedirs(os.path.join(base, slide))
            for c, r in [(0, 1), (2, 3)]:
                with open(os.path.join(base, slide, f"t_{c}_{r}.jpg"), "wb") as f:
                    f.write(b"\xff\xd8fakejpg")
        tiles = scan_tiles(spark, base)
        rows = tiles.orderBy("path").collect()
        assert len(rows) == 4
        assert {r["slide_name"] for r in rows} == {"slideA", "slideB"}
        assert {(r["tile_col"], r["tile_row"]) for r in rows} == {(0, 1), (2, 3)}
        meta = spark.createDataFrame(
            [("slideA", 1), ("slideB", 0)], "slide_name string, label int"
        )
        joined = join_tiles_to_metadata(tiles, meta)
        assert joined.filter(F.col("label") == 1).count() == 2
