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
        "decode_status",
    ]
    a = sorted(map(tuple, feats.collect()))
    b = sorted(map(tuple, image_features(tiles.repartition(7)).collect()))
    assert a == b  # decode stub is content-deterministic
    assert all(64 <= r[1] < 256 for r in a)


def test_image_header_parse_real_dimensions(spark):
    """JPEG/PNG/GIF headers yield REAL dimensions through the
    mapInPandas decode lane; unknown payloads fall back to the
    deterministic stub."""
    # minimal JPEG: SOI, APP0 (empty), SOF0 with height=31, width=640
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x02"
        + b"\xff\xc0\x00\x0b\x08" + (31).to_bytes(2, "big") + (640).to_bytes(2, "big")
        + b"\x01\x11\x00"
    )
    # minimal PNG: signature + IHDR length/type + width=12, height=34
    png = (
        b"\x89PNG\r\n\x1a\n"
        + b"\x00\x00\x00\x0dIHDR"
        + (12).to_bytes(4, "big") + (34).to_bytes(4, "big")
    )
    gif = b"GIF89a" + (77).to_bytes(2, "little") + (55).to_bytes(2, "little")
    df = spark.createDataFrame(
        [("a.jpg", bytearray(jpeg)), ("b.png", bytearray(png)),
         ("c.gif", bytearray(gif)), ("d.bin", bytearray(b"not an image"))],
        "path string, content binary",
    )
    got = {r.path: (r.width, r.height) for r in image_features(df).collect()}
    assert got["a.jpg"] == (640, 31)
    assert got["b.png"] == (12, 34)
    assert got["c.gif"] == (77, 55)
    w, h = got["d.bin"]
    assert 64 <= w < 256 and 64 <= h < 256  # stub fallback range


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


def test_stream_sessionize_matches_batch(spark, sf_dir):
    """Stateful streaming sessions == batch sessions, except each
    user's trailing session that the final watermark couldn't flush
    (timeout fires only when watermark >= session_end + gap)."""
    from patientdataintegration_spark.operators.sessionize import sessionize
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.streaming.sessions import sessionize_stream

    import pyspark.sql.functions as F

    gap_us = 43_200 * 1_000_000
    e = load_table(spark, sf_dir, "events")
    batch = sessionize(e, gap_seconds=43200).select(
        "user_id", "start_us", "end_us", "n_events"
    )
    streamed = sessionize_stream(
        spark, sf_dir, gap_seconds=43200, watermark="0 seconds",
        table_name="t_sessions",
    ).select(
        "user_id",
        F.col("session_start_us").alias("start_us"),
        F.col("session_end_us").alias("end_us"),
        "n_events",
    )
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in streamed.collect()}
    assert s, "stream emitted no sessions"
    assert s <= b, f"streamed sessions not in batch: {sorted(s - b)[:3]}"
    # watermark semantics: the engine's final watermark is max event
    # ts (0s delay) but timeouts fire with >= comparison on the NEXT
    # no-data batch; every unflushed session must be within gap of
    # the stream's end
    max_us = e.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    for (_, _, end_us, _) in b - s:
        assert end_us + gap_us >= max_us - 1_000_000, (
            "session old enough to flush was not emitted"
        )


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a watermark: an event arriving
    in a later micro-batch, older than the advanced watermark, is
    dropped; finalized window counts exclude it. Two availableNow
    runs over a shared checkpoint make the batch boundary (and the
    persisted watermark) deterministic."""
    import pyspark.sql.functions as F
    from patientdataintegration_spark.streaming.events import tumbling_counts

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    base = 1_700_000_000  # arbitrary epoch seconds

    def write_file(name, rows):
        df = spark.createDataFrame(rows, "user_id long, value double, sec long")
        df = df.select(
            "user_id", "value", F.timestamp_seconds("sec").alias("ts"),
            F.lit("click").alias("event_type"),
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src_dir / name))

    def run_once():
        raw_schema = "user_id long, value double, ts timestamp, event_type string"
        stream = (
            spark.readStream.schema(raw_schema)
            .format("parquet")
            .option("recursiveFileLookup", "true")
            .load(str(src_dir))
        )
        agg = tumbling_counts(stream, window_duration="5 minutes", watermark="0 seconds")
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: two events in the first 5-min window, one event 2h later
    # (advances the persisted watermark far past the first window)
    write_file("a", [(1, 1.0, base + 10), (1, 1.0, base + 20), (1, 1.0, base + 7200)])
    run_once()
    # run 2: a late event for the long-finalized first window + a fresh one
    write_file("b", [(1, 5.0, base + 30), (1, 1.0, base + 7500)])
    run_once()

    got = {
        r["bucket"]: (r["n"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    first_bucket = base - base % 300
    # the first window was finalized in run 1: count 2, and the late
    # value=5.0 event must NOT appear anywhere
    assert got[first_bucket] == (2, 2.0), got
    assert all(abs(v - 5.0) > 1e-9 for _, v in got.values()), got


def test_frame_sample_shape_and_cap(spark):
    from patientdataintegration_spark.operators.multimodal import frame_sample

    rows = [("v1", b"x" * 95), ("v2", b"y" * 5), ("v3", None)]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = frame_sample(df, every_n=10, max_frames=8).collect()
    by_path = {}
    for r in out:
        by_path.setdefault(r["path"], []).append(r["frame_idx"])
    assert len(by_path["v1"]) == 8          # capped at max_frames
    assert by_path["v2"] == [0]             # 5 bytes -> single frame
    assert by_path["v3"] == [0]             # empty payload -> one stub frame
    assert by_path["v1"] == list(range(0, 80, 10))


def test_batch_inference_deterministic(spark):
    from patientdataintegration_spark.operators.multimodal import batch_inference

    rows = [("a", b"hello"), ("b", b"hello"), ("c", b"other"), ("d", None)]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r["path"]: r["score"] for r in batch_inference(df).collect()}
    assert out["a"] == out["b"]             # same payload -> same score
    assert out["a"] != out["c"]
    assert out["d"] == 0.0


def test_ivf_ann_recall(spark, sf_dir):
    """IVF with n_probe=4/16 cells must recover most of the exact
    top-3 neighbors on the synthetic embeddings."""
    from patientdataintegration_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
    )
    from patientdataintegration_spark.sources.catalog import load_table

    import pyspark.sql.functions as F

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(q, e, k=3).collect()}
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_cosine_topk(q, e, k=3, n_cells=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall too low: {recall}"
    # the deterministic (oracle-checkable) quantizer holds the same
    # recall bar and is partition-layout invariant
    det = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_cosine_topk(
            q, e, k=3, n_cells=16, n_probe=4, quantizer="exact"
        ).collect()
    }
    det_recall = len(exact & det) / len(exact)
    assert det_recall >= 0.4, f"exact-quantizer recall too low: {det_recall}"
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_cosine_topk(
            q.repartition(7), e.repartition(5), k=3, n_cells=16, n_probe=4,
            quantizer="exact",
        ).collect()
    }
    assert det == again


def test_stream_stream_join_matches_batch(spark, sf_dir):
    from patientdataintegration_spark.streaming.sessions import interval_join_stream
    from patientdataintegration_spark.suite.core import q47_interval_join

    batch = {tuple(r) for r in q47_interval_join(spark, sf_dir).collect()}
    stream = {
        tuple(r)
        for r in interval_join_stream(
            spark, sf_dir, window_hours=24, table_name="t_ssj"
        ).collect()
    }
    assert stream == batch, (
        f"missing={len(batch - stream)} extra={len(stream - batch)}"
    )


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.streaming.events import enrich_stream_static

    got = {
        (r.c_mktsegment, r.event_type): (r.n, round(r.sum_value, 6))
        for r in enrich_stream_static(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    batch = (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    want = {
        (r.c_mktsegment, r.event_type): (r.n, round(r.sum_value, 6))
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_stream_dedup_each_event_once(spark, sf_dir):
    from pyspark.sql import functions as F

    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.streaming.events import dedup_stream

    out = dedup_stream(spark, sf_dir)
    n_events = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_events
    assert out.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0


def test_session_window_matches_sessionize(spark, sf_dir):
    """Native session_window == the lag+running-sum sessionizer on
    (user, session_start, n_events)."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.sessionize import sessionize
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext import q85_session_window

    native = {
        (r.user_id, r.start_us, r.n_events)
        for r in q85_session_window(spark, sf_dir)
        .select(
            "user_id",
            F.col("session_start_us").alias("start_us"),
            "n_events",
        )
        .collect()
    }
    e = load_table(spark, sf_dir, "events")
    ours = {
        (r.user_id, r.start_us, r.n_events)
        for r in sessionize(e, gap_seconds=43200)
        .select("user_id", "start_us", "n_events")
        .collect()
    }
    assert native == ours and len(native) > 0


def test_foreachbatch_sink_exactly_once(spark, sf_dir, tmp_path):
    """Checkpointed foreachBatch drains the backlog once; restarting
    with the same checkpoint ingests nothing new."""
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.streaming.sinks import stream_to_parquet

    out = str(tmp_path / "ingested")
    ckpt = str(tmp_path / "ckpt")
    q = stream_to_parquet(spark, sf_dir, out, ckpt)
    q.awaitTermination()
    n_in = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(out).count() == n_in

    q2 = stream_to_parquet(spark, sf_dir, out, ckpt)
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == n_in


def test_audio_wav_header_real_metadata(spark):
    """RIFF/WAVE headers yield real rate/channels/bits/duration
    through the mapInPandas audio lane; non-audio rows survive with
    null metadata."""
    from patientdataintegration_spark.operators.multimodal import audio_features

    def wav(rate, channels, bits, n_samples):
        block = channels * bits // 8
        data_size = n_samples * block
        fmt = (
            (1).to_bytes(2, "little")
            + channels.to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * block).to_bytes(4, "little")
            + block.to_bytes(2, "little")
            + bits.to_bytes(2, "little")
        )
        body = b"WAVEfmt " + (16).to_bytes(4, "little") + fmt
        body += b"data" + data_size.to_bytes(4, "little") + b"\x00" * data_size
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    df = spark.createDataFrame(
        [
            ("a.wav", bytearray(wav(16000, 1, 16, 8000))),
            ("b.wav", bytearray(wav(44100, 2, 16, 44100))),
            ("c.bin", bytearray(b"not audio at all")),
        ],
        "path string, content binary",
    )
    got = {r.path: r for r in audio_features(df).collect()}
    a = got["a.wav"]
    assert (a.sample_rate, a.channels, a.bits_per_sample, a.n_samples) == (16000, 1, 16, 8000)
    assert a.duration_s == 0.5
    b = got["b.wav"]
    assert (b.sample_rate, b.channels, b.n_samples) == (44100, 2, 44100)
    assert b.duration_s == 1.0
    assert got["c.bin"].sample_rate is None and got["c.bin"].n_bytes == 16


def test_png_pixel_decode_all_filters():
    """The pure-stdlib PNG decoder recovers exact pixel means through
    every scanline filter type (0..4), checked against pixels held in
    plain arrays before encoding."""
    import zlib

    from patientdataintegration_spark.operators.multimodal import decode_png_pixels

    w, h = 6, 5
    pixels = [[(3 * x + 7 * y * y + 13) % 256 for x in range(w)] for y in range(h)]

    def encode(filters):
        raw = bytearray()
        prev = [0] * w
        for y, ftype in enumerate(filters):
            line = pixels[y]
            raw.append(ftype)
            for x in range(w):
                a = line[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                if ftype == 0:
                    v = line[x]
                elif ftype == 1:
                    v = line[x] - a
                elif ftype == 2:
                    v = line[x] - b
                elif ftype == 3:
                    v = line[x] - ((a + b) >> 1)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] - pred
                raw.append(v & 0xFF)
            prev = line

        def chunk(cid, body):
            return (
                len(body).to_bytes(4, "big") + cid + body
                + zlib.crc32(cid + body).to_bytes(4, "big")
            )

        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
        )

    expect = sum(sum(r) for r in pixels) / (w * h) / 255.0
    for filters in ([0] * h, [1] * h, [0, 2, 2, 2, 2], [0, 3, 4, 1, 2]):
        got = decode_png_pixels(encode(filters))
        assert got is not None, filters
        gw, gh, mean = got
        assert (gw, gh) == (w, h)
        assert abs(mean - expect) < 1e-12, filters


def test_png_pixel_decode_rgba_and_palette():
    """Color types beyond grayscale: RGBA means ignore alpha; palette
    images resolve indices through PLTE."""
    import zlib

    from patientdataintegration_spark.operators.multimodal import decode_png_pixels

    def chunk(cid, body):
        return (
            len(body).to_bytes(4, "big") + cid + body
            + zlib.crc32(cid + body).to_bytes(4, "big")
        )

    # 2x1 RGBA: pixels (10,20,30,alpha=0) and (40,50,60,alpha=255)
    ihdr = (2).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 6, 0, 0, 0])
    raw = bytes([0, 10, 20, 30, 0, 40, 50, 60, 255])
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    got = decode_png_pixels(png)
    assert got == (2, 1, (10 + 20 + 30 + 40 + 50 + 60) / 6 / 255.0)

    # 3x1 palette: indices 0,1,1 → colors (0,0,0) and (255,255,255)
    ihdr = (3).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    plte = bytes([0, 0, 0, 255, 255, 255])
    raw = bytes([0, 0, 1, 1])
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    got = decode_png_pixels(png)
    assert got == (3, 1, (0 + 255 + 255) * 3 / 9 / 255.0)


def test_image_features_real_png_pixels(spark):
    """End-to-end through the Spark lane: synthetic real PNGs →
    image_features returns the TRUE per-image pixel mean (computed
    independently here from the same generator formula)."""
    from patientdataintegration_spark.operators.multimodal import (
        image_features,
        synthetic_pngs,
    )

    tiles = synthetic_pngs(spark.range(1, 9), "id")
    feats = {r.path: r for r in image_features(tiles).collect()}
    assert len(feats) == 8
    for k in range(1, 9):
        w, h = 4 + (k % 13), 4 + (k % 7)
        vals = [((k + x * y) * 31) % 256 for y in range(h) for x in range(w)]
        expect = sum(vals) / len(vals) / 255.0
        r = feats[f"/synthetic/img/{k}.png"]
        assert (r.width, r.height) == (w, h)
        assert abs(r.mean_intensity - expect) < 1e-12


def test_decode_status_mixed_corpus(spark):
    """decode_status separates real pixel decodes from header-only
    and fully-stubbed fallbacks on a mixed corpus, so consumers can
    filter fabricated mean_intensity values instead of trusting them."""
    import zlib

    from patientdataintegration_spark.operators.multimodal import image_features

    def chunk(cid, body):
        return len(body).to_bytes(4, "big") + cid + body + b"\x00" * 4

    ihdr = (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes([0, 128]))) + chunk(b"IEND", b"")
    )
    gif = b"GIF89a" + (9).to_bytes(2, "little") + (7).to_bytes(2, "little")
    # valid IHDR but palette index 1 with a 1-entry PLTE: pixel decode
    # declines (guarded, no IndexError), header dims still real
    bad_plte = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0]))
        + chunk(b"PLTE", bytes([9, 9, 9]))
        + chunk(b"IDAT", zlib.compress(bytes([0, 1])))
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame(
        [
            ("real.png", bytearray(png)),
            ("hdr.gif", bytearray(gif)),
            ("bad_plte.png", bytearray(bad_plte)),
            ("junk.bin", bytearray(b"not an image")),
        ],
        "path string, content binary",
    )
    got = {r.path: r for r in image_features(df).collect()}
    assert got["real.png"].decode_status == "real"
    assert abs(got["real.png"].mean_intensity - 128 / 255.0) < 1e-12
    assert got["hdr.gif"].decode_status == "header"
    assert (got["hdr.gif"].width, got["hdr.gif"].height) == (9, 7)
    assert got["bad_plte.png"].decode_status == "header"
    assert got["junk.bin"].decode_status == "stub"
    statuses = [r.decode_status for r in got.values()]
    assert statuses.count("real") == 1 and statuses.count("stub") == 1


def test_png_adam7_interlaced_decode():
    """An Adam7-interlaced grayscale PNG (independently assembled
    here: pixels split into the 7 passes, each filtered on its own)
    decodes to the exact full-image mean."""
    import zlib

    from patientdataintegration_spark.operators.multimodal import (
        decode_png_pixels,
    )

    w, h = 11, 7  # odd dims exercise empty/ragged passes
    pixels = [[(x * 13 + y * 31 + 7) % 256 for x in range(w)] for y in range(h)]
    passes = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    raw = bytearray()
    for pi, (x0, y0, dx, dy) in enumerate(passes):
        rows = [
            [pixels[y][x] for x in range(x0, w, dx)]
            for y in range(y0, h, dy)
        ]
        if not rows or not rows[0]:
            continue
        prev = [0] * len(rows[0])
        for r in rows:
            if pi % 2:  # alternate filter types across passes
                raw.append(2)  # Up
                raw += bytes((v - p) & 0xFF for v, p in zip(r, prev))
            else:
                raw.append(0)  # None
                raw += bytes(r)
            prev = r

    def chunk(cid, body):
        return len(body).to_bytes(4, "big") + cid + body + b"\x00" * 4

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 0, 0, 0, 1])
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    got = decode_png_pixels(png)
    assert got is not None
    expect = sum(sum(r) for r in pixels) / (w * h) / 255.0
    assert got[0] == w and got[1] == h
    assert abs(got[2] - expect) < 1e-12
    # truncated interlaced stream declines
    bad = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw[: len(raw) // 2])))
        + chunk(b"IEND", b"")
    )
    assert decode_png_pixels(bad) is None


def test_audio_pcm_real_sample_statistics(spark):
    """REAL PCM decode: a 16-bit square wave at +/-16384 has RMS and
    peak exactly 0.5 and alternates sign every sample (zcr 1.0); an
    8-bit unsigned constant 128 decodes to silence (rms/peak/zcr 0);
    a non-PCM format code declines to header-only nulls."""
    import struct

    from patientdataintegration_spark.operators.multimodal import audio_features

    def wav(fmt_code, channels, bits, frames):
        block = channels * bits // 8
        data = b"".join(frames)
        fmt = struct.pack(
            "<HHIIHH", fmt_code, channels, 8000, 8000 * block, block, bits
        )
        body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    square = [struct.pack("<h", 16384 if i % 2 == 0 else -16384) for i in range(100)]
    silent8 = [bytes([128]) for _ in range(50)]
    rows = [
        ("sq.wav", bytearray(wav(1, 1, 16, square))),
        ("silent.wav", bytearray(wav(1, 1, 8, silent8))),
        ("ulaw.wav", bytearray(wav(7, 1, 8, silent8))),  # non-PCM format
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = {r.path: r for r in audio_features(df).collect()}

    sq = got["sq.wav"]
    assert sq.rms == 0.5 and sq.peak == 0.5 and sq.zero_cross_rate == 1.0
    sil = got["silent.wav"]
    assert sil.rms == 0.0 and sil.peak == 0.0 and sil.zero_cross_rate == 0.0
    # non-PCM: header metadata parses, sample stats decline to null
    ul = got["ulaw.wav"]
    assert ul.sample_rate == 8000 and ul.rms is None and ul.peak is None


def test_audio_pcm_truncated_data_decodes_whole_frames(spark):
    """A data chunk whose declared size overruns the payload decodes
    to the last complete frame instead of failing the task."""
    import struct

    from patientdataintegration_spark.operators.multimodal import (
        decode_wav_samples,
    )

    block = 2
    data = b"".join(struct.pack("<h", 1000) for _ in range(10))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * block, block, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    # declare 100 frames but only append 10 and then one EXTRA odd byte
    body += b"data" + struct.pack("<I", 200) + data + b"\x7f"
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    samples = decode_wav_samples(payload)
    assert samples is not None and samples.shape == (10, 1)


def test_avi_roundtrip_real_pixels(spark):
    """synthetic_avis builds REAL uncompressed AVI containers;
    video_frame_features decodes REAL pixels: every frame mean
    matches the hand-computed generator formula, and metadata
    matches the written header."""
    from patientdataintegration_spark.operators.multimodal import (
        synthetic_avis,
        video_frame_features,
        video_metadata,
    )

    keys = spark.createDataFrame([(1,), (2,), (7,)], "k long")
    avis = synthetic_avis(keys, "k", width=8, height=6)

    meta = {r.path: r for r in video_metadata(avis).collect()}
    for k in (1, 2, 7):
        m = meta[f"/synthetic/video/{k}.avi"]
        assert (m.width, m.height, m.codec) == (8, 6, "DIB ")
        assert m.n_frames == 2 + (k % 4)
        assert m.fps == 25.0

    got = {
        (r.path, r.frame_idx): r
        for r in video_frame_features(avis, every_n=1, max_frames=16).collect()
    }

    def expected_mean(k, f):
        vals = [
            (k * 31 + f * 17 + y * 5 + x * 3) % 256
            for y in range(6)
            for x in range(8)
        ]
        return sum(vals) / len(vals)

    for k in (1, 2, 7):
        for f in range(2 + (k % 4)):
            r = got[(f"/synthetic/video/{k}.avi", f)]
            assert (r.width, r.height) == (8, 6)
            assert abs(r.mean_intensity - expected_mean(k, f)) < 1e-9
            # grayscale generator: all three channel means equal
            assert r.mean_r == r.mean_g == r.mean_b


def test_avi_frame_sampling_and_decline(spark):
    """every_n/max_frames subsample REAL frames by index; non-AVI
    payloads produce zero frame rows but survive in metadata with
    nulls; a compressed ('00dc') stream yields metadata but no
    pixels."""
    from patientdataintegration_spark.operators.multimodal import (
        decode_avi_frames,
        synthetic_avis,
        video_frame_features,
        video_metadata,
    )

    keys = spark.createDataFrame([(3,)], "k long")  # 2 + 3%4 = 5 frames
    avis = synthetic_avis(keys, "k")
    sampled = video_frame_features(avis, every_n=2, max_frames=2).collect()
    assert sorted(r.frame_idx for r in sampled) == [0, 2]

    junk = spark.createDataFrame(
        [("x.bin", bytearray(b"not a video"))], "path string, content binary"
    )
    assert video_frame_features(junk).collect() == []
    m = video_metadata(junk).collect()[0]
    assert m.width is None and m.n_bytes == 11

    # rewrite a generated AVI's frame fourccs to '00dc' (compressed):
    # metadata still parses, pixel decode declines
    payload = bytes(avis.collect()[0].content).replace(b"00db", b"00dc")
    assert list(decode_avi_frames(payload)) == []


def test_mp4_box_walk_real_metadata(spark):
    """A hand-built minimal ISO-BMFF payload (ftyp + moov/mvhd +
    trak/tkhd) parses to its real duration, dimensions, brand and
    track count through the video_metadata lane."""
    import struct

    from patientdataintegration_spark.operators.multimodal import video_metadata

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    # mvhd v0: ver/flags, ctime, mtime, timescale=1000, duration=2500ms
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, 2500) + b"\x00" * 80,
    )
    # tkhd v0: 84-byte body; width/height 16.16 fixed at the tail
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 72
        + struct.pack(">II", 640 << 16, 360 << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    payload = ftyp + moov

    df = spark.createDataFrame(
        [("clip.mp4", bytearray(payload))], "path string, content binary"
    )
    m = video_metadata(df).collect()[0]
    assert m.container == "mp4"
    assert m.duration_s == 2.5
    assert (m.width, m.height) == (640, 360)
    assert m.codec == "isom"


def test_avi_corruption_resilience(spark):
    """Corrupt containers must decline per-frame, never fail the
    task or spin: (a) a frame chunk whose declared size overruns the
    payload is skipped; (b) a LIST declaring a ~4GB size terminates
    immediately (the chunk walk clamps to the real buffer); (c) a
    version-1 mvhd too short for its 64-bit duration declines
    instead of misreading v0 offsets."""
    import struct
    import time

    from patientdataintegration_spark.operators.multimodal import (
        decode_avi_frames,
        parse_mp4_header,
        synthetic_avis,
    )

    keys = spark.createDataFrame([(1,)], "k long")
    good = bytes(synthetic_avis(keys, "k").collect()[0].content)

    # (a) truncate mid-frame: remaining whole frames decode, the cut
    # one is skipped, no exception
    cut = good[: len(good) - 50]
    frames = list(decode_avi_frames(cut))
    assert 0 < len(frames) < len(list(decode_avi_frames(good)))

    # (b) hostile LIST size: must return (not spin) in well under a
    # second
    evil = (
        b"RIFF" + struct.pack("<I", 0xFFFFFFF0)
        + b"AVI LIST" + struct.pack("<I", 0xFFFFFFF0) + b"movi"
    )
    t0 = time.time()
    assert list(decode_avi_frames(evil)) == []
    assert time.time() - t0 < 1.0

    # (c) short mvhd v1 declines to no duration
    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    short_v1 = box(b"mvhd", b"\x01\x00\x00\x00" + b"\x00" * 24)  # 28 < 32
    payload = box(b"ftyp", b"isom" + b"\x00" * 8) + box(b"moov", short_v1)
    hdr = parse_mp4_header(payload)
    assert hdr is not None and hdr[0] is None  # parses, no duration


def test_synthetic_avi_strh_field_offsets(spark):
    """The generator's AVISTREAMHEADER is spec-conformant: dwScale at
    body offset 20, dwRate at 24 (25 fps), dwLength at 32 — so
    EXTERNAL parsers that derive fps from strh (not avih) read the
    same 25 fps our parser reads."""
    from patientdataintegration_spark.operators.multimodal import synthetic_avis

    keys = spark.createDataFrame([(3,)], "k long")  # 5 frames
    payload = bytes(synthetic_avis(keys, "k").collect()[0].content)
    i = payload.find(b"strh")
    body = payload[i + 8 :]
    assert body[:4] == b"vids" and body[4:8] == b"DIB "
    assert int.from_bytes(body[20:24], "little") == 1     # dwScale
    assert int.from_bytes(body[24:28], "little") == 25    # dwRate
    assert int.from_bytes(body[28:32], "little") == 0     # dwStart
    assert int.from_bytes(body[32:36], "little") == 5     # dwLength
