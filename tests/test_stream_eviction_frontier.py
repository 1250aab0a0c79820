"""Millisecond-exact calibration of the stream-stream outer-join
eviction frontier — the empirical basis for q201/q231's r8 oracle
upgrade. Synthetic feeds place unmatched rows 1 ms apart around the
predicted cut so the rules

  unmatched error emits  iff  e_ms <  wm_ms          (STRICT)
  unmatched click emits  iff  c_ms + 24h <= wm_ms    (NON-strict)

with wm_ms = min(per-side ms-floored max event time) are pinned to
the exact millisecond and comparison direction, including the
sub-millisecond case (a row 500 µs past the cut must behave like the
next millisecond, proving the engine compares ms-floored values).
If a Spark upgrade ever moves these semantics, THESE tests go red
before the driver's oracle hash does."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
DAY_MS = 86_400_000


def _ts(ms: int, us: int = 0) -> dt.datetime:
    return BASE + dt.timedelta(milliseconds=ms, microseconds=us)


def _write_feed(spark, rows, path: str) -> str:
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    part = [f for f in os.listdir(path) if f.endswith(".parquet")][0]
    os.rename(f"{path}/{part}", f"{path}/events.parquet")
    return path


def test_error_side_eviction_is_strict_ms(spark, tmp_path):
    """Unmatched errors around the watermark (set by the click side,
    since the error side runs ahead): strictly-below emits, at/above
    withholds, 500 µs past the cut behaves like the next ms."""
    from patientdataintegration_spark.streaming.sessions import (
        interval_join_stream,
    )

    c_ms = 100_000  # last click — becomes wm (errors run ahead)
    rows, errs, rid = [], {}, 1
    rows.append((rid, 999, _ts(0), "click", 1.0)); rid += 1
    rows.append((rid, 999, _ts(c_ms), "click", 1.0)); rid += 1
    for o in (-2, -1, 0, 1, 2):
        rows.append((rid, 100 + o, _ts(c_ms + o), "error", 2.0))
        errs[rid] = o
        rid += 1
    rows.append((rid, 200, _ts(c_ms, 500), "error", 2.0))
    errs[rid] = 0.5
    rid += 1
    rows.append((rid, 300, _ts(c_ms + 5000), "error", 2.0))  # wm stays at clicks
    errs[rid] = 5000
    rid += 1

    d = _write_feed(spark, rows, str(tmp_path / "feed_err"))
    out = interval_join_stream(
        spark, d, window_hours=24, table_name="evict_cal_err", how="left_outer"
    )
    emitted = {r.error_id for r in out.filter(F.col("click_id").isNull()).collect()}
    for eid, off in errs.items():
        assert (eid in emitted) == (off < 0), f"offset {off} ms"


def test_click_side_eviction_is_nonstrict_ms(spark, tmp_path):
    """Unmatched clicks around wm - 24h (wm set by the error side):
    at-or-below emits (c + 24h <= wm), above withholds — the open
    end of the (e-24h, e] join interval made visible."""
    from patientdataintegration_spark.streaming.sessions import (
        interval_join_stream,
    )

    e_ms = DAY_MS + 200_000  # last error — becomes wm (clicks run ahead)
    rows, clicks, rid = [], {}, 1
    rows.append((rid, 999, _ts(1000), "error", 2.0)); rid += 1
    rows.append((rid, 999, _ts(500), "click", 1.0)); rid += 1  # matched pair
    rows.append((rid, 998, _ts(e_ms), "error", 2.0)); rid += 1
    rows.append((rid, 997, _ts(e_ms + 10_000), "click", 1.0)); rid += 1  # wm = errors
    for o in (-2, -1, 0, 1, 2):
        rows.append((rid, 100 + o, _ts(e_ms - DAY_MS + o), "click", 1.0))
        clicks[rid] = o
        rid += 1
    rows.append((rid, 200, _ts(e_ms - DAY_MS, 500), "click", 1.0))
    clicks[rid] = 0.5
    rid += 1

    d = _write_feed(spark, rows, str(tmp_path / "feed_clk"))
    out = interval_join_stream(
        spark, d, window_hours=24, table_name="evict_cal_clk", how="full_outer"
    )
    emitted = {r.click_id for r in out.filter(F.col("error_id").isNull()).collect()}
    for cid, off in clicks.items():
        assert (cid in emitted) == (off <= 0), f"offset {off} ms"
    # error side obeys the strict rule in FULL outer too: the error
    # AT the watermark is withheld
    err_null = {r.error_id for r in out.filter(F.col("click_id").isNull()).collect()}
    assert 3 not in err_null
