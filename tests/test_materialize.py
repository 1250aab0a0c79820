"""Tests for the content-addressed materialization cache
(`plans/materialize.py`) — the round-4 ADVICE hardening of the
q130/q138 edge-cache: content-keyed tags, per-user root, atomic
publish, Hadoop-FS completion detection."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from patientdataintegration_spark.plans.materialize import (
    cache_path,
    cached_parquet,
    corpus_fingerprint,
    ensure_materialized,
    is_materialized,
)


def _touch_corpus(tmp_path, name="corpus", content=b"abc"):
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    (d / "part-0.parquet").write_bytes(content)
    return str(d)


def test_fingerprint_changes_when_content_regenerated(tmp_path):
    p = _touch_corpus(tmp_path)
    tag1 = corpus_fingerprint(p)
    time.sleep(0.01)
    # same path, regenerated content (different size AND mtime)
    (tmp_path / "corpus" / "part-0.parquet").write_bytes(b"abcdef")
    tag2 = corpus_fingerprint(p)
    assert tag1 != tag2
    # and mtime-only changes invalidate too (rewrite-in-place, same bytes)
    time.sleep(0.01)
    (tmp_path / "corpus" / "part-0.parquet").write_bytes(b"abcdef")
    assert corpus_fingerprint(p) != tag2


def test_fingerprint_stable_for_unchanged_content(tmp_path):
    p = _touch_corpus(tmp_path)
    assert corpus_fingerprint(p) == corpus_fingerprint(p)


def test_cache_path_is_per_user_and_content_keyed(tmp_path):
    p = _touch_corpus(tmp_path)
    cp = cache_path("test_kind", p)
    assert f"uid{os.getuid()}" in cp or "pdi_cache_" in cp
    assert "test_kind_" in os.path.basename(cp)
    root = os.path.dirname(cp)
    st = os.stat(root)
    assert st.st_uid == os.getuid()


def test_ensure_materialized_writes_once_and_reuses(spark, tmp_path):
    final = str(tmp_path / "edges")
    calls = []

    def producer():
        calls.append(1)
        return spark.range(10).select(F.col("id").alias("a"))

    ensure_materialized(spark, final, producer)
    assert is_materialized(spark, final)
    assert len(calls) == 1
    ensure_materialized(spark, final, producer)
    assert len(calls) == 1  # completed materialization skipped the producer
    # no leftover tmp dirs from the atomic publish
    leftovers = [d for d in os.listdir(tmp_path) if ".tmp-" in d]
    assert leftovers == []
    assert spark.read.parquet(final).count() == 10


def test_ensure_materialized_replaces_incomplete_dir(spark, tmp_path):
    final = tmp_path / "partial"
    final.mkdir()
    (final / "part-garbage").write_bytes(b"junk")  # no _SUCCESS: incomplete
    assert not is_materialized(spark, str(final))
    ensure_materialized(
        spark, str(final), lambda: spark.range(5).select("id")
    )
    assert is_materialized(spark, str(final))
    assert spark.read.parquet(str(final)).count() == 5


def test_cached_parquet_invalidates_on_corpus_change(spark, tmp_path):
    corpus = _touch_corpus(tmp_path)
    runs = []

    def producer():
        runs.append(1)
        return spark.range(3).select("id")

    cached_parquet(spark, "inv_test", [corpus], producer)
    cached_parquet(spark, "inv_test", [corpus], producer)
    assert len(runs) == 1
    time.sleep(0.01)
    (tmp_path / "corpus" / "part-0.parquet").write_bytes(b"regenerated!")
    cached_parquet(spark, "inv_test", [corpus], producer)
    assert len(runs) == 2  # stale edges NOT silently reused


def test_ensure_materialized_loses_race_to_completed_twin(spark, tmp_path):
    """r5 ADVICE race: a twin completes final_dir DURING our
    producer's write. The pre-delete guard must not fire (the twin is
    complete), the last-instant re-check must discard our tmp, and
    final_dir must end up containing the TWIN's data with no nested
    tmp directory inside it (HDFS rename-onto-existing-dir nests)."""
    final = str(tmp_path / "raced")

    def producer():
        # Simulate the concurrent winner finishing while we compute:
        # by the time our tmp write starts, final_dir is complete.
        spark.range(7).select(F.col("id").alias("a")).write.mode(
            "overwrite"
        ).parquet(final)
        return spark.range(99).select(F.col("id").alias("a"))

    out = ensure_materialized(spark, final, producer)
    assert out == final
    assert is_materialized(spark, final)
    # the twin's 7 rows survive — not our 99, not 7+99 via nesting
    assert spark.read.parquet(final).count() == 7
    nested = [d for d in os.listdir(final) if ".tmp-" in d]
    assert nested == []
    leftovers = [d for d in os.listdir(tmp_path) if ".tmp-" in d]
    assert leftovers == []


def test_q130_q138_share_green_cache_discipline(spark, sf_dir):
    """End-to-end: the two iterative graph queries still produce rows
    through the new cache layer (their oracle gate pins values)."""
    from patientdataintegration_spark.suite.ext import (
        q130_pagerank,
        q138_reachability,
    )

    assert q130_pagerank(spark, sf_dir).count() > 0
    assert q138_reachability(spark, sf_dir).count() > 0
