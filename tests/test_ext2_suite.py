"""Hand-computed semantics for the round-4 suite — independent of
the DuckDB oracle (which re-checks the same queries at three scale
factors): tiny inputs where the expected output is derivable on
paper."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events(spark, rows):
    """rows: (user_id, epoch_seconds, event_type)."""
    df = spark.createDataFrame(rows, "user_id long, sec long, event_type string")
    return df.select(
        F.monotonically_increasing_id().alias("event_id"),
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
    )


def test_streak_islands_hand_computed(spark, tmp_path):
    """User 1: days 0,1,2 then 5,6 → streaks [3,2]; user 2: days
    0 and 7 → streaks [1,1] — through the REGISTERED query itself."""
    from patientdataintegration_spark.suite.ext2 import q151_activity_streaks

    day = 86400
    rows = [
        (1, 0 * day + 5, "click"),
        (1, 1 * day + 9, "click"),
        (1, 2 * day + 2, "view"),
        (1, 2 * day + 3, "view"),  # same day, distinct collapses
        (1, 5 * day + 1, "click"),
        (1, 6 * day + 1, "click"),
        (2, 0 * day + 1, "click"),
        (2, 7 * day + 1, "click"),
    ]
    src_dir = tmp_path / "sf"
    src_dir.mkdir()
    _events(spark, rows).write.parquet(str(src_dir / "events.parquet"))
    got = {
        r.user_id: (r.n_active_days, r.n_streaks, r.max_streak)
        for r in q151_activity_streaks(spark, str(src_dir)).collect()
    }
    assert got == {1: (5, 2, 3), 2: (2, 2, 1)}


def test_markov_transitions_hand_computed(spark, sf_dir, tmp_path, monkeypatch):
    """One user: a->b->b->c gives transitions (a,b)=1 (p=1.0) and
    (b,b)=1, (b,c)=1 — prev 'b' has two outgoing, so p=0.5 each."""
    from patientdataintegration_spark.suite.ext2 import q148_markov_transitions

    rows = [(1, 10, "a"), (1, 20, "b"), (1, 30, "b"), (1, 40, "c")]
    src_dir = tmp_path / "sf"
    src_dir.mkdir()
    _events(spark, rows).write.parquet(str(src_dir / "events.parquet"))
    got = {
        (r.prev_type, r.next_type): (r.n, r.p_transition)
        for r in q148_markov_transitions(spark, str(src_dir)).collect()
    }
    assert got == {("a", "b"): (1, 1.0), ("b", "b"): (1, 0.5), ("b", "c"): (1, 0.5)}


def test_retention_cohorts_hand_computed(spark, tmp_path):
    """Users 1,2 start week 0; user 1 returns week 1. Triangle:
    (0,0)=2 users, (0,1)=1 user."""
    from patientdataintegration_spark.suite.ext2 import q147_retention_cohorts

    wk = 604800
    rows = [
        (1, 10, "click"),
        (2, 20, "click"),
        (1, wk + 5, "click"),
    ]
    src_dir = tmp_path / "sf"
    src_dir.mkdir()
    _events(spark, rows).write.parquet(str(src_dir / "events.parquet"))
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in q147_retention_cohorts(spark, str(src_dir)).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1}


def test_snapshot_diff_classification(spark, sf_dir):
    """Statuses partition the key space: added keys are new-only
    (divisible by 7, not by 5), removed are old-only (by 5 not 7),
    changed are keys where c_custkey % 3 != 0 (bal shifted), and the
    four counts sum to the full outer key-universe size."""
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext2 import q153_snapshot_diff

    got = {r.status: r.n for r in q153_snapshot_diff(spark, sf_dir).collect()}
    cu = load_table(spark, sf_dir, "customer")
    n = cu.count()
    both = cu.filter((F.col("c_custkey") % 7 != 0) & (F.col("c_custkey") % 5 != 0))
    expect_added = cu.filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 5 != 0)
    ).count()
    expect_removed = cu.filter(
        (F.col("c_custkey") % 7 != 0) & (F.col("c_custkey") % 5 == 0)
    ).count()
    expect_changed = both.filter(F.col("c_custkey") % 3 != 0).count()
    expect_unchanged = both.filter(F.col("c_custkey") % 3 == 0).count()
    assert got.get("added", 0) == expect_added
    assert got.get("removed", 0) == expect_removed
    assert got.get("changed", 0) == expect_changed
    assert got.get("unchanged", 0) == expect_unchanged
    assert sum(got.values()) == n - cu.filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 5 == 0)
    ).count()


def test_quality_verdict_reasons_consistent(spark, sf_dir):
    """keep == (reasons is empty); reason substrings match the
    individual rule predicates."""
    from patientdataintegration_spark.suite.ext2 import q156_quality_verdict

    rows = q156_quality_verdict(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.keep == (r.reasons == "")
        if "too_short" in r.reasons:
            assert r.n_tokens < 20


def test_semantic_dedup_sizes_sum_to_corpus(spark, sf_dir):
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext2 import q157_semantic_dedup

    rows = q157_semantic_dedup(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.size for r in rows) == total
    assert all(r.n_removable == r.size - 1 for r in rows)
    assert len({r.canonical_id for r in rows}) == len(rows)


def test_xml_quarantine_lane(spark, tmp_path):
    """Malformed XML rows land in _corrupt_record with the raw text;
    healthy rows parse into the declared schema."""
    from patientdataintegration_spark.sources.xml_io import (
        healthy,
        quarantined,
        read_xml,
        write_xml,
    )

    df = spark.createDataFrame(
        [(1, "alpha <&> beta"), (2, "ok")], "id long, body string"
    )
    path = str(tmp_path / "x")
    write_xml(df, path, n_files=1)
    # append a well-formed but type-malformed row to the written
    # shard (document-level malformation fails the whole file read;
    # the quarantine lane is per-RECORD typing)
    import glob

    shard = glob.glob(path + "/*.xml")[0]
    text = open(shard).read()
    text = text.replace(
        "</rows>", "<row><id>not_a_long</id><body>x</body></row></rows>"
    )
    open(shard, "w").write(text)
    import os

    for crc in glob.glob(path + "/.*.crc"):
        os.remove(crc)  # hand-edited shard invalidates Hadoop's CRC sidecar
    back = read_xml(spark, path, schema=df.schema)
    ok = {(r.id, r.body) for r in healthy(back).collect()}
    assert ok == {(1, "alpha <&> beta"), (2, "ok")}
    bad = quarantined(back).collect()
    assert len(bad) == 1 and bad[0].id is None
