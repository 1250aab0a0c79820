"""Semantics tests for the round-6 suite batch (ext5): the embedding
near-dup pipeline (planted-duplicate recovery, banding recall,
cluster invariants) and spot invariants for the classic plan shapes
q208-q213 (each is also value-pinned by its DuckDB oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_srp_neardup_finds_planted_duplicate(spark):
    from patientdataintegration_spark.operators.similarity import (
        srp_banded_neardup_pairs,
    )
    from patientdataintegration_spark.suite.ext4 import _srp_signs

    base = [0.5] * 32 + [-0.5] * 32
    near = list(base)
    near[0] += 0.01  # cosine ~0.9999
    far = [(-1.0) ** i * (0.1 + 0.01 * i) for i in range(64)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id bigint, v array<double>"
    )
    pairs = srp_banded_neardup_pairs(
        df, signs=_srp_signs(k=16), n_bands=2, min_cosine=0.98, vec_col="v"
    ).collect()
    assert {(r.vec_a, r.vec_b) for r in pairs} == {(1, 2)}
    assert pairs[0].cos_sim >= 0.999


def test_srp_neardup_rejects_bad_banding(spark):
    from patientdataintegration_spark.operators.similarity import (
        srp_banded_neardup_pairs,
    )
    from patientdataintegration_spark.suite.ext4 import _srp_signs

    df = spark.createDataFrame([(1, [1.0] * 64)], "vec_id bigint, v array<double>")
    with pytest.raises(ValueError):
        srp_banded_neardup_pairs(df, signs=_srp_signs(k=16), n_bands=3, vec_col="v")


def test_q207_planted_clusters(spark):
    """Every cluster is either a singleton or a (vec, planted twin)
    pair: the twin of vec_id k is k + 10_000_000, no false merges
    at cosine >= 0.98, and each non-singleton cluster has exactly
    one canonical member — the smallest id."""
    from patientdataintegration_spark.suite.ext5 import (
        _PLANT_OFFSET,
        q207_embedding_neardup_clusters,
    )

    rows = q207_embedding_neardup_clusters(spark, SF_DIR).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    n_pairs = 0
    for cl, members in by_cluster.items():
        ids = sorted(m.vec_id for m in members)
        assert sum(m.is_canonical for m in members) == 1
        assert min(ids) == cl
        if len(ids) == 2:
            assert ids[1] == ids[0] + _PLANT_OFFSET, f"false merge: {ids}"
            n_pairs += 1
        else:
            assert len(ids) == 1, f"unexpected cluster {ids}"
    n_planted = sum(1 for r in rows if r.vec_id >= _PLANT_OFFSET)
    # banding may deterministically miss ~1% of planted pairs; it
    # must find the overwhelming majority
    assert n_pairs >= 0.9 * n_planted
    assert n_planted > 0


def test_q208_sole_late_supplier_semantics(spark):
    """Recompute one reported supplier's numwait naively."""
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import q208_sole_late_supplier

    top = q208_sole_late_supplier(spark, SF_DIR).collect()
    assert top and top[0].numwait >= top[-1].numwait
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    s = load_table(spark, SF_DIR, "supplier")
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
                ).cast("int")
            ).alias("late")
        )
    ).collect()
    orders: dict = {}
    for r in per:
        orders.setdefault(r.l_orderkey, []).append((r.l_suppkey, r.late))
    name_to_key = {r.s_name: r.s_suppkey for r in s.collect()}
    target = top[0]
    expect = sum(
        1
        for members in orders.values()
        if len(members) > 1
        and sum(late for _, late in members) == 1
        and any(
            sk == name_to_key[target.s_name] and late == 1
            for sk, late in members
        )
    )
    assert expect == target.numwait


def test_q210_median_matches_python(spark):
    import statistics

    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import q210_token_count_median

    got = {
        r.lang: r.median_tokens
        for r in q210_token_count_median(spark, SF_DIR).collect()
    }
    d = load_table(spark, SF_DIR, "documents").select("lang", "text").collect()
    by_lang: dict = {}
    for r in d:
        by_lang.setdefault(r.lang, []).append(len(r.text.split(" ")))
    for lang, toks in by_lang.items():
        assert got[lang] == pytest.approx(statistics.median(toks))


def test_q211_skew_audit_invariants(spark):
    from patientdataintegration_spark.suite.ext5 import q211_join_key_skew

    rows = q211_join_key_skew(spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(rows[i].cnt >= rows[i + 1].cnt for i in range(9))
    assert all(0 < r.share < 1 for r in rows)
    assert len({round(r.skew_ratio, 12) for r in rows}) == 1
    assert rows[0].skew_ratio >= 1.0


def test_q212_pivot_row_sums(spark):
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import q212_status_pivot

    rows = q212_status_pivot(spark, SF_DIR).collect()
    o = load_table(spark, SF_DIR, "orders")
    per_prio = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_f + r.n_o + r.n_p == per_prio[r.o_orderpriority]


def test_q214_scd2_interval_invariants(spark):
    """Validity intervals per user: contiguous in sequence order,
    state actually changes between versions, exactly one open
    (is_current) row per user."""
    from patientdataintegration_spark.suite.ext5 import q214_scd2_history

    rows = q214_scd2_history(spark, SF_DIR).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for _u, hist in by_user.items():
        hist.sort(key=lambda r: r.version)
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        assert sum(r.is_current for r in hist) == 1
        assert hist[-1].is_current and hist[-1].valid_to_us is None
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.state != b.state


def test_q215_max_concurrency_matches_naive(spark):
    """Naive per-type sweep in Python equals the windowed sweep."""
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import q215_max_concurrency

    got = {
        r.event_type: r.max_concurrent
        for r in q215_max_concurrency(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select("event_type", "ts").collect()
    from datetime import timedelta

    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.ts)
    for t, starts in by_type.items():
        pts = [(s, 1) for s in starts] + [
            (s + timedelta(minutes=30), -1) for s in starts
        ]
        pts.sort()
        live = best = 0
        for _ts, d in pts:
            live += d
            best = max(best, live)
        assert got[t] == best


def test_q216_every_typo_recovers_its_source(spark):
    """The planted 1-deletion typo must match its own clean name at
    distance exactly 1 (names repeat, so matched_name == any name
    equal to the source's) and blocking must never miss it."""
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import q216_fuzzy_name_match

    p = {
        r.p_partkey: r.p_name
        for r in load_table(spark, SF_DIR, "part").collect()
    }
    out = {r.typo_id: r for r in q216_fuzzy_name_match(spark, SF_DIR).collect()}
    planted = {
        k: v for k, v in p.items() if k % 7 == 0 and len(v) >= 4
    }
    assert set(out) == set(planted)
    for k, clean in planted.items():
        r = out[k]
        assert r.lev <= 1
        assert r.typo_name == clean[:2] + clean[3:]
        assert r.n_candidates >= 1


def test_q219_twap_bounds(spark):
    """TWAP lies within [min, max] of the type's values and differs
    from the unweighted mean only by weighting (sanity, not value —
    the oracle pins values)."""
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import q219_time_weighted_avg

    got = {r.event_type: r for r in q219_time_weighted_avg(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select("event_type", "value").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    for t, vals in by_type.items():
        assert min(vals) <= got[t].twap <= max(vals)
        assert got[t].n_intervals == len(vals) - 1


def test_salted_join_equals_plain_join(spark):
    """salted_join must be a pure physical rewrite: inner and left
    results equal the plain joins row-for-row, including unmatched
    left rows, and no _salt column leaks."""
    from patientdataintegration_spark.plans.partitioning import salted_join

    fact = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (9, "d")], "k bigint, payload string"
    )
    dim = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "z")], "dk bigint, attr string"
    )
    for how in ("inner", "left"):
        plain = fact.join(dim, fact.k == dim.dk, how)
        salted = salted_join(fact, dim, "k", "dk", n_salts=4, how=how)
        assert salted.columns == plain.columns
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(fact, dim, "k", "dk", n_salts=0)
    with _pytest.raises(ValueError):
        salted_join(fact, dim, "k", "dk", how="full")


def test_q220_session_window_matches_manual_sessions(spark):
    """The native session_window agrees with the manual lag+cumsum
    construction (same gap) for every (user, session)."""
    from datetime import timedelta

    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import (
        q220_native_session_window,
    )

    got = {
        (r.user_id, r.session_start_us): r
        for r in q220_native_session_window(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts").collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r.ts)
    n_sessions = 0
    for u, tss in by_user.items():
        tss.sort()
        start = prev = tss[0]
        n = 1
        for t in tss[1:]:
            if t - prev <= timedelta(minutes=30):
                prev = t
                n += 1
            else:
                key = (u, int(start.timestamp() * 1_000_000))
                assert key in got and got[key].n_events == n
                n_sessions += 1
                start = prev = t
                n = 1
        key = (u, int(start.timestamp() * 1_000_000))
        assert key in got and got[key].n_events == n
        n_sessions += 1
    assert n_sessions == len(got)


def test_q223_stream_sessions_match_batch_up_to_frontier(spark):
    """The streaming native session_window (append mode) must emit a
    SUBSET of the batch sessions (q220), bit-identical per emitted
    row, and every withheld session must close within the watermark
    horizon (1h) + gap of the stream's max timestamp — the only
    sessions availableNow's final watermark legitimately cannot
    finalize."""
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import (
        q220_native_session_window,
        q223_stream_session_window,
    )

    stream = q223_stream_session_window(spark, SF_DIR)
    batch = q220_native_session_window(spark, SF_DIR)
    assert stream.count() > 0
    assert stream.exceptAll(batch).count() == 0
    withheld = batch.exceptAll(stream).collect()
    max_us = (
        load_table(spark, SF_DIR, "events")
        .agg(F.max(F.unix_micros("ts")))
        .collect()[0][0]
    )
    horizon_us = (3600 + 1800) * 1_000_000  # watermark 1h + gap 30m
    for r in withheld:
        assert r.session_end_us > max_us - horizon_us, (
            f"session ending {r.session_end_us} withheld but outside "
            "the watermark frontier"
        )


def test_q228_trailing_frame_matches_naive(spark):
    """Per-event trailing-hour stats equal a brute-force recompute
    (floored epoch seconds, inclusive [t-3600, t], ties share one
    frame) for one event type."""
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import q228_trailing_hour_frame

    got = {
        r.event_id: (r.n_trailing_1h, r.sum_trailing_1h)
        for r in q228_trailing_hour_frame(spark, SF_DIR).collect()
    }
    ev = [
        (r.event_id, int(r.ts.timestamp()), r.value)
        for r in load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "click")
        .collect()
    ]
    for eid, t, _v in ev:
        frame = [(e, s, v) for e, s, v in ev if t - 3600 <= s <= t]
        n, sm = got[eid]
        assert n == len(frame)
        from decimal import Decimal

        exact = sum(Decimal(str(round(v, 6))) for _, _, v in frame)
        assert sm == pytest.approx(float(exact), abs=1e-6)


def test_q226_every_reported_order_clears_threshold(spark):
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import q226_large_volume_orders

    rows = q226_large_volume_orders(spark, SF_DIR).collect()
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    qty = {
        r.l_orderkey: r.q
        for r in li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    }
    for r in rows:
        assert qty[r.o_orderkey] > 300
        assert r.total_qty == pytest.approx(qty[r.o_orderkey])


def test_q224_verdicts_are_true(spark):
    from patientdataintegration_spark.suite.ext5 import q224_rf_quality_verdict

    r = q224_rf_quality_verdict(spark, SF_DIR).collect()[0]
    assert r.beats_chance and r.scores_in_unit and r.preds_binary
    assert r.n_scored == 150


def test_q229_sql_udfs_inline_into_codegen(spark):
    """SQL UDFs must be macros, not black boxes: the physical plan
    contains no Python evaluation node and the aggregation stays in
    whole-stage codegen."""
    from patientdataintegration_spark.suite.ext5 import q229_sql_udf_macros

    df = q229_sql_udf_macros(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # inlining keeps pushdown/pruning alive: the part scan reads only
    # the two referenced columns (AQE's unexecuted plan hides the
    # WholeStageCodegen markers, so assert on the scan instead)
    assert "ReadSchema: struct<p_partkey:bigint,p_size:int>" in plan
    rows = {r.size_band: r for r in df.collect()}
    assert set(rows) == {"small", "mid", "large"}


def test_q230_lateral_matches_window_formulation(spark):
    """The decorrelated LATERAL top-2 equals the row_number window
    spelling row-for-row."""
    from pyspark.sql.window import Window

    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import q230_lateral_topk

    got = {
        (r.n_name, r.s_name): r.s_acctbal
        for r in q230_lateral_topk(spark, SF_DIR).collect()
    }
    n = load_table(spark, SF_DIR, "nation")
    s = load_table(spark, SF_DIR, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), "s_suppkey"
    )
    expect = {
        (r.n_name, r.s_name): r.s_acctbal
        for r in s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .collect()
    }
    assert got == expect


def test_stream_full_outer_join_matches_batch_twin(spark):
    """q231 vs the batch FULL OUTER twin: every streamed row appears
    in the batch result; withheld rows are exclusively outer rows at
    the watermark frontier on EITHER side (an unmatched error whose
    window end the watermark never passed, or an unmatched click
    whose state could not be proven final). Both null-extension
    directions must actually occur."""
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext5 import (
        q231_stream_full_outer_join,
    )

    streamed = q231_stream_full_outer_join(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("e_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    batch = errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("e_ts"))
        & (F.col("c_ts") > F.col("e_ts") - F.expr("INTERVAL 24 HOURS")),
        "full_outer",
    ).select(
        "error_id",
        "click_id",
        "user_id",
        (F.unix_micros("e_ts") - F.unix_micros("c_ts")).alias(
            "micros_between"
        ),
        "e_ts",
        "c_ts",
    )
    wm = min(
        errors.agg(F.max("e_ts")).collect()[0][0],
        clicks.agg(F.max("c_ts")).collect()[0][0],
    )
    s_rows = {tuple(r) for r in streamed.collect()}
    b_all = batch.collect()
    b_rows = {
        (r.error_id, r.click_id, r.user_id, r.micros_between) for r in b_all
    }
    assert s_rows and s_rows <= b_rows
    missing = b_rows - s_rows
    import datetime as dt

    frontier = set()
    for r in b_all:
        if r.click_id is None and r.e_ts >= wm:
            frontier.add((r.error_id, None, r.user_id, None))
        # an unmatched click's state is final once the watermark
        # passes c_ts + window (no future error can still reach it)
        if r.error_id is None and r.c_ts + dt.timedelta(hours=24) >= wm:
            frontier.add((None, r.click_id, None, None))
    assert missing <= frontier, f"non-frontier rows withheld: {list(missing)[:3]}"
    assert any(r[1] is None and r[0] is not None for r in s_rows)
    assert any(r[0] is None and r[1] is not None for r in s_rows)
