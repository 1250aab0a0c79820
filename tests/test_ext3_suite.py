"""Hand-computed semantics + plan shapes for the round-4 batch-4
suite (suite/ext3.py) — independent of the DuckDB oracle, which
re-checks the same queries at three scale factors: tiny inputs where
the expected output is derivable on paper, through the REGISTERED
query functions themselves."""

from __future__ import annotations

from patientdataintegration_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
)


def _write(df, tmp, name):
    df.write.parquet(str(tmp / f"{name}.parquet"))


def test_triangle_count_hand_computed(spark, tmp_path):
    """Orders 101-105 each shared by suppliers {1,2,3} (5 shared
    orders -> all three pair edges pass the support threshold);
    order 106 shared by {3,4} only once -> that edge is pruned.
    Edges {12,13,23}; degrees 2,2,2 -> wedges 3; triangles 1;
    cc = 3*1/3 = 1.0."""
    from patientdataintegration_spark.suite.ext3 import q172_triangle_count

    rows = [(o, s) for o in (101, 102, 103, 104, 105) for s in (1, 2, 3)]
    rows += [(106, 3), (106, 4)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")
    _write(li, tmp_path, "lineitem")
    r = q172_triangle_count(spark, str(tmp_path)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (3, 3, 3, 1)
    assert r.clustering == 1.0


def test_cdc_apply_hand_computed(spark, tmp_path):
    """Key 1 deleted (orderkey 16: 16%10=6 -> D), key 2 updated to
    99.0 (orderkey 25 -> U), key -4 inserted (orderkey 8 -> I,
    minted from custkey 3 into the negative key range, disjoint
    from base custkeys at any SF). Change seqs are orderkey+1 so a
    change from orderkey 0 can never tie the base rows at seq 0."""
    from patientdataintegration_spark.suite.ext3 import q174_cdc_apply

    c = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "c_custkey long, c_acctbal double"
    )
    o = spark.createDataFrame(
        [(16, 1, 5.0), (25, 2, 99.0), (8, 3, 50.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    _write(c, tmp_path, "customer")
    _write(o, tmp_path, "orders")
    got = {
        r.key: (r.bal, r.last_seq, r.src)
        for r in q174_cdc_apply(spark, str(tmp_path)).collect()
    }
    assert got == {2: (99.0, 26, "chg"), -4: (50.0, 9, "chg")}


def test_benford_digit_extraction(spark, tmp_path):
    """First significant digits of 123.45, 987.00, 0.07 are 1, 9, 7 —
    extracted via the integer-string path (ROUND(x*100) -> BIGINT),
    never float formatting."""
    from patientdataintegration_spark.suite.ext3 import q173_benford_digits

    o = spark.createDataFrame(
        [(1, 123.45), (2, 987.00), (3, 0.07)],
        "o_orderkey long, o_totalprice double",
    )
    _write(o, tmp_path, "orders")
    got = {
        r.first_digit: (r.n, r.obs_share)
        for r in q173_benford_digits(spark, str(tmp_path)).collect()
    }
    assert got == {1: (1, round(1 / 3, 6)), 9: (1, round(1 / 3, 6)),
                   7: (1, round(1 / 3, 6))}


def test_grid_radius_join_matches_brute_force(spark, tmp_path):
    """The 3x3 neighbor-cell candidate generation loses NO pair:
    compare against a brute-force quadratic scan in Python over the
    same synthetic coordinates (radius 0.5 < cell size 1.0)."""
    from patientdataintegration_spark.suite.ext3 import q175_grid_radius_join

    ckeys = list(range(1, 60))
    skeys = list(range(1, 15))
    c = spark.createDataFrame([(k,) for k in ckeys], "c_custkey long")
    s = spark.createDataFrame([(k,) for k in skeys], "s_suppkey long")
    _write(c, tmp_path, "customer")
    _write(s, tmp_path, "supplier")

    def cust_pt(k):
        return ((k * 7919 % 2000) / 100.0 - 10.0, (k * 104729 % 2000) / 100.0 - 10.0)

    def supp_pt(k):
        return ((k * 6101 % 2000) / 100.0 - 10.0, (k * 9973 % 2000) / 100.0 - 10.0)

    expected = set()
    for ck in ckeys:
        clat, clon = cust_pt(ck)
        for sk in skeys:
            slat, slon = supp_pt(sk)
            d2 = (clat - slat) * (clat - slat) + (clon - slon) * (clon - slon)
            if d2 < 0.25:
                expected.add((ck, sk))
    got = {
        (r.c_custkey, r.s_suppkey)
        for r in q175_grid_radius_join(spark, str(tmp_path)).collect()
    }
    assert got == expected and expected  # non-vacuous


def test_lonely_returner_hand_computed(spark, tmp_path):
    """Order 1 (status F): supplier 1 returned, supplier 2 did not ->
    supplier 1 counted. Order 2 (F): both returned -> nobody. Order
    3 (F): single-supplier -> nobody. Order 4 (status O) -> nobody."""
    from patientdataintegration_spark.suite.ext3 import q170_lonely_returner

    li = spark.createDataFrame(
        [
            (1, 1, "R"), (1, 2, "N"),
            (2, 1, "R"), (2, 2, "R"),
            (3, 1, "R"),
            (4, 1, "R"), (4, 2, "N"),
        ],
        "l_orderkey long, l_suppkey long, l_returnflag string",
    )
    o = spark.createDataFrame(
        [(1, "F"), (2, "F"), (3, "F"), (4, "O")],
        "o_orderkey long, o_orderstatus string",
    )
    s = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "s_suppkey long, s_name string"
    )
    for name, df in [("lineitem", li), ("orders", o), ("supplier", s)]:
        _write(df, tmp_path, name)
    got = [(r.s_suppkey, r.s_name, r.numwait)
           for r in q170_lonely_returner(spark, str(tmp_path)).collect()]
    assert got == [(1, "alpha", 1)]


def test_order_count_distribution_keeps_zero_customers(spark, tmp_path):
    """Customer 1 has 2 qualifying orders, customer 2 has only a
    '4-NOT SPECIFIED' order (filtered IN THE JOIN CONDITION, so the
    customer still appears with count 0): histogram {2:1, 0:1}."""
    from patientdataintegration_spark.suite.ext3 import (
        q164_order_count_distribution,
    )

    c = spark.createDataFrame([(1,), (2,)], "c_custkey long")
    o = spark.createDataFrame(
        [(11, 1, "1-URGENT"), (12, 1, "5-LOW"), (13, 2, "4-NOT SPECIFIED")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    _write(c, tmp_path, "customer")
    _write(o, tmp_path, "orders")
    got = {
        r.c_count: r.custdist
        for r in q164_order_count_distribution(spark, str(tmp_path)).collect()
    }
    assert got == {2: 1, 0: 1}


def test_small_qty_revenue_hand_computed(spark, tmp_path):
    """Part 1 (Brand#13) quantities [1,10,10,10]: avg 7.75, cut
    1.55 -> only the qty-1 line (price 7.0) qualifies ->
    avg_yearly 1.0, n_lines 1."""
    from patientdataintegration_spark.suite.ext3 import q165_small_qty_revenue

    p = spark.createDataFrame([(1, "Brand#13")], "p_partkey long, p_brand string")
    li = spark.createDataFrame(
        [(1, 1.0, 7.0), (1, 10.0, 70.0), (1, 10.0, 70.0), (1, 10.0, 70.0)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    _write(p, tmp_path, "part")
    _write(li, tmp_path, "lineitem")
    r = q165_small_qty_revenue(spark, str(tmp_path)).collect()[0]
    assert (r.avg_yearly, r.n_lines) == (1.0, 1)


# --- plan shapes -------------------------------------------------------------


def test_disjunctive_join_stays_equi_join(spark, sf_dir):
    """q167's OR-of-ANDs must NOT degrade the partkey equi-join to a
    nested-loop / cartesian plan."""
    from patientdataintegration_spark.suite.ext3 import q167_disjunctive_join

    plan = explain_str(q167_disjunctive_join(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert has_broadcast_join(q167_disjunctive_join(spark, sf_dir))


def test_returned_items_pushes_returnflag(spark, sf_dir):
    """q163's returnflag filter reaches the lineitem parquet scan."""
    from patientdataintegration_spark.suite.ext3 import q163_returned_items

    pushed = pushed_filters(q163_returned_items(spark, sf_dir))
    assert any("l_returnflag" in p for p in pushed)


def test_large_volume_uses_semi_join(spark, sf_dir):
    """q166's IN-subquery runs as a LEFT SEMI join, not a distinct +
    inner join."""
    from patientdataintegration_spark.suite.ext3 import q166_large_volume_orders

    plan = explain_str(q166_large_volume_orders(spark, sf_dir))
    assert "LeftSemi" in plan


def test_grid_join_is_equi_join_on_cells(spark, sf_dir):
    """q175 joins on cell ids (hash/broadcast equi-join) — the plan
    must not contain a cartesian candidate generator."""
    from patientdataintegration_spark.suite.ext3 import q175_grid_radius_join

    plan = explain_str(q175_grid_radius_join(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_last_touch_attribution_hand_computed(spark, tmp_path):
    """User 1: click@100 -> purchase@200 (attributed, 5.0);
    purchase@50 precedes any click (unattributed); a purchase 8 days
    after the last click falls outside the 7-day lookback."""
    import pyspark.sql.functions as F
    from patientdataintegration_spark.suite.ext3 import (
        q176_last_touch_attribution,
    )

    rows = [
        (1, 1, 50.0, "purchase", 3.0),
        (2, 1, 100.0, "click", 0.0),
        (3, 1, 200.0, "purchase", 5.0),
        (4, 1, 100.0 + 8 * 86400, "purchase", 7.0),
        (5, 2, 10.0, "view", 1.0),
        # fractional-second boundary: click at 1000.7, purchase
        # 604800.4s later — OUTSIDE the 7-day lookback. A truncated
        # (unix_timestamp) diff would be exactly 604800 and wrongly
        # attribute it; the full-precision epoch must not.
        (6, 3, 1000.7, "click", 0.0),
        (7, 3, 1000.7 + 604800.4, "purchase", 11.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec double, event_type string, value double"
    ).select(
        "event_id", F.timestamp_seconds("sec").alias("ts"), "user_id",
        "event_type", "value",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.user_id: (r.n_purchases, r.n_attributed, r.attributed_rev)
        for r in q176_last_touch_attribution(spark, str(tmp_path)).collect()
    }
    assert got == {1: (3, 1, 5.0), 3: (1, 0, 0.0)}


def test_pareto_frontier_hand_computed(spark, tmp_path):
    """Points (price_c, size): (100,5) and (200,3) are mutually
    non-dominating -> frontier; (200,5) is dominated by (100,5)
    (cheaper, same size); (300,3) is dominated by (200,3); a
    DUPLICATE of (100,5) stays on the frontier (neither strictly
    dominates the other)."""
    from patientdataintegration_spark.suite.ext3 import q178_pareto_frontier

    p = spark.createDataFrame(
        [
            (1, 1.00, 5), (2, 2.00, 3), (3, 2.00, 5), (4, 3.00, 3),
            (5, 1.00, 5),
        ],
        "p_partkey long, p_retailprice double, p_size int",
    )
    p.write.parquet(str(tmp_path / "part.parquet"))
    got = [
        (r.p_partkey, r.price_c, r.size)
        for r in q178_pareto_frontier(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 100, 5), (5, 100, 5), (2, 200, 3)]


def test_rolling_correlation_perfect(spark, tmp_path):
    """Three days with (clicks, views) = (1,2), (2,4), (3,6) —
    perfectly linear -> the day-3 frame (all three days) has
    roll_corr exactly 1.0; day-1 frame (single point) is NULL."""
    import pyspark.sql.functions as F
    from patientdataintegration_spark.suite.ext3 import q177_rolling_correlation

    rows = []
    eid = 0
    for day, (nc, nv) in enumerate([(1, 2), (2, 4), (3, 6)]):
        for _ in range(nc):
            eid += 1
            rows.append((eid, day * 86400 + 10, "click"))
        for _ in range(nv):
            eid += 1
            rows.append((eid, day * 86400 + 20, "view"))
    df = spark.createDataFrame(
        rows, "event_id long, sec long, event_type string"
    ).select(
        "event_id", F.timestamp_seconds("sec").alias("ts"), "event_type",
        F.lit(1).alias("user_id"), F.lit(0.0).alias("value"),
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {r.day: r.roll_corr
           for r in q177_rolling_correlation(spark, str(tmp_path)).collect()}
    assert got[0] is None and got[1] == 1.0 and got[2] == 1.0


def test_ordered_stringagg_rank_order(spark, tmp_path):
    """Nation 7: balances 30 > 20 > 10 -> 'c,b,a' in that exact
    order regardless of input partitioning."""
    from patientdataintegration_spark.suite.ext3 import q179_ordered_stringagg

    c = spark.createDataFrame(
        [(1, "a", 7, 10.0), (2, "b", 7, 20.0), (3, "c", 7, 30.0)],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double",
    ).repartition(4)
    n = spark.createDataFrame([(7, "X")], "n_nationkey long, n_name string")
    c.write.parquet(str(tmp_path / "customer.parquet"))
    n.write.parquet(str(tmp_path / "nation.parquet"))
    r = q179_ordered_stringagg(spark, str(tmp_path)).collect()[0]
    assert (r.n_name, r.top_names, r.n_top) == ("X", "c,b,a", 3)


def test_udtf_chunking_matches_native_chunker(spark, sf_dir):
    """The Python-UDTF chunker (q182) and the native-Column chunker
    (q81) must be row-identical — the slow-path API surface computes
    exactly what the codegen path computes — and the plans must show
    the expected nodes: a Python UDTF evaluation in q182, none in
    q81."""
    from patientdataintegration_spark.suite.ext import q81_chunking
    from patientdataintegration_spark.suite.ext3 import q182_udtf_chunking

    native = q81_chunking(spark, sf_dir)
    via_udtf = q182_udtf_chunking(spark, sf_dir)
    cols = sorted(native.columns)
    assert cols == sorted(via_udtf.columns)
    a = sorted(tuple(repr(r[c]) for c in cols) for r in native.collect())
    b = sorted(tuple(repr(r[c]) for c in cols) for r in via_udtf.collect())
    assert a == b and a

    assert "PythonUDTF" in explain_str(via_udtf)
    assert "PythonUDTF" not in explain_str(native)


def test_udtf_chunker_null_text_emits_no_rows(spark):
    """NULL-document parity (round-4 ADVICE): split(NULL) propagates
    NULL in SQL, so the native chunker and the DuckDB oracle emit
    ZERO chunks for a NULL text — the UDTF must match, not coerce
    NULL to '' and emit one empty chunk."""
    from patientdataintegration_spark.functions.udtfs import (
        ChunkTextUDTF,
        register_udtfs,
    )

    impl = ChunkTextUDTF.func()  # the underlying class behind @udtf
    assert list(impl.eval(7, None)) == []
    # non-NULL empty string still yields its one empty chunk
    # (string_split('') -> [''] in both engines)
    rows = list(impl.eval(8, ""))
    assert len(rows) == 1 and rows[0][0] == 8

    # and through the real SQL surface: a NULL-text doc contributes
    # zero rows to the LATERAL expansion
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id bigint, text string"
    ).createOrReplaceTempView("null_docs")
    out = spark.sql(
        "SELECT c.* FROM null_docs, LATERAL chunk_text(doc_id, text) c"
    )
    ids = [r.doc_id for r in out.collect()]
    assert 2 not in ids and 1 in ids


def test_hierarchical_shares_hand_computed(spark, tmp_path):
    """Two regions: R1 holds nations A (30) and B (10), R2 holds C
    (60): A's share of R1 = 0.75, R1's share of total = 0.4."""
    from patientdataintegration_spark.suite.ext3 import q183_hierarchical_shares

    r = spark.createDataFrame([(1, "R1"), (2, "R2")], "r_regionkey long, r_name string")
    n = spark.createDataFrame(
        [(1, "A", 1), (2, "B", 1), (3, "C", 2)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    c = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "c_custkey long, c_nationkey long"
    )
    o = spark.createDataFrame(
        [(1, 10, 30.0), (2, 20, 10.0), (3, 30, 60.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    for name, df in [("region", r), ("nation", n), ("customer", c), ("orders", o)]:
        _write(df, tmp_path, name)
    got = {
        row.nation: (row.val, row.share_of_region, row.region_share_of_total)
        for row in q183_hierarchical_shares(spark, str(tmp_path)).collect()
    }
    assert got == {
        "A": (30.0, 0.75, 0.4),
        "B": (10.0, 0.25, 0.4),
        "C": (60.0, 1.0, 0.6),
    }


def test_top_session_paths_hand_computed(spark, tmp_path):
    """User 1: click,view within one session then a purchase 31 min
    later (new session). User 2: click,view. Paths: 'click>view' x2,
    'purchase' x1 — ordered by count then path."""
    import pyspark.sql.functions as F
    from patientdataintegration_spark.suite.ext3 import q184_top_session_paths

    rows = [
        (1, 1, 0.0, "click"), (2, 1, 60.0, "view"),
        (3, 1, 60.0 + 31 * 60, "purchase"),
        (4, 2, 0.0, "click"), (5, 2, 10.0, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec double, event_type string"
    ).select(
        "event_id", F.timestamp_seconds("sec").alias("ts"), "user_id",
        "event_type", F.lit(0.0).alias("value"),
    )
    _write(df, tmp_path, "events")
    got = [(r.path, r.n_sessions)
           for r in q184_top_session_paths(spark, str(tmp_path)).collect()]
    assert got == [("click>view", 2), ("purchase", 1)]
