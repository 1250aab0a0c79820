"""Round-8 incremental-maintenance additions (operators/incremental):
bitmap exact-distinct state and delta join-view maintenance — each
merge identity proven bit-exact against the flat recompute, plus the
properties the lanes lean on (idempotent OR-merge, disjoint delta
branches, broadcast delta plan shape).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from patientdataintegration_spark.operators.incremental import (
    bitmap_distinct_readout,
    delta_join_rows,
    distinct_bitmap_state,
    maintain_join_view,
    merge_bitmap_states,
)


def _vals_df(spark):
    # two keys; k1 sees {1..40} twice (dups must not count), k2 sees
    # a sparse range spanning multiple 32768-bit bitmap buckets
    rows = [("k1", v) for v in range(1, 41)] * 2
    rows += [("k2", v) for v in (5, 70000, 70001, 200000)]
    return spark.createDataFrame(rows, "k string, v bigint")


def test_bitmap_state_merge_matches_flat(spark):
    df = _vals_df(spark)
    # split into 3 arbitrary slices, state each, merge
    slices = [df.filter(F.col("v") % 3 == i) for i in range(3)]
    merged = merge_bitmap_states(
        [distinct_bitmap_state(s, ["k"], "v") for s in slices], ["k"]
    )
    got = {
        r["k"]: r["n_distinct"]
        for r in bitmap_distinct_readout(merged, ["k"]).collect()
    }
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k")
        .agg(F.count_distinct("v").alias("n"))
        .collect()
    }
    assert got == exact == {"k1": 40, "k2": 4}


def test_bitmap_merge_is_idempotent(spark):
    # replaying a slice into the merge must not change the count —
    # the property additive states (sum, HLL register max is also
    # idempotent; exact count rollups are NOT) give up
    df = _vals_df(spark)
    st = distinct_bitmap_state(df, ["k"], "v")
    twice = merge_bitmap_states([st, st], ["k"])
    got = {
        r["k"]: r["n_distinct"]
        for r in bitmap_distinct_readout(twice, ["k"]).collect()
    }
    assert got == {"k1": 40, "k2": 4}


def _ab(spark):
    a = spark.createDataFrame(
        [(i, i % 5, 10.0 + i) for i in range(100)], "id bigint, k bigint, x double"
    )
    b = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(5)], "k bigint, label string"
    )
    return a, b


def test_delta_join_view_matches_full_recompute(spark):
    a, b = _ab(spark)
    a_old, delta_a = a.filter("id % 10 != 0"), a.filter("id % 10 = 0")
    b_old, delta_b = b.filter("k != 3"), b.filter("k = 3")
    view_old = a_old.join(b_old, ["k"])
    maintained = maintain_join_view(
        view_old, a_old, delta_a, b_old, delta_b, ["k"]
    )
    full = a.join(b, ["k"])
    # bit-identical contents: symmetric difference empty, counts equal
    assert maintained.count() == full.count() == 100
    assert maintained.exceptAll(full).count() == 0
    assert full.exceptAll(maintained).count() == 0


def test_delta_join_branches_are_disjoint(spark):
    # every joined pair appears in EXACTLY one branch — the reason a
    # plain append (no dedup) is exact
    a, b = _ab(spark)
    a_old, delta_a = a.filter("id % 10 != 0"), a.filter("id % 10 = 0")
    b_old, delta_b = b.filter("k != 3"), b.filter("k = 3")
    dj = delta_join_rows(a_old, delta_a, b_old, delta_b, ["k"])
    assert dj.count() == dj.dropDuplicates(["id", "k"]).count()


def test_delta_join_broadcasts_deltas(spark):
    # the scale contract: the delta sides reach the join as broadcast
    # relations (map-side joins over the stored tables — no large
    # shuffle). Assert on the optimized physical plan.
    a, b = _ab(spark)
    a_old, delta_a = a.filter("id % 10 != 0"), a.filter("id % 10 = 0")
    b_old, delta_b = b.filter("k != 3"), b.filter("k = 3")
    dj = delta_join_rows(a_old, delta_a, b_old, delta_b, ["k"])
    plan = dj._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_nightly_maintenance_certifies_all_artifacts(spark, sf_dir):
    """The q246 flagship: one DAG certifies all five maintained
    artifacts against their full-recompute twins — every matches
    flag TRUE, all five artifact rows present."""
    from patientdataintegration_spark.suite.ext7 import (
        q246_nightly_maintenance,
    )

    rows = {
        r["artifact"]: r for r in q246_nightly_maintenance(spark, sf_dir).collect()
    }
    assert sorted(rows) == [
        "bitmap_distinct",
        "bloom_store",
        "hll_distinct",
        "join_view",
        "rollup",
    ]
    assert all(r["matches"] for r in rows.values())
    assert all(r["n_rows"] > 0 for r in rows.values())


def test_rollup_retractions_matches_recompute(spark):
    """The hybrid retraction algebra vs recompute on adversarial
    CDC: a key whose MINIMUM is deleted (algebraic min would be
    stale), a key emptied entirely (must drop), a brand-new key from
    inserts only, and an untouched clean key."""
    from patientdataintegration_spark.operators.incremental import (
        apply_rollup_retractions,
        cdc_rollup_delta,
        partial_rollup,
        rollup_readout,
    )

    old = spark.createDataFrame(
        [
            ("a", 1.0), ("a", 5.0), ("a", 9.0),   # min 1.0 will be deleted
            ("b", 2.0), ("b", 4.0),               # emptied entirely
            ("d", 7.0),                           # clean, untouched
        ],
        "k string, v double",
    )
    cdc = spark.createDataFrame(
        [
            ("a", 1.0, -1),            # delete the minimum
            ("a", 0.5, 1),             # and insert a new minimum
            ("b", 2.0, -1), ("b", 4.0, -1),  # empty key b
            ("c", 3.0, 1), ("c", 8.0, 1),    # brand-new key
        ],
        "k string, v double, op int",
    )
    post = spark.createDataFrame(
        [
            ("a", 5.0), ("a", 9.0), ("a", 0.5),
            ("c", 3.0), ("c", 8.0),
            ("d", 7.0),
        ],
        "k string, v double",
    )
    state = apply_rollup_retractions(
        partial_rollup(old, ["k"], "v"),
        cdc_rollup_delta(cdc, ["k"], "v"),
        post,
        ["k"],
        "v",
    )
    got = rollup_readout(state, ["k"])
    want = rollup_readout(partial_rollup(post, ["k"], "v"), ["k"])
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # key b must be gone
    assert got.filter("k = 'b'").count() == 0


def test_moments_state_merge_matches_flat(spark):
    """Merged (n, Σx, Σx²) state reads out bit-identically to one
    flat aggregation — including a single-row key (variance 0) and a
    constant-valued key."""
    from patientdataintegration_spark.operators.incremental import (
        merge_moments,
        moments_readout,
        moments_state,
    )

    rows = (
        [("a", float(i % 7)) for i in range(100)]
        + [("b", 5.0)] * 20          # constant -> var 0
        + [("c", 3.0)]               # single row -> var 0
    )
    df = spark.createDataFrame(rows, "k string, v double")
    s1 = df.filter("v < 4")
    s2 = df.filter("v >= 4")
    merged = moments_readout(
        merge_moments(
            [moments_state(s1, ["k"], "v"), moments_state(s2, ["k"], "v")],
            ["k"],
        ),
        ["k"],
    )
    flat = moments_readout(moments_state(df, ["k"], "v"), ["k"])
    assert merged.exceptAll(flat).count() == 0
    assert flat.exceptAll(merged).count() == 0
    got = {r["k"]: r for r in merged.collect()}
    assert got["b"]["var_pop"] == 0.0 and got["c"]["std_pop"] == 0.0


def test_retract_join_view_matches_rejoin(spark):
    """Two broadcast anti-probes equal the re-join of the post-delete
    tables, including a row dead on BOTH sides (deleted once, not
    twice) and untouched rows."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.incremental import (
        retract_join_view,
    )

    a = spark.createDataFrame(
        [(i, i % 5, f"a{i}") for i in range(100)], "ak bigint, j bigint, pa string"
    )
    b = spark.createDataFrame(
        [(j, f"b{j}") for j in range(5)], "j bigint, pb string"
    )
    view = a.join(b, "j")
    del_a = a.filter("ak % 7 = 0").select(F.col("ak"))
    del_b = b.filter("j = 3").select(F.col("j"))
    got = retract_join_view(view, del_a, del_b, "ak", "j")
    want = a.join(del_a, "ak", "left_anti").join(
        b.join(del_b, "j", "left_anti"), "j"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_cdc_retractions_null_measure_matches_recompute(spark):
    """r9 ADVICE: a CDC slice carrying NULL measures must keep the
    maintained n identical to partial_rollup(base_post)'s
    COUNT(value_col) — NULL rows change neither count nor sum."""
    from patientdataintegration_spark.operators.incremental import (
        apply_rollup_retractions,
        cdc_rollup_delta,
        partial_rollup,
        rollup_readout,
    )

    old = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 9.0), ("b", 2.0)],
        "k string, v double",
    )
    cdc = spark.createDataFrame(
        [
            ("a", None, 1),    # NULL insert: no count/sum effect
            ("a", 4.0, 1),     # real insert
            ("b", None, -1),   # NULL delete: no count/sum effect
            ("b", 6.0, 1),
        ],
        "k string, v double, op int",
    )
    post = spark.createDataFrame(
        [
            ("a", 1.0), ("a", None), ("a", 9.0), ("a", None), ("a", 4.0),
            ("b", 2.0), ("b", 6.0),
        ],
        "k string, v double",
    )
    state = apply_rollup_retractions(
        partial_rollup(old, ["k"], "v"),
        cdc_rollup_delta(cdc, ["k"], "v"),
        post,
        ["k"],
        "v",
    )
    got = rollup_readout(state, ["k"])
    want = rollup_readout(partial_rollup(post, ["k"], "v"), ["k"])
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    n = {r["k"]: r["n"] for r in got.collect()}
    assert n == {"a": 3, "b": 2}  # NULL measures never counted


def test_histogram_state_skips_null_measures(spark):
    """r9 ADVICE: NULL values must be filtered before bucketing, not
    clamped into bucket 0 by NULL-skipping greatest()."""
    from patientdataintegration_spark.operators.incremental import (
        histogram_state,
    )

    df = spark.createDataFrame(
        [("a", 0.5), ("a", None), ("a", 2.5), ("b", None)],
        "k string, v double",
    )
    st = histogram_state(df, ["k"], "v", lo=0.0, width=1.0, n_buckets=4)
    rows = {(r["k"], r["bucket"]): r["cnt"] for r in st.collect()}
    assert rows == {("a", 0): 1, ("a", 2): 1}  # no NULL counted, no key b


def test_upsert_join_view_matches_rejoin_and_resolves_seq_ties(spark):
    """upsert_join_view == re-join of the post-CDC tables, with
    updates, inserts of new keys, a key updated twice in one slice,
    and a SAME-SEQ tie resolved deterministically by the tiebreak
    column (highest wins), never by arrival order."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.incremental import (
        upsert_join_view,
    )

    a_old = spark.createDataFrame(
        [(1, 10, "v1"), (2, 20, "v2"), (3, 10, "v3")],
        "ak bigint, j bigint, payload string",
    )
    b = spark.createDataFrame(
        [(10, "b10"), (20, "b20")], "j bigint, pb string"
    )
    view_old = a_old.join(b, "j")
    cdc = spark.createDataFrame(
        [
            (1, 10, "v1-new", 2, 100),   # plain update
            (2, 20, "v2-mid", 1, 101),   # superseded within the slice
            (2, 10, "v2-new", 2, 102),   # wins; also MOVES key 2 to j=10
            (4, 20, "v4", 1, 103),       # brand-new key (insert)
            (5, 10, "v5-a", 1, 104),     # same-seq tie ...
            (5, 10, "v5-b", 1, 105),     # ... higher tiebreak wins
        ],
        "ak bigint, j bigint, payload string, seq int, cid bigint",
    )
    got = upsert_join_view(
        view_old, cdc, b, "ak", ["j"], seq_col="seq", tiebreak_col="cid"
    )
    a_post = spark.createDataFrame(
        [
            (1, 10, "v1-new"), (2, 10, "v2-new"), (3, 10, "v3"),
            (4, 20, "v4"), (5, 10, "v5-b"),
        ],
        "ak bigint, j bigint, payload string",
    )
    want = a_post.join(b, "j").select(*got.columns)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_topk_state_merge_matches_flat(spark):
    """merge_topk == topk_state over the union on arbitrary slicings,
    including ties resolved by the tiebreak and keys whose whole
    top-k lives in one slice."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.incremental import (
        merge_topk,
        topk_state,
    )

    rows = [
        ("a", i, float(v))
        for i, v in enumerate([5, 9, 9, 1, 7, 9, 3])   # ties at 9
    ] + [("b", 100 + i, float(i)) for i in range(4)]   # monotone
    df = spark.createDataFrame(rows, "k string, rid bigint, v double")
    slices = [df.filter(F.col("rid") % 3 == i) for i in range(3)]
    merged = merge_topk(
        [topk_state(s, ["k"], "v", 2, "rid") for s in slices],
        ["k"], "v", 2, "rid",
    )
    flat = topk_state(df, ["k"], "v", 2, "rid")
    assert merged.exceptAll(flat).count() == 0
    assert flat.exceptAll(merged).count() == 0
    got = sorted(map(tuple, merged.collect()))
    # a: the two smallest-rid rows of value 9; b: values 3, 2
    assert got == [
        ("a", 1, 9.0), ("a", 2, 9.0), ("b", 102, 2.0), ("b", 103, 3.0),
    ]


def test_histogram_overflow_sentinels_and_audit(spark):
    """track_overflow routes out-of-domain values to sentinel buckets
    (-1 / n_buckets) instead of clamping; the audit's (n_in, n_under,
    n_over) equal the direct predicates, boundary values included
    (lo is in-domain, hi is over)."""
    from patientdataintegration_spark.operators.incremental import (
        histogram_domain_audit,
        histogram_state,
    )

    # domain [10, 30) in 2 buckets of 10
    vals = [5.0, 9.999, 10.0, 19.0, 20.0, 29.999, 30.0, 99.0, None]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v double")
    st = histogram_state(
        df, ["k"], "v", lo=10.0, width=10.0, n_buckets=2, track_overflow=True
    )
    buckets = {r["bucket"]: r["cnt"] for r in st.collect()}
    assert buckets == {-1: 2, 0: 2, 1: 2, 2: 2}  # NULL absent
    audit = histogram_domain_audit(st, ["k"], 2).collect()[0]
    assert (audit["n_in"], audit["n_under"], audit["n_over"]) == (4, 2, 2)


def test_moments_exact_money_matches_recompute(spark):
    """Integer-grain moments: merged state reads out identically to
    the flat state, every output column is an exact integer, and the
    rational variance equals a Python Fraction recompute."""
    from fractions import Fraction

    from patientdataintegration_spark.operators.incremental import (
        merge_moments,
        moments_exact_readout,
        moments_state_scaled,
    )

    vals = [("a", 12.34), ("a", 56.78), ("a", 0.01), ("b", 99.99), ("b", 99.99)]
    df = spark.createDataFrame(vals, "k string, v double")
    s1, s2 = df.filter("v < 50"), df.filter("v >= 50")
    merged = moments_exact_readout(
        merge_moments(
            [
                moments_state_scaled(s1, ["k"], "v", scale=100),
                moments_state_scaled(s2, ["k"], "v", scale=100),
            ],
            ["k"],
        ),
        ["k"],
        mean_scale=10_000,
    )
    flat = moments_exact_readout(
        moments_state_scaled(df, ["k"], "v", scale=100), ["k"], 10_000
    )
    assert merged.exceptAll(flat).count() == 0
    assert flat.exceptAll(merged).count() == 0
    got = {r["k"]: r for r in merged.collect()}
    cents = {"a": [1234, 5678, 1], "b": [9999, 9999]}
    for k, cs in cents.items():
        n = len(cs)
        assert got[k]["n"] == n
        assert int(got[k]["sum_i"]) == sum(cs)
        assert got[k]["mean_q"] == (sum(cs) * 10_000) // n
        var = Fraction(n * sum(c * c for c in cs) - sum(cs) ** 2, n * n)
        assert Fraction(int(got[k]["var_num"]), got[k]["var_den"]) == var
    assert got["b"]["var_num"] == 0  # constant key: exact zero, no FP dust


def test_topk_retractions_matches_recompute(spark):
    """apply_topk_retractions vs topk_state(post) on adversarial
    deletes: a key whose ENTIRE top-k is wiped, a key whose deleted
    row was unranked (conservative repair), a key emptied entirely,
    and an untouched key."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.incremental import (
        apply_topk_retractions,
        topk_state,
    )

    rows = (
        [("a", i, float(100 - i)) for i in range(6)]   # top-2 = rid 0,1
        + [("b", 10 + i, float(i)) for i in range(4)]  # top-2 = rid 13,12
        + [("c", 20, 1.0)]                             # emptied
        + [("d", 30, 7.0), ("d", 31, 6.0)]             # untouched
    )
    df = spark.createDataFrame(rows, "k string, rid bigint, v double")
    state_old = topk_state(df, ["k"], "v", 2, "rid")
    # delete a's two best (whole top-k), b's WORST (unranked), all of c
    deleted = df.filter(
        (F.col("rid").isin(0, 1)) | (F.col("rid") == 10) | (F.col("k") == "c")
    )
    post = df.exceptAll(deleted)
    got = apply_topk_retractions(
        state_old, deleted, post, ["k"], "v", 2, "rid"
    )
    want = topk_state(post, ["k"], "v", 2, "rid")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.filter("k = 'c'").count() == 0


def test_maintain_lsh_pairs_matches_full_recompute(spark):
    """maintain_lsh_pairs == full-corpus LSH pairs: the three origin
    classes are disjoint and exhaustive (checked by exact set
    equality AND no duplicate pairs after the plain append)."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.dedup import (
        lsh_candidate_pairs,
        maintain_lsh_pairs,
        minhash_signatures,
        shingle_table,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "completely different content about spark engines",
        "completely different content about spark engines today",  # ~2
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "unrelated fifth document text goes here now",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    sigs = minhash_signatures(shingle_table(d), k=8, seed=42)
    hist = sigs.filter(F.col("doc_id") < 4)
    delta = sigs.filter(F.col("doc_id") >= 4)
    got = maintain_lsh_pairs(
        lsh_candidate_pairs(hist), hist, delta
    )
    want = lsh_candidate_pairs(sigs)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == got.distinct().count()  # disjoint branches
    # the exact dup (0,4) spans the split and must be found
    assert got.filter("doc_a = 0 AND doc_b = 4").count() == 1


def test_histogram_retractions_match_recompute_and_guard(spark):
    """Signed-count histogram retraction == recompute on the post
    table (emptied buckets dropped), and a CDC slice deleting rows
    the state never counted fails LOUD instead of clamping."""
    import pytest
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.incremental import (
        apply_histogram_retractions,
        histogram_state,
        histogram_state_signed,
    )

    base = spark.createDataFrame(
        [("k", v) for v in [1.0, 1.5, 12.0, 12.5, 25.0]],
        "k string, v double",
    )
    dead = base.filter("v >= 12 AND v < 20").withColumn("op", F.lit(-1))
    post = base.filter("NOT (v >= 12 AND v < 20)")
    args = (["k"], "v", 0.0, 10.0, 4)
    got = apply_histogram_retractions(
        histogram_state(base, *args),
        histogram_state_signed(dead, *args),
        ["k"],
    )
    want = histogram_state(post, *args)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.filter("bucket = 1").count() == 0  # emptied bucket gone
    # double-delete: bucket would go negative -> loud failure
    twice = histogram_state_signed(
        dead.unionByName(dead), *args
    )
    with pytest.raises(Exception, match="negative"):
        apply_histogram_retractions(
            histogram_state(base, *args), twice, ["k"]
        ).collect()


def test_upsert_join_view_fails_loud_on_untied_same_seq(spark):
    """With the default tiebreak_col=None, a CDC slice carrying two
    same-(key, seq) versions of one key must RAISE (last writer is
    not well-defined — r10 ADVICE), while a duplicate-free slice
    still maintains the view correctly without a tiebreak column."""
    import pytest
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.incremental import (
        upsert_join_view,
    )

    a_old = spark.createDataFrame(
        [(1, 10, "v1")], "ak bigint, j bigint, payload string"
    )
    b = spark.createDataFrame([(10, "b10")], "j bigint, pb string")
    view_old = a_old.join(b, "j")

    clean = spark.createDataFrame(
        [(1, 10, "v1-new", 2)], "ak bigint, j bigint, payload string, seq int"
    )
    got = upsert_join_view(view_old, clean, b, "ak", ["j"], seq_col="seq")
    assert [
        (r["ak"], r["payload"]) for r in got.collect()
    ] == [(1, "v1-new")]

    tied = spark.createDataFrame(
        [(1, 10, "v1-a", 2), (1, 10, "v1-b", 2)],
        "ak bigint, j bigint, payload string, seq int",
    )
    with pytest.raises(Exception, match="same-\\(key, seq\\)"):
        upsert_join_view(view_old, tied, b, "ak", ["j"], seq_col="seq").collect()

    # r11 ADVICE: the guard must NOT fire on benign duplicates where
    # last writer is still well-defined —
    # (a) an exact replayed row (at-least-once CDC delivery), and
    # (b) distinct same-seq versions in a NON-winning seq group
    #     (outvoted by a higher seq).
    benign = spark.createDataFrame(
        [
            (1, 10, "v1-new", 3),  # the unambiguous winner
            (1, 10, "v1-new", 3),  # (a) exact replay of the winner
            (1, 10, "v1-a", 2),    # (b) distinct tie at a LOSING seq
            (1, 10, "v1-b", 2),
        ],
        "ak bigint, j bigint, payload string, seq int",
    )
    got2 = upsert_join_view(view_old, benign, b, "ak", ["j"], seq_col="seq")
    assert [
        (r["ak"], r["payload"]) for r in got2.collect()
    ] == [(1, "v1-new")]


def test_moments_exact_readout_rejects_negative_sums(spark):
    """Spark DIV truncates toward zero; DuckDB // floors — they
    disagree on negative dividends, so a refund-heavy (negative-sum)
    key must fail LOUD instead of hashing one sub-grain unit off
    (r10 ADVICE). Non-negative keys still read out fine."""
    import pytest

    from patientdataintegration_spark.operators.incremental import (
        moments_exact_readout,
        moments_state_scaled,
    )

    ok = spark.createDataFrame(
        [("a", 1.25), ("a", 2.50)], "k string, v double"
    )
    out = moments_exact_readout(
        moments_state_scaled(ok, ["k"], "v", scale=100), ["k"]
    )
    assert out.collect()[0]["mean_q"] == (375 * 10_000) // 2

    refunds = spark.createDataFrame(
        [("a", 1.00), ("a", -3.00)], "k string, v double"
    )
    with pytest.raises(Exception, match="negative grain sum"):
        moments_exact_readout(
            moments_state_scaled(refunds, ["k"], "v", scale=100), ["k"]
        ).collect()


def test_histogram_signed_overflow_retraction_matches_recompute(spark):
    """The q260+q265 composition the r10 ADVICE flagged: retracting a
    CDC slice against an overflow-TRACKED state. With
    track_overflow=True on BOTH the state and the signed slice, the
    maintained state (including sentinel buckets) equals a recompute
    on the post table, and the domain audit stays truthful; the
    variant-mismatched composition (clamped slice vs tracked state)
    is what the parameter exists to prevent."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.incremental import (
        apply_histogram_retractions,
        histogram_domain_audit,
        histogram_state,
        histogram_state_signed,
    )

    # values below lo (-5) and at/above the top (45, 99) land in the
    # -1 / n_buckets sentinels; the delete slice removes one row from
    # EACH region: in-domain, under, over.
    base = spark.createDataFrame(
        [("k", v) for v in [-5.0, 1.0, 12.0, 25.0, 45.0, 99.0]],
        "k string, v double",
    )
    dead = base.filter("v IN (-5.0, 12.0, 99.0)").withColumn(
        "op", F.lit(-1)
    )
    post = base.filter("v NOT IN (-5.0, 12.0, 99.0)")
    lo, width, nb = 0.0, 10.0, 4
    state = histogram_state(base, ["k"], "v", lo, width, nb, track_overflow=True)
    slice_signed = histogram_state_signed(
        dead, ["k"], "v", lo, width, nb, track_overflow=True
    )
    got = apply_histogram_retractions(state, slice_signed, ["k"])
    want = histogram_state(post, ["k"], "v", lo, width, nb, track_overflow=True)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    audit = histogram_domain_audit(got, ["k"], nb).collect()[0]
    assert (audit["n_in"], audit["n_under"], audit["n_over"]) == (2, 0, 1)
