"""Imputation / encodings / sampling / splits semantics
(SURVEY.md §2.5 A1-A3, §2.9, §2.6 W1-W3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from patientdataintegration_spark.operators.encodings import onehot_columns, scale01
from patientdataintegration_spark.operators.imputation import impute_mean, impute_mode, mode_value
from patientdataintegration_spark.operators.sampling import sample_per_group
from patientdataintegration_spark.operators.splits import assign_folds, fold_to_set


def test_impute_mean_fills_with_nonnull_mean(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 20.0), (4, None)], "id int, v double"
    )
    got = {r["id"]: r["v"] for r in impute_mean(df, "v").collect()}
    assert got[2] == got[4] == pytest.approx(15.0)
    assert got[1] == 10.0 and got[3] == 20.0


def test_impute_mode_tie_breaks_to_lowest(spark):
    # values 1 and 2 both appear twice -> reference argmax picks the
    # first (lowest) category value (functions_v2.py:43)
    df = spark.createDataFrame(
        [(1, 2), (2, 2), (3, 1), (4, 1), (5, None)], "id int, v int"
    )
    assert mode_value(df, "v").collect()[0]["mode_v"] == 1
    got = {r["id"]: r["v"] for r in impute_mode(df, "v").collect()}
    assert got[5] == 1


def test_scale01_bounds_and_degenerate(spark):
    df = spark.createDataFrame([(0.0, 5.0), (10.0, 5.0)], "a double, b double")
    row = {
        (r["a"]): (r["a_scaled"], r["b_scaled"]) for r in scale01(df, ["a", "b"]).collect()
    }
    assert row[0.0] == (0.0, 0.0)  # degenerate b -> 0.0 like sklearn
    assert row[10.0][0] == 1.0


def test_onehot_columns(spark):
    df = spark.createDataFrame([(0,), (1,), (2,)], "loc int")
    out = onehot_columns(df, "loc", [0, 1, 2]).collect()
    for r in out:
        vec = (r["loc_0"], r["loc_1"], r["loc_2"])
        assert sum(vec) == 1 and vec[r["loc"]] == 1


def test_sample_per_group_caps_and_is_partitioning_invariant(spark):
    rows = [(g, i) for g in range(20) for i in range(g % 7 + 1)]
    df = spark.createDataFrame(rows, "g int, i int")
    s1 = sample_per_group(df, ["g"], 3, ["g", "i"], seed=5)
    s2 = sample_per_group(df.repartition(17), ["g"], 3, ["g", "i"], seed=5)
    got1 = sorted((r["g"], r["i"]) for r in s1.collect())
    got2 = sorted((r["g"], r["i"]) for r in s2.collect())
    assert got1 == got2  # deterministic under repartitioning
    sizes = {}
    for g, _ in got1:
        sizes[g] = sizes.get(g, 0) + 1
    for g, n in sizes.items():
        assert n == min(3, g % 7 + 1)  # min(len(group), n) reference semantics


def test_sample_per_group_seed_changes_picks(spark):
    rows = [(g, i) for g in range(50) for i in range(10)]
    df = spark.createDataFrame(rows, "g int, i int")
    a = sorted(map(tuple, sample_per_group(df, ["g"], 2, ["g", "i"], seed=1).collect()))
    b = sorted(map(tuple, sample_per_group(df, ["g"], 2, ["g", "i"], seed=2).collect()))
    assert a != b


def test_assign_folds_stratified_balance(spark):
    # 4 strata x 260 rows; 13 folds -> each stratum contributes
    # exactly 20 per fold (ntile guarantee: sizes differ by <= 1)
    rows = [(s, s * 1000 + i) for s in range(4) for i in range(260)]
    df = spark.createDataFrame(rows, "stratum int, key int")
    f = assign_folds(df, ["stratum"], ["key"], n_folds=13, seed=42)
    counts = {
        (r["stratum"], r["fold"]): r["n"]
        for r in f.groupBy("stratum", "fold").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(n == 20 for n in counts.values())
    assert {k[1] for k in counts} == set(range(13))


def test_fold_to_set_reference_ranges(spark):
    df = spark.createDataFrame([(i,) for i in range(13)], "fold int")
    got = {r["fold"]: r["s"] for r in df.select("fold", fold_to_set(F.col("fold")).alias("s")).collect()}
    assert [got[i] for i in range(13)] == (
        ["val"] * 2 + ["test"] * 4 + ["train"] * 7
    )  # functions_v2.py:105


def test_csv_roundtrip_and_cohort_union(spark, tmp_path):
    """S1/K1/U1: explicit-schema CSV read with provenance tag, union
    by name, sink, and read-back equality."""
    from patientdataintegration_spark.sources.csv_io import (
        SLIDE_METADATA_SCHEMA,
        read_cohort_csv,
        union_cohorts,
        write_csv,
    )

    import pyspark.sql.functions as F

    lab1 = tmp_path / "lab1.csv"
    lab2 = tmp_path / "lab2.csv"
    lab1.write_text(
        "slide_name,label,age,gender,location,UV\n"
        "F01,1,63.0,0,2,1\nF02,0,,1,0,\n"
    )
    lab2.write_text(
        "slide_name,label,age,gender,location,UV\n"
        "2019-03-12 12.05.43,1,48.0,1,,0\n"
    )
    a = read_cohort_csv(spark, str(lab1), lab=1)
    b = read_cohort_csv(spark, str(lab2), lab=0)
    u = union_cohorts(a, b)
    assert u.count() == 3
    assert dict(u.dtypes)["age"] == "double"
    assert u.filter(F.col("age").isNull()).count() == 1
    assert {r["lab"] for r in u.select("lab").distinct().collect()} == {0, 1}

    out = tmp_path / "out_csv"
    write_csv(u, str(out), single_file=True)
    back = (
        spark.read.option("header", True)
        .schema(SLIDE_METADATA_SCHEMA.add("lab", "integer"))
        .csv(str(out))
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, u.collect()))


def test_engine_facade(spark, sf_dir):
    from patientdataintegration_spark.engine import Engine

    eng = Engine(data_dir=sf_dir, spark=spark)
    assert eng.table("orders").count() > 0
    assert eng.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"] > 0
    assert "q45_full_pipeline" in eng.names()
    assert eng.run("q03_balanced_accuracy").count() > 0
    assert eng.oracle_sql("q03_balanced_accuracy") is not None
    # r8 upgraded every streaming lane to a hash oracle; r16 closed
    # the last gap (q94 → deterministic forest) — every lane oracled
    assert eng.oracle_sql("q90_stream_tumbling") is not None
    assert eng.oracle_sql("q94_random_forest") is not None
    assert "Exchange" in eng.explain("q02_group_scores") or "Scan" in eng.explain(
        "q02_group_scores"
    )


def test_engine_run_experiments_config_glob(spark, sf_dir, tmp_path):
    """S4 (`run_experiments.py:11-17`): glob configs (JSON and
    key=value forms), run each named query on the shared session."""
    from patientdataintegration_spark.engine import Engine

    (tmp_path / "exp_a.json").write_text('{"query": "q03_balanced_accuracy"}')
    (tmp_path / "exp_b.json").write_text("query = q14_union_cohorts\n# comment\n")
    eng = Engine(data_dir=sf_dir, spark=spark)
    results = eng.run_experiments(str(tmp_path / "exp_*.json"), repeats=2)
    assert sorted(p.split("/")[-1] for p in results) == ["exp_a.json", "exp_b.json"]
    for frames in results.values():
        assert len(frames) == 2
        assert frames[0].count() > 0

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        eng.run_experiments(str(tmp_path / "nope_*.json"))

    # K3: overview sink unions heterogeneous results with provenance
    overview = eng.results_overview(results, out_path=str(tmp_path / "overview"))
    assert {"config", "repeat"} <= set(overview.columns)
    assert overview.select("config").distinct().count() == 2
    back = spark.read.option("header", True).csv(str(tmp_path / "overview"))
    assert back.count() == overview.count() > 0


def test_schema_evolution_merge_and_union(spark, sf_dir, tmp_path):
    """Schema evolution: two writers with drifting schemas; mergeSchema
    reconciles at read time, unionByName(allowMissingColumns) at
    compute time — the two lanes a long-lived 100 TB table needs."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    v1 = o.select("o_orderkey", "o_totalprice")
    v2 = o.select("o_orderkey", "o_totalprice", F.year("o_orderdate").alias("yr"))
    path = str(tmp_path / "evolving")
    v1.write.parquet(f"{path}/batch=1")
    v2.write.parquet(f"{path}/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) >= {"o_orderkey", "o_totalprice", "yr"}
    assert merged.count() == 2 * o.count()
    # old-batch rows surface the new column as null
    assert merged.filter(F.col("yr").isNull()).count() == o.count()

    unioned = v1.unionByName(v2, allowMissingColumns=True)
    assert unioned.count() == 2 * o.count()
    assert unioned.filter(F.col("yr").isNull()).count() == o.count()


def test_approx_percentile_within_error_bound(spark, sf_dir):
    """approx_percentile (the 100 TB replacement for exact
    percentiles, q43/q55) must land within its accuracy contract:
    rank error <= n/accuracy."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    acc = 1000
    got = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, acc).alias("p50_approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_exact"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    # translate rank error to a value tolerance empirically: the
    # approx answer must sit between the exact (0.5 - 1/acc) and
    # (0.5 + 1/acc) quantiles
    lo, hi = (
        li.agg(
            F.expr(f"percentile(l_extendedprice, {0.5 - 1.0/acc})"),
            F.expr(f"percentile(l_extendedprice, {0.5 + 1.0/acc})"),
        ).first()
    )
    assert lo <= got.p50_approx <= hi, (lo, got.p50_approx, hi)


def test_quality_checks_single_scan(spark, sf_dir):
    """All row-level checks must run in ONE scan of the table."""
    from patientdataintegration_spark.operators.quality_checks import (
        in_range,
        not_null,
        run_checks,
    )
    from patientdataintegration_spark.plans.inspect import explain_str
    from patientdataintegration_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    rep = run_checks(o, [not_null("o_custkey"), in_range("o_totalprice", 0, 1e6)])
    plan = explain_str(rep)
    assert plan.count("Location:") == 1, plan
    rows = {r.check_name: r for r in rep.collect()}
    assert rows["not_null_o_custkey"].n_violations == 0


def test_global_row_ids_match_window_numbering(spark, sf_dir):
    """Range-partitioned prefix-sum ids == single-reducer row_number,
    with no global sort in the plan's critical path."""
    from pyspark.sql import Window, functions as F

    from patientdataintegration_spark.operators.indexing import global_row_ids
    from patientdataintegration_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    got = global_row_ids(o, ["o_orderkey"], num_partitions=8)
    w = Window.orderBy("o_orderkey")
    want = o.withColumn("row_id", (F.row_number().over(w) - 1).cast("bigint"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_python_datasource_partitioned_deterministic(spark):
    """Custom Python DataSource (Spark 4): declared partition planning
    drives task parallelism, and values derive from keys alone so the
    relation is identical under any partition count."""
    from patientdataintegration_spark.sources.pydatasource import register

    register(spark)
    df8 = (
        spark.read.format("synthetic_events")
        .option("rows", 500)
        .option("partitions", 8)
        .load()
    )
    assert df8.rdd.getNumPartitions() == 8
    assert df8.count() == 500
    df3 = (
        spark.read.format("synthetic_events")
        .option("rows", 500)
        .option("partitions", 3)
        .load()
    )
    assert sorted(map(tuple, df8.collect())) == sorted(map(tuple, df3.collect()))
    # joins into the engine like any relation
    from pyspark.sql import functions as F

    agg = df8.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    assert agg.count() == 4 and agg.agg(F.sum("n")).collect()[0][0] == 500


def test_python_datasource_streaming_checkpointed_drain(spark, tmp_path):
    """Streaming side of the custom Python DataSource: offsets are
    checkpointed dicts; repeated availableNow runs drain the feed
    incrementally with no duplicates and batch-exact values."""
    from patientdataintegration_spark.sources.pydatasource import register

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("synthetic_events")
            .option("rows", 250)
            .option("batch_rows", 100)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    n1 = run_once().count()
    assert 0 < n1 < 250  # partial drain: offsets checkpointed mid-feed
    for _ in range(4):
        got = run_once()
    assert got.count() == 250  # fully drained, nothing duplicated
    assert got.select("event_id").distinct().count() == 250
    batch = (
        spark.read.format("synthetic_events").option("rows", 250).load()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_engine_verify_against_oracle(spark, sf_dir):
    """Engine.verify: the migration-trust check as a library call."""
    from patientdataintegration_spark.engine import Engine

    eng = Engine(data_dir=sf_dir, spark=spark)
    res = eng.verify("q03_balanced_accuracy")
    assert res["match"] is True and res["rows"] > 0 and not res["problems"]
    st = eng.verify("q90_stream_tumbling")  # hash-oracled since r8
    assert st["match"] is True and st["rows"] > 0 and not st["problems"]
    ro = eng.verify("q94_random_forest")  # full hash oracle since r16
    assert ro["match"] is True and ro["rows"] > 0 and not ro["problems"]


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    """JSONL write→read is lossless; malformed lines land in the
    corrupt-record lane, not in the data columns."""
    from patientdataintegration_spark.sources.jsonl_io import (
        bad_lines,
        read_jsonl,
        write_jsonl,
    )

    df = spark.createDataFrame(
        [(1, 'uni"code\ttext', "en"), (2, "plain", "de"), (3, None, "fr")],
        "doc_id bigint, text string, lang string",
    )
    path = str(tmp_path / "docs")
    write_jsonl(df, path, n_files=2)
    back = read_jsonl(spark, path, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    # inject a malformed line next to the valid shards
    (tmp_path / "docs" / "extra.json").write_text(
        '{"doc_id": 9, "text": "ok", "lang": "en"}\n{broken json\n'
    )
    quarantined = bad_lines(spark, path, df.schema).collect()
    assert [r[0] for r in quarantined] == ["{broken json"]
    good = read_jsonl(spark, path, schema=df.schema).filter("doc_id = 9")
    assert good.count() == 1


def test_pack_sequences_hand_computed(spark):
    from patientdataintegration_spark.operators.sampling import pack_sequences

    # one source, force hash order = doc order is NOT assumed: check
    # invariants that hold under ANY order instead of exact layout
    docs = [(i, "s", " ".join(["t"] * n)) for i, n in enumerate([3, 10, 4, 0, 7])]
    df = spark.createDataFrame(docs, "doc_id int, source string, text string")
    rows = sorted(pack_sequences(df, seq_len=8).collect(), key=lambda r: r["pack_id"] * 8 + r["pack_offset"])
    # concatenation is gapless: each doc starts where the previous ended
    pos = 0
    for r in rows:
        assert r["pack_id"] * 8 + r["pack_offset"] == pos
        pos += r["n_tokens"]
        if r["n_tokens"] == 0:
            assert r["packs_spanned"] == 1
        else:
            last = (r["pack_id"] * 8 + r["pack_offset"] + r["n_tokens"] - 1) // 8
            assert r["packs_spanned"] == last - r["pack_id"] + 1
        assert 0 <= r["pack_offset"] < 8
    assert pos == 24  # total tokens


def test_inverted_index_hand_computed(spark):
    from patientdataintegration_spark.operators.indexing import inverted_index

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c"), (3, "c a a"), (4, "")],
        "doc_id int, text string",
    )
    idx = {r["term"]: r for r in inverted_index(df).collect()}
    assert set(idx) == {"a", "b", "c"}  # empty doc contributes nothing
    assert idx["a"]["postings"] == [1, 3] and idx["a"]["doc_freq"] == 2
    assert idx["c"]["postings"] == [1, 2, 3] and idx["c"]["doc_freq"] == 3
    capped = {r["term"]: r for r in inverted_index(df, max_postings=2).collect()}
    assert capped["c"]["postings"] == [1, 2] and capped["c"]["doc_freq"] == 3
    assert "b" not in {r["term"] for r in inverted_index(df, min_df=3).collect()}


def test_retract_inverted_index_at_cap_readmission(spark):
    """The at-cap adversarial battery: deleting a VISIBLE posting of
    an at-cap term re-admits the smallest displaced overflow doc;
    deleting an OVERFLOW doc leaves the visible postings unchanged
    but decrements doc_freq; a term falling below min_df leaves the
    index; untouched terms pass through verbatim — and the whole
    maintained pair equals the from-scratch rebuild over survivors."""
    from patientdataintegration_spark.operators.indexing import (
        inverted_index_with_overflow,
        retract_inverted_index,
    )

    # term 'h' in docs 1..6 (cap 3 -> postings [1,2,3], overflow
    # [4,5,6]); 'x' in docs 1..3 (at min_df edge after one delete);
    # 'z' untouched in docs 7,8
    rows = [
        (1, "h x"), (2, "h x"), (3, "h x"),
        (4, "h"), (5, "h"), (6, "h"),
        (7, "z h"), (8, "z"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    index, overflow = inverted_index_with_overflow(
        df, min_df=2, max_postings=3
    )
    got_idx = {r["term"]: r for r in index.collect()}
    assert got_idx["h"]["postings"] == [1, 2, 3]
    assert got_idx["h"]["doc_freq"] == 7
    assert sorted(
        (r["term"], r["doc"]) for r in overflow.collect()
    ) == [("h", 4), ("h", 5), ("h", 6), ("h", 7)]

    # delete 2 (visible posting of at-cap 'h'; drops 'x' to df=2) and
    # 5 (an OVERFLOW doc of 'h')
    deleted = spark.createDataFrame([(2,), (5,)], "doc_id bigint")
    new_index, new_overflow = retract_inverted_index(
        index, overflow, deleted, min_df=2, max_postings=3
    )
    ni = {r["term"]: r for r in new_index.collect()}
    assert ni["h"]["postings"] == [1, 3, 4], "displaced 4 re-admitted"
    assert ni["h"]["doc_freq"] == 5, "both deletes decrement df"
    assert ni["x"]["postings"] == [1, 3] and ni["x"]["doc_freq"] == 2
    assert ni["z"]["postings"] == [7, 8], "untouched term verbatim"
    assert sorted(
        (r["term"], r["doc"]) for r in new_overflow.collect()
    ) == [("h", 6), ("h", 7)]

    # maintained pair == rebuild over the surviving corpus (both
    # relations), and a below-min_df drop: deleting 1 and 3 empties
    # 'x' (df 1 < 2) out of the index entirely
    surv = df.join(deleted, "doc_id", "left_anti")
    want_index, want_overflow = inverted_index_with_overflow(
        surv, min_df=2, max_postings=3
    )
    assert sorted(map(tuple, new_index.collect())) == sorted(
        map(tuple, want_index.collect())
    )
    assert sorted(map(tuple, new_overflow.collect())) == sorted(
        map(tuple, want_overflow.collect())
    )
    deleted2 = spark.createDataFrame([(1,), (3,)], "doc_id bigint")
    idx2, _of2 = retract_inverted_index(
        new_index, new_overflow, deleted2, min_df=2, max_postings=3
    )
    terms2 = {r["term"] for r in idx2.collect()}
    assert "x" not in terms2 and {"h", "z"} <= terms2


def test_extend_inverted_index_crud(spark):
    """The insert battery (the verb that completes the index family's
    CRUD): a new smaller doc_id DISPLACES an at-cap posting into the
    overflow; a brand-new term is admitted; untouched terms pass
    through verbatim; the maintained pair equals the from-scratch
    rebuild over old ∪ new; identical-content re-ingest is
    idempotent; and a min_df>1 store is refused with the lossy-under-
    inserts contract."""
    import pytest

    from patientdataintegration_spark.operators.indexing import (
        extend_inverted_index,
        inverted_index_with_overflow,
    )

    # 'h' in docs 2..7 (cap 3 -> postings [2,3,4], overflow [5,6,7]);
    # 'z' in docs 7,8 (untouched by the batch)
    base = spark.createDataFrame(
        [(2, "h"), (3, "h"), (4, "h"), (5, "h"), (6, "h"), (7, "h z"), (8, "z")],
        "doc_id bigint, text string",
    )
    index, overflow = inverted_index_with_overflow(base, min_df=1, max_postings=3)
    new = spark.createDataFrame(
        [(1, "h q"), (9, "h q")], "doc_id bigint, text string"
    )
    idx2, of2 = extend_inverted_index(index, overflow, new, max_postings=3)
    ni = {r["term"]: r for r in idx2.collect()}
    assert ni["h"]["postings"] == [1, 2, 3], "new doc 1 displaces 4 off the cap"
    assert ni["h"]["doc_freq"] == 8
    assert ni["q"]["postings"] == [1, 9] and ni["q"]["doc_freq"] == 2, "new term"
    assert ni["z"]["postings"] == [7, 8], "untouched term verbatim"
    assert sorted((r["term"], r["doc"]) for r in of2.collect()) == [
        ("h", 4), ("h", 5), ("h", 6), ("h", 7), ("h", 9)
    ], "displaced posting demoted INTO the overflow"

    # maintained pair == rebuild over the union corpus (both relations)
    want_index, want_overflow = inverted_index_with_overflow(
        base.unionByName(new), min_df=1, max_postings=3
    )
    assert sorted(map(tuple, idx2.collect())) == sorted(
        map(tuple, want_index.collect())
    )
    assert sorted(map(tuple, of2.collect())) == sorted(
        map(tuple, want_overflow.collect())
    )

    # identical-content re-ingest is idempotent
    idx3, of3 = extend_inverted_index(idx2, of2, new, max_postings=3)
    assert sorted(map(tuple, idx3.collect())) == sorted(map(tuple, idx2.collect()))
    assert sorted(map(tuple, of3.collect())) == sorted(map(tuple, of2.collect()))

    # min_df>1 stores are lossy under inserts — refuse, don't undercount
    with pytest.raises(ValueError, match="min_df=1 store"):
        extend_inverted_index(index, overflow, new, min_df=2, max_postings=3)


def test_phrase_retrieval_adjacency(spark):
    """Phrase hits are positional ADJACENCY, not co-occurrence:
    overlapping occurrences count individually ('a a a' contains
    'a a' twice), reversed order does not match, and empty tokens
    hold their position (a double separator breaks adjacency)."""
    from patientdataintegration_spark.operators.indexing import (
        phrase_retrieval,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b a"), (3, "a b"), (4, "a  b")],
        "doc_id bigint, text string",
    )
    pos = positional_postings(docs)
    got = {(r["term"], r["doc"], r["pos"]) for r in pos.collect()}
    assert ("a", 1, 1) in got and ("a", 1, 3) in got, "1-based, duplicates kept"
    assert ("b", 4, 3) in got and ("a", 4, 1) in got, (
        "empty token holds position 2"
    )
    pairs = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "term_a string, term_b string"
    )
    hits = sorted(
        (r["term_a"], r["term_b"], r["doc"], r["pos"])
        for r in phrase_retrieval(pos, pairs).collect()
    )
    assert hits == [
        ("a", "a", 1, 1),  # overlapping matches ...
        ("a", "a", 1, 2),  # ... count individually
        ("a", "b", 3, 1),  # doc 2 is reversed; doc 4 is separated
    ]


def test_shard_manifest_partitions_corpus(spark):
    from patientdataintegration_spark.operators.indexing import shard_manifest

    docs = [(i, f"{'w ' * (i % 5)}".strip(), (i % 5) * 2 - 1) for i in range(100)]
    df = spark.createDataFrame(
        [(i, t, max(len(t), 0)) for i, t, _ in docs],
        "doc_id bigint, text string, n_chars bigint",
    )
    m = shard_manifest(df, n_shards=8)
    rows = m.collect()
    assert sum(r["n_docs"] for r in rows) == 100  # every doc in exactly one shard
    assert len(rows) <= 8 and all(0 <= r["shard"] < 8 for r in rows)
    # deterministic across partitionings
    again = sorted(map(tuple, shard_manifest(df.repartition(7), n_shards=8).collect()))
    assert again == sorted(map(tuple, rows))


def test_morton_code_hand_computed(spark):
    from patientdataintegration_spark.plans.partitioning import morton_code
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    got = df.select(morton_code(F.col("x"), F.col("y"), bits=3).alias("z")).first()["z"]
    # interleave x=101, y=011 -> bits (y2 x2)(y1 x1)(y0 x0) = 01 10 11
    assert got == 0b011011
    # z-order sorts (0,0),(1,0),(0,1),(1,1) as 0,1,2,3
    quad = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1)], "x long, y long"
    ).select("x", "y", morton_code(F.col("x"), F.col("y"), bits=1).alias("z"))
    assert sorted(r["z"] for r in quad.collect()) == [0, 1, 2, 3]


def test_zorder_by_clusters_both_dims(spark):
    from patientdataintegration_spark.plans.inspect import explain_str
    from patientdataintegration_spark.plans.partitioning import zorder_by

    df = spark.range(0, 4096).selectExpr(
        "id % 64 AS a", "CAST(floor(id / 64) AS BIGINT) AS b", "id AS payload"
    )
    z = zorder_by(df.repartition(8), "a", "b")
    assert "rangepartitioning" in explain_str(z).lower()
    assert z.count() == 4096 and set(z.columns) == {"a", "b", "payload"}


def test_winsorize_hand_computed(spark):
    from patientdataintegration_spark.operators.encodings import winsorize

    # group g: values 1..20 -> p05 pos = ceil(.05*20)=1 -> lo=1;
    # p95 pos = ceil(.95*20)=19 -> hi=19, so only 20 clamps (to 19)
    rows = [(i, "g", float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id int, grp string, value double")
    out = {r["id"]: r["value_w"] for r in winsorize(df, "value", "grp").collect()}
    assert out[20] == 19.0 and out[19] == 19.0 and out[1] == 1.0 and out[10] == 10.0
    # tighter caps clamp both tails
    out2 = {
        r["id"]: r["value_w"]
        for r in winsorize(df, "value", "grp", p_lo=0.25, p_hi=0.75).collect()
    }
    assert out2[1] == 5.0 and out2[20] == 15.0


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC sink/source: lossless roundtrip of a typed table and
    predicate pushdown reaching the ORC scan (PushedFilters), the
    same scale posture as the parquet path."""
    from patientdataintegration_spark.plans.inspect import explain_str
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.sources.orc_io import read_orc, write_orc

    src = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert back.schema == src.schema
    assert back.count() == src.count()
    a = sorted(map(tuple, src.orderBy("o_orderkey").limit(50).collect()))
    b = sorted(map(tuple, back.orderBy("o_orderkey").limit(50).collect()))
    assert a == b

    plan = explain_str(back.filter(F.col("o_orderkey") == 7).select("o_orderkey"))
    assert "PushedFilters" in plan and "o_orderkey" in plan


def test_conjunctive_retrieval_uses_overflow(spark):
    """Boolean-AND served from the capped factorization: a hot term's
    intersection must include docs the capped array displaced — the
    read-side proof the overflow store exists for."""
    from patientdataintegration_spark.operators.indexing import (
        conjunctive_retrieval,
        inverted_index_with_overflow,
    )

    # 'h' in docs 1..6 (cap 3 -> postings [1,2,3], overflow [4,5,6]);
    # 'z' in docs 5..8: the true intersection {5,6} lives ENTIRELY in
    # h's overflow
    rows = [
        (1, "h"), (2, "h"), (3, "h"), (4, "h"),
        (5, "h z"), (6, "h z"), (7, "z"), (8, "z"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    index, overflow = inverted_index_with_overflow(
        df, min_df=1, max_postings=3
    )
    pairs = spark.createDataFrame([("h", "z")], "term_a string, term_b string")
    got = sorted(
        r.doc for r in conjunctive_retrieval(index, overflow, pairs).collect()
    )
    assert got == [5, 6], (
        "capped arrays alone would return [] — the overflow rows must serve"
    )


def test_bm25_topk_hand_computed(spark):
    """BM25 against hand arithmetic: idf ordering (rarer term wins),
    length normalization (shorter doc wins at equal tf), self-hit
    exclusion, and the max_df guard dropping a universal term."""
    import math

    from patientdataintegration_spark.operators.indexing import bm25_topk

    # 'rare' in docs 1,2; 'common' everywhere; doc 2 shorter than 3
    rows = [
        (1, "rare common common"),
        (2, "rare common"),
        (3, "common common common"),
        (4, "common"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    queries = df.filter(F.col("doc_id") == 1).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    got = {
        (r.query_id, r.doc_id): (r.score, r.rnk)
        for r in bm25_topk(df, queries, k=4, k1=1.2, b=0.75).collect()
    }
    assert (1, 1) not in got, "self-hit excluded"
    assert set(got) == {(1, 2), (1, 3), (1, 4)}
    # doc 2 carries the rare term -> highest score
    ranks = {d: rk for (_q, d), (_s, rk) in got.items()}
    assert ranks[2] == 1
    # docs 3 and 4 score only on 'common' (tf 3 vs 1, len 3 vs 1):
    # replicate the arithmetic exactly
    n_docs, total = 4, 9
    def score(term_df, tf, len_d):
        idf = math.log((n_docs - term_df + 0.5) / (term_df + 0.5) + 1.0)
        tfn = (tf * (1.2 + 1.0)) / (
            tf + 1.2 * ((1.0 - 0.75) + 0.75 * len_d * n_docs / total)
        )
        return round(idf * tfn, 6)
    s3 = score(4, 3, 3)
    s4 = score(4, 1, 1)
    assert abs(got[(1, 3)][0] - s3) < 1e-9
    assert abs(got[(1, 4)][0] - s4) < 1e-9
    assert (ranks[3] < ranks[4]) == (s3 > s4)
    # the guard: max_df=3 silences 'common' everywhere; only doc 2
    # (the other 'rare' holder) survives
    guarded = {
        r.doc_id
        for r in bm25_topk(df, queries, k=4, k1=1.2, b=0.75, max_df=3).collect()
    }
    assert guarded == {2}
