"""Hand-computed and property tests for the round-5 batch
(`suite/ext4.py`, q186-q191) plus the q185 per-vertex triangle
sibling — small synthetic parquet corpora with independently
derivable expected values (the oracle gate pins full-corpus values;
these pin the SEMANTICS on inputs a human can check)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _write(df, tmp_path, name):
    df.write.mode("overwrite").parquet(str(tmp_path / f"{name}.parquet"))


def test_market_basket_hand_computed(spark, tmp_path):
    """Orders: {p1,p2} x3, {p1,p3} x1. Pair (p1,p2) has n_ab=3,
    n_a=4 (p1 in all four orders), n_b=3, N=4 ->
    confidence 3/4, lift (3*4)/(4*3)=1.0. Pair (p1,p3) has support
    1 < 3 and must be cut."""
    from patientdataintegration_spark.suite.ext4 import q186_market_basket

    rows = []
    for o in (1, 2, 3):
        rows += [(o, 1), (o, 2)]
    rows += [(4, 1), (4, 3)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    _write(li, tmp_path, "lineitem")
    out = q186_market_basket(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.n_ab, r.n_a, r.n_b) == (1, 2, 3, 4, 3)
    assert r.confidence == 3 / 4
    assert r.lift == (3 * 4) / (4 * 3)


def test_k_anonymity_hand_computed(spark, tmp_path):
    """6 customers in band (0, 'A', 1); 2 in (0, 'A', 2). Only the
    2-person group violates k=5."""
    from patientdataintegration_spark.suite.ext4 import q187_k_anonymity

    rows = [(i, 0, "A", 1500.0) for i in range(6)]
    rows += [(10, 0, "A", 2500.0), (11, 0, "A", 2600.0)]
    c = spark.createDataFrame(
        rows,
        "c_custkey bigint, c_nationkey bigint, c_mktsegment string, c_acctbal double",
    )
    _write(c, tmp_path, "customer")
    out = q187_k_anonymity(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert (out[0].bal_band, out[0].group_size) == (2, 2)


def test_bpe_pair_counts_multiplicity(spark, tmp_path):
    """'a b a b' contributes pairs (a b), (b a), (a b) — WITH
    multiplicity, unlike the deduped shingle lanes."""
    from patientdataintegration_spark.suite.ext4 import q188_bpe_pair_counts

    d = spark.createDataFrame(
        [(1, "a b a b", "s"), (2, "c", "s")],
        "doc_id bigint, text string, source string",
    )
    _write(d, tmp_path, "documents")
    out = {r.pair: r.n for r in q188_bpe_pair_counts(spark, str(tmp_path)).collect()}
    assert out == {"a b": 2, "b a": 1}  # doc 2 has no pairs


def test_kcore_peels_tail_keeps_clique(spark, tmp_path):
    """K4 on suppliers 1-4 (3 shared orders per pair via 3 orders
    containing all four) + a pendant supplier 5 tied to supplier 1.
    k=3 peeling drops the pendant; the 4-clique survives with every
    degree exactly 3."""
    from patientdataintegration_spark.suite.ext4 import q189_kcore

    rows = []
    for o in (1, 2, 3):
        rows += [(o, s) for s in (1, 2, 3, 4)]
    for o in (4, 5, 6):
        rows += [(o, 1), (o, 5)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_suppkey bigint")
    _write(li, tmp_path, "lineitem")
    out = {r.node: r.degree for r in q189_kcore(spark, str(tmp_path)).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_minhash_error_identical_docs_zero(spark, tmp_path):
    """Two identical documents: the LSH must surface the pair, the
    exact Jaccard is 1.0, every minhash component matches (est 1.0),
    so abs_err == 0.0 exactly."""
    from patientdataintegration_spark.suite.ext4 import q190_minhash_error

    text = "the quick brown fox jumps over the lazy dog again and again"
    d = spark.createDataFrame(
        [(1, text, "s"), (2, text, "s"), (3, "совсем другой текст без общих слов вообще ни одного", "s")],
        "doc_id bigint, text string, source string",
    )
    _write(d, tmp_path, "documents")
    out = q190_minhash_error(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r.est_jaccard == 1.0 and r.exact_jaccard == 1.0 and r.abs_err == 0.0
    for r in out:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert r.abs_err == abs(r.est_jaccard - r.exact_jaccard)


def test_bigram_surprisal_hand_computed(spark, tmp_path):
    """Corpus: 'a b', 'a b', 'a c'. Bigram counts: (a b)=2, (a c)=1;
    leading count c1(a)=3. Doc 1/2 score round(ln(2/3),6); doc 3
    scores round(ln(1/3),6)."""
    from patientdataintegration_spark.suite.ext4 import q191_bigram_surprisal

    d = spark.createDataFrame(
        [(1, "a b", "s"), (2, "a b", "s"), (3, "a c", "s")],
        "doc_id bigint, text string, source string",
    )
    _write(d, tmp_path, "documents")
    out = {r.doc_id: r for r in q191_bigram_surprisal(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    exp_ab = round(round(math.log(2 / 3), 6) / 1, 6)
    exp_ac = round(round(math.log(1 / 3), 6) / 1, 6)
    for doc in (1, 2):
        assert out[doc].n_bigrams == 1
        assert out[doc].avg_logprob == exp_ab
    assert out[3].n_bigrams == 1
    assert out[3].avg_logprob == exp_ac


def test_local_clustering_triangle_plus_tail(spark, tmp_path):
    """Suppliers 1-3 form a triangle (5 shared orders pairwise via 5
    orders holding all three); supplier 4 hangs off supplier 1. Nodes
    1-3 each close their one wedge... node 1 has degree 3 (two
    triangle edges + the pendant) so its local coefficient is
    2*1/(3*2) = 1/3; nodes 2,3 have degree 2 and coefficient 1.0;
    the pendant has degree 1 -> 0.0."""
    from patientdataintegration_spark.suite.ext3 import q185_local_clustering

    rows = []
    for o in range(1, 6):
        rows += [(o, s) for s in (1, 2, 3)]
    for o in range(6, 11):
        rows += [(o, 1), (o, 4)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_suppkey bigint")
    _write(li, tmp_path, "lineitem")
    out = {
        r.node: r for r in q185_local_clustering(spark, str(tmp_path)).collect()
    }
    assert out[1].degree == 3 and out[1].n_triangles == 1
    assert out[1].local_clustering == round(2 * 1 / (3 * 2), 9)
    for n in (2, 3):
        assert out[n].degree == 2 and out[n].n_triangles == 1
        assert out[n].local_clustering == 1.0
    assert out[4].degree == 1 and out[4].n_triangles == 0
    assert out[4].local_clustering == 0.0


def test_degree_orientation_preserves_triangle_count(spark, tmp_path):
    """The degree-oriented two-hop join must count exactly what the
    id-oriented join counts — same clique fixture, known 4 triangles
    in K4."""
    from patientdataintegration_spark.suite.ext3 import q172_triangle_count

    rows = []
    for o in range(1, 6):
        rows += [(o, s) for s in (1, 2, 3, 4)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_suppkey bigint")
    _write(li, tmp_path, "lineitem")
    r = q172_triangle_count(spark, str(tmp_path)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    # K4: every vertex has degree 3 -> 3 wedges each, 12 total;
    # global clustering = 3*4/12 = 1.0
    assert r.n_wedges == 12 and r.clustering == 1.0


def test_random_projection_sign_symmetry(spark, tmp_path):
    """SRP invariants on constructed vectors: negating a vector flips
    every projection's sign (complementary signature bits when no
    projection is exactly zero); scaling by 2 doubles every
    projection exactly and preserves the signature."""
    from patientdataintegration_spark.suite.ext4 import (
        _SRP_K,
        q192_random_projection,
    )

    base = [((-1) ** i) * (0.25 + 0.015625 * i) for i in range(64)]
    rows = [
        (1, [float(v) for v in base], 0),
        (2, [float(-v) for v in base], 0),
        (3, [float(2 * v) for v in base], 0),
    ]
    e = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    e.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r.vec_id: r
        for r in q192_random_projection(spark, str(tmp_path)).collect()
    }
    full = (1 << _SRP_K) - 1
    for j in range(_SRP_K):
        p = out[1][f"p{j}"]
        assert p != 0.0
        assert out[2][f"p{j}"] == -p
        assert out[3][f"p{j}"] == 2 * p
    assert out[1].srp_sig == out[3].srp_sig
    assert out[1].srp_sig + out[2].srp_sig == full
    assert 0 <= out[1].srp_sig <= full


def _png_gray(w, h, pixel):
    """Minimal valid non-interlaced 8-bit grayscale PNG with
    pixel[y][x] values."""
    import zlib

    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += bytes(pixel(x, y) for x in range(w))

    def chunk(cid, body):
        return (
            len(body).to_bytes(4, "big")
            + cid
            + body
            + zlib.crc32(cid + body).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_dhash_known_gradient():
    """9x8 image exactly the grid size: each cell is one pixel, a
    strict left-to-right brightness ramp sets every bit -> all-ones
    hash; the reversed ramp clears every bit."""
    from patientdataintegration_spark.operators.multimodal import (
        decode_png_gray_grid,
        dhash64,
    )

    inc = _png_gray(9, 8, lambda x, y: x * 20)
    w, h, sums, counts = decode_png_gray_grid(inc)
    assert (w, h) == (9, 8)
    assert dhash64(sums, counts) == "f" * 16
    dec = _png_gray(9, 8, lambda x, y: (8 - x) * 20)
    assert dhash64(*decode_png_gray_grid(dec)[2:]) == "0" * 16


def test_dhash_scale_invariance():
    """The same ramp rendered at 2x resolution box-bins to the same
    grid ordering -> identical dHash (the point of a perceptual
    hash)."""
    from patientdataintegration_spark.operators.multimodal import (
        decode_png_gray_grid,
        dhash64,
    )

    small = _png_gray(9, 8, lambda x, y: x * 20)
    big = _png_gray(18, 16, lambda x, y: (x // 2) * 20)
    assert (
        dhash64(*decode_png_gray_grid(small)[2:])
        == dhash64(*decode_png_gray_grid(big)[2:])
    )


def test_dhash_unsupported_payloads():
    from patientdataintegration_spark.operators.multimodal import (
        decode_png_gray_grid,
    )

    assert decode_png_gray_grid(b"not a png") is None
    assert decode_png_gray_grid(_png_gray(4, 4, lambda x, y: 0)) is None  # < grid


def test_image_dhash_operator_and_neardup(spark):
    """End-to-end through mapInPandas: two paths carrying identical
    pixels hash equal and pair at hamming 0; a garbage payload
    surfaces as unsupported with NULL hash; the near-dup join never
    pairs the unsupported row."""
    from patientdataintegration_spark.operators.multimodal import (
        dhash_neardup_pairs,
        image_dhash,
    )

    png = _png_gray(12, 10, lambda x, y: (x * 7 + y * 3) % 256)
    other = _png_gray(12, 10, lambda x, y: (255 - x * 11) % 256)
    df = spark.createDataFrame(
        [("a.png", bytearray(png)), ("b.png", bytearray(png)),
         ("c.png", bytearray(other)), ("junk", bytearray(b"\x00\x01"))],
        "path string, content binary",
    )
    hashes = image_dhash(df)
    rows = {r.path: r for r in hashes.collect()}
    assert rows["a.png"].dhash_status == "real"
    assert rows["a.png"].dhash == rows["b.png"].dhash
    assert len(rows["a.png"].dhash) == 16
    assert rows["junk"].dhash is None
    assert rows["junk"].dhash_status == "unsupported"
    pairs = {(r.path_a, r.path_b): r.hamming for r in dhash_neardup_pairs(hashes).collect()}
    assert pairs.get(("a.png", "b.png")) == 0
    assert all("junk" not in k for pair in pairs for k in pair)


def test_python_datasource_pushdown_prunes_partitions():
    """Unit-level: range filters on doc_id are CONSUMED (nothing
    yielded back to Spark) and the planned partitions cover exactly
    the pruned range."""
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
    )

    from patientdataintegration_spark.sources.pysource import SynthDocsReader

    r = SynthDocsReader({"n": "1000", "parts": "4"})
    rest = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 100),
                LessThan(("doc_id",), 200),
                IsNotNull(("text",)),  # unsupported -> handed back
            ]
        )
    )
    assert len(rest) == 1 and isinstance(rest[0], IsNotNull)
    parts = r.partitions()
    assert parts[0].start == 100 and parts[-1].end == 200
    covered = sum(p.end - p.start for p in parts)
    assert covered == 100


def test_python_datasource_matches_plain_generation(spark):
    """E2E: the source with a pushed filter returns exactly the rows
    the pure generator produces for that range."""
    from patientdataintegration_spark.sources.pysource import (
        register_synth_docs,
        synth_tokens,
    )

    register_synth_docs(spark)
    out = (
        spark.read.format("synth_docs")
        .option("n", 500)
        .option("parts", 4)
        .load()
        .filter((F.col("doc_id") >= 17) & (F.col("doc_id") < 42))
        .collect()
    )
    assert len(out) == 25
    for r in sorted(out, key=lambda r: r.doc_id):
        toks = synth_tokens(r.doc_id)
        assert r.text == " ".join(toks)
        assert r.n_tokens == len(toks)


def test_python_datasource_survives_pushdown_disabled_session(spark):
    """r5 driver regression: the driver builds its own SparkSession
    WITHOUT session.py's conf block, and q195 died with
    DATA_SOURCE_PUSHDOWN_DISABLED because
    spark.sql.python.filterPushdown.enabled is a runtime SQL conf
    that defaults to false. register_synth_docs must now set it on
    whatever session it is handed — simulated here by forcing the
    conf off first."""
    from patientdataintegration_spark.sources.pysource import (
        register_synth_docs,
    )
    from patientdataintegration_spark.suite.ext4 import (
        q195_python_datasource,
    )

    conf_key = "spark.sql.python.filterPushdown.enabled"
    spark.conf.set(conf_key, "false")
    try:
        register_synth_docs(spark)
        assert spark.conf.get(conf_key) == "true"
        out = q195_python_datasource(spark, "/root/testdata/sf0.001")
        rows = {r.lang: r for r in out.collect()}
        assert set(rows) == {"en", "de", "fr"}
        assert sum(r.n_docs for r in rows.values()) == 1500
    finally:
        spark.conf.set(conf_key, "true")


def test_python_stream_source_restart_resumes_offset(spark, tmp_path):
    """Two availableNow runs on the SAME checkpoint: the first
    consumes the first prefetch window (ids 0..99), the restart
    consumes exactly the next (100..199) — checkpointed offsets +
    deterministic replay, the exactly-once contract."""
    from patientdataintegration_spark.sources.pydatasource import register

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")  # file sink: memory sink cannot recover

    def run_once():
        stream = (
            spark.readStream.format("synthetic_events")
            .option("rows", 1000)
            .option("batch_rows", 100)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    first = run_once()
    ids1 = sorted(r.event_id for r in first)
    assert ids1 == list(range(0, 100))
    second = run_once()
    ids2 = sorted(r.event_id for r in second)
    assert ids2 == list(range(0, 200))  # cumulative: first window + the next


def test_q196_streaming_totals(spark, sf_dir):
    from patientdataintegration_spark.suite.ext4 import (
        q196_python_stream_source,
    )

    out = q196_python_stream_source(spark, sf_dir)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 300


def test_dhash_banding_recall_at_threshold(spark):
    """Adversarial banding check: a pair at exactly hamming 6 with
    the differing bits SPREAD ACROSS SIX DIFFERENT former-4-band
    regions (which 4-wide banding would miss) must still be found by
    the 8-band pigeonhole."""
    from patientdataintegration_spark.operators.multimodal import (
        dhash_neardup_pairs,
    )

    base = int("a5a5a5a5a5a5a5a5", 16)
    # flip one bit in 6 of the 8 bytes -> hamming 6, at most 2 bands equal
    flipped = base
    for byte in (0, 1, 2, 3, 4, 5):
        flipped ^= 1 << (byte * 8)
    hashes = spark.createDataFrame(
        [("x", f"{base:016x}", "real"), ("y", f"{flipped:016x}", "real")],
        "path string, dhash string, dhash_status string",
    )
    out = dhash_neardup_pairs(hashes, max_hamming=6).collect()
    assert len(out) == 1 and out[0].hamming == 6

    import pytest as _pytest

    with _pytest.raises(ValueError):
        dhash_neardup_pairs(hashes, max_hamming=8)


def test_pandas_udf_scalar_matches_native_twin(spark, sf_dir):
    """q197's pandas-UDF logistic score must be row-identical to the
    JVM-native Column expression of the same formula, and the plan
    must actually contain an ArrowEvalPython node (proving the lane
    exercises the vectorized Python path, not a constant-folded
    shortcut)."""
    from patientdataintegration_spark.suite.ext4 import q197_pandas_udf_scalar

    via_udf = q197_pandas_udf_scalar(spark, sf_dir)
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") >= 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                1.0 / (1.0 + F.exp(-((F.col("l_extendedprice") / 1000.0) - 30.0))),
                6,
            ).alias("purchase_score"),
        )
    )
    a = sorted(map(tuple, via_udf.collect()))
    b = sorted(map(tuple, li.collect()))
    assert a == b and a
    plan = via_udf._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan


def test_grouped_agg_pandas_hand_computed(spark, tmp_path):
    """One nation, balances [1, 2, 3, 4]: median 2.5, IQR (3.25 -
    1.75) = 1.5, n = 4."""
    from patientdataintegration_spark.suite.ext4 import q198_grouped_agg_pandas

    c = spark.createDataFrame(
        [(i, 7, float(i)) for i in (1, 2, 3, 4)],
        "c_custkey bigint, c_nationkey bigint, c_acctbal double",
    )
    _write(c, tmp_path, "customer")
    out = q198_grouped_agg_pandas(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.median_bal, r.iqr_bal, r.n) == (2.5, 1.5, 4)


def test_apply_in_pandas_hand_computed(spark, tmp_path):
    """Customer 1: orders priced 100 then 150 (by date) -> drift 50;
    customer 2: single order -> drift 0."""
    import datetime

    from patientdataintegration_spark.suite.ext4 import q199_apply_in_pandas

    d = datetime.datetime
    o = spark.createDataFrame(
        [
            (10, 1, d(2024, 1, 1), 100.0),
            (11, 1, d(2024, 2, 1), 150.0),
            (12, 2, d(2024, 1, 15), 70.0),
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp, o_totalprice double",
    )
    _write(o, tmp_path, "orders")
    out = {r.custkey: r for r in q199_apply_in_pandas(spark, str(tmp_path)).collect()}
    assert out[1].n_orders == 2 and out[1].price_drift == 50.0
    assert out[2].n_orders == 1 and out[2].price_drift == 0.0


def test_corpus_curation_stage_accounting(spark, tmp_path):
    """Constructed corpus where each stage drops a known document:
    - doc 1: good (20+ tokens, sane lengths)         -> survives all
    - doc 2: exact duplicate of doc 1 (same text)    -> dropped at exact-dedup
    - doc 3: near-duplicate of doc 1 (one token off) -> dropped at LSH stage
    - doc 4: too short (5 tokens)                    -> dropped at quality gate
    Final: 1 selected doc; accounting 4 -> 3 -> 2 -> 1 -> 1."""
    from patientdataintegration_spark.suite.ext4 import q200_corpus_curation

    base_tokens = [f"tok{i:02d}" for i in range(24)]
    good = " ".join(base_tokens)
    near = " ".join(base_tokens[:-1] + ["tok99"])
    d = spark.createDataFrame(
        [
            (1, good, "s"),
            (2, good, "s"),
            (3, near, "s"),
            (4, "only five tokens right here", "s"),
        ],
        "doc_id bigint, text string, source string",
    )
    _write(d, tmp_path, "documents")
    out = q200_corpus_curation(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_raw, r.n_quality, r.n_exact, r.n_neardup, r.n_selected) == (
        4, 3, 2, 1, 1,
    )
    assert r.tokens_selected == 24


def test_stream_outer_join_matches_batch_twin(spark, sf_dir):
    """q201 vs the batch LEFT JOIN twin: every streamed row appears in
    the batch result, and every batch row is streamed EXCEPT outer
    (null-click) rows at the watermark frontier (errors at the
    stream's max timestamp are legitimately withheld — outer emission
    requires the watermark to pass their window)."""
    from patientdataintegration_spark.sources.catalog import load_table
    from patientdataintegration_spark.suite.ext4 import q201_stream_outer_join

    streamed = q201_stream_outer_join(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
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
        "left_outer",
    ).select(
        "error_id",
        "click_id",
        "user_id",
        (F.unix_micros("e_ts") - F.unix_micros("c_ts")).alias("micros_between"),
        "e_ts",
    )
    # the query watermark is the MIN across both inputs' frontiers
    # (each = its max event time at 0s delay); outer rows flush only
    # once the watermark passes their window end (e_ts)
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
    frontier = {
        (r.error_id, r.click_id, r.user_id, r.micros_between)
        for r in b_all
        if r.click_id is None and r.e_ts >= wm
    }
    assert missing <= frontier, f"non-frontier rows withheld: {list(missing)[:3]}"
    # the outer lane genuinely emitted null-click rows
    assert any(r[1] is None for r in s_rows)
