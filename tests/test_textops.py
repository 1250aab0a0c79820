

def test_mixture_weights_hand_computed(spark):
    """Uniform-target weights on a 2-source corpus: the small source
    gets upsampled (capped), the big one downsampled; shares exact."""
    from patientdataintegration_spark.operators.mixture import mixture_weights

    df = spark.createDataFrame(
        [("a b c d e f", "web")] * 3 + [("x y", "code")],
        "text string, source string",
    )
    rows = {r.source: r for r in mixture_weights(df, max_epochs=4.0).collect()}
    web, code = rows["web"], rows["code"]
    assert (web.n_docs, web.n_tokens) == (3, 18) and (code.n_docs, code.n_tokens) == (1, 2)
    assert web.natural_share == 18 / 20 and code.natural_share == 2 / 20
    # target per source = 10 tokens: web 10/18, code capped at 4.0 (not 5.0)
    assert web.weight == (20.0 / 2) / 18 and code.weight == 4.0
    assert code.target_tokens == 8.0


def test_realize_mixture_epochs_and_determinism(spark):
    """floor(weight) full epochs always survive; the fractional
    epoch keeps a hash-selected subset; two runs are identical."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.mixture import realize_mixture

    docs = spark.createDataFrame(
        [(i, "web") for i in range(40)] + [(100 + i, "code") for i in range(10)],
        "doc_id bigint, source string",
    )
    weights = spark.createDataFrame(
        [("web", 1.0), ("code", 2.5)], "source string, weight double"
    )
    out = realize_mixture(docs, weights, seed=42)
    rows = out.collect()
    per = out.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in per}
    # web: exactly 1 epoch per doc; code: 2 full epochs + 0..10 extra
    assert counts["web"] == 40
    assert 20 <= counts["code"] <= 30
    code_extra = [r for r in rows if r.source == "code" and r.epoch == 2]
    assert 0 < len(code_extra) < 10  # fractional epoch is a strict subset
    again = {tuple(r) for r in realize_mixture(docs, weights, seed=42).collect()}
    assert again == {tuple(r) for r in rows}
    # a different seed draws a different fractional subset
    other = {tuple(r) for r in realize_mixture(docs, weights, seed=7).collect()}
    assert {t for t in other if t[2] < 2} == {t for t in again if t[2] < 2}


def test_vocab_coverage_hand_computed(spark):
    from patientdataintegration_spark.operators.textops import vocab_coverage

    df = spark.createDataFrame(
        [("a a a b",), ("b c",), ("a d",)], "text string"
    )
    rows = {r.rank: r for r in vocab_coverage(df, top_n=10).collect()}
    assert [rows[i].token for i in (1, 2, 3, 4)] == ["a", "b", "c", "d"]
    assert rows[1].cnt == 4 and rows[2].cnt == 2
    assert rows[1].cum_share == 4 / 8 and rows[4].cum_share == 1.0
    # local-prune + global-rank is partition-layout invariant, and
    # top_n smaller than the vocab still yields exact cum_share
    # (denominator counts ALL occurrences, pruned types included)
    a = sorted(map(tuple, vocab_coverage(df, top_n=2).collect()))
    b = sorted(map(tuple, vocab_coverage(df.repartition(7), top_n=2).collect()))
    assert a == b
    assert [r[3] for r in a] == [4 / 8, 6 / 8]


def test_sparse_cosine_pairs_hand_computed(spark):
    """Identical docs → cosine 1.0; df=1 terms can't pair and are
    pruned; terms above max_df are dropped (stop-word/scale guard)."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.textops import sparse_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha beta"),
            (3, "gamma"),            # df=1 terms only → no pairs
            (4, "common common"),    # 'common' below: df=4 > max_df
            (5, "common alpha"),
        ],
        "doc_id bigint, text string",
    )
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 4, F.lit("common stuff"))
        .when(F.col("doc_id") == 5, F.lit("common alpha"))
        .otherwise(F.col("text")),
    )
    # df: alpha=3, beta=2, common=2, gamma/stuff=1
    out = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in sparse_cosine_pairs(
            docs, min_sim=0.0, min_df=2, max_df=2
        ).collect()
    }
    # alpha df=3 > max_df=2 → dropped; beta pairs docs 1-2 (identical
    # single-term vectors → 1.0); common pairs 4-5 (1.0)
    assert out == {(1, 2): 1.0, (4, 5): 1.0}

    out2 = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in sparse_cosine_pairs(
            docs, min_sim=0.0, min_df=2, max_df=64
        ).collect()
    }
    # now alpha kept: docs 1,2 share alpha+beta (cos 1.0); doc 5
    # shares alpha with 1 and 2; doc 4 shares common with 5
    assert out2[(1, 2)] == 1.0
    assert set(out2) == {(1, 2), (1, 5), (2, 5), (4, 5)}
    assert 0.0 < out2[(1, 5)] < 1.0 and out2[(1, 5)] == out2[(2, 5)]


def test_bpe_merges_hand_computed(spark):
    """4 BPE merges over a tiny corpus, checked against the merge
    table computed by hand — including the 'a a a' non-overlap rule
    and the (cnt DESC, l, r) tiebreak."""
    from patientdataintegration_spark.operators.textops import bpe_merges

    docs = spark.createDataFrame(
        [
            ("low low low lower",),
            ("newest newest west",),
            ("aaa Mixed-CASE! ignored123",),   # aaa kept; others filtered
        ],
        "text string",
    )
    got = [tuple(r) for r in bpe_merges(docs, "text", n_merges=4).collect()]
    # vocab: low×3, lower×1, newest×2, west×1, aaa×1
    # step 1 pair counts: (l,o)=4, (o,w)=4, (w,e)=4(lower+newest+west),
    #   (e,s)=3, (s,t)=3, (e,r)=1, (n,e)=2, (e,w)=2, (a,a)=1 →
    #   tie at 4 between (l,o),(o,w),(w,e): lexicographic 'l'<'o'<'w'
    #   → merge (l,o)
    assert got[0] == (1, "l", "o", 4)
    # step 2: (lo,w)=4, (w,e)=4 → 'lo' < 'w' → (lo,w)
    assert got[1] == (2, "lo", "w", 4)
    # step 3: (w,e)=3 now (newest, west; lower's w fused into low):
    #   (low,e)=1, (e,s)=3, (s,t)=3, (w,e)=3 → tie at 3:
    #   (e,s) < (s,t) < (w,e) → (e,s)
    assert got[2] == (3, "e", "s", 3)
    # step 4: (es,t)=3 beats everything
    assert got[3] == (4, "es", "t", 3)
