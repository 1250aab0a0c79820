"""Dedup + similarity semantics: MinHash estimates Jaccard, LSH
candidates cover true near-dups, simhash hamming tracks similarity,
brute-force cosine is exact, LSH-ANN achieves recall on clustered
data."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from patientdataintegration_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_table,
    simhash,
    simhash_near_pairs,
)
from patientdataintegration_spark.operators.similarity import cosine_topk, lsh_cosine_topk


def _doc_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # near-dup of doc 0
    far = "completely different content about spark catalyst optimizer plans"
    dup = base  # exact dup of doc 0
    rows = [(0, base, "s"), (1, near, "s"), (2, far, "s"), (3, dup, "s")]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup_groups(spark):
    d = _doc_corpus(spark)
    groups = {r["canonical_id"]: r["n_docs"] for r in exact_dedup(d).collect()}
    assert groups[0] == 2  # doc 0 and 3 identical
    assert groups[1] == 1 and groups[2] == 1


def test_ngram_jaccard_identifies_near_dup(spark):
    d = _doc_corpus(spark)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(d).collect()}
    assert pairs[(0, 3)] == 1.0  # exact dup
    assert 0.5 < pairs[(0, 1)] < 1.0  # near dup
    assert (0, 2) not in pairs  # no shared shingles


def test_minhash_lsh_finds_dup_pair(spark):
    d = _doc_corpus(spark)
    sigs = minhash_signatures(shingle_table(d), k=8, seed=42)
    cand = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert (0, 3) in cand  # identical docs share every band
    # near-dup (0,1) very likely but probabilistic; dissimilar pair
    # (0,2) sharing a band is possible only by hash collision
    assert (0, 2) not in cand


def test_minhash_estimates_jaccard(spark):
    # two docs with known shingle overlap; k=64 signature agreement
    # rate should approximate the true jaccard
    a = " ".join(f"w{i}" for i in range(100))
    b = " ".join(f"w{i}" for i in range(50)) + " " + " ".join(f"x{i}" for i in range(50))
    d = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    sh = shingle_table(d)
    sigs = minhash_signatures(sh, k=64, seed=1).collect()
    s0 = [sigs[0][f"mh_{i}"] for i in range(64)] if sigs[0]["doc_id"] == 0 else [sigs[1][f"mh_{i}"] for i in range(64)]
    s1 = [sigs[1][f"mh_{i}"] for i in range(64)] if sigs[1]["doc_id"] == 1 else [sigs[0][f"mh_{i}"] for i in range(64)]
    agree = sum(x == y for x, y in zip(s0, s1)) / 64
    # true 3-gram jaccard: 48 common shingles of 98 each -> 48/148
    true_j = 48 / 148
    assert abs(agree - true_j) < 0.18  # 64 hashes -> wide but bounded CI


def test_simhash_near_pairs(spark):
    d = _doc_corpus(spark)
    sig = simhash(d, bits=16)
    sigs = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    assert sigs[0] == sigs[3]  # identical text, identical signature
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_pairs(sig, max_hamming=3).collect()}
    assert pairs[(0, 3)] == 0


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    got = [(r["neighbor_id"], r["rank"]) for r in cosine_topk(q, df, k=3).orderBy("rank").collect()]
    assert got[0][0] == 1  # most similar
    assert got[-1][0] == 3  # least similar (opposite)


def test_lsh_cosine_recall_on_clusters(spark):
    rng = random.Random(3)
    rows = []
    for cid in range(4):
        center = [rng.gauss(0, 1) for _ in range(16)]
        nrm = math.sqrt(sum(x * x for x in center))
        center = [x / nrm for x in center]
        for i in range(25):
            vec = [c + rng.gauss(0, 0.05) for c in center]
            rows.append((cid * 25 + i, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") % 25 == 0)  # one query per cluster
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(q, df, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_cosine_topk(q, df, dim=16, k=3, n_planes=4, seed=11).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # tight clusters: same-bucket neighbors dominate


def test_connected_components_match_union_find(spark, sf_dir):
    """Spark min-label propagation == driver-side union-find on the
    same pair list."""
    from patientdataintegration_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_table,
    )
    from patientdataintegration_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(
        minhash_signatures(shingle_table(d), k=8, seed=42), bands=4, rows_per_band=2
    )
    got = {
        r.node: r.label for r in connected_components(pairs).collect()
    }

    edges = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of each component
    want = {}
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    for n in parent:
        want[n] = comp_min[find(n)]
    assert got == want and len(got) > 0


def test_canonicalize_keeps_one_per_cluster(spark, sf_dir):
    from pyspark.sql import functions as F

    from patientdataintegration_spark.suite.ext import q86_dedup_clusters

    out = q86_dedup_clusters(spark, sf_dir)
    per = out.groupBy("cluster").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
        F.count(F.lit(1)).alias("n"),
    )
    assert per.filter(F.col("n_canon") != 1).count() == 0
    # every document appears exactly once
    d_total = out.count()
    assert out.select("doc_id").distinct().count() == d_total


def test_chunk_documents_reassembles_and_overlaps(spark):
    """Chunks tile the token stream: stride apart, overlap shared,
    short docs emit exactly one chunk."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.textops import chunk_documents

    long_text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame(
        [(1, long_text), (2, "just three tokens"), (3, "one")],
        "doc_id bigint, text string",
    )
    out = chunk_documents(df, chunk_size=64, overlap=16).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 150 tokens, stride 48: starts 0,48,96 -> 3 chunks (96+16 < 150)
    assert [len(by_doc[d]) for d in (1, 2, 3)] == [3, 1, 1]
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    toks = long_text.split(" ")
    for i, r in enumerate(c1):
        want = toks[i * 48 : i * 48 + 64]
        assert r.chunk_text.split(" ") == want
        assert r.n_chunk_tokens == len(want)
    # consecutive chunks share exactly the 16-token overlap
    assert c1[0].chunk_text.split(" ")[48:] == c1[1].chunk_text.split(" ")[:16]
    assert by_doc[2][0].chunk_text == "just three tokens"


def test_quantize_embeddings_exact_and_partition_invariant(spark, sf_dir):
    from patientdataintegration_spark.operators.similarity import quantize_embeddings
    from patientdataintegration_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, quantize_embeddings(e).drop("codes").collect()))
    b = sorted(
        map(tuple, quantize_embeddings(e.repartition(13)).drop("codes").collect())
    )
    assert a == b and len(a) > 0
    # codes reconstruct to within one lattice step
    row = quantize_embeddings(e).first()
    assert all(isinstance(c, int) for c in row.codes)
    assert 0.0 <= row.recon_err < len(row.codes) * (1 / 64) ** 2


def test_contamination_bounds_and_self_containment(spark, sf_dir):
    """Benchmark docs checked against themselves are 100% contaminated;
    ratios always lie in [0, 1]."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.textops import contamination_check
    from patientdataintegration_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("source") == "src0")
    out = contamination_check(bench, bench)
    assert out.filter(F.col("contamination") != 1.0).count() == 0
    cand = d.filter(F.col("source") != "src0")
    mixed = contamination_check(cand, bench)
    assert (
        mixed.filter(
            (F.col("contamination") < 0) | (F.col("contamination") > 1)
        ).count()
        == 0
    )


def test_repetition_signals_hand_computed(spark):
    from patientdataintegration_spark.operators.textops import repetition_signals

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x y z"), (3, "w w w w")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    # doc 1: tokens a,b,a,b,c -> top token 2/5; 2-grams ab,ba,ab,bc ->
    # top 2/4, dup (4-3)/4; 3-grams aba,bab,abc -> dup 0/3
    r1 = rows[1]
    assert r1["n_tokens"] == 5
    assert r1["top_token_frac"] == 2 / 5
    assert r1["top_2gram_frac"] == 2 / 4
    assert r1["dup_2gram_frac"] == 1 / 4
    assert r1["dup_3gram_frac"] == 0.0
    # doc 2: no repetition at all
    r2 = rows[2]
    assert r2["top_token_frac"] == 1 / 3
    assert r2["dup_2gram_frac"] == 0.0
    # doc 3: maximal repetition: w w w w
    r3 = rows[3]
    assert r3["top_token_frac"] == 1.0
    assert r3["dup_2gram_frac"] == 2 / 3
    assert r3["dup_3gram_frac"] == 1 / 2


def test_token_budget_sample_budget_and_determinism(spark):
    from patientdataintegration_spark.operators.sampling import token_budget_sample

    docs = [(i, f"src{i % 3}", " ".join(["tok"] * (10 + i % 7))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id int, source string, text string")
    out = token_budget_sample(df, budget_tokens=50)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        total = sum(r["n_tokens"] for r in rs)
        # within budget unless a single first doc overshoots
        assert total <= 50 or len(rs) == 1
        assert max(r["cum_tokens"] for r in rs) == total
    # deterministic under a different partitioning
    out2 = token_budget_sample(df.repartition(7), budget_tokens=50)
    assert sorted(r["doc_id"] for r in out2.collect()) == sorted(
        r["doc_id"] for r in rows
    )
    # a bigger budget keeps a superset
    out3 = {r["doc_id"] for r in token_budget_sample(df, budget_tokens=200).collect()}
    assert {r["doc_id"] for r in rows} <= out3


def test_components_star_matches_min_label(spark):
    """Large-star/small-star == min-label propagation on adversarial
    shapes: a diameter-200 chain (where min-label needs 200 rounds
    but star needs O(log)), bridged cliques, and a random graph."""
    import random

    from patientdataintegration_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    cases = {
        "chain": [(i, i + 1) for i in range(200)],
        "cliques": [(i, j) for i in range(10) for j in range(i + 1, 10)]
        + [(100 + i, 100 + j) for i in range(8) for j in range(i + 1, 8)]
        + [(9, 100)],
    }
    rng = random.Random(7)
    cases["random"] = [
        (rng.randrange(500), rng.randrange(500)) for _ in range(400)
    ]
    for name, edges in cases.items():
        df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
        want = {
            (r.node, r.label)
            for r in connected_components(df, max_iters=300).collect()
        }
        got = {
            (r.node, r.label) for r in connected_components_star(df).collect()
        }
        assert got == want and len(got) > 0, name


def test_merge_rollups_equals_full_recompute(spark, sf_dir):
    """Merging partial rollups of ANY slicing is bit-identical to one
    aggregation of the full table (the decimal-monoid contract)."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.incremental import (
        merge_rollups,
        partial_rollup,
        rollup_readout,
    )
    from patientdataintegration_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    # a 3-way mod split — deliberately unrelated to the group key
    slices = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    merged = merge_rollups(
        [partial_rollup(s, ["o_orderpriority"], "o_totalprice") for s in slices],
        ["o_orderpriority"],
    )
    full = partial_rollup(o, ["o_orderpriority"], "o_totalprice")
    got = {
        tuple(r) for r in rollup_readout(merged, ["o_orderpriority"]).collect()
    }
    want = {
        tuple(r) for r in rollup_readout(full, ["o_orderpriority"]).collect()
    }
    assert got == want and len(got) == 5


def test_incremental_dedup_properties(spark, sf_dir):
    """(a) against an EMPTY store, incremental == plain exact_dedup;
    (b) against a store, no surviving fingerprint is in the store and
    survivors == delta fingerprints minus store."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.dedup import (
        exact_dedup,
        incremental_exact_dedup,
    )
    from patientdataintegration_spark.operators.textops import fingerprint
    from patientdataintegration_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    empty = spark.createDataFrame([], "fingerprint string")
    got = {
        tuple(r) for r in incremental_exact_dedup(d, empty).collect()
    }
    want = {tuple(r) for r in exact_dedup(d).collect()}
    assert got == want and len(got) > 0

    hist = fingerprint(d.filter(F.col("doc_id") % 10 < 7)).select("fingerprint").distinct()
    delta = d.filter(F.col("doc_id") % 10 >= 7)
    surv = incremental_exact_dedup(delta, hist)
    hist_set = {r.fingerprint for r in hist.collect()}
    surv_rows = surv.collect()
    assert all(r.fingerprint not in hist_set for r in surv_rows)
    delta_fps = {r.fingerprint for r in fingerprint(delta).collect()}
    assert {r.fingerprint for r in surv_rows} == delta_fps - hist_set


def test_bipartite_lsh_matches_cross_restriction(spark, sf_dir):
    """Bipartite LSH pairs == the cross-split restriction of the
    self-join LSH pairs (same banding, same buckets)."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_bipartite,
        minhash_signatures,
        shingle_table,
    )
    from patientdataintegration_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(shingle_table(d), k=8, seed=42)
    train = sigs.filter(F.col("doc_id") % 10 < 7)
    crawl = sigs.filter(F.col("doc_id") % 10 >= 7)
    got = {
        (r.left_id, r.right_id)
        for r in lsh_candidate_pairs_bipartite(train, crawl).collect()
    }
    is_train = lambda i: i % 10 < 7
    full = {
        (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs).collect()
    }
    want = {
        (a, b) if is_train(a) else (b, a)
        for a, b in full
        if is_train(a) != is_train(b)
    }
    assert got == want


def test_weighted_sample_favors_heavy_rows(spark):
    """A-ES weighted sampling: a row with overwhelming weight is
    picked in (nearly) every seed's n=1 sample; zero-weight rows are
    never picked; output is partitioning-invariant."""
    from pyspark.sql import functions as F

    from patientdataintegration_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = [("g", i, 1) for i in range(1, 20)] + [("g", 99, 100000), ("g", 100, 0)]
    df = spark.createDataFrame(rows, "lang string, doc_id bigint, n_chars bigint")

    hits = 0
    for seed in range(10):
        got = weighted_sample_per_group(df, n=1, seed=seed).collect()
        assert len(got) == 1
        assert got[0].doc_id != 100  # zero weight excluded
        hits += got[0].doc_id == 99
    assert hits >= 8  # weight 100000 vs 19 × 1

    a = sorted(map(tuple, weighted_sample_per_group(df, n=3, seed=7).collect()))
    b = sorted(
        map(tuple, weighted_sample_per_group(df.repartition(13), n=3, seed=7).collect())
    )
    assert a == b


def test_kmeans_assign_separated_clusters(spark):
    """Two well-separated groups: 2-means recovers them exactly and
    is invariant to input partitioning; points sit at sq_dist 0 from
    their centroid when the group is symmetric around it."""
    from patientdataintegration_spark.operators.clustering import kmeans_assign

    lo = [(i, [0.0 + (i % 2), 0.0]) for i in range(4)]       # around (0.5, 0)
    hi = [(10 + i, [100.0 + (i % 2), 0.0]) for i in range(4)]  # around (100.5, 0)
    df = spark.createDataFrame(lo + hi, "vec_id bigint, embedding array<float>")

    got = {r.vec_id: (r.cluster, r.sq_dist) for r in kmeans_assign(df, k=2, iterations=2).collect()}
    assert {got[i][0] for i in range(4)} == {0}
    assert {got[10 + i][0] for i in range(4)} == {1}
    # symmetric group around (0.5, 0) / (100.5, 0): sq_dist = 0.25
    assert all(got[i][1] == 0.25 for i in got)

    rep = {
        r.vec_id: (r.cluster, r.sq_dist)
        for r in kmeans_assign(df.repartition(7), k=2, iterations=2).collect()
    }
    assert rep == got


def test_paragraph_dedup_stats_hand_computed(spark):
    """Shared 2-token paragraph across docs counts as dup for both;
    unique paragraphs don't."""
    from patientdataintegration_spark.operators.textops import paragraph_dedup_stats

    df = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa bb zz yy"), (3, "qq ww")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.n_paras, r.n_dup_paras, r.dup_ratio)
        for r in paragraph_dedup_stats(df, para_tokens=2).collect()
    }
    assert got == {1: (2, 1, 0.5), 2: (2, 1, 0.5), 3: (1, 0, 0.0)}


def test_pagerank_checkpoint_dir_single_upstream_execution(spark, tmp_path):
    """checkpoint_dir materializes the pair producer ONCE: an
    accumulator-instrumented upstream is executed exactly one time
    (the parquet write), while the unmaterialized path re-executes it
    per iteration; results are identical either way."""
    import pandas as pd

    from patientdataintegration_spark.operators.graph import pagerank

    raw = [(i, i + 1) for i in range(20)] + [(0, 10), (5, 15)]
    base = spark.createDataFrame(raw, "doc_a long, doc_b long")

    def instrumented(acc):
        def gen(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        return base.mapInPandas(gen, "doc_a long, doc_b long")

    acc_ck = spark.sparkContext.accumulator(0)
    ck = pagerank(
        instrumented(acc_ck), iterations=3, checkpoint_dir=str(tmp_path / "pairs")
    ).collect()
    assert acc_ck.value == len(raw), "producer must run exactly once"

    acc_no = spark.sparkContext.accumulator(0)
    plain = pagerank(instrumented(acc_no), iterations=3).collect()
    assert acc_no.value > len(raw), "unmaterialized path re-executes producer"

    assert sorted(map(tuple, ck)) == sorted(map(tuple, plain))


def test_kmeans_checkpoint_dir_matches_unmaterialized(spark, tmp_path):
    from patientdataintegration_spark.operators.clustering import kmeans_assign

    rows = [
        (i, [float(i % 3) * 10 + 0.1 * i, float((i * 7) % 5)]) for i in range(30)
    ]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = kmeans_assign(base, k=3, iterations=2).collect()

    # accumulator-instrumented upstream: with checkpoint_dir the
    # producer must execute exactly once (the parquet write),
    # including the FINAL assignment pass
    acc = spark.sparkContext.accumulator(0)

    def gen(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    instrumented = base.mapInPandas(gen, "vec_id long, embedding array<double>")
    b = kmeans_assign(
        instrumented, k=3, iterations=2, checkpoint_dir=str(tmp_path / "emb")
    ).collect()
    assert acc.value == len(rows), "producer must run exactly once"
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_maintain_components_adversarial_deltas(spark):
    """maintain_components(labels_old, Δ) == full star recompute over
    edges_old ∪ Δ, under every merge class at once: a bridge between
    two old components, a chain stringing THREE old components
    through brand-new nodes, a new node whose id undercuts every old
    member (it must become the merged component's label), an
    internal no-op edge, and a delta-only component of new nodes."""
    from patientdataintegration_spark.operators.dedup import (
        connected_components_star,
        maintain_components,
    )

    # old graph: components {10,11}, {20,21}, {30,31}, {40,41}, {50,51}
    old_edges = spark.createDataFrame(
        [(10, 11), (20, 21), (30, 31), (40, 41), (50, 51)],
        "doc_a bigint, doc_b bigint",
    )
    labels_old = connected_components_star(old_edges)
    delta = spark.createDataFrame(
        [
            (11, 20),   # bridge: {10,11} ∪ {20,21}
            (31, 100),  # chain via new node 100 ...
            (100, 41),  # ... strings {30,31} and {40,41} together
            (5, 50),    # NEW MIN: node 5 < every member of {50,51}
            (40, 41),   # internal no-op (contracts to a self-loop)
            (200, 201), # delta-only component of brand-new nodes
        ],
        "doc_a bigint, doc_b bigint",
    )
    got = maintain_components(labels_old, delta)
    want = connected_components_star(old_edges.unionByName(delta))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    g = dict(got.collect())
    assert g[50] == 5 and g[51] == 5 and g[5] == 5   # new-min relabel
    assert g[30] == g[31] == g[40] == g[41] == g[100] == 30  # chain
    assert g[10] == g[11] == g[20] == g[21] == 10    # bridge
    assert g[200] == 200 and g[201] == 200           # delta-only


def test_maintain_components_all_internal_delta(spark):
    """A delta made ENTIRELY of within-component edges contracts to
    nothing — the early path must return the old labels unchanged
    (plus nothing: no new nodes)."""
    from patientdataintegration_spark.operators.dedup import (
        connected_components_star,
        maintain_components,
    )

    old_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a bigint, doc_b bigint"
    )
    labels_old = connected_components_star(old_edges)
    delta = spark.createDataFrame(
        [(1, 3), (7, 8)], "doc_a bigint, doc_b bigint"
    )
    got = maintain_components(labels_old, delta)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, labels_old.collect())
    )


def test_maintain_components_self_loop_new_node(spark):
    """A self-loop on a brand-new node still registers the node,
    labeled as itself (the full star recompute drops edgeless nodes,
    so this is checked directly, not by equivalence)."""
    from patientdataintegration_spark.operators.dedup import (
        connected_components_star,
        maintain_components,
    )

    old_edges = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    labels_old = connected_components_star(old_edges)
    delta = spark.createDataFrame([(9, 9)], "doc_a bigint, doc_b bigint")
    got = dict(maintain_components(labels_old, delta).collect())
    assert got == {1: 1, 2: 1, 9: 9}


def test_retract_documents_adversarial_deletes(spark):
    """retract_documents(pairs, labels, D) == full star recompute
    over retract_lsh_pairs(pairs, D), under every delete class at
    once: a BRIDGE removal that splits one component into two, a
    CANONICAL (min-id) removal that forces label re-election, a LEAF
    removal that leaves its cluster intact, a WHOLE-cluster wipe, a
    survivor orphaned into edgelessness (drops out of the labeling,
    per the node-coverage contract), and a delete of an id that was
    never clustered (no-op)."""
    from patientdataintegration_spark.operators.dedup import (
        connected_components_star,
        retract_documents,
        retract_lsh_pairs,
    )

    pairs = spark.createDataFrame(
        [
            # path component {1,2,3,4,5}: 3 is a bridge
            (1, 2), (2, 3), (3, 4), (4, 5),
            # component {10,11,12}: 10 is the canonical (min id)
            (10, 11), (10, 12), (11, 12),
            # component {20,21}: wiped entirely
            (20, 21),
            # component {30,31}: 31's ONLY partner is 30 -> orphaned
            (30, 31),
            # untouched component {40,41,42}
            (40, 41), (41, 42),
        ],
        "doc_a bigint, doc_b bigint",
    )
    labels_old = connected_components_star(pairs)
    deleted = spark.createDataFrame(
        [(3,), (10,), (20,), (21,), (30,), (999,)], "doc_id bigint"
    )
    got = retract_documents(pairs, labels_old, deleted)
    want = connected_components_star(retract_lsh_pairs(pairs, deleted))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    g = dict(got.collect())
    assert g[1] == g[2] == 1 and g[4] == g[5] == 4, "bridge delete splits"
    assert g[11] == g[12] == 11, "canonical delete re-elects next min"
    assert 20 not in g and 21 not in g, "wiped cluster vanishes"
    assert 30 not in g and 31 not in g, "orphaned survivor drops out"
    assert g[40] == g[41] == g[42] == 40, "untouched cluster unchanged"
    assert 3 not in g and 10 not in g and 999 not in g


def test_retract_documents_untouched_fastpath_and_pair_view(spark):
    """Deletes that hit NO clustered document leave the labels
    bit-identical (the dirty set is empty, so the star never runs),
    and retract_lsh_pairs removes exactly the touching pairs."""
    from patientdataintegration_spark.operators.dedup import (
        connected_components_star,
        retract_documents,
        retract_lsh_pairs,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (5, 6)], "doc_a bigint, doc_b bigint"
    )
    labels_old = connected_components_star(pairs)
    deleted = spark.createDataFrame([(100,), (200,)], "doc_id bigint")
    got = retract_documents(pairs, labels_old, deleted)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, labels_old.collect())
    )
    kept = retract_lsh_pairs(
        pairs, spark.createDataFrame([(5,)], "doc_id bigint")
    )
    assert sorted(map(tuple, kept.collect())) == [(1, 2)]


def test_maintain_components_delta_composition(spark):
    """maintain_components_delta returns EXACTLY the rows that differ:
    (L ∖-by-node Δrows) ∪ Δrows == maintain_components(L, Δ), and no
    Δrow repeats an unchanged old label — under the full adversarial
    merge battery (bridge, chain through new nodes, new-min relabel,
    internal no-op, delta-only component)."""
    from patientdataintegration_spark.operators.dedup import (
        connected_components_star,
        maintain_components,
        maintain_components_delta,
    )

    old_edges = spark.createDataFrame(
        [(10, 11), (20, 21), (30, 31), (40, 41), (50, 51)],
        "doc_a bigint, doc_b bigint",
    )
    labels_old = connected_components_star(old_edges)
    delta = spark.createDataFrame(
        [(11, 20), (31, 100), (100, 41), (5, 50), (40, 41), (200, 201)],
        "doc_a bigint, doc_b bigint",
    )
    drows = maintain_components_delta(labels_old, delta)
    composed = labels_old.join(
        drows.select("node"), "node", "left_anti"
    ).unionByName(drows)
    want = sorted(map(tuple, maintain_components(labels_old, delta).collect()))
    assert sorted(map(tuple, composed.collect())) == want
    # minimality: every emitted row genuinely differs from labels_old
    old = dict(labels_old.collect())
    for node, label in drows.collect():
        assert old.get(node) != label, f"non-delta row ({node}, {label})"
    # exactly the relabeled members: 20/21 (bridge merges into 10's
    # label), 40/41 + new node 100 (chain merges into 30's label —
    # 30/31 already carry the min), 50/51 + new-min 5, and the
    # delta-only component; minimum-keeping members must NOT appear
    emitted = {n for n, _l in drows.collect()}
    assert emitted == {5, 20, 21, 40, 41, 50, 51, 100, 200, 201}

    # all-internal delta: the delta is EMPTY (nothing changed)
    delta2 = spark.createDataFrame([(10, 11)], "doc_a bigint, doc_b bigint")
    assert maintain_components_delta(labels_old, delta2).isEmpty()


def test_retract_documents_delta_composition(spark):
    """retract_documents_delta's three relations compose back to
    retract_documents, and the tombstones are exactly the nodes that
    leave the labeling (deleted + orphaned survivors) — under the
    full adversarial delete battery."""
    from patientdataintegration_spark.operators.dedup import (
        connected_components_star,
        retract_documents,
        retract_documents_delta,
    )

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4), (4, 5),
            (10, 11), (10, 12), (11, 12),
            (20, 21),
            (30, 31),
            (40, 41), (41, 42),
        ],
        "doc_a bigint, doc_b bigint",
    )
    labels_old = connected_components_star(pairs)
    deleted = spark.createDataFrame(
        [(3,), (10,), (20,), (21,), (30,), (999,)], "doc_id bigint"
    )
    dirty_labels, repaired, tombs = retract_documents_delta(
        pairs, labels_old, deleted
    )
    composed = labels_old.join(
        dirty_labels, "label", "left_semi"
    ).select("node", "label")
    composed = labels_old.join(
        dirty_labels, "label", "left_anti"
    ).select("node", "label").unionByName(repaired)
    want_full = retract_documents(pairs, labels_old, deleted)
    assert sorted(map(tuple, composed.collect())) == sorted(
        map(tuple, want_full.collect())
    )
    want_tombs = {n for n, _l in labels_old.collect()} - {
        n for n, _l in want_full.collect()
    }
    assert {r.node for r in tombs.collect()} == want_tombs
    # orphaned survivor 31 and wiped/deleted 3,10,20,21,30 leave;
    # never-clustered 999 was never a node, so it cannot tombstone
    assert want_tombs == {3, 10, 20, 21, 30, 31}

    # no-op delete: every relation empty
    dl2, rep2, tb2 = retract_documents_delta(
        pairs, labels_old,
        spark.createDataFrame([(999,)], "doc_id bigint"),
    )
    assert dl2.isEmpty() and rep2.isEmpty() and tb2.isEmpty()


def test_retract_exact_dedup_matches_recompute(spark):
    """retract_exact_dedup == exact_dedup over the surviving corpus,
    across the delete classes: the CANONICAL of a group removed
    (re-election), a non-canonical member removed (count drops), a
    group emptied (row leaves the store), untouched groups verbatim,
    and a takedown id with no stored fingerprint (no-op)."""
    from patientdataintegration_spark.operators.dedup import (
        exact_dedup,
        retract_exact_dedup,
    )
    from patientdataintegration_spark.operators.textops import fingerprint

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"), (2, "alpha beta"), (3, "alpha beta"),
            (10, "gamma"), (11, "gamma"),
            (20, "delta"),
            (30, "epsilon"), (31, "epsilon"),
        ],
        "doc_id bigint, text string",
    )
    store_old = exact_dedup(docs)
    doc_fps = fingerprint(docs).select("doc_id", "fingerprint")
    # delete: 1 (canonical of the alpha group), 11 (non-canonical of
    # gamma), 20 (empties the delta group), 999 (never stored)
    deleted = spark.createDataFrame(
        [(1,), (11,), (20,), (999,)], "doc_id bigint"
    )
    got = retract_exact_dedup(store_old, doc_fps, deleted)
    survivors = docs.join(deleted, "doc_id", "left_anti")
    want = exact_dedup(survivors)
    key = lambda df: sorted(
        (r["fingerprint"], r["canonical_id"], r["n_docs"])
        for r in df.collect()
    )
    assert key(got) == key(want)
    by_canon = {r["canonical_id"]: r["n_docs"] for r in got.collect()}
    assert by_canon[2] == 2, "canonical re-elects to next min id"
    assert by_canon[10] == 1, "non-canonical delete just drops the count"
    assert 20 not in by_canon, "emptied group leaves the store"
    assert by_canon[30] == 2, "untouched group passes through"


def test_retract_ivf_absence_and_rebuild_identity(spark):
    """ANN-index erasure: after retract_ivf (a) no deleted vector
    appears in ANY probe's top-k, (b) search over the retracted
    index is BIT-IDENTICAL to a rebuild over the survivors against
    the same frozen centroids (so recall vs brute on survivors is
    unchanged by construction), and (c) an emptied cell keeps its
    centroid without breaking the probe ranking."""
    from patientdataintegration_spark.operators.clustering import _assign
    from patientdataintegration_spark.operators.similarity import (
        ivf_index_exact,
        ivf_search,
        retract_ivf,
    )
    from pyspark.sql import functions as F

    # 3 tight groups of 4 vectors; ids 0..11; group g at axis g
    rows = []
    for g in range(3):
        for j in range(4):
            v = [0.0] * 6
            v[g] = 10.0
            v[g + 3] = 1.0 + j  # spread within the group
            rows.append((g * 4 + j, v))
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    assigned, centroids = ivf_index_exact(e, n_cells=3, iterations=3)

    # delete one whole group (ids 4..7 -> empties its cell) plus one
    # member of another (id 1)
    deleted = spark.createDataFrame(
        [(1,), (4,), (5,), (6,), (7,)], "vec_id bigint"
    )
    maintained = retract_ivf(assigned, deleted)
    gone = {1, 4, 5, 6, 7}
    assert {r.neighbor_id for r in maintained.collect()}.isdisjoint(gone)
    # centroid table untouched: the emptied cell's centroid remains
    assert centroids.count() == 3

    got = ivf_search(e, maintained, centroids, k=3, n_probe=3)
    assert not {r.neighbor_id for r in got.collect()} & gone, (
        "a deleted vector surfaced in a probe's top-k"
    )

    # bit-identity with a fresh assignment of the SURVIVORS against
    # the same frozen centroids
    surv = e.join(deleted, "vec_id", "left_anti")
    emb = surv.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = centroids.select(
        F.col("cell").alias("c"), F.col("centroid").alias("cv")
    )
    rebuilt = _assign(emb, cent, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("c_vec"),
        F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)
        ).alias("c_norm"),
        F.col("c").alias("cell"),
    )
    want = ivf_search(e, rebuilt, centroids, k=3, n_probe=3)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
