"""Property-based batteries for the inverted-index CRUD verbs and
phrase retrieval: randomized small corpora and op sequences against
the from-scratch oracle — the hand batteries in
tests/test_etl_operators.py pin the named adversarial cases (at-cap
re-admission, displacement, below-min_df drops); these sweeps cover
the combinatorial space around them (random caps, random overlaps,
random batch splits)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

VOCAB = ["a", "b", "c", "d", "e"]

# one doc = 0..6 tokens from a 5-term vocab (duplicates allowed —
# tf > 1 and multi-position phrases arise naturally)
_doc = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=6)
_corpus = st.lists(_doc, min_size=1, max_size=12)
_cap = st.sampled_from([1, 2, 3, None])


def _df(spark, docs, ids):
    return spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in zip(ids, docs)],
        "doc_id bigint, text string",
    )


def _norm(pair):
    index, overflow = pair
    return (
        sorted((r["term"], r["doc_freq"], tuple(r["postings"]))
               for r in index.collect()),
        sorted((r["term"], r["doc"]) for r in overflow.collect()),
    )


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus, split=st.integers(0, 11), cap=_cap)
def test_extend_equals_rebuild_over_union(spark, corpus, split, cap):
    """extend(seed over prefix, batch = suffix) == build(whole
    corpus), both relations, for every cap — including empty seeds,
    empty batches, and terms crossing the cap in either direction."""
    from patientdataintegration_spark.operators.indexing import (
        extend_inverted_index,
        inverted_index_with_overflow,
    )

    split = min(split, len(corpus))
    ids = list(range(len(corpus)))
    seed = _df(spark, corpus[:split], ids[:split])
    batch = _df(spark, corpus[split:], ids[split:])
    index, overflow = inverted_index_with_overflow(
        seed, min_df=1, max_postings=cap
    )
    got = _norm(extend_inverted_index(index, overflow, batch, max_postings=cap))
    want = _norm(
        inverted_index_with_overflow(
            _df(spark, corpus, ids), min_df=1, max_postings=cap
        )
    )
    assert got == want


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    corpus=_corpus,
    delete_mask=st.lists(st.booleans(), min_size=12, max_size=12),
    cap=_cap,
    min_df=st.sampled_from([1, 2]),
)
def test_retract_equals_rebuild_over_survivors(spark, corpus, delete_mask, cap, min_df):
    """retract(store, random delete set) == build(survivors), both
    relations, for every (cap, min_df) — including full wipes and
    deletes that empty a term or drop it below min_df."""
    from patientdataintegration_spark.operators.indexing import (
        inverted_index_with_overflow,
        retract_inverted_index,
    )

    ids = list(range(len(corpus)))
    deleted_ids = [i for i in ids if delete_mask[i]]
    full = _df(spark, corpus, ids)
    index, overflow = inverted_index_with_overflow(
        full, min_df=min_df, max_postings=cap
    )
    deleted = spark.createDataFrame(
        [(i,) for i in deleted_ids] or [(-(10 ** 6),)], "doc_id bigint"
    )
    got = _norm(
        retract_inverted_index(
            index, overflow, deleted, min_df=min_df, max_postings=cap
        )
    )
    survivors = [(c, i) for c, i in zip(corpus, ids) if i not in set(deleted_ids)]
    want = _norm(
        inverted_index_with_overflow(
            _df(spark, [c for c, _ in survivors], [i for _, i in survivors]),
            min_df=min_df,
            max_postings=cap,
        )
    )
    assert got == want


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus, ta=st.sampled_from(VOCAB), tb=st.sampled_from(VOCAB))
def test_phrase_retrieval_matches_python_scan(spark, corpus, ta, tb):
    """phrase_retrieval == a per-doc Python adjacency scan, including
    overlapping matches and ta == tb phrases."""
    from patientdataintegration_spark.operators.indexing import (
        phrase_retrieval,
        positional_postings,
    )

    ids = list(range(len(corpus)))
    pos = positional_postings(_df(spark, corpus, ids))
    pairs = spark.createDataFrame([(ta, tb)], "term_a string, term_b string")
    got = sorted(
        (r["doc"], r["pos"]) for r in phrase_retrieval(pos, pairs).collect()
    )
    want = sorted(
        (i, p + 1)
        for i, toks in zip(ids, corpus)
        for p in range(len(toks) - 1)
        if toks[p] == ta and toks[p + 1] == tb
    )
    assert got == want
