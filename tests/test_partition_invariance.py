"""Partitioning-invariance of the exactness contract: the suite's
FP-sensitive queries (decimal sums feeding ratios, rounded libm
outputs, windowed statistics) must produce BIT-IDENTICAL results when
the shuffle partition count — and hence every accumulation order —
changes. This is the same property the DuckDB hash gate checks
cross-engine, pinned here cross-PARTITIONING within Spark: if a query
passes only at one partition count, its "exact" claim is luck."""

from __future__ import annotations

import pytest

# the most accumulation-order-exposed oracle-backed queries, one per
# exactness mechanism
QUERIES_UNDER_TEST = [
    "q01_pricing_summary",      # decimal money sums
    "q45_full_pipeline",        # full-lifecycle DAG, metrics stack
    "q121_resample_interp",     # window interpolation arithmetic
    "q133_ewma",                # sequential fold, rounded output
    "q139_correlation_matrix",  # decimal moment sums -> ratios
    "q141_group_trend",         # OLS closed form, -0.0 normalized
    "q162_product_profit",      # decimal difference sums
    "q169_important_share",     # mean-relative threshold cut
    "q172_triangle_count",      # integer graph statistics
    "q177_rolling_correlation", # integer window sufficient stats
    # round-5 additions, one per new exactness mechanism
    "q185_local_clustering",    # per-vertex ratio of exact integers
    "q188_bpe_pair_counts",     # TakeOrdered prefix with unique tiebreak
    "q190_minhash_error",       # md5 sketch vs exact-set division
    "q191_bigram_surprisal",    # round-ln-then-decimal-sum (bigram LM)
    "q192_random_projection",   # sequential array fold, raw doubles
    "q198_grouped_agg_pandas",  # numpy quantiles in grouped-agg UDFs
    "q200_corpus_curation",     # the five-stage composite end to end
]


def _canonical(df):
    rows = df.collect()
    cols = sorted(df.columns)
    return sorted(
        tuple(repr(r[c]) for c in cols) for r in rows
    )


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_bit_identical_across_shuffle_partitionings(spark, sf_dir, name):
    from patientdataintegration_spark.suite import QUERIES

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _canonical(QUERIES[name](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = _canonical(QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
