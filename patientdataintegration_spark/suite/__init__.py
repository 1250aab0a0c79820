"""The engine's named query suite — SURVEY.md §2 operator inventory
re-expressed over the driver's star schema, each with an ANSI-SQL
oracle twin for the DuckDB correctness gate.

Exactness contract (why results hash-match bit-for-bit across
engines and partitionings):

- sums of money-like doubles go through `CAST(x AS DECIMAL(18,4))`
  — decimal addition is exact and order-independent, then one
  deterministic cast back to double;
- "score" columns are integer-valued doubles (`FLOOR(x*1000)`), so
  their sums/averages are exact in double precision;
- rank statistics (AUROC) only depend on score *order* plus sums of
  integers/halves — exact below 2^53;
- rounded outputs (stddev, cosine/fusion scores, ln-based terms —
  tf-idf, surprisal, KL, MI — EWMA, correlations, OLS trends) round
  to 4-9 digits where accumulation order or libm last-ulp genuinely
  differs; ln-term and dot-product SUMS route through DECIMAL casts
  first so only the final scalar step carries FP;
- rounded values must not be able to land ON a decimal boundary:
  finite-decimal weights over finite-decimal inputs do exactly that,
  and Spark/DuckDB round such doubles in different directions (the
  q133 EWMA lesson — its alpha is 1/3 for this reason).

Registration order is an explicit PRIORITY list: the driver's
correctness harness checks a bounded prefix of the registry (50
entries per round), so the prefix is ROTATED each round to extend
cumulative coverage. Round 1 checked the core §2 operator queries;
round 2 the events + LLM-pipeline lanes; round 3 the r2 reds, the
post-freeze additions (q113-q144), and first rows-only evidence.
Round 4 rotated in the two r3 hash-fails (re-proven green), the 10
never-checked rows-only lanes (completing ever-checked coverage of
the then-registry), the q145-q158 additions, and the r4 re-proof
set — see CORRECTNESS_r04.json.

The round-5 window holds (a) q176-q184, which postdate the frozen r4
window and have never had a driver row (the r4 verdict's item 3 —
this restores ever-checked = all registered), (b) the seven new r5
queries q185-q191 (per-vertex triangle clustering, market-basket
association rules, k-anonymity audit, BPE adjacent-pair counts,
k-core peeling, MinHash estimation error, bigram-LM surprisal),
(c) re-proof rows for every query whose text or operator changed in
r5 (q33 cap-strategy default, q94 summary strip, q130/q138
content-keyed edge cache, q160 unique tiebreak, q172 degree
orientation), and (d) a longest-unchecked rotation of r1/r2-era
rows. Previously-green queries stay registered after the priority
block; their evidence is CORRECTNESS_r01-r04.json plus the committed
full-registry ORACLE_RUN logs.
"""

from patientdataintegration_spark.suite.core import ORACLES as CORE_ORACLES
from patientdataintegration_spark.suite.core import QUERIES as CORE_QUERIES
from patientdataintegration_spark.suite.ext import ORACLES as EXT_ORACLES
from patientdataintegration_spark.suite.ext import QUERIES as EXT_QUERIES
from patientdataintegration_spark.suite.ext2 import ORACLES as EXT2_ORACLES
from patientdataintegration_spark.suite.ext2 import QUERIES as EXT2_QUERIES
from patientdataintegration_spark.suite.ext3 import ORACLES as EXT3_ORACLES
from patientdataintegration_spark.suite.ext3 import QUERIES as EXT3_QUERIES
from patientdataintegration_spark.suite.ext4 import ORACLES as EXT4_ORACLES
from patientdataintegration_spark.suite.ext4 import QUERIES as EXT4_QUERIES
from patientdataintegration_spark.suite.ext5 import ORACLES as EXT5_ORACLES
from patientdataintegration_spark.suite.ext5 import QUERIES as EXT5_QUERIES

_ALL_QUERIES = {
    **CORE_QUERIES,
    **EXT_QUERIES,
    **EXT2_QUERIES,
    **EXT3_QUERIES,
    **EXT4_QUERIES,
    **EXT5_QUERIES,
}
_ALL_ORACLES = {
    **CORE_ORACLES,
    **EXT_ORACLES,
    **EXT2_ORACLES,
    **EXT3_ORACLES,
    **EXT4_ORACLES,
    **EXT5_ORACLES,
}

# The driver-checked prefix, by design exactly 50 names (round-4
# rotation: see module docstring).
PRIORITY = [
    # (a) never driver-checked: q176-q184 postdate the fixed r4
    # window (r4 verdict item 3) — rotating them in completes
    # ever-checked coverage of the registry. q180 (streaming CDC
    # sink) and q181 (video) are rows-only by nature.
    "q176_last_touch_attribution",
    "q177_rolling_correlation",
    "q178_pareto_frontier",
    "q179_ordered_stringagg",
    "q180_stream_cdc_upsert",
    "q181_video_frames",
    "q182_udtf_chunking",
    "q183_hierarchical_shares",
    "q184_top_session_paths",
    # (b) new round-5 queries (q185-q191: per-vertex clustering,
    # market-basket rules, k-anonymity, BPE pair counts, k-core,
    # minhash error, bigram surprisal) — all SQL-oracle-backed
    "q185_local_clustering",
    "q186_market_basket",
    "q187_k_anonymity",
    "q188_bpe_pair_counts",
    "q189_kcore",
    "q190_minhash_error",
    "q191_bigram_surprisal",
    # (c) operator or query text changed in round 5 — re-prove:
    # q33 (cap strategy default), q94 (summary strip), q130/q138
    # (content-keyed edge cache), q160 (unique tiebreak), q172
    # (degree orientation + localCheckpoint), q182 (UDTF NULL fix,
    # also in block a)
    "q33_ngram_jaccard",
    "q94_random_forest",
    "q130_pagerank",
    "q138_reachability",
    "q160_min_cost_supplier",
    "q172_triangle_count",
    # (b cont.) late-r5 additions: SRP signatures, image dHash +
    # banded near-dup (rows-only binary lanes), the custom Python
    # DataSource batch + streaming lanes, and the three sanctioned
    # pandas-UDF API surfaces (scalar / grouped-agg / applyInPandas)
    "q192_random_projection",
    "q193_image_dhash",
    "q194_dhash_neardup",
    "q195_python_datasource",
    "q196_python_stream_source",
    "q197_pandas_udf_scalar",
    "q198_grouped_agg_pandas",
    "q199_apply_in_pandas",
    # (d) longest-unchecked rotation: r1/r2-era rows whose last
    # driver evidence predates every later window
    "q01_pricing_summary",
    "q02_group_scores",
    "q04_auroc",
    "q05_mean_std_over_folds",
    "q06_impute_mean",
    "q11_fold_assignment",
    "q12_balance_audit",
    "q16_naive_fusion",
    "q24_shipping_priority",
    "q28_asof_join",
    "q36_cosine_topk",
    "q45_full_pipeline",
    "q115_components_star",
    # (b cont.) the r5 stream-stream LEFT OUTER lane (rows-only;
    # its batch-twin parity is pinned in pytest) and the flagship
    # composite — quality gate, exact
    # dedup, LSH near-dup removal, token-budget sampling as ONE
    # hash-checked DAG (its LSH machinery re-proves q92's)
    "q200_corpus_curation",
    "q201_stream_outer_join",
    # (b cont.) ANN ground-truth baseline + recall audit
    "q202_bruteforce_topk",
    "q203_ann_recall",
    "q204_ks_drift",
    # (b cont.) binary-lane oracle UPGRADES: audio header metadata
    # and PNG pixel decode hash-checked against closed-form replays
    "q205_audio_metadata_exact",
    "q206_image_decode_exact",
]

_missing = [n for n in PRIORITY if n not in _ALL_QUERIES]
if _missing:
    raise RuntimeError(f"PRIORITY names not registered: {_missing}")

QUERIES = {name: _ALL_QUERIES[name] for name in PRIORITY}
QUERIES.update(
    {name: fn for name, fn in _ALL_QUERIES.items() if name not in QUERIES}
)
ORACLES = dict(_ALL_ORACLES)
