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
- the only rounded outputs are stddev (A11) and cosine similarity /
  fusion scores, rounded to 6/4 digits where accumulation order (or
  libm last-ulp) genuinely differs.

Registration order is an explicit PRIORITY list: the driver's
correctness harness checks a bounded prefix of the registry (50
entries in round 1), so the prefix must cover every SURVEY §2
operator family AND the LLM-pipeline lane (dedup, similarity, text,
fusion). Batteries (q77-q80) consolidate families that would
otherwise overflow the window; the standalone member queries stay
registered after the priority block for direct use. Lanes with no
SQL oracle (streaming, ML, multimodal) park at the end, where a
missing row costs least — pytest covers their semantics.
"""

from patientdataintegration_spark.suite.core import ORACLES as CORE_ORACLES
from patientdataintegration_spark.suite.core import QUERIES as CORE_QUERIES
from patientdataintegration_spark.suite.ext import ORACLES as EXT_ORACLES
from patientdataintegration_spark.suite.ext import QUERIES as EXT_QUERIES

_ALL_QUERIES = {**CORE_QUERIES, **EXT_QUERIES}
_ALL_ORACLES = {**CORE_ORACLES, **EXT_ORACLES}

# The driver-checked prefix, by design exactly 50 names:
# §2 core operators, the flagship pipeline, the events lane, the
# LLM-data-pipeline lane, and the consolidation batteries.
PRIORITY = [
    # §2 core operator queries (imputation, encodings, splits,
    # sampling, metrics, fusion, unions, top-k, path parsing)
    "q01_pricing_summary",
    "q02_group_scores",
    "q03_balanced_accuracy",
    "q04_auroc",
    "q05_mean_std_over_folds",
    "q06_impute_mean",
    "q07_impute_mode",
    "q08_scale01",
    "q09_onehot",
    "q10_bucketize",
    "q11_fold_assignment",
    "q12_balance_audit",
    "q13_sample_per_group",
    "q14_union_cohorts",
    "q15_topk_per_group",
    "q16_naive_fusion",
    "q17_threshold_sweep",
    "q18_semi_anti_join",
    "q19_set_ops",
    "q23_distinct_agg",
    "q24_shipping_priority",
    "q26_path_parsing",
    "q45_full_pipeline",
    # events lane (TIMESTAMP(NANOS) read + window/asof/interval ops)
    "q21_window_lag",
    "q22_running_best",
    "q28_asof_join",
    "q29_json_props",
    "q42_sessionize",
    "q47_interval_join",
    "q48_metric_map",
    "q63_latest_per_key",
    # LLM-data-pipeline lane: text, dedup, similarity, tokenization
    "q30_token_stats",
    "q31_lang_id",
    "q32_exact_dedup",
    "q33_ngram_jaccard",
    "q34_minhash_signatures",
    "q35_simhash",
    "q36_cosine_topk",
    "q37_events_tumbling",
    "q38_quality_filter",
    "q40_embedding_neardup",
    "q41_winnowing_fp",
    "q46_tfidf_top_terms",
    "q72_regex_tokens",
    "q92_minhash_lsh_pairs",
    "q93_lsh_cosine_topk",
    # consolidation batteries (fusion C5-C7, grouping, subqueries,
    # window functions)
    "q77_fusion_battery",
    "q78_grouping_battery",
    "q79_subquery_battery",
    "q80_window_battery",
]

_missing = [n for n in PRIORITY if n not in _ALL_QUERIES]
if _missing:
    raise RuntimeError(f"PRIORITY names not registered: {_missing}")

QUERIES = {name: _ALL_QUERIES[name] for name in PRIORITY}
QUERIES.update(
    {name: fn for name, fn in _ALL_QUERIES.items() if name not in QUERIES}
)
ORACLES = dict(_ALL_ORACLES)
