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
entries per round), so the prefix is ROTATED each round to extend
cumulative coverage. Round 1 checked the core §2 operator queries
(q01-q29, q42-q65: 42 green; the 8 events-lane reds were the
vanilla-session nanos conf, fixed in `catalog.load_table`). The
round-2 window therefore holds (a) the 8 events-lane queries, to
prove the fix green, and (b) 42 queries never yet inside a window —
the whole LLM-pipeline lane (text, dedup, similarity, tokenization)
plus every operator added since. Previously-green queries stay
registered after the priority block; their evidence is
CORRECTNESS_r01.json. Lanes with no SQL oracle (streaming, ML,
multimodal) park at the end, where a missing row costs least —
pytest covers their semantics.
"""

from patientdataintegration_spark.suite.core import ORACLES as CORE_ORACLES
from patientdataintegration_spark.suite.core import QUERIES as CORE_QUERIES
from patientdataintegration_spark.suite.ext import ORACLES as EXT_ORACLES
from patientdataintegration_spark.suite.ext import QUERIES as EXT_QUERIES

_ALL_QUERIES = {**CORE_QUERIES, **EXT_QUERIES}
_ALL_ORACLES = {**CORE_ORACLES, **EXT_ORACLES}

# The driver-checked prefix, by design exactly 50 names (round-2
# rotation: events lane + everything not yet oracle-checked).
PRIORITY = [
    # events lane (TIMESTAMP(NANOS) read + window/asof/interval ops)
    # — red in r01 for the session-conf reason above, now fixed
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
    "q39_events_sliding",
    "q40_embedding_neardup",
    "q41_winnowing_fp",
    "q46_tfidf_top_terms",
    "q72_regex_tokens",
    "q92_minhash_lsh_pairs",
    "q93_lsh_cosine_topk",
    "q105_repetition_signals",
    "q106_token_budget_sample",
    # consolidation batteries (fusion C5-C7, grouping, subqueries,
    # window functions, type/variant handling)
    "q77_fusion_battery",
    "q78_grouping_battery",
    "q79_subquery_battery",
    "q80_window_battery",
    "q103_variant_battery",
    # operators added after the round-1 window closed
    "q81_chunking",
    "q82_token_rarity",
    "q83_contamination",
    "q84_quantize_embeddings",
    "q87_multires_rollup",
    "q100_redaction",
    "q101_upsert_merge",
    "q102_time_weighted_avg",
    "q107_jsonl_roundtrip",
    "q108_sequence_packing",
    "q109_shard_manifest",
    "q110_inverted_index",
    "q111_zorder_layout",
    "q112_winsorize",
    # remaining never-checked standalone operators
    "q68_array_battery",
    "q69_forward_fill",
    "q74_funnel",
    "q75_retention_cohorts",
    "q76_stratified_sample",
]

_missing = [n for n in PRIORITY if n not in _ALL_QUERIES]
if _missing:
    raise RuntimeError(f"PRIORITY names not registered: {_missing}")

QUERIES = {name: _ALL_QUERIES[name] for name in PRIORITY}
QUERIES.update(
    {name: fn for name, fn in _ALL_QUERIES.items() if name not in QUERIES}
)
ORACLES = dict(_ALL_ORACLES)
