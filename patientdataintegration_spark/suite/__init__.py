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
round 2 checked the events lane + the LLM-pipeline lane (text,
dedup, similarity, tokenization). The round-3 window holds
(a) the 8 queries that were red in r2 (6 NTZ-timestamp ERRs + the
q74 oracle-typing and q110 output-typing fixes), to prove the fixes
green, (b) every SQL-oracle-backed query never yet inside a window
(q113-q123 were added after the r2 registry freeze; q60-q73 oddments
were r1 spillover), (c) the rows-only lanes (streaming, ML,
multimodal — weaker rows-only driver rows, pytest covers their
semantics) so they get first-ever driver evidence, and (d) events-
lane re-proof rows, since the NTZ cast rewrote every events scan.
Previously-green queries stay registered after the priority block;
their evidence is CORRECTNESS_r01/r02.json.
"""

from patientdataintegration_spark.suite.core import ORACLES as CORE_ORACLES
from patientdataintegration_spark.suite.core import QUERIES as CORE_QUERIES
from patientdataintegration_spark.suite.ext import ORACLES as EXT_ORACLES
from patientdataintegration_spark.suite.ext import QUERIES as EXT_QUERIES
from patientdataintegration_spark.suite.ext2 import ORACLES as EXT2_ORACLES
from patientdataintegration_spark.suite.ext2 import QUERIES as EXT2_QUERIES

_ALL_QUERIES = {**CORE_QUERIES, **EXT_QUERIES, **EXT2_QUERIES}
_ALL_ORACLES = {**CORE_ORACLES, **EXT_ORACLES, **EXT2_ORACLES}

# The driver-checked prefix, by design exactly 50 names (round-3
# rotation: r2 reds re-proven, then everything never yet checked).
PRIORITY = [
    # (a) red in r2 — 6 NTZ-timestamp ERRs + q74 oracle typing +
    # q110 output typing, all fixed this round; prove them green
    "q28_asof_join",
    "q42_sessionize",
    "q47_interval_join",
    "q74_funnel",
    "q101_upsert_merge",
    "q102_time_weighted_avg",
    "q110_inverted_index",
    # (b) SQL-oracle-backed, never inside a window: post-freeze
    # additions (salted skew join, incremental rollup/dedup, star CC,
    # bucketed zero-shuffle join, profiler, cross-corpus LSH, mixture
    # lane, resampling, vocab coverage) + r1 spillover oddments
    "q113_salted_join",
    "q114_incremental_rollup",
    "q115_components_star",
    "q116_bucketed_join",
    "q117_incremental_dedup",
    "q118_profile",
    "q119_crosscorpus_neardup",
    "q120_mixture_weights",
    "q121_resample_interp",
    "q122_realize_mixture",
    "q123_vocab_coverage",
    "q60_explode_vocab",
    "q62_moving_frame",
    "q66_nation_volume",
    "q67_market_share",
    "q70_multi_distinct",
    "q71_first_nth_value",
    "q73_quality_checks",
    # (c) never driver-checked: q85 (upgraded to a full SQL oracle
    # this round) + rows-only lanes (no SQL oracle — pytest covers
    # semantics; a rows-only driver row beats none)
    "q85_session_window",
    "q104_audio_metadata",
    "q96_stream_sessionize",
    # (d) operators added this round (all SQL-oracle-backed) —
    # driver-unproven is the gap that bit round 2, so new queries
    # enter the window immediately, displacing stream lanes whose
    # batch twins are hash-checked and stream==batch pytest-pinned
    "q124_asof_forward",
    "q125_asof_nearest",
    "q126_sparse_cosine_pairs",
    "q127_weighted_sample",
    "q128_scd2_history",
    "q129_robust_stats",
    "q130_pagerank",
    "q131_paragraph_dedup",
    "q132_kmeans_assign",
    "q133_ewma",
    "q134_source_kl",
    "q135_session_funnel",
    "q136_growth_accounting",
    "q137_fuzzy_join",
    "q138_reachability",
    "q139_correlation_matrix",
    "q140_mutual_information",
    "q141_group_trend",
    "q142_dedup_impact",
    "q143_histogram",
    "q144_event_pmi",
    # (e) the flagship pipeline under the rewritten events scans
    # (q63/q48 dropped: q101 subsumes the latest-per-key NTZ re-proof
    # and q48's output is all-scalar since r2, so its struct-canary
    # role is moot)
    "q45_full_pipeline",
]

_missing = [n for n in PRIORITY if n not in _ALL_QUERIES]
if _missing:
    raise RuntimeError(f"PRIORITY names not registered: {_missing}")

QUERIES = {name: _ALL_QUERIES[name] for name in PRIORITY}
QUERIES.update(
    {name: fn for name, fn in _ALL_QUERIES.items() if name not in QUERIES}
)
ORACLES = dict(_ALL_ORACLES)
