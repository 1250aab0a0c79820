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
The round-4 window holds (a) the two r3 hash-fails re-proven after
their oracle-normalization fixes (q42 HUGEINT cast, q141 -0.0),
(b) the 10 lanes that have NEVER had a driver row in any round
(q86, q88-q91, q94, q95, q97-q99; q86 gained a recursive-CTE oracle
and q98 a deterministic-quantizer oracle in r4 — full hash rows; the
other eight have no SQL oracle by nature — rows-only; this completes
ever-checked = all registered), (c) the 14 new r4
queries (q145-q158: equi-depth histogram, pivot, retention,
transitions, percentiles, orphan audit, streaks, WoW, snapshot
diff, A/B z-score, column entropy, quality verdict, semantic dedup,
best-split screening — the last six take the final fill slots),
(d) re-proof rows for
queries whose text or operator changed this round (q127 priority
rounding, q143 degenerate-bin guard, q134/q139/q140 -0.0 sweep,
q130/q132 checkpoint_dir refactor), and (e) the flagship plus the
oldest-evidence r1 block (q01-q26 families, last checked r1) for
freshness. Previously-green queries stay registered after the
priority block; their evidence is CORRECTNESS_r01-r03.json.
"""

from patientdataintegration_spark.suite.core import ORACLES as CORE_ORACLES
from patientdataintegration_spark.suite.core import QUERIES as CORE_QUERIES
from patientdataintegration_spark.suite.ext import ORACLES as EXT_ORACLES
from patientdataintegration_spark.suite.ext import QUERIES as EXT_QUERIES
from patientdataintegration_spark.suite.ext2 import ORACLES as EXT2_ORACLES
from patientdataintegration_spark.suite.ext2 import QUERIES as EXT2_QUERIES

_ALL_QUERIES = {**CORE_QUERIES, **EXT_QUERIES, **EXT2_QUERIES}
_ALL_ORACLES = {**CORE_ORACLES, **EXT_ORACLES, **EXT2_ORACLES}

# The driver-checked prefix, by design exactly 50 names (round-4
# rotation: see module docstring).
PRIORITY = [
    # (a) r3 hash-fails, fixed this round — prove them green
    "q42_sessionize",
    "q141_group_trend",
    # (b) never-driver-checked lanes — completes ever-checked
    # coverage of the registry. q86 (recursive-CTE twin) and q98
    # (deterministic-quantizer IVF) are fully oracle-checked as of
    # r4; the rest have no SQL oracle by nature (rows-only; pytest
    # pins their semantics)
    "q86_dedup_clusters",
    "q88_stream_static_enrich",
    "q89_stream_dedup",
    "q90_stream_tumbling",
    "q91_multimodal_features",
    "q94_random_forest",
    "q95_approx_distinct",
    "q97_batch_inference",
    "q98_ivf_cosine_topk",
    "q99_stream_stream_join",
    # (c) new round-4 operators (all SQL-oracle-backed)
    "q145_equidepth_histogram",
    "q146_pivot_lang",
    "q147_retention_cohorts",
    "q148_markov_transitions",
    "q149_percentiles",
    "q150_orphan_audit",
    "q151_activity_streaks",
    "q152_wow_change",
    # (d) query text or operator changed this round — re-prove
    "q127_weighted_sample",
    "q143_histogram",
    "q134_source_kl",
    "q139_correlation_matrix",
    "q140_mutual_information",
    "q130_pagerank",
    "q132_kmeans_assign",
    # (e) flagship + oldest-evidence r1 block (last checked round 1)
    "q45_full_pipeline",
    "q01_pricing_summary",
    "q02_group_scores",
    "q03_balanced_accuracy",
    "q04_auroc",
    "q05_mean_std_over_folds",
    "q06_impute_mean",
    "q07_impute_mode",
    "q11_fold_assignment",
    "q12_balance_audit",
    "q16_naive_fusion",
    "q159_xml_roundtrip",
    # operators/oracles changed late in r4 (cos_sim -0.0 sweep, the
    # vocab-coverage local-prune, the shingle pre-cap) — re-prove
    # under the driver hash rather than only the local gate; displaces
    # five r1-era re-proof fills (q08-q10, q14, q15 stay green in r01)
    "q33_ngram_jaccard",
    "q36_cosine_topk",
    "q40_embedding_neardup",
    "q93_lsh_cosine_topk",
    "q123_vocab_coverage",
    # batch-2/3 additions take the last six fill slots: zero driver
    # evidence beats r1 re-proof (r1 rows stand in CORRECTNESS_r01)
    "q153_snapshot_diff",
    "q154_abtest_zscore",
    "q155_column_entropy",
    "q156_quality_verdict",
    "q157_semantic_dedup",
    "q158_best_split",
]

_missing = [n for n in PRIORITY if n not in _ALL_QUERIES]
if _missing:
    raise RuntimeError(f"PRIORITY names not registered: {_missing}")

QUERIES = {name: _ALL_QUERIES[name] for name in PRIORITY}
QUERIES.update(
    {name: fn for name, fn in _ALL_QUERIES.items() if name not in QUERIES}
)
ORACLES = dict(_ALL_ORACLES)
