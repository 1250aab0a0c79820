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

Round 5 rotated in q176-q191 (restoring ever-checked = all
registered), the r5 re-proof set, and late-r5 additions q192-q206 —
see CORRECTNESS_r05.json.

The round-6 window holds (a) the twenty-four new r6 queries
q207-q231 (embedding near-dup dedup pipeline, TPC-H
Q21/Q22/Q17/Q7/Q8 shapes, exact grouped median, join-key skew
audit, native pivot, SCD2 history, sweep-line max-concurrency,
blocked fuzzy string join, time-weighted averages, native
session_window, salted skew join, mapInArrow byte stats, RF
quality verdict, TPC-H Q11/Q18/Q19 shapes, trailing interval
RANGE frame, SQL-UDF macros, correlated LATERAL top-k, FULL
OUTER stream-stream join), (b) re-proof
rows for everything the r6 fixes touched (q193/q194: integer dHash
grid + cross-multiplied oracle; q195: pushdown conf now set at
source registration; q206: same PNG decode family), (c) q63 per the
r5 verdict (last driver evidence was an r2 err), and (d) the r1-era residue
minus its fourteen youngest rows (q49-q59/q61/q64/q65 — they queue for r7 with the
oldest r2-era rows; never-checked new queries outrank
longest-unchecked fill). Previously-green queries stay registered
after the priority block; their evidence is
CORRECTNESS_r01-r05.json plus the committed full-registry
ORACLE_RUN logs.
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
    # (a) never driver-checked: the round-6 batch, all
    # SQL-oracle-backed — embedding near-dup pipeline q207, classic
    # plan shapes q208-q213, and the warehouse/time-series set
    # q214-q231 (SCD2, sweep-line concurrency, blocked fuzzy join,
    # TPC-H Q7/Q8, TWAP, native session_window, salted skew join)
    "q207_embedding_neardup_clusters",
    "q208_sole_late_supplier",
    "q209_rich_idle_customers",
    "q210_token_count_median",
    "q211_join_key_skew",
    "q212_status_pivot",
    "q213_small_qty_revenue",
    "q214_scd2_history",
    "q215_max_concurrency",
    "q216_fuzzy_name_match",
    "q217_nation_trade_matrix",
    "q218_market_share",
    "q219_time_weighted_avg",
    "q220_native_session_window",
    "q221_salted_join",
    "q222_arrow_byte_stats",
    "q224_rf_quality_verdict",
    "q225_revenue_concentration",
    "q226_large_volume_orders",
    "q227_disjunctive_revenue",
    "q228_trailing_hour_frame",
    "q229_sql_udf_macros",
    "q230_lateral_topk",
    "q231_stream_full_outer_join",
    # (b) operator or oracle changed in round 6 — re-prove: q193/
    # q194 (integer dHash + cross-multiplied oracle), q195 (runtime
    # pushdown conf now set in register_synth_docs), q206 (shares
    # the PNG decode family the dHash fix touched), q104/q181 (the
    # two binary lanes upgraded r6 from rows-only to closed-form
    # PCM/video-frame hash oracles), q95 (partial oracle: exact
    # counts + error-bound verdict)
    "q193_image_dhash",
    "q194_dhash_neardup",
    "q195_python_datasource",
    "q206_image_decode_exact",
    "q104_audio_metadata",
    "q181_video_frames",
    "q95_approx_distinct",
    # (c) r5 verdict item 3: last driver evidence r2-err, green in
    # every builder run since
    "q63_latest_per_key",
    # (d) longest-unchecked rotation: the r1-era residue (18 of 32
    # rows, last driver evidence CORRECTNESS_r01); q49-q65 + the
    # oldest r2-era rows queue for the r7 window
    "q03_balanced_accuracy",
    "q07_impute_mode",
    "q08_scale01",
    "q09_onehot",
    "q10_bucketize",
    "q13_sample_per_group",
    "q14_union_cohorts",
    "q15_topk_per_group",
    "q17_threshold_sweep",
    "q18_semi_anti_join",
    "q19_set_ops",
    "q20_rollup",
    "q23_distinct_agg",
    "q25_local_volume",
    "q26_path_parsing",
    "q27_status_matrix",
    "q43_percentiles",
    "q44_cube",
]

_missing = [n for n in PRIORITY if n not in _ALL_QUERIES]
if _missing:
    raise RuntimeError(f"PRIORITY names not registered: {_missing}")

QUERIES = {name: _ALL_QUERIES[name] for name in PRIORITY}
QUERIES.update(
    {name: fn for name, fn in _ALL_QUERIES.items() if name not in QUERIES}
)
ORACLES = dict(_ALL_ORACLES)
