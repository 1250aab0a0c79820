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

The round-7 window is the r6 verdict's evidence-refresh plan: (a)
the never-driver-checked entries — the two new r7 sketch-path
queries q232/q233 (approx-percentile bucket edges with
bounded-error verdict oracles) and q223 (upgraded r7 from a
rows-only streaming lane to a FULL hash oracle replaying the
append-mode watermark-eviction rule, so its first driver row
compares something); (b) re-proof rows for everything r7 changed —
q220 (cumsum window now tie-deterministic on event_id), q224
(preds_binary verdict hardened per ADVICE), q54/q145 (exact
NTILE/PERCENT_RANK rollups rewritten onto the distributed
global_row_number operator, bit-identical output, no unpartitioned
WindowExec); (c) the complete r1-era evidence residue
(q49-q59/q61/q64/q65, latest driver rows CORRECTNESS_r01); and (d)
the thirty oldest r2-era rows (q21-q92). The ten youngest r2-era
rows (q93/q100/q103/q105-q109/q111/q112) queue for r8, which
clears the backlog: after r8 no registry query's latest driver
evidence predates r3. Per the r6 verdict, no-oracle streaming
lanes stay OUT of the window (q231 burned an r6 slot on
err:no_oracle; the lanes are pinned by batch twins + the replay
matrix). Previously-green queries stay registered after the
priority block; their evidence is CORRECTNESS_r01-r06.json plus
the committed full-registry ORACLE_RUN logs.
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

# The driver-checked prefix, by design exactly 50 names (round-7
# rotation: see module docstring).
PRIORITY = [
    # (a) never driver-checked: the r7 sketch-path pair + q223 (now
    # carrying a full watermark-frontier hash oracle)
    "q232_decile_edges_approx",
    "q233_equidepth_approx",
    "q223_stream_session_window",
    # (b) changed in round 7 — re-prove: q220 (tie-deterministic
    # cumsum oracle), q224 (hardened preds_binary verdict), q54/q145
    # (distributed global_row_number rewrite, same oracles)
    "q220_native_session_window",
    "q224_rf_quality_verdict",
    "q54_spend_deciles",
    "q145_equidepth_histogram",
    # (c) the r1-era evidence residue (latest driver rows
    # CORRECTNESS_r01)
    "q49_global_topk",
    "q50_exists_correlated",
    "q51_scalar_subquery",
    "q52_unpivot",
    "q53_having_join_back",
    "q55_quantile_binning",
    "q56_pivot_status",
    "q57_not_exists_anti",
    "q58_full_outer",
    "q59_grouping_sets",
    "q61_date_battery",
    "q64_string_battery",
    "q65_label_centroids",
    # (d) the thirty oldest r2-era rows (latest driver rows
    # CORRECTNESS_r02); q93/q100/q103/q105-q109/q111/q112 close out in r8 (q110's latest evidence is r3)
    "q21_window_lag",
    "q22_running_best",
    "q29_json_props",
    "q30_token_stats",
    "q31_lang_id",
    "q32_exact_dedup",
    "q34_minhash_signatures",
    "q35_simhash",
    "q37_events_tumbling",
    "q38_quality_filter",
    "q39_events_sliding",
    "q40_embedding_neardup",
    "q41_winnowing_fp",
    "q46_tfidf_top_terms",
    "q48_metric_map",
    "q68_array_battery",
    "q69_forward_fill",
    "q72_regex_tokens",
    "q75_retention_cohorts",
    "q76_stratified_sample",
    "q77_fusion_battery",
    "q78_grouping_battery",
    "q79_subquery_battery",
    "q80_window_battery",
    "q81_chunking",
    "q82_token_rarity",
    "q83_contamination",
    "q84_quantize_embeddings",
    "q87_multires_rollup",
    "q92_minhash_lsh_pairs",
]

_missing = [n for n in PRIORITY if n not in _ALL_QUERIES]
if _missing:
    raise RuntimeError(f"PRIORITY names not registered: {_missing}")

QUERIES = {name: _ALL_QUERIES[name] for name in PRIORITY}
QUERIES.update(
    {name: fn for name, fn in _ALL_QUERIES.items() if name not in QUERIES}
)
ORACLES = dict(_ALL_ORACLES)
