"""Deterministic random forest (M1) — engine-portable train + score.

The reference trains `RandomForestClassifier(n_estimators=121,
max_depth=5)` on tabular patient features and scores the same
relation (`ipynb cell 10:37-48`). `operators/mlbridge.py` carries
the MLlib spelling of that lane (distributed CART training, model
artifact save/load, q224's hash-checked quality verdict) — but CART
split search is engine-internal, so MLlib scores can never be
hash-verified by an external oracle, which left q94 as the one
registry row without a driver check (r15 verdict, item 1).

This module closes that hole with the *totally-random-split* member
of the random-forest family (Geurts, Ernst & Wehenkel, "Extremely
Randomized Trees", Machine Learning 63(1), 2006 — the K=1
fully-random variant; also Cutler's PERT): split features and
thresholds are drawn at random rather than searched, and ONLY the
leaf values are estimated from (bagged) data. Drawing the splits
from `functions/deterministic.pseudo_random` — pure integer
arithmetic, identical in any ANSI engine — makes the entire
train+score computation a relational expression BOTH Spark and
DuckDB evaluate bit-for-bit:

- split(t, node): feature = pr(t, node, SEED_FEAT) % 3, threshold =
  lo_f + (pr(t, node, SEED_THR) / M) * (hi_f - lo_f) over the
  feature's global [min, max];
- bag(t): rows with pr(custkey, t, SEED_BAG) % 4 > 0 (75%) — a
  deliberate divergence from the reference, whose
  RandomForestClassifier sets bootstrap=False (every tree sees every
  row); the deterministic bag is what makes trees differ here, since
  splits are data-independent draws;
- leaf value: floor(1e6 * mean(label)) over the bag — *integer*
  milli-micro means, so the ensemble sum is exact BIGINT arithmetic
  with zero float-ordering risk (the suite's round-then-DECIMAL
  discipline, taken all the way to integers);
- score6 = Σ_t leaf6_t ∈ [0, 121e6]; pred = [2·score6 > 121e6].

Scale (100 TB): scoring is the canonical forest fan-out — each row
visits all 121 trees via a broadcast crossJoin (map-side, no
shuffle); the MODEL STRUCTURE is itself a relation (the 3,751-row
(tree, node) → (feature, threshold) split table, derived once from
the same pseudo-random draws the oracle unrolls) and leaf routing is
five broadcast hash-join levels over it — whole-stage codegen end to
end, no per-row hash arithmetic (an `aggregate`-lambda spelling was
13× slower because higher-order lambda bodies evaluate interpreted;
a chained-projection spelling cost the OPTIMIZER 43s inlining five
levels of itself — both measured, see PERF_NOTES r16). The trained
leaf table (≤ trees·2^depth = 3,872 rows) broadcasts back. The
per-row ensemble sum happens in the partial hash-aggregate BEFORE
the exchange (a row's 121 copies are produced consecutively in one
task), so shuffle volume stays ≈ |rows|, not 121×. Training adds
one tiny shuffle keyed (tree, leaf) with ≤ 3,872 groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from patientdataintegration_spark.functions.deterministic import (
    MODULUS,
    pseudo_random_py,
    pseudo_random_sql,
)
from patientdataintegration_spark.sources.catalog import load_table

NUM_TREES = 121  # reference n_estimators (ipynb cell 10:37)
DEPTH = 5  # reference max_depth (ipynb cell 10:38)
SEED_FEAT = 11
SEED_THR = 13
SEED_BAG = 7
BAG_MOD = 4  # keep rows with draw % 4 > 0 → 75% bag per tree
SCALE6 = 1_000_000  # integer milli-micro leaf means

# The three features and the label, shared with mlbridge's MLlib
# lane: nation key, market-segment index (fixed alphabetic map — the
# five TPC-H segments), trailing customer-name digits; label =
# account balance above the global mean, compared in exact DECIMAL
# (bal · n > Σbal) so no engine ever divides.
_SEG_CASE = (
    "CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1 "
    "WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3 "
    "WHEN 'MACHINERY' THEN 4 ELSE 5 END"
)
_FEAT_COLS = {
    "f0": "CAST(c_nationkey AS DOUBLE)",
    "f1": f"CAST({_SEG_CASE} AS DOUBLE)",
    "f2": "CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS DOUBLE)",
}


def _case3(fi: str, a: str, b: str, c: str) -> str:
    return f"(CASE WHEN {fi} = 0 THEN {a} WHEN {fi} = 1 THEN {b} ELSE {c} END)"


def _split_table_rows(stats_row) -> list[tuple[int, int, int, float | None]]:
    """The MODEL STRUCTURE derived DRIVER-SIDE (r17, guide §1.2 step 1
    / r16 verdict item 4): trees × internal nodes = NUM_TREES ·
    (2^DEPTH - 1) = 3,751 (t, node, feature, threshold) rows from the
    same `pseudo_random` draws the oracle unrolls — pure integer
    arithmetic plus one lo/hi lookup in the collected 1-row stats
    marginal, so no cluster job (the r16 spelling localCheckpointed a
    crossJoin per invocation) and no data dependency beyond that one
    bounded collect. The float expression replays the SQL tree's exact
    IEEE op order (`lo + (pr/M) * (hi - lo)`), so thresholds stay
    bit-identical to the oracle's CTE spelling; a NULL lo/hi (empty
    table) propagates as None exactly like the SQL NULL."""
    lo = [stats_row["lo0"], stats_row["lo1"], stats_row["lo2"]]
    hi = [stats_row["hi0"], stats_row["hi1"], stats_row["hi2"]]
    rows: list[tuple[int, int, int, float | None]] = []
    for t in range(NUM_TREES):
        for node in range(1, 2**DEPTH):
            fi = pseudo_random_py(t, node, SEED_FEAT) % 3
            if lo[fi] is None or hi[fi] is None:
                thr = None
            else:
                fr = pseudo_random_py(t, node, SEED_THR) / MODULUS
                thr = lo[fi] + fr * (hi[fi] - lo[fi])
            rows.append((t, node, fi, thr))
    return rows


def _level_exprs(d: int) -> dict[str, str]:
    """The oracle's unrolled spelling of `_step_exprs` for level `d`:
    nd{d-1} → nd{d}, with the pseudo-random draws bound to columns so
    each CTE stays readable."""
    prev = f"nd{d - 1}"
    fi = f"fi{d}"
    fr = f"fr{d}"
    x = _case3(fi, "f0", "f1", "f2")
    lo = _case3(fi, "lo0", "lo1", "lo2")
    hi = _case3(fi, "hi0", "hi1", "hi2")
    return {
        fi: f"({pseudo_random_sql('t', prev, SEED_FEAT)} % 3)",
        fr: (
            f"(CAST({pseudo_random_sql('t', prev, SEED_THR)} AS DOUBLE)"
            f" / {MODULUS})"
        ),
        f"nd{d}": (
            f"(2 * {prev} + (CASE WHEN {x} >= {lo} + {fr} * ({hi} - {lo})"
            f" THEN 1 ELSE 0 END))"
        ),
    }


_BAG_EXPR = f"(({pseudo_random_sql('c_custkey', 't', SEED_BAG)} % {BAG_MOD}) > 0)"
_PRED_EXPR = (
    f"CAST(CASE WHEN 2 * score6 > {NUM_TREES} * {SCALE6} "
    "THEN 1 ELSE 0 END AS INT)"
)


def deterministic_forest_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train and score the 121-tree/depth-5 deterministic forest on
    the customer table; returns (c_custkey, label, pred, score6)
    ordered by key. score6 is the exact BIGINT ensemble sum of
    per-tree leaf values in milli-micro units (score6 / 121e6 is the
    probability-like mean)."""
    c = load_table(spark, sf_dir, "customer")
    feat = c.selectExpr(
        "c_custkey",
        *[f"{expr} AS {name}" for name, expr in _FEAT_COLS.items()],
        "CAST(c_acctbal AS DECIMAL(18,2)) AS bal",
    )
    stats = feat.agg(
        F.min("f0").alias("lo0"),
        F.max("f0").alias("hi0"),
        F.min("f1").alias("lo1"),
        F.max("f1").alias("hi1"),
        F.min("f2").alias("lo2"),
        F.max("f2").alias("hi2"),
        F.sum("bal").alias("total_bal"),
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
    )
    # ONE bounded driver action — the 1-row stats marginal (the
    # `collect_pruning_terms`/salt-factor precedent) — feeds both the
    # driver-derived split table and a literal 1-row stats relation,
    # so the label/split branches stop re-running the stats scan and
    # the per-invocation localCheckpoint job is gone (guide §1.2/§5;
    # r16 verdict item 4)
    st = stats.collect()[0]
    stats_lit = spark.createDataFrame([st], stats.schema)
    from patientdataintegration_spark.plans.partitioning import fan_out

    # fan_out BEFORE the 121× tree fan-out: the routing pipeline
    # inherits the scan's partitioning, and a narrow scan (one row
    # group locally) would run the whole rows×trees×5-level pipeline
    # on one task; at real volumes the guard is a no-op (guide §2.5
    # input skew / §1.2 step 1)
    lab = fan_out(
        feat.crossJoin(F.broadcast(stats_lit))
        .withColumn(
            "label",
            F.expr("CASE WHEN bal * n_all > total_bal THEN 1 ELSE 0 END"),
        )
        .select("c_custkey", "f0", "f1", "f2", "label")
    )
    prior = lab.agg(
        F.sum("label").cast("bigint").alias("lab_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_lab"),
    )
    trees = spark.range(NUM_TREES).select(F.col("id").cast("bigint").alias("t"))

    # the model structure as a broadcastable LOCAL relation (3,751
    # rows, derived driver-side from the same pseudo-random draws the
    # oracle unrolls — `_split_table_rows`): routing below stays five
    # codegen'd broadcast-join levels over data, with zero per-row
    # hash arithmetic, and the broadcast build is now a local-relation
    # scan instead of a per-invocation checkpointed crossJoin
    splits = spark.createDataFrame(
        _split_table_rows(st), "t bigint, node bigint, fi bigint, thr double"
    )

    routed = lab.crossJoin(F.broadcast(trees)).withColumn(
        "nd", F.lit(1).cast("bigint")
    )
    for d in range(1, DEPTH + 1):
        sp = splits.select(
            F.col("t").alias(f"_t{d}"),
            F.col("node").alias(f"_n{d}"),
            F.col("fi").alias(f"_fi{d}"),
            F.col("thr").alias(f"_thr{d}"),
        )
        descend = (
            f"CAST(2 * nd + (CASE WHEN "
            f"{_case3(f'_fi{d}', 'f0', 'f1', 'f2')} >= _thr{d} "
            f"THEN 1 ELSE 0 END) AS BIGINT)"
        )
        routed = (
            routed.join(
                F.broadcast(sp),
                (F.col("t") == F.col(f"_t{d}"))
                & (F.col("nd") == F.col(f"_n{d}")),
            )
            .withColumn("nd", F.expr(descend))
            .drop(f"_t{d}", f"_n{d}", f"_fi{d}", f"_thr{d}")
        )
    # pin the routed fan-out ONCE: it feeds BOTH the leaf-value
    # training aggregate and the scoring join, and without the pin the
    # whole routing subtree (customer × 121 trees × five join levels)
    # executes twice per action — once inside the leafval broadcast
    # build, once on the probe side (measured in the r17 before-plan:
    # two parallel routing subtrees). Materializing |rows|·NUM_TREES
    # narrow rows is one pass; re-deriving them is two (guide §5:
    # cache exactly when recompute costs more than the memory).
    #
    # SIZE-GATED (r17 verdict item 8): |rows|×121 pinned to executor
    # memory/disk is fine at bench scale but a very large persist at
    # 100 TB — and localCheckpoint additionally forfeits lineage
    # recovery on executor loss. The routed cardinality is EXACTLY
    # n_all × NUM_TREES and n_all is already in the collected 1-row
    # stats marginal, so the gate costs nothing and never guesses
    # (the optimizer's own estimate was measured at ~1e121 bytes here
    # — five broadcast-join levels multiply size estimates — and is
    # unusable; see OPTIMIZATION_r18.md). Above
    # `spark.pdi.forest.pinMaxBytes` (default 8 GiB; <= 0 disables
    # the gate and always pins) skip the pin and pay the second
    # routing pass instead: two passes beat an OOM. The local default
    # keeps the bench on the pinned plan (sf0.1 routed ≈ 87 MB).
    leafed = routed.select(
        "c_custkey",
        "label",
        "t",
        F.col("nd").alias("leaf"),
        F.expr(_BAG_EXPR).alias("in_bag"),
    )
    try:
        pin_budget = int(
            spark.conf.get("spark.pdi.forest.pinMaxBytes",
                           str(8 * 1024**3))
        )
    except (TypeError, ValueError):
        pin_budget = 8 * 1024**3
    _ROUTED_ROW_BYTES = 48  # (bigint key, label, t, leaf, bool) + slack
    routed_bytes = int(st["n_all"] or 0) * NUM_TREES * _ROUTED_ROW_BYTES
    if pin_budget <= 0 or routed_bytes <= pin_budget:
        leafed = leafed.localCheckpoint()

    leafval = (
        leafed.filter("in_bag")
        .groupBy("t", "leaf")
        .agg(
            F.sum("label").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .selectExpr("t", "leaf", f"CAST((s * {SCALE6}) DIV n AS BIGINT) AS leaf6")
    )

    scored = (
        leafed.join(F.broadcast(leafval), ["t", "leaf"], "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "c_custkey",
            "label",
            F.coalesce(
                F.col("leaf6"),
                F.expr(f"CAST((lab_s * {SCALE6}) DIV n_lab AS BIGINT)"),
            ).alias("leaf6"),
        )
    )
    return (
        scored.groupBy("c_custkey", "label")
        .agg(F.sum("leaf6").cast("bigint").alias("score6"))
        .select(
            "c_custkey",
            F.col("label").cast("int").alias("label"),
            F.expr(_PRED_EXPR).alias("pred"),
            "score6",
        )
        .orderBy("c_custkey")
    )


def deterministic_forest_oracle_sql() -> str:
    """The DuckDB twin, generated from the SAME per-level expression
    text as the Spark plan. Dialect deltas are exactly two: integer
    division spells `//` (Spark: `DIV`) and the tree series comes
    from DuckDB's range() table function (Spark: spark.range)."""
    level_ctes = []
    prev = "rt"
    for d in range(1, DEPTH + 1):
        e = _level_exprs(d)
        fi, fr, nd = f"fi{d}", f"fr{d}", f"nd{d}"
        level_ctes.append(
            f"s{d} AS (SELECT *, {e[fi]} AS {fi}, {e[fr]} AS {fr} "
            f"FROM {prev})"
        )
        level_ctes.append(f"n{d} AS (SELECT *, {e[nd]} AS {nd} FROM s{d})")
        prev = f"n{d}"
    levels = ",\n    ".join(level_ctes)
    feats = ",\n             ".join(
        f"{expr} AS {name}" for name, expr in _FEAT_COLS.items()
    )
    return f"""
    WITH feat AS (
      SELECT c_custkey,
             {feats},
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer
    ),
    stats AS (
      SELECT MIN(f0) AS lo0, MAX(f0) AS hi0,
             MIN(f1) AS lo1, MAX(f1) AS hi1,
             MIN(f2) AS lo2, MAX(f2) AS hi2,
             SUM(bal) AS total_bal, CAST(COUNT(*) AS BIGINT) AS n_all
      FROM feat
    ),
    lab AS (
      SELECT f.*, s.lo0, s.hi0, s.lo1, s.hi1, s.lo2, s.hi2,
             CASE WHEN f.bal * s.n_all > s.total_bal THEN 1 ELSE 0 END
               AS label
      FROM feat f CROSS JOIN stats s
    ),
    prior AS (
      SELECT CAST(SUM(label) AS BIGINT) AS lab_s,
             CAST(COUNT(*) AS BIGINT) AS n_lab
      FROM lab
    ),
    trees AS (SELECT CAST(range AS BIGINT) AS t FROM range({NUM_TREES})),
    rt AS (SELECT l.*, tr.t, 1 AS nd0 FROM lab l CROSS JOIN trees tr),
    {levels},
    leafed AS (
      SELECT c_custkey, label, t, nd{DEPTH} AS leaf,
             {_BAG_EXPR} AS in_bag
      FROM {prev}
    ),
    leafval AS (
      SELECT t, leaf,
             CAST((CAST(SUM(label) AS BIGINT) * {SCALE6})
                  // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS leaf6
      FROM leafed WHERE in_bag GROUP BY t, leaf
    ),
    scored AS (
      SELECT L.c_custkey, L.label,
             COALESCE(v.leaf6,
                      CAST((p.lab_s * {SCALE6}) // p.n_lab AS BIGINT))
               AS leaf6
      FROM leafed L
      LEFT JOIN leafval v ON v.t = L.t AND v.leaf = L.leaf
      CROSS JOIN prior p
    ),
    agg AS (
      SELECT c_custkey, label, CAST(SUM(leaf6) AS BIGINT) AS score6
      FROM scored GROUP BY c_custkey, label
    )
    SELECT c_custkey,
           CAST(label AS INT) AS label,
           {_PRED_EXPR} AS pred,
           score6
    FROM agg
    ORDER BY c_custkey
    """
