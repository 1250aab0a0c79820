"""Deterministic 3-phase training loop (M4 analogue) — engine-portable
batch gradient descent with a full cross-engine oracle.

The reference's M4 is a torch training loop (`functions_v2.py:222-403`):
three phases with a stepped learning-rate schedule, per-epoch loss
tracking, and an early-stopping signal on the loss curve. The torch
specifics (CNN forward pass, autograd, CUDA) are out of the engine's
scope by SURVEY §2.11 declaration — but the LOOP ITSELF is data-plane
machinery a distributed engine should own: per-epoch full-corpus
gradient aggregation, a phase/LR schedule, a loss curve, and a
stopping signal. This module re-expresses exactly that, on a model
chosen so every arithmetic step is bit-identical in Spark and DuckDB:

- model: linear scores over the (nation key, segment index, name
  digits) customer features standardized to [0, 1] by the global
  min/max (exact doubles), the same feature/label design as
  `operators/forest.py` (label: balance above the global mean,
  decided in exact DECIMAL);
- activation: the Elliott "fast sigmoid" σ(z) = 0.5 + 0.5·z/(1+|z|)
  (Elliott 1993) — +, −, ×, ÷, abs only, so IEEE-deterministic in
  any engine, unlike exp()-based sigmoids whose libm last-ulps
  differ across runtimes;
- loss: mean squared error; gradient: the exact closed form
  2·(σ(z)−y)·σ'(z)·x with σ'(z) = 0.5/(1+|z|)²;
- exact aggregation: each row's gradient/loss contribution rounds to
  9 decimals and sums as DECIMAL — the suite's round-then-DECIMAL
  discipline — so the per-epoch totals are exact numbers both
  engines reproduce digit-for-digit, and the weight recurrence
  w ← w − lr·(G/n) evolves identically on both sides;
- split: a deterministic 75/25 train/validation split from the
  engine-portable pseudo_random draw on the row key — gradients and
  train loss aggregate over the train split, the validation loss
  over the held-out quarter (FILTER-clause aggregates, identical
  syntax in Spark SQL and DuckDB);
- schedule: three phases × two epochs at lr = 0.5 / 0.25 / 0.125
  (the reference's stepped-LR shape); the early-stopping SIGNAL
  tracks the VALIDATION loss — the variant the reference considered
  (its val-loss check is commented out, "Auf loss umsteigen?",
  functions_v2.py; the reference's ACTIVE selection criterion is
  validation balanced accuracy after epoch 5) — and is emitted per
  epoch rather than acted on, so the full curve stays in the output
  for the oracle to hash. (On this corpus the label is
  noise w.r.t. the features, so the curve shows textbook
  overfitting: train loss falls, val loss rises, the signal fires.)

The lane output IS the training curve: one row per epoch with the
phase, learning rate, 6-dp train and validation losses, post-epoch
weights, and the improvement flag — the table a training-ops
dashboard ingests.

Scale (100 TB): each epoch is ONE map-side aggregation over the
standardized projection (partial aggregation before a 1-row
exchange — gradient descent's shuffle volume is O(model), not
O(rows)); the driver holds only the weight vector, the canonical
parameter-server-on-the-driver shape for small models. The
standardized projection is pinned (`localCheckpoint`) so the loop
re-reads columnar row groups, not raw parquet, each epoch.

Reference parity: the loop mechanics mirror `functions_v2.py`'s
phase/epoch/metric structure; the model is deliberately the smallest
one whose training is exactly replayable by an external engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from patientdataintegration_spark.functions.deterministic import (
    pseudo_random_sql,
)
from patientdataintegration_spark.sources.catalog import load_table

PHASES: tuple[tuple[float, int], ...] = ((0.5, 2), (0.25, 2), (0.125, 2))
ROUND_D = 9  # per-row contribution rounding (round-then-DECIMAL)
EPS = 1e-5  # early-stop improvement threshold on the 6-dp VAL loss
SEED_SPLIT = 17  # deterministic 75/25 train/validation split
VAL_MOD = 4  # rows with draw % 4 == 0 are validation

_SEG_CASE = (
    "CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1 "
    "WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3 "
    "WHEN 'MACHINERY' THEN 4 ELSE 5 END"
)
_RAW_FEATS = {
    "f1": "CAST(c_nationkey AS DOUBLE)",
    "f2": f"CAST({_SEG_CASE} AS DOUBLE)",
    "f3": "CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS DOUBLE)",
}


def _std_expr(j: int) -> str:
    """x_j = (f_j - lo_j)/(hi_j - lo_j), 0 on a constant feature —
    every op a single IEEE double op on identical inputs."""
    return (
        f"(CASE WHEN (hi{j} - lo{j}) = 0 THEN 0.0 "
        f"ELSE ((f{j} - lo{j}) / (hi{j} - lo{j})) END)"
    )


def _epoch_aggs(w: tuple[str, str, str, str]) -> dict[str, str]:
    """The per-epoch aggregate expressions with the weights spliced
    in as TEXT (`w` holds either SQL column references — the oracle's
    CTE chain — or repr'd double literals — the Spark loop): shared
    operation trees, so both engines execute the same IEEE sequence.

    Keys: g0..g3 (decimal-exact gradient sums over the TRAIN split —
    `FILTER (WHERE v = 0)`, identical syntax in Spark SQL and
    DuckDB), lt/lv (decimal-exact squared-error sums over train /
    validation)."""
    w0, w1, w2, w3 = w
    z = f"((({w0}) + (({w1}) * x1) + (({w2}) * x2)) + (({w3}) * x3))"
    az = f"(1.0 + abs({z}))"
    s = f"(0.5 + (0.5 * (({z}) / {az})))"
    e = f"({s} - y)"
    dsdz = f"(0.5 / ({az} * {az}))"
    core = f"((2.0 * ({e} * {dsdz})))"

    def dec_sum(expr: str, where: str) -> str:
        return (
            f"SUM(CAST(round({expr}, {ROUND_D}) AS DECIMAL(28,12))) "
            f"FILTER (WHERE {where})"
        )

    return {
        "g0": dec_sum(core, "v = 0"),
        "g1": dec_sum(f"({core} * x1)", "v = 0"),
        "g2": dec_sum(f"({core} * x2)", "v = 0"),
        "g3": dec_sum(f"({core} * x3)", "v = 0"),
        "lt": dec_sum(f"({e} * {e})", "v = 0"),
        "lv": dec_sum(f"({e} * {e})", "v = 1"),
    }


def _schedule() -> list[tuple[int, int, float]]:
    """[(epoch, phase, lr)] — 1-based epoch over the phase plan."""
    out = []
    epoch = 0
    for phase, (lr, n_epochs) in enumerate(PHASES, start=1):
        for _ in range(n_epochs):
            epoch += 1
            out.append((epoch, phase, lr))
    return out


def training_curve(
    spark: SparkSession, sf_dir: str, momentum: float = 0.0
) -> DataFrame:
    """Run the 3-phase loop and return the per-epoch curve:
    (epoch, phase, lr, loss6, val_loss6, w0..w3 at 6 dp, improved).

    `momentum` enables classical momentum (velocity fold
    v ← μ·v + G/n_tr, w ← w − lr·v — Polyak's heavy ball), the
    reference loop's per-phase-optimizer shape; still fully
    deterministic (the velocity recurrence is the same single-IEEE-op
    sequence on both sides), but the registered q301 lane pins
    μ = 0 so its oracle stays the plain-GD unroll — the momentum
    path is pytest-pinned (tests/test_training.py) instead."""
    c = load_table(spark, sf_dir, "customer")
    feat = c.selectExpr(
        "c_custkey",
        *[f"{expr} AS {name}" for name, expr in _RAW_FEATS.items()],
        "CAST(c_acctbal AS DECIMAL(18,2)) AS bal",
    )
    stats = feat.agg(
        *[
            agg
            for j in (1, 2, 3)
            for agg in (
                F.min(f"f{j}").alias(f"lo{j}"),
                F.max(f"f{j}").alias(f"hi{j}"),
            )
        ],
        F.sum("bal").alias("total_bal"),
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
    )
    split = (
        f"(CASE WHEN ({pseudo_random_sql('c_custkey', None, SEED_SPLIT)} "
        f"% {VAL_MOD}) = 0 THEN 1 ELSE 0 END)"
    )
    lab = (
        feat.crossJoin(F.broadcast(stats))
        .selectExpr(
            _std_expr(1) + " AS x1",
            _std_expr(2) + " AS x2",
            _std_expr(3) + " AS x3",
            "CASE WHEN bal * n_all > total_bal THEN 1 ELSE 0 END AS y",
            split + " AS v",
        )
        # one epoch = one map-side aggregate over this projection;
        # pin it so each epoch re-reads columnar batches, not parquet
        .localCheckpoint()
    )
    cnt = lab.selectExpr(
        "CAST(SUM(1 - v) AS BIGINT) AS n_tr",
        "CAST(SUM(v) AS BIGINT) AS n_va",
    ).first()
    if cnt["n_tr"] is None or cnt["n_va"] is None or not cnt["n_tr"] or not cnt["n_va"]:
        # r16 ADVICE: a tiny table can leave either side of the
        # deterministic 75/25 split empty, and the division below
        # would surface as an opaque TypeError/ZeroDivisionError
        empty = [
            side
            for side, n in (("train", cnt["n_tr"]), ("validation", cnt["n_va"]))
            if not n
        ]
        raise ValueError(
            "training_curve: the deterministic 75/25 split left "
            f"{' and '.join(empty)} empty "
            f"(n_tr={cnt['n_tr']}, n_va={cnt['n_va']}) — the input "
            "table is too small to train on"
        )
    n_tr, n_va = int(cnt["n_tr"]), int(cnt["n_va"])

    w = (0.0, 0.0, 0.0, 0.0)
    vel = (0.0, 0.0, 0.0, 0.0)
    rows = []
    for epoch, phase, lr in _schedule():
        aggs = _epoch_aggs(tuple(repr(x) for x in w))
        got = lab.agg(
            *[F.expr(expr).alias(name) for name, expr in aggs.items()]
        ).first()
        gs = [float(got[k]) for k in ("g0", "g1", "g2", "g3")]
        loss = float(got["lt"]) / n_tr
        val_loss = float(got["lv"]) / n_va
        # the weight recurrence — the same op sequence the oracle's
        # CTE chain runs for the μ=0 lane: w - lr * (G / n_tr), one
        # op at a time; with momentum the velocity folds first
        vel = tuple(
            momentum * vj + (gj / n_tr) for vj, gj in zip(vel, gs)
        )
        w = tuple(wj - lr * vj for wj, vj in zip(w, vel))
        rows.append((epoch, phase, lr, loss, val_loss, *w))

    curve = spark.createDataFrame(
        rows,
        "epoch int, phase int, lr double, loss double, val_loss double, "
        "rw0 double, rw1 double, rw2 double, rw3 double",
    ).select(
        "epoch",
        "phase",
        "lr",
        F.round("loss", 6).alias("loss6"),
        F.round("val_loss", 6).alias("val_loss6"),
        *[F.round(f"rw{j}", 6).alias(f"w{j}") for j in range(4)],
    )
    win = Window.orderBy("epoch")
    return (
        curve.withColumn(
            "improved",
            F.coalesce(
                (F.lag("val_loss6").over(win) - F.col("val_loss6")) > EPS,
                F.lit(True),
            ),
        )
        .orderBy("epoch")
    )


def training_curve_oracle_sql() -> str:
    """The DuckDB twin: the epoch recurrence unrolled into chained
    CTEs (w0cte → e1 → w1 → …), built from the SAME `_epoch_aggs`
    expression text with the weights spliced as CTE column
    references. The weight/loss doubles evolve identically because
    every op is a single IEEE double op on identical inputs and every
    cross-row sum rides the 9-dp round-then-DECIMAL discipline; the
    75/25 split replays through the engine-portable pseudo_random
    draw on c_custkey."""
    feats = ",\n             ".join(
        f"{expr} AS {name}" for name, expr in _RAW_FEATS.items()
    )
    stat_cols = ",\n             ".join(
        f"MIN(f{j}) AS lo{j}, MAX(f{j}) AS hi{j}" for j in (1, 2, 3)
    )
    split = (
        f"(CASE WHEN ({pseudo_random_sql('c_custkey', None, SEED_SPLIT)} "
        f"% {VAL_MOD}) = 0 THEN 1 ELSE 0 END)"
    )
    ctes = [
        f"""feat AS (
      SELECT c_custkey, {feats},
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer
    )""",
        f"""stats AS (
      SELECT {stat_cols},
             SUM(bal) AS total_bal, CAST(COUNT(*) AS BIGINT) AS n_all
      FROM feat
    )""",
        f"""lab AS (
      SELECT {_std_expr(1)} AS x1, {_std_expr(2)} AS x2,
             {_std_expr(3)} AS x3,
             CASE WHEN f.bal * s.n_all > s.total_bal THEN 1 ELSE 0 END AS y,
             {split} AS v
      FROM feat f CROSS JOIN stats s
    )""",
        """cnt AS (
      SELECT CAST(SUM(1 - v) AS BIGINT) AS n_tr,
             CAST(SUM(v) AS BIGINT) AS n_va
      FROM lab
    )""",
        """w0cte AS (
      SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3
    )""",
    ]
    outrows = []
    prev = "w0cte"
    for epoch, phase, lr in _schedule():
        aggs = _epoch_aggs(("w0", "w1", "w2", "w3"))
        agg_cols = ",\n             ".join(
            f"{expr} AS {name}" for name, expr in aggs.items()
        )
        ctes.append(
            f"""e{epoch} AS (
      SELECT MIN(w0) AS w0, MIN(w1) AS w1, MIN(w2) AS w2, MIN(w3) AS w3,
             MIN(n_tr) AS n_tr, MIN(n_va) AS n_va,
             {agg_cols}
      FROM lab CROSS JOIN {prev} CROSS JOIN cnt
    )"""
        )
        upd = ",\n             ".join(
            f"(w{j} - {lr!r} * (CAST(g{j} AS DOUBLE) / n_tr)) AS w{j}"
            for j in range(4)
        )
        ctes.append(
            f"""w{epoch} AS (
      SELECT {upd},
             (CAST(lt AS DOUBLE) / n_tr) AS loss,
             (CAST(lv AS DOUBLE) / n_va) AS val_loss
      FROM e{epoch}
    )"""
        )
        outrows.append(
            f"SELECT CAST({epoch} AS INT) AS epoch, "
            f"CAST({phase} AS INT) AS phase, {lr!r} AS lr, "
            f"round(loss, 6) AS loss6, round(val_loss, 6) AS val_loss6, "
            + ", ".join(f"round(w{j}, 6) AS w{j}" for j in range(4))
            + f" FROM w{epoch}"
        )
        prev = f"w{epoch}"
    body = ",\n    ".join(ctes)
    union = "\n      UNION ALL ".join(outrows)
    return f"""
    WITH {body},
    curve AS (
      {union}
    )
    SELECT epoch, phase, lr, loss6, val_loss6, w0, w1, w2, w3,
           COALESCE(
             (lag(val_loss6) OVER (ORDER BY epoch)) - val_loss6 > {EPS!r},
             TRUE) AS improved
    FROM curve
    ORDER BY epoch
    """
