"""Job observability via `Dataset.observe` — aggregate metrics
computed ON THE STREAM OF ROWS a job actually processes, collected
at action time for free (no second scan, no extra shuffle: the
metrics ride the existing plan as accumulator-style expressions).

Production stance at 100 TB: every ingest/transform job should emit
row counts and data-quality gauges (null rates, min/max watermarks)
WITHOUT re-reading the input — a separate validation query doubles
the scan cost. `observe` is Spark's native mechanism for exactly
this; the helpers here standardize it:

- `with_quality_metrics(df)` attaches the standard gauge set for a
  set of columns;
- `run_observed(df, ...)` runs an action and returns the observed
  metrics as a dict.

Streaming: the same `observe` call works on streaming DataFrames,
surfaced per micro-batch through `StreamingQueryProgress.observedMetrics`
(left to the streaming lane's listeners; this module covers batch
Observation, whose `get` blocks until the action completes).

Session-poisoning hazard (PySpark 4.1 classic): the first use of the
`Observation` object API initializes the session's non-transient,
non-serializable `observationManager` lazy val. From then on the
SparkSession object itself fails Java serialization, which breaks any
later task closure that (transitively) captures the session — the
canonical victim being an MLlib model whose `trainingSummary` holds a
session reference and whose prediction ScalaUDF ships the model to
executors. Serialization stack:

    WholeStageCodegen references -> ScalaUDF(probability)
      -> RandomForestClassificationModel.trainingSummary
      -> SparkSession.observationManager  (NotSerializableException)

Mitigation here: the helpers below transplant the observed plan onto a
throwaway `spark.newSession()` (same SparkContext, fresh session
object) so the CALLER's session manager is never initialized. The
victim side is independently hardened in `operators/mlbridge.py`
(`strip_training_summary`). Regression coverage:
`tests/test_observe_mllib_regression.py`.
"""

from __future__ import annotations

import uuid
import weakref

from pyspark.sql import DataFrame, Observation, functions as F

# One dedicated observation child session per root session, keyed
# weakly so a stopped/collected root releases its child. Creating a
# child per call (the r5 shape) accumulated sessions — and their
# listener/state registries — without bound on a long-lived driver.
_OBS_CHILD_SESSIONS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _observation_child_session(spark):
    """The caller session's single cached observation child (shared
    SparkContext, separate session state). All observed plans from
    one root session share it: its observationManager is initialized
    once, the root's never is, and no per-call session leak."""
    child = _OBS_CHILD_SESSIONS.get(spark)
    if child is None:
        child = spark.newSession()
        _OBS_CHILD_SESSIONS[spark] = child
    return child


def _transplant_to_fresh_session(df: DataFrame) -> DataFrame:
    """Re-bind `df`'s analyzed logical plan to the caller session's
    cached observation child (see `_observation_child_session`) so
    that attaching an `Observation` initializes the CHILD's
    observationManager, not the caller's.

    Contract note for callers: the returned frame is bound to a
    DIFFERENT session object — the caller's temp views and
    session-level SQL confs do not apply to transforms chained onto
    it. Resolve views / read confs BEFORE calling, or pass
    ``isolate=False`` where that matters. Falls back to the original
    frame when the classic py4j internals are unavailable (e.g.
    Spark Connect)."""
    try:
        spark = df.sparkSession
        child = _observation_child_session(spark)
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            child._jsparkSession, df._jdf.logicalPlan()
        )
        return DataFrame(jdf, child)
    except Exception:
        return df


def quality_metric_exprs(
    count_col_nulls: list[str] | None = None,
    sum_cols: list[str] | None = None,
):
    """The standard gauge set: total rows, per-column null counts,
    per-column decimal-exact sums (same exactness discipline as the
    query suite — order-independent, so the gauge is deterministic
    across partitionings)."""
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for c in count_col_nulls or []:
        exprs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"n_null_{c}")
        )
    for c in sum_cols or []:
        exprs.append(
            F.sum(F.col(c).cast("decimal(18,6)")).cast("double").alias(f"sum_{c}")
        )
    return exprs


def run_observed(
    df: DataFrame,
    metric_exprs,
    name: str = "job_metrics",
) -> dict:
    """Attach `metric_exprs` to the frame, run it through the noop
    action (full computation, nothing materialized on the driver),
    and return the observed metrics dict. One job; the metrics are
    NOT a second query.

    The observed action runs on a throwaway child session (see module
    docstring) so the caller's session stays Java-serializable and
    MLlib lanes on the same long-lived session keep working. The
    child session is CACHED per root session, so the observation name
    is uniquified per call — concurrent `run_observed` calls on one
    root session would otherwise collide in the shared child's
    observationManager (or cross-match metrics by name)."""
    obs = Observation(f"{name}_{uuid.uuid4().hex}")
    observed = _transplant_to_fresh_session(df).observe(obs, *metric_exprs)
    observed.write.format("noop").mode("overwrite").save()
    return obs.get


def with_quality_metrics(
    df: DataFrame,
    obs: Observation,
    count_col_nulls: list[str] | None = None,
    sum_cols: list[str] | None = None,
    isolate: bool = True,
) -> DataFrame:
    """Attach the standard gauges to a frame inside a larger
    pipeline; the caller reads `obs.get` after its OWN action.

    With ``isolate=True`` (default) the returned frame is re-bound to
    a fresh child session first, so attaching the Observation does not
    initialize the caller session's observationManager (the 4.1
    session-poisoning hazard — module docstring). Downstream
    transforms and actions on the returned frame behave identically
    (same SparkContext, same data); pass ``isolate=False`` only if the
    frame must stay on the caller's session object and no MLlib
    model-closure job will ever run on that session."""
    base = _transplant_to_fresh_session(df) if isolate else df
    return base.observe(
        obs, *quality_metric_exprs(count_col_nulls, sum_cols)
    )
