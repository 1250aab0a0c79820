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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


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
    NOT a second query."""
    obs = Observation(name)
    observed = df.observe(obs, *metric_exprs)
    observed.write.format("noop").mode("overwrite").save()
    return obs.get


def with_quality_metrics(
    df: DataFrame,
    obs: Observation,
    count_col_nulls: list[str] | None = None,
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Attach the standard gauges to a frame inside a larger
    pipeline; the caller reads `obs.get` after its OWN action."""
    return df.observe(
        obs, *quality_metric_exprs(count_col_nulls, sum_cols)
    )
