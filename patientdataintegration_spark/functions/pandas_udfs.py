"""Vectorized pandas UDFs for the sanctioned Python-math lanes
(q197/q198). Lives in its own module WITHOUT
`from __future__ import annotations`: pandas_udf infers the UDF
flavor (scalar vs grouped-agg) from the evaluated type hints, and
postponed annotations turn them into unresolvable strings
(`UNSUPPORTED_SIGNATURE`)."""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def purchase_score(price: pd.Series) -> pd.Series:
    """Scalar flavor: Arrow column batch in, column batch out —
    logistic score rounded at 6 digits (numpy exp agrees with libm
    to the ulp on this range; the q82 rounding discipline)."""
    return np.round(1.0 / (1.0 + np.exp(-((price / 1000.0) - 30.0))), 6)


@pandas_udf("double")
def group_median(v: pd.Series) -> float:
    """Grouped-agg flavor: the whole group's column in, one scalar
    out. Selection statistic, rounded at 4 digits: quartile lerp of
    2-decimal balances lands on multiples of 0.0025 — a 0.00125
    margin to any rounding boundary, dwarfing the last-ulp lerp
    difference between numpy (a+f*(b-a)) and DuckDB's
    quantile_cont."""
    return float(np.round(np.quantile(v.to_numpy(), 0.5), 4))


@pandas_udf("double")
def group_iqr(v: pd.Series) -> float:
    a = v.to_numpy()
    return float(np.round(np.quantile(a, 0.75) - np.quantile(a, 0.25), 4))


@pandas_udf("long")
def group_count(v: pd.Series) -> int:
    """Count as a grouped-agg UDF: Spark disallows mixing grouped-agg
    pandas UDFs with JVM aggregates in one agg(), so the count rides
    the same Python pass."""
    return int(len(v))
