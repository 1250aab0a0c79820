"""Scalar column expressions used across the engine (SURVEY.md §2.2 P9,
§2.10 C3-C5).

All are native Column expressions (whole-stage-codegen friendly);
none require UDFs. Reference provenance:

- sigmoid / pairwise softmax: `mymodels.py:50-57,91-93`,
- threshold predicate → 0/1 prediction: `functions_v2.py:328,434`,
- score orientation for AUC (`score if pred==1 else 1-score`):
  `ipynb cell 13:14`, `ipynb cell 19:35`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sigmoid(x: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def pairwise_softmax(a: Column, b: Column) -> Column:
    """softmax over a 2-logit pair, returning the weight of `a`
    (`mymodels.py:50-53` softmaxes the two importance logits)."""
    return F.exp(a) / (F.exp(a) + F.exp(b))


def threshold_pred(score: Column, threshold: float = 0.5) -> Column:
    """`1*(outputs >= t)` (F3): binary prediction from a score."""
    return F.when(score >= F.lit(threshold), F.lit(1)).otherwise(F.lit(0))


def oriented_score(score: Column, pred: Column) -> Column:
    """Probability of the positive class given the probability of the
    *predicted* class (C4): `score if pred==1 else 1-score`."""
    return F.when(pred == 1, score).otherwise(F.lit(1.0) - score)
