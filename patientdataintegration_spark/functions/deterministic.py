"""Deterministic, engine-portable pseudo-randomness and hashing.

The reference seeds Python RNGs for reproducibility
(`functions_v2.py:78`, `dataset_classes_v1.py:46` — SURVEY.md §4.1
"Seeded determinism everywhere"). Spark's `rand(seed)` is only
deterministic for a fixed partition layout, and its `hash()` differs
from every other engine's. For operators whose output must be
reproducible across runs AND verifiable against an external oracle
(seeded sampling W1, fold assignment W2), we instead derive
pseudo-random draws from pure integer arithmetic over the row's own
keys — identical in any engine, any partitioning, any run.

`pseudo_random` is a Knuth-multiplicative hash followed by a
mid-square step:
    x = (key1 * 2654435761 + key2 * 40503 + seed * 97531) % M
    draw = (x * x) % M,  M = 1_000_000_007
The squaring is what makes the seed effective: without it a seed
change is a constant additive shift within a group, which (mod
wraparound aside) preserves the relative order of draws and so
yields the SAME per-group sample for every seed. All intermediates
stay below 2^63 for key domains up to ~1e9 (x < M ⇒ x² < 1.1e18).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH_A = 2654435761  # 2^32 * golden ratio
KNUTH_B = 40503
SEED_MIX = 97531
MODULUS = 1_000_000_007


def pseudo_random(key1: Column, key2: Column | None = None, seed: int = 42) -> Column:
    """Deterministic pseudo-random bigint in [0, MODULUS) from row keys.

    Pure integer arithmetic => same value in Spark, DuckDB, or any
    ANSI SQL engine; independent of partitioning (unlike rand(seed)).
    """
    expr = key1.cast("bigint") * F.lit(KNUTH_A) + F.lit(int(seed) * SEED_MIX)
    if key2 is not None:
        expr = expr + key2.cast("bigint") * F.lit(KNUTH_B)
    x = expr % F.lit(MODULUS)
    return (x * x) % F.lit(MODULUS)


def pseudo_random_sql(key1: str, key2: str | None = None, seed: int = 42) -> str:
    """ANSI-SQL twin of `pseudo_random` for oracle queries."""
    expr = f"CAST({key1} AS BIGINT) * {KNUTH_A} + {int(seed) * SEED_MIX}"
    if key2 is not None:
        expr += f" + CAST({key2} AS BIGINT) * {KNUTH_B}"
    x = f"(({expr}) % {MODULUS})"
    return f"(({x} * {x}) % {MODULUS})"


def pseudo_random_py(key1: int, key2: int | None = None, seed: int = 42) -> int:
    """Driver-side Python twin of `pseudo_random` (the `term_bucket_py`
    pattern): pure integer arithmetic, bit-identical to the SQL form
    for non-negative keys, so a planner can derive pseudo-random model
    structure (e.g. the forest split table) without a cluster job."""
    expr = int(key1) * KNUTH_A + int(seed) * SEED_MIX
    if key2 is not None:
        expr += int(key2) * KNUTH_B
    x = expr % MODULUS
    return (x * x) % MODULUS


def md5_bigint(col: Column, hex_digits: int = 14) -> Column:
    """Stable 56-bit integer hash of a string column via md5.

    md5 is bit-identical across engines (unlike Spark's murmur
    `hash()`), so signatures built on it (MinHash, fingerprints) are
    oracle-checkable. 14 hex digits keeps the value < 2^56, safely
    inside BIGINT for downstream modular arithmetic.
    """
    return F.conv(F.substring(F.md5(col), 1, hex_digits), 16, 10).cast("bigint")
