"""Library-level correctness verification: run a named suite query on
Spark AND its ANSI-SQL oracle twin on DuckDB over the same parquet
tables, and compare row count, column names, and order-insensitive
values (exact for ints/strings/bools; floats flagged separately when
they only match within tolerance — a tolerance-only match means a
value-hash gate would fail).

This is the engine's answer to "how do I trust the migration?": a
user switching from the reference pipeline can verify any operator
against an independent engine with one call
(`Engine.verify("q04_auroc")`). `tools/oracle_check.py` is the CLI
over this module.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(x):
    """numpy arrays/scalars → plain python so str() and == behave."""
    if hasattr(x, "tolist"):
        return x.tolist()
    if hasattr(x, "item"):
        return x.item()
    return x


def canon(df) -> list[tuple]:
    """Column-name-sorted, row-sorted representation (driver-style)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm(x) for x in r) for r in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        if (
            not isinstance(a, (list, tuple))
            or not isinstance(b, (list, tuple))
            or len(a) != len(b)
        ):
            return False
        # arrays must be EXACT (no float tolerance): a value-hash
        # stringifies them, so a last-ulp difference fails
        return all(
            x == y
            or (x is None and y is None)
            or (
                isinstance(x, float)
                and isinstance(y, float)
                and math.isnan(x)
                and math.isnan(y)
            )
            for x, y in zip(a, b)
        )
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        if af == bf:
            return True
        return abs(af - bf) <= 1e-12 * max(abs(af), abs(bf))
    return a == b or str(a) == str(b)


def compare_frames(spark_pdf, duck_pdf) -> list[str]:
    """Problems list; empty = exact match. 'WARN-INEXACT' entry =
    tolerance-only float match (a hash gate would fail)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    sa, sb = canon(spark_pdf), canon(duck_pdf)
    n_bad = 0
    exact = True
    for ra, rb in zip(sa, sb):
        for va, vb in zip(ra, rb):
            if not values_equal(va, vb):
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"value: spark={ra} duck={rb}")
                break
            if isinstance(va, (list, tuple)) or isinstance(vb, (list, tuple)):
                continue  # elementwise equality already established above
            if va != vb and not (va is None and vb is None):
                try:
                    fa, fb = float(va), float(vb)
                    if fa != fb and not (math.isnan(fa) and math.isnan(fb)):
                        exact = False
                except (TypeError, ValueError):
                    exact = False
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    if not problems and not exact:
        problems.append(
            "WARN-INEXACT: values equal only within tolerance (hash would differ!)"
        )
    return problems


def duckdb_connection(sf_dir: str):
    """A DuckDB connection with the catalog tables registered as
    views over the same parquet files Spark reads."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def verify_query(
    spark: SparkSession, sf_dir: str, name: str, con=None
) -> dict:
    """Run one named suite query and its oracle; return a result dict
    {name, rows, match, problems, rows_only}."""
    from patientdataintegration_spark.suite import ORACLES, QUERIES

    if name not in QUERIES:
        raise KeyError(f"unknown query {name!r}")
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        return {
            "name": name,
            "rows": len(sdf),
            "match": None,
            "problems": [],
            "rows_only": True,
        }
    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        ddf = con.execute(ORACLES[name]).fetchdf()
    finally:
        if own_con:
            con.close()
    problems = compare_frames(sdf, ddf)
    return {
        "name": name,
        "rows": len(sdf),
        "match": not problems,
        "problems": problems,
        "rows_only": False,
    }
