"""Local clone of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and order-insensitive values (exact for
ints/strings/bools, exact-or-1e-12-relative for floats so we catch
accidental FP-order dependence before the driver's hash does).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


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
        # arrays must be EXACT (no float tolerance): the driver's
        # value-hash stringifies them, so a last-ulp difference fails
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


def compare(name, spark_pdf, duck_pdf) -> list[str]:
    problems = []
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
        problems.append("WARN-INEXACT: values equal only within tolerance (hash would differ!)")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from patientdataintegration_spark.session import build_session

    spark = build_session("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} rows):")
            for p in problems:
                print(f"  {p}")
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
