#!/usr/bin/env python
"""Local mimic of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() twin on DuckDB over the same parquet, compare
row count, column names, and sorted values (exact for ints/strings, 1e-9 rel
tol for floats).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _type_class(x) -> str:
    """Coarse type family for pairing AND comparison: None is its own class
    (never equal to the string 'None'); bool folds into num (True == 1 —
    engines disagree on boolean-expr result types); int/float/Decimal unify
    (BIGINT 2 must pair with DOUBLE 2.0, but NOT with the string '2')."""
    if x is None:
        return "null"
    if isinstance(x, (bool, int, float, decimal.Decimal)):
        return "num"
    if isinstance(x, str):
        return "str"
    return "other"


def _canon_value(x) -> tuple[str, str]:
    """(type_class, canonical string). Numerics render at 6dp — the gate
    convention rounds floats to 6dp on both sides, so sub-6dp noise collapses
    to one key and rows pair the same way values_equal judges them."""
    tc = _type_class(x)
    if tc == "null":
        return (tc, "")
    if tc == "num":
        f = float(x)
        return (tc, f"{f:.6f}" if math.isfinite(f) else str(f))
    return (tc, str(x))


def _sort_key(x) -> str:
    tc, s = _canon_value(x)
    return f"{tc}|{s}"


def canon(rows, cols):
    # case-insensitive column sort: DuckDB lowercases unquoted identifiers,
    # Spark preserves case — a case-sensitive sort could order the two sides'
    # columns differently and then "compare" mismatched columns
    idx = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(out, key=lambda t: tuple(_sort_key(x) for x in t)), [cols[i] for i in idx]


def values_equal(a, b) -> bool:
    ta, tb = _type_class(a), _type_class(b)
    if ta != tb:
        # cross-class is type drift, a real finding: NULL vs the string
        # 'None' and 123 vs '123' must FAIL here even though str() agrees
        return False
    if ta == "null":
        return True
    if ta == "num":
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:  # covers +/-inf == +/-inf (inf - inf is NaN below)
            return True
        if not (math.isfinite(fa) and math.isfinite(fb)):
            return False
        # same 6dp rendering (the gate's rounding convention) or sub-1e-9
        # relative noise
        return f"{fa:.6f}" == f"{fb:.6f}" or abs(fa - fb) <= 1e-9 * max(
            1.0, abs(fa), abs(fb)
        )
    return str(a) == str(b)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from sparkdoc.session import get_spark

    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd filter must not yield a vacuous "all queries match"
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
                print(f"FAIL {name}: rows-only query returned 0 rows")
            else:
                print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        s_sorted, s_cols = canon(srows, scols)
        o_sorted, o_cols = canon(orows, ocols)
        if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
            failures.append((name, f"columns differ: {s_cols} vs {o_cols}"))
            print(f"FAIL {name}: columns {s_cols} vs {o_cols}")
            continue
        if len(s_sorted) != len(o_sorted):
            failures.append((name, f"row count {len(s_sorted)} vs {len(o_sorted)}"))
            print(f"FAIL {name}: rows {len(s_sorted)} vs {len(o_sorted)}")
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
            if len(sr) != len(orow) or not all(values_equal(x, y) for x, y in zip(sr, orow)):
                bad = (i, sr, orow)
                break
        if bad:
            failures.append((name, f"value mismatch at sorted row {bad[0]}"))
            print(f"FAIL {name}: row {bad[0]}\n  spark: {bad[1]}\n  duck : {bad[2]}")
        else:
            print(f"PASS {name}: {len(s_sorted)} rows")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg[:200]}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
