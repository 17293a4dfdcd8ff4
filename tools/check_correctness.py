"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a scale factor,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet,
and compares row count, column names, and values (exact, after
sorting columns by name and rows by all columns).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _norm(v.item())
    except ImportError:
        pass
    import datetime as dt
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm(r[i]) for i in order))
    return sorted(cols), sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from aligned_spark.session import get_spark

    spark = get_spark("correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"ROWS  {name}: {len(spark_rows)} rows, cols={spark_cols}"
                f"  ({time.time()-t0:.1f}s)"
            )
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            oracle_cols = [d[0] for d in res.description]
            oracle_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, sr = _rowset(spark_cols, spark_rows)
        oc, orows = _rowset(oracle_cols, oracle_rows)
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} != {oc}")
            n_fail += 1
            continue
        if len(sr) != len(orows):
            print(f"FAIL  {name}: rowcount {len(sr)} != {len(orows)}")
            n_fail += 1
            continue
        if sr != orows:
            bad = [
                (a, b) for a, b in zip(sr, orows) if a != b
            ][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(sr)} rows  ({time.time()-t0:.1f}s)")
        n_pass += 1

    print(
        f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"(sf={sf_dir}) =="
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
