"""Emulate the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB, compare row count, column names,
and order-insensitive values (exact for ints/strings/dates, 1e-9-rel
for floats).

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hospital_stain_tracker_data_pipeline_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return v


def compare_frames(spark_rows, duck_rows, cols):
    if len(spark_rows) != len(duck_rows):
        return f"row count {len(spark_rows)} vs {len(duck_rows)}"

    def key(row):
        return tuple(str(normalize_cell(v)) for v in row)

    s_sorted = sorted(spark_rows, key=key)
    d_sorted = sorted(duck_rows, key=key)
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for c, sv, dv in zip(cols, sr, dr):
            sv, dv = normalize_cell(sv), normalize_cell(dv)
            if sv is None and dv is None:
                continue
            if isinstance(sv, float) and isinstance(dv, float):
                if abs(sv - dv) > 1e-9 * max(1.0, abs(sv), abs(dv)):
                    return f"row {i} col {c}: {sv!r} vs {dv!r}"
            elif str(sv) != str(dv):
                return f"row {i} col {c}: {sv!r} vs {dv!r}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            dres = con.execute(oracles[name])
            dcols = [d[0] for d in dres.description]
            duck_rows = dres.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        if sorted(cols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(cols)} vs {sorted(dcols)}")
            continue
        # align column order by name
        sidx = [cols.index(c) for c in sorted(cols)]
        didx = [dcols.index(c) for c in sorted(dcols)]
        s_rows = [tuple(r[i] for i in sidx) for r in spark_rows]
        d_rows = [tuple(r[i] for i in didx) for r in duck_rows]
        err = compare_frames(s_rows, d_rows, sorted(cols))
        if err:
            failures.append(name)
            print(f"FAIL  {name}: {err}")
        else:
            print(f"ok    {name}: {len(spark_rows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
