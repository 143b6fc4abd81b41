"""Local mimic of the driver's CORRECTNESS gate.

Runs the named `queries()` entries at an sf dir (default sf0.01), runs
the matching `oracle_sql()` in DuckDB over the same parquet views, and
compares row count, column names, and values after sorting rows — the
same signal the driver hashes. Stricter than the driver: values must
be exactly equal (floats bit-equal after both sides' ROUND), so a pass
here implies a driver hash match.

Usage: python scripts/check_driver.py [query ...] [--sf DIR] [--diag]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def compare(name: str, spdf: pd.DataFrame, opdf: pd.DataFrame) -> bool:
    ok = True
    if len(spdf) != len(opdf):
        print(f"  ROWS MISMATCH spark={len(spdf)} oracle={len(opdf)}")
        ok = False
    scols, ocols = sorted(spdf.columns), sorted(opdf.columns)
    if scols != ocols:
        print(f"  SCHEMA MISMATCH spark={scols} oracle={ocols}")
        return False
    s = spdf[scols].sort_values(scols, na_position="last").reset_index(drop=True)
    o = opdf[scols].sort_values(scols, na_position="last").reset_index(drop=True)
    if not ok:
        return False
    for c in scols:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sv = sv.astype(np.float64).to_numpy()
            ov = ov.astype(np.float64).to_numpy()
            nan_ok = np.isnan(sv) == np.isnan(ov)
            both = ~np.isnan(sv) & ~np.isnan(ov)
            eq = np.zeros(len(sv), dtype=bool)
            eq[both] = sv[both] == ov[both]
            eq |= np.isnan(sv) & nan_ok
            bad = ~eq
            if bad.any():
                d = np.abs(sv[both] - ov[both])
                print(f"  COL {c}: {bad.sum()} mismatches, "
                      f"maxdiff={d.max() if both.any() else 'nan-pattern'}")
                i = np.flatnonzero(bad)[:3]
                for j in i:
                    print(f"    row {j}: spark={sv[j]!r} oracle={ov[j]!r}")
                ok = False
        else:
            bad = ~((sv == ov) | (sv.isna() & ov.isna()))
            if bad.any():
                print(f"  COL {c}: {bad.sum()} mismatches")
                for j in np.flatnonzero(bad.to_numpy())[:3]:
                    print(f"    row {j}: spark={sv.iloc[j]!r} oracle={ov.iloc[j]!r}")
                ok = False
    return ok


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    argv = sys.argv[1:]
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]  # drop the flag AND its value
    diag = "--diag" in argv
    args = [a for a in argv if not a.startswith("--")]

    import __spark_entry__ as E
    from extract_sf_r_parallel_spark.session import get_spark

    qs, osql = E.queries(), E.oracle_sql()
    names = args or [n for n in qs if n in osql]
    spark = get_spark(app="check_driver", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_ok = 0
    for name in names:
        t0 = time.time()
        spdf = qs[name](spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in osql:
            print(f"{name}: NO ORACLE (rows={len(spdf)})")
            continue
        opdf = con.sql(osql[name]).df()
        t2 = time.time()
        good = compare(name, spdf, opdf)
        n_ok += good
        print(f"{name}: {'OK' if good else 'FAIL'} rows={len(spdf)} "
              f"spark={t1 - t0:.1f}s duck={t2 - t1:.1f}s")
        if diag and not good:
            print(spdf.head())
            print(opdf.head())
    print(f"{n_ok}/{len([n for n in names if n in osql])} green")
    return 0 if n_ok == len([n for n in names if n in osql]) else 1


if __name__ == "__main__":
    raise SystemExit(main())
