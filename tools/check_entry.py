"""Self-check harness mimicking the driver's queries()/oracle_sql() contract.

For each query: run the Spark DataFrame and the DuckDB oracle SQL on the same
parquet tables, sort columns by name and rows by all columns, and compare
values (floats to 9 significant digits, plus an exact-equality report so
ulp-level drift is visible before the driver sees it).

Usage: python tools/check_entry.py [sf_dir] [query_name ...]

Set SPARK_GRAFT_ANSI=1 to run with spark.sql.ansi.enabled=true — the driver
owns the contract session and Spark 4 defaults ANSI ON, so every query must
also pass in that mode (the r2 checkpoint_resume red was exactly this).
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from forecaster_spark.session import get_spark  # noqa: E402
from forecaster_spark.sources import TESTDATA_TABLES  # noqa: E402


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> bool:
    ok = True
    if len(spark_pdf) != len(duck_pdf):
        print(f"  [{name}] ROWS MISMATCH spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return False
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        print(f"  [{name}] SCHEMA MISMATCH {list(a.columns)} vs {list(b.columns)}")
        return False
    exact = True
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(np.asarray(bv).dtype, np.floating):
            av = av.astype(float)
            bv = np.asarray(bv, dtype=float)
            both_nan = np.isnan(av) & np.isnan(bv)
            close = np.isclose(av, bv, rtol=1e-9, atol=1e-12) | both_nan
            if not close.all():
                bad = np.flatnonzero(~close)[:3]
                print(f"  [{name}] col {c} VALUE MISMATCH at rows {bad}: {av[bad]} vs {bv[bad]}")
                ok = False
            if not ((av == bv) | both_nan).all():
                exact = False
        else:
            if not (pd.Series(av).fillna("~N") == pd.Series(bv).fillna("~N")).all():
                neq = (pd.Series(av).fillna("~N") != pd.Series(bv).fillna("~N"))
                i = int(np.flatnonzero(neq.to_numpy())[0])
                print(f"  [{name}] col {c} MISMATCH row {i}: {av[i]!r} vs {bv[i]!r}")
                ok = False
    tag = "OK-exact" if (ok and exact) else ("OK-approx (float ulp drift!)" if ok else "FAIL")
    print(f"  [{name}] rows={len(a)} -> {tag}")
    return ok


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    extra = {}
    if os.environ.get("SPARK_GRAFT_ANSI") == "1":
        extra["spark.sql.ansi.enabled"] = "true"
        print("== ANSI mode ON (driver-session mirror) ==")
    spark = get_spark("check_entry", extra_conf=extra)
    con = duck_conn(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name silently skipping would report success having
        # checked nothing — fail loudly instead
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)

    print("== entry() smoke ==")
    edf = entrymod.entry(spark)
    print(f"  rows={edf.count()} schema={[f.name for f in edf.schema.fields]}")

    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"  [{name}] rows-only (no oracle): rows={len(sdf)}")
            continue
        ddf = con.execute(oracles[name]).df()
        if not compare(name, sdf, ddf):
            failures.append(name)
    print(f"\n{n_run - len(failures)}/{n_run} OK (of {len(qs)} registered); failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
