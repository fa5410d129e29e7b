"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, schema (sorted column names)
and an order-insensitive value comparison (columns sorted by name, rows
sorted by all columns, exact string equality per cell after canonical
formatting). Exact-string equality is intentionally stricter than any
tolerance the driver might use.

Usage: python tools/check_oracle.py [--sf-dir DIR] [--only name1,name2]
       [--registry window|rotated|staged|all]

``--registry`` widens the sweep beyond the driver's 50-slot window to
the rotated-out and staged registries (the same comparison pytest runs
in tests/test_rotated_contract.py), so an auditor can re-verify EVERY
oracle-backed entry from one command.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--registry",
        default="window",
        choices=("window", "rotated", "staged", "all"),
    )
    args = ap.parse_args()
    # computed VALUES-literal oracles must be generated at the same scale
    os.environ["LETSEARCH_ORACLE_SF_DIR"] = args.sf_dir

    import duckdb

    import __spark_entry__ as entrymod
    from letsearch_spark.queries import TABLES
    from letsearch_spark.session import get_spark

    spark = get_spark("check-oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs = dict(entrymod.queries()) if args.registry in ("window", "all") else {}
    oracles = dict(entrymod.oracle_sql()) if qs else {}
    if args.registry in ("rotated", "all"):
        from letsearch_spark.queries import (
            ROTATED_OUT_ORACLES,
            ROTATED_OUT_QUERIES,
        )

        qs.update(ROTATED_OUT_QUERIES)
        oracles.update(
            {
                k: (v(args.sf_dir) if callable(v) else v)
                for k, v in ROTATED_OUT_ORACLES.items()
            }
        )
    if args.registry in ("staged", "all"):
        from letsearch_spark.queries import STAGED_ORACLES, STAGED_QUERIES

        qs.update(STAGED_QUERIES)
        oracles.update(
            {
                k: (v(args.sf_dir) if callable(v) else v)
                for k, v in STAGED_ORACLES.items()
            }
        )
    only = set(args.only.split(",")) if args.only else None

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            if len(srows) == 0:
                print(f"      WARNING {name} returned 0 rows")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = list(ddf.columns)
            drows = ddf.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue

        s_cols, s_rows = frame_to_rows(scols, srows)
        d_cols, d_rows = frame_to_rows(dcols, drows)
        problems = []
        if s_cols != d_cols:
            problems.append(f"schema: spark={s_cols} duckdb={d_cols}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}")
        if not problems and s_rows != d_rows:
            # find first differing row for the report
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    problems.append(f"first diff at sorted row {i}:\n"
                                    f"        spark : {a}\n"
                                    f"        duckdb: {b}")
                    break
        if problems:
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s_rows)} rows match exactly "
                  f"[{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
