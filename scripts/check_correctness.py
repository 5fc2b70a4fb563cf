#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
twin in DuckDB over the same parquet tables, then compares row count,
column-name set, and a canonical value hash (columns sorted by name,
floats rounded, rows sorted) — the same shape as CORRECTNESS_r{N}.json.

Usage: python3 scripts/check_correctness.py [--sf-dir /root/testdata/sf0.01]
       [--only q_name,q_name2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import traceback

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: json.dumps(v, sort_keys=True, default=str)
                if isinstance(v, (list, dict, tuple)) else v
            )
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    body = df.to_csv(index=False, float_format="%.6f")
    return hashlib.sha256(body.encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--json-out",
        default=None,
        help="write the per-query result rows to this JSON file "
        "(second-scale-factor evidence: run with --sf-dir .../sf0.1)",
    )
    args = ap.parse_args()

    import __spark_entry__ as ent
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.session import get_spark

    spark = get_spark()
    qs = ent.queries()
    oracles = ent.oracle_sql()
    only = {s for s in args.only.split(",") if s}

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    out: dict[str, dict] = {}
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row: dict = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            sdf = fn(spark, args.sf_dir).toPandas()
            if name not in oracles:
                row.update(spark_rows=len(sdf), err="no_oracle")
                out[name] = row
                print(f"{name:28s} NO-ORACLE rows={len(sdf)}")
                continue
            odf = con.execute(oracles[name]).df()
            row["spark_rows"], row["oracle_rows"] = len(sdf), len(odf)
            row["rows_match"] = len(sdf) == len(odf)
            row["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
            row["hash_match"] = (
                row["rows_match"] and row["schema_match"] and _canon(sdf) == _canon(odf)
            )
            ok = row["hash_match"]
            print(f"{name:28s} {'PASS' if ok else 'FAIL'} "
                  f"rows={len(sdf)}/{len(odf)} schema={row['schema_match']}")
            if not ok:
                fails.append(name)
                if not row["schema_match"]:
                    print(f"    spark cols:  {sorted(sdf.columns)}")
                    print(f"    oracle cols: {sorted(odf.columns)}")
        except Exception:
            row["err"] = traceback.format_exc(limit=3)
            fails.append(name)
            print(f"{name:28s} ERROR\n{row['err']}")
        out[name] = row

    n = len(out)
    npass = sum(1 for r in out.values() if r.get("hash_match"))
    print(f"\n{npass}/{n} hash-pass; fails: {fails or 'none'}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(
                {"sf_dir": args.sf_dir, "n_pass": npass, "n_total": n,
                 "fails": fails, "rows": out},
                f, indent=1,
            )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
