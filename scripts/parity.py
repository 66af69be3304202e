"""Local emulation of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the given SF, compare row count + column names + order-insensitive
values. Usage: python scripts/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from propertygraph_spark.pipeline.session import get_spark

TABLES = ("region nation customer supplier part orders lineitem events"
          " documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: repr(v))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) "
                  f"[{t_spark:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        issues = []
        if len(sdf) != len(odf):
            issues.append(f"rowcount spark={len(sdf)} duck={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            issues.append(f"cols spark={sorted(sdf.columns)} "
                          f"duck={sorted(odf.columns)}")
        if not issues:
            cs, co = canon(sdf), canon(odf)
            if not cs.equals(co):
                diff_mask = (cs != co).any(axis=1)
                ndiff = int(diff_mask.sum())
                issues.append(f"values differ in {ndiff}/{len(cs)} rows")
                ex = diff_mask.idxmax()
                issues.append(f"  spark[{ex}]: {cs.iloc[ex].to_dict()}")
                issues.append(f"  duck [{ex}]: {co.iloc[ex].to_dict()}")
        if issues:
            print(f"FAIL  {name}: " + "; ".join(issues[:1]))
            for line in issues[1:]:
                print("      " + line)
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{t_spark:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()


if __name__ == "__main__":
    main()
