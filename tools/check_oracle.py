#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name> directory of Spark parquet under verifyOutDir, runs
oracle_sql.json[<name>] in DuckDB with views over the sfDir tables and
compares: schema (column names), row count, and cell values (columns
sorted by name, rows sorted, exact match after canonicalization).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    # every cell becomes a (tag, str) pair so rows sort across NULLs
    # and mixed types (rollup/cube emit NULL subtotal keys)
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "NaN")
        return (1, repr(round(v, 9)))
    if hasattr(v, "isoformat"):
        return (2, v.isoformat())
    if isinstance(v, list):
        return (3, repr([canon(x) for x in v]))
    return (4, str(v))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        spark_cols = sorted(spark_rel.columns)
        spark_rows = sorted(
            tuple(canon(v) for v in row) for row in con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols) +
                f" FROM spark_rel").fetchall())
        if name not in oracles:
            print(f"  {name}: NO-ORACLE rows={len(spark_rows)} "
                  f"cols={spark_cols}")
            continue
        try:
            ora = con.sql(oracles[name])
            ora_cols = sorted(ora.columns)
            ora_rows = sorted(
                tuple(canon(v) for v in row) for row in con.sql(
                    "SELECT " + ", ".join(f'"{c}"' for c in ora_cols) +
                    " FROM ora").fetchall())
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        if spark_cols != ora_cols:
            print(f"✗ {name}: SCHEMA spark={spark_cols} oracle={ora_cols}")
            n_fail += 1
        elif len(spark_rows) != len(ora_rows):
            print(f"✗ {name}: ROWS spark={len(spark_rows)} "
                  f"oracle={len(ora_rows)}")
            n_fail += 1
        elif spark_rows != ora_rows:
            bad = [(a, b) for a, b in zip(spark_rows, ora_rows) if a != b]
            print(f"✗ {name}: VALUES {len(bad)}/{len(spark_rows)} differ; "
                  f"first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"✓ {name}: {len(spark_rows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
