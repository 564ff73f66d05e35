#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the raw
testdata parquet tables, and compares row counts, schemas (loosely)
and values (exact, after sorting columns by name and rows by value).
"""
import json
import math
import sys

import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    # Type- AND repr-strict (round-9 incident): the driver's hasher
    # distinguishes representations that Python `==` equates — a
    # Decimal('1.5') on one side vs float 1.5 on the other passed the
    # old comparison but failed the driver gate. Canonicalizing every
    # value to "typename:repr" makes this gate at least as strict:
    # repr() is injective on doubles (shortest-roundtrip), so any ulp
    # or representation divergence fails here first.
    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, float):
                canon_row.append("float:NaN" if math.isnan(v) else f"float:{v!r}")
            else:
                canon_row.append(f"{type(v).__name__}:{v!r}")
        out.append(tuple(canon_row))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
            spark_cols = sorted(spark_tbl.column_names)
            spark_rows = canon(
                zip(*[spark_tbl.column(c).to_pylist() for c in spark_cols]))
            duck = con.execute(sql).arrow()
            duck_cols = sorted(duck.column_names)
            duck_rows = canon(
                zip(*[duck.column(c).to_pylist() for c in duck_cols]))
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: exception {type(e).__name__}: {e}")
            continue
        if spark_cols != duck_cols:
            failures.append(name)
            print(f"FAIL  {name}: columns {spark_cols} != {duck_cols}")
            continue
        if len(spark_rows) != len(duck_rows):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(spark_rows)} != {len(duck_rows)}")
            continue
        if spark_rows != duck_rows:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(spark_rows, duck_rows) if a != b)
            print(f"FAIL  {name}: {ndiff}/{len(spark_rows)} rows differ")
            for a, b in list(zip(spark_rows, duck_rows))[:2000]:
                if a != b:
                    print(f"      spark={a}\n      duck ={b}")
                    break
            continue
        print(f"ok    {name} ({len(spark_rows)} rows)")
    extra = []  # queries without oracle: rows-only smoke
    import os
    for nm in sorted(os.listdir(out_dir)):
        if nm in oracle or nm == "oracle_sql.json":
            continue
        n = ds.dataset(f"{out_dir}/{nm}").to_table().num_rows
        status = "ok(rows)" if n > 0 else "EMPTY"
        if n == 0:
            failures.append(nm)
        print(f"{status:9s} {nm} ({n} rows, no oracle)")
        extra.append(nm)
    print(f"\n{len(oracle) - len([f for f in failures if f in oracle])}/"
          f"{len(oracle)} oracled queries pass; "
          f"{len(extra)} rows-only; {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
