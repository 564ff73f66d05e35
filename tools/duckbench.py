#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over the raw testdata parquet and
compare per-query against the Spark engine's BENCH_FULL.json — the
single-node-engine head-to-head BENCH_NOTES tracks per round.

Usage: python3 tools/duckbench.py <sfDir> <verifyOutDir> [BENCH_FULL.json]

The oracle SQL is the SAME computation the Spark queries run (that is
the point of the t2 gate), so wall-clock per name is an apples-to-
apples single-node comparison: DuckDB pays no job-scheduling overhead,
Spark pays ~0.1-0.2 s per query at this scale — the interesting rows
are the data-bound ones.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, bench_path=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark = {}
    if bench_path:
        # BENCH_FULL.json is JSON-lines (totals line + data-bound line)
        with open(bench_path) as fh:
            spark = json.loads(fh.readline())["queries"]
    times = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            times[name] = None
            print(f"ERR  {name}: {e}")
    total = sum(v for v in times.values() if v is not None)
    print(f"duckdb_total={total:.1f}s over {len(times)} oracles")
    if spark:
        st = sum(float(spark[n]) for n in times if n in spark)
        print(f"spark_total={st:.1f}s on the same names")
        print(f"\n{'query':34s} {'duck':>7s} {'spark':>7s} {'ratio':>6s}")
        for n, dv in sorted(times.items(), key=lambda kv: -(kv[1] or 0)):
            if dv is None or n not in spark:
                continue
            sv = float(spark[n])
            print(f"{n:34s} {dv:7.2f} {sv:7.2f} {sv / dv if dv > 0 else 0:6.1f}x")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else None)
