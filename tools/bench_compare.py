#!/usr/bin/env python3
"""Single-node baseline context for BENCH (BASELINE.md: the reference
publishes no numbers, so DuckDB — the correctness oracle — doubles as
the independent single-node baseline on identical queries).

Usage: python3 tools/bench_compare.py <sfDir> <benchJson> <oracleJson> > BENCH_NOTES.md
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, bench_json, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    bench = json.load(open(bench_json))["queries"]
    oracle = json.load(open(oracle_json))
    rows = []
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows.append((name, bench.get(name), best))
    print(f"# BENCH_NOTES — Spark engine vs DuckDB single-node on identical queries ({sf_dir})\n")
    print("DuckDB is the correctness oracle; its single-node time on the SAME SQL is")
    print("the closest available independent baseline (the pandas reference publishes")
    print("no numbers — BASELINE.md). Spark times include job-scheduling overhead per")
    print("query (~0.1-0.2 s), which dominates at this scale and vanishes at larger SFs.\n")
    print("| query | spark (s) | duckdb (s) | ratio |")
    print("|---|---|---|---|")
    total_s = total_d = 0.0
    for name, s, d in rows:
        if s is None:
            continue
        total_s += s
        total_d += d
        print(f"| {name} | {s:.2f} | {d:.3f} | {s / d if d > 0 else float('inf'):.1f}x |")
    print(f"| **total (oracled)** | **{total_s:.1f}** | **{total_d:.1f}** | "
          f"**{total_s / total_d:.1f}x** |")


if __name__ == "__main__":
    main(*sys.argv[1:4])
