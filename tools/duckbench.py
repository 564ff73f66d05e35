#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over the raw testdata parquet and
compare per-query against the Spark engine's BENCH_FULL.json — the
single-node-engine head-to-head BENCH_NOTES tracks per round.

Usage: python3 tools/duckbench.py <sfDir> <verifyOutDir> [BENCH_FULL.json] [--timeout=SEC]

--timeout interrupts a query after SEC seconds and records it as a
">=SEC" lower bound — at sf10 a handful of oracle replays (the span
family, jaccard) run 10x-100x past Spark and would otherwise dominate
the wall of the whole head-to-head without changing its conclusion.

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


def main(sf_dir, out_dir, bench_path=None, timeout=None):
    import threading
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
    timed_out = set()
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        timer = None
        # the timer can fire in the window between fetchall() returning
        # and cancel() running — without the flag guard that late
        # interrupt() lands on the NEXT query and spuriously records it
        # as a timeout. The flag is cleared BEFORE cancel() so a
        # late-firing callback becomes a no-op.
        running = {"q": name}
        if timeout:
            def _interrupt(qname=name):
                if running.get("q") == qname:
                    con.interrupt()
            timer = threading.Timer(timeout, _interrupt)
            timer.start()
        try:
            con.execute(sql).fetchall()
            times[name] = time.time() - t0
        except duckdb.InterruptException:
            times[name] = time.time() - t0
            timed_out.add(name)
            print(f"TIMEOUT {name}: >= {times[name]:.0f}s (lower bound)")
        except Exception as e:
            times[name] = None
            if timeout and time.time() - t0 >= timeout:
                times[name] = time.time() - t0
                timed_out.add(name)
                print(f"TIMEOUT {name}: >= {times[name]:.0f}s (lower bound)")
            else:
                print(f"ERR  {name}: {e}")
        finally:
            running["q"] = None
            if timer:
                timer.cancel()
    total = sum(v for v in times.values() if v is not None)
    plus = "+" if timed_out else ""
    print(f"duckdb_total={total:.1f}s{plus} over {len(times)} oracles"
          + (f" ({len(timed_out)} timed out — totals are lower bounds)" if timed_out else ""))
    if spark:
        st = sum(float(spark[n]) for n in times if n in spark)
        print(f"spark_total={st:.1f}s on the same names")
        print(f"\n{'query':34s} {'duck':>7s} {'spark':>7s} {'ratio':>6s}")
        for n, dv in sorted(times.items(), key=lambda kv: -(kv[1] or 0)):
            if dv is None or n not in spark:
                continue
            sv = float(spark[n])
            mark = ">=" if n in timed_out else "  "
            print(f"{n:34s} {mark}{dv:5.2f} {sv:7.2f} {sv / dv if dv > 0 else 0:6.1f}x")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--timeout=")]
    tmo = next((float(a.split("=", 1)[1]) for a in sys.argv[1:]
                if a.startswith("--timeout=")), None)
    main(args[0], args[1], args[2] if len(args) > 2 else None, timeout=tmo)
