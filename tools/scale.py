#!/usr/bin/env python3
"""Bench-only scale-up of a testdata SF dir: N shifted copies of each
fact table, FK-consistent (every key column in a copy is shifted by the
same per-copy offset, so joins keep their selectivity). Dimension
tables (region, nation) keep their fixed domain. NOT for oracle runs —
the driver's correctness gate stays on the pristine sf dirs.

Usage: python3 tools/scale.py SRC_DIR DST_DIR COPIES
       python3 tools/scale.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys

import duckdb

# key columns that shift per copy (offset = copy_idx * OFF, one OFF per
# key domain so references stay aligned across tables)
SHIFTS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}
# one offset per key DOMAIN (l_orderkey must shift exactly like
# o_orderkey); big round numbers far above any sf's max key
DOMAIN_OFF = {
    "c_custkey": 10_000_000, "o_custkey": 10_000_000,
    "o_orderkey": 100_000_000, "l_orderkey": 100_000_000,
    "p_partkey": 10_000_000, "l_partkey": 10_000_000,
    "s_suppkey": 1_000_000, "l_suppkey": 1_000_000,
    "event_id": 100_000_000, "user_id": 10_000_000,
    "doc_id": 10_000_000, "vec_id": 10_000_000,
}


def main() -> None:
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFTS.items():
        src_file = f"{src}/{table}.parquet"
        dst_file = f"{dst}/{table}.parquet"
        if not keys:  # fixed-domain dimension: copy through
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)")
            continue
        if table == "events":
            # events.ts is TIMESTAMP(NANOS) in the pristine testdata;
            # DuckDB's parquet writer coerces timestamps to micros (even
            # through a TIMESTAMP_NS cast), which changes the physical
            # type the Spark side reads (nanosAsLong) and breaks every
            # events query. Scale this table with pyarrow, which
            # round-trips ns exactly.
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq
            t = pq.read_table(src_file)
            chunks = []
            for i in range(copies):
                tt = t
                for k in keys:
                    off = i * DOMAIN_OFF[k]
                    if off:
                        tt = tt.set_column(tt.column_names.index(k), k,
                                           pc.add(tt.column(k), off))
                chunks.append(tt)
            pq.write_table(pa.concat_tables(chunks), dst_file)
            n = pq.read_metadata(dst_file).num_rows
            print(f"{table}: {n} rows (pyarrow, ns preserved)")
            continue
        selects = []
        for i in range(copies):
            repl = ", ".join(f"{k} + {i * DOMAIN_OFF[k]} AS {k}" for k in keys)
            selects.append(
                f"SELECT * REPLACE ({repl}) FROM read_parquet('{src_file}')")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{dst_file}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst_file}')").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
