#!/usr/bin/env python3
"""Bench-only scale-up of a testdata SF dir: N shifted copies of each
fact table, FK-consistent (every key column in a copy is shifted by the
same per-copy offset, so joins keep their selectivity). Dimension
tables (region, nation) keep their fixed domain. NOT for oracle runs —
the driver's correctness gate stays on the pristine sf dirs.

Usage: python3 tools/scale.py SRC_DIR DST_DIR COPIES [--neardup]
       python3 tools/scale.py /root/testdata/sf0.1 /tmp/sf1 10 --neardup

--neardup: realistic near-duplicate structure for documents and
embeddings instead of exact copies. Plain copy-scaling makes EVERY
doc/vector a COPIES-member identical clique — a degenerate corpus for
the near-dup/pair operators (round-6 verdict: the pair family had to
be excluded from the sf10 bench on that fixture). With --neardup,
each source row draws a clique size K from a zipf-ish tail
(P(K ≥ k) = 1/k, mean ≈ ln COPIES): copies i < K are token/vector
jittered NEAR-dups of the original; copies i ≥ K are heavily mutated
DISTINCT rows. Deterministic (hash-seeded per row+copy), so fixtures
reproduce bit-for-bit. Row counts and key shifting are identical to
the exact mode.
"""
import random
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


def clique_size(row_key: int, copies: int) -> int:
    """Zipf-tailed near-dup clique size in [1, copies]: P(K >= k) = 1/k.
    Deterministic per source row (Knuth multiplicative hash)."""
    u = (((row_key * 2654435761) & 0xFFFFFFFF) + 0.5) / 2**32
    return min(copies, int(1.0 / u))


def mutate_text(text: str, rate: float, rng: random.Random, tag: str) -> str:
    """Token-level edits at `rate`: each token independently replaced
    with a copy-unique token (or dropped, 1 in 4 edits)."""
    out = []
    for j, tok in enumerate(text.split(" ")):
        if rng.random() < rate:
            if rng.random() < 0.25:
                continue  # deletion
            out.append(f"{tag}x{j}")
        else:
            out.append(tok)
    return " ".join(out)


def scale_documents_neardup(src_file: str, dst_file: str, copies: int) -> int:
    """COPIES shifted copies of documents with realistic near-dup
    structure: copy 0 pristine; copies i < K(doc) lightly jittered
    (3% token edits — inside minhash/simhash near-dup range); copies
    i >= K heavily mutated (60% — distinct content)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pq.read_table(src_file)
    cols = t.column_names
    doc_idx = cols.index("doc_id")
    text_idx = cols.index("text")
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    chunks = [t]  # copy 0 pristine
    for i in range(1, copies):
        new_texts = []
        for d, txt in zip(doc_ids, texts):
            if txt is None:
                new_texts.append(None)
                continue
            rate = 0.03 if i < clique_size(d, copies) else 0.6
            # tag carries doc AND copy: replacement tokens must never
            # collide across docs, or the heavily-mutated copies would
            # themselves form one giant spurious near-dup clique
            new_texts.append(
                mutate_text(txt, rate, random.Random((d << 20) ^ i), f"c{i}d{d}"))
        tt = t.set_column(doc_idx, "doc_id",
                          pa.array([d + i * DOMAIN_OFF["doc_id"] for d in doc_ids],
                                   type=t.schema.field("doc_id").type))
        tt = tt.set_column(text_idx, "text",
                           pa.array(new_texts, type=t.schema.field("text").type))
        chunks.append(tt)
    pq.write_table(pa.concat_tables(chunks), dst_file)
    return pq.read_metadata(dst_file).num_rows


def scale_embeddings_neardup(src_file: str, dst_file: str, copies: int) -> int:
    """COPIES shifted copies of embeddings with near-dup structure:
    copies i < K(vec) get small gaussian jitter (cosine ~0.999 to the
    original); copies i >= K are fresh random directions."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pq.read_table(src_file)
    vec_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = emb.shape
    scale = float(np.abs(emb).mean())
    ks = np.minimum(copies, (1.0 / ((((vec_ids * 2654435761) & 0xFFFFFFFF)
                                     + 0.5) / 2**32)).astype(np.int64))
    vec_type = t.schema.field("vec_id").type
    emb_type = t.schema.field("embedding").type
    chunks = [t]
    for i in range(1, copies):
        rng = np.random.default_rng(900000 + i)
        is_near = i < ks
        jittered = emb + rng.normal(0.0, 0.02 * scale, emb.shape).astype(np.float32)
        fresh = rng.normal(0.0, scale, emb.shape).astype(np.float32)
        new_emb = np.where(is_near[:, None], jittered, fresh)
        tt = pa.table({
            "vec_id": pa.array(vec_ids + i * DOMAIN_OFF["vec_id"], type=vec_type),
            "embedding": pa.array(list(new_emb), type=emb_type),
        })
        # keep any extra columns by rebuilding in source column order
        extra = [c for c in t.column_names if c not in ("vec_id", "embedding")]
        if extra:
            data = {c: t.column(c) for c in t.column_names}
            data["vec_id"] = tt.column("vec_id")
            data["embedding"] = tt.column("embedding")
            tt = pa.table({c: data[c] for c in t.column_names})
        chunks.append(tt)
    pq.write_table(pa.concat_tables(chunks), dst_file)
    return pq.read_metadata(dst_file).num_rows


def valid_parquet(path: str) -> bool:
    """A killed COPY leaves a non-empty file with no footer (parquet
    footers are written last) — existence/size checks would 'keep' the
    corrupt file forever. Only a readable footer counts as done."""
    import os
    import pyarrow.parquet as pq
    if not os.path.exists(path):
        return False
    try:
        pq.read_metadata(path)
        return True
    except Exception:
        return False


def main() -> None:
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    neardup = "--neardup" in sys.argv[4:]
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # stream the big COPYs: without these, the 1000-copy lineitem write
    # buffers the whole result for insertion-order preservation
    # (~100 GB resident before being killed). Row order within the
    # fixture is meaningless — every consumer keys on the shifted ids.
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='24GB'")
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for table, keys in SHIFTS.items():
        src_file = f"{src}/{table}.parquet"
        dst_file = f"{dst}/{table}.parquet"
        if valid_parquet(dst_file):
            print(f"{table}: kept existing {dst_file}")
            continue
        # all writers target a temp name and rename on success, so a
        # killed run never leaves a footerless file under the final name
        tmp_file = f"{dst_file}.tmp"
        if os.path.exists(tmp_file):
            os.remove(tmp_file)
        if not keys:  # fixed-domain dimension: copy through
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{tmp_file}' (FORMAT PARQUET)")
            os.replace(tmp_file, dst_file)
            continue
        if neardup and table == "documents":
            n = scale_documents_neardup(src_file, tmp_file, copies)
            os.replace(tmp_file, dst_file)
            print(f"{table}: {n} rows (neardup mutation)")
            continue
        if neardup and table == "embeddings":
            n = scale_embeddings_neardup(src_file, tmp_file, copies)
            os.replace(tmp_file, dst_file)
            print(f"{table}: {n} rows (neardup jitter)")
            continue
        if table == "events":
            # events.ts has shipped as TIMESTAMP(NANOS) and as µs
            # TIMESTAMP across driver testdata versions; DuckDB's
            # parquet writer coerces timestamps to micros, which would
            # silently change the physical type the Spark side reads on
            # the nanos generation. Scale this table with pyarrow,
            # which round-trips the source type exactly either way.
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
            pq.write_table(pa.concat_tables(chunks), tmp_file)
            os.replace(tmp_file, dst_file)
            n = pq.read_metadata(dst_file).num_rows
            print(f"{table}: {n} rows (pyarrow, source ts type preserved)")
            continue
        # one cross-join against the copy-index series instead of a
        # copies-way UNION ALL (which trips DuckDB's expression-depth
        # limit at copies=1000 for the sf100 decade fixture). The
        # qualified star keeps _copy.i out of the output schema (a bare
        # SELECT * expands over BOTH relations and leaks the copy index
        # as an extra BIGINT column into the fixture).
        repl = ", ".join(
            f"src.{k} + _copy.i * {DOMAIN_OFF[k]} AS {k}" for k in keys)
        con.execute(
            f"COPY (SELECT src.* REPLACE ({repl}) FROM read_parquet('{src_file}') src, "
            f"(SELECT UNNEST(generate_series(0, {copies - 1})) AS i) _copy) "
            f"TO '{tmp_file}' (FORMAT PARQUET)")
        os.replace(tmp_file, dst_file)
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst_file}')").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
