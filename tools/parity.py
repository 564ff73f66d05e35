#!/usr/bin/env python3
"""Parity spot-check vs the reference itself (SURVEY §5.2.4).

Generates a MaxQuant-style fixture, runs the pandas-only reference
modules (padua.filters / process / normalization loaded directly by
path — the package __init__ needs scipy, which isn't installed) and
diffs each pipeline stage against the Spark engine's ParityDump
output.

Usage:
  python3 tools/parity.py gen /tmp/parity/fixture.txt
  sbt "runMain graft.ParityDump /tmp/parity/fixture.txt /tmp/parity/out"
  python3 tools/parity.py check /tmp/parity/fixture.txt /tmp/parity/out
"""
import glob
import importlib.util
import math
import os
import sys

import numpy as np
import pandas as pd

REF = "/root/reference/padua"


# the only module-top imports the reference has that aren't installed
# here (utils.py). Stub exactly these, up front, so (a) exec_module runs
# ONCE (no retry loop re-running module-level side effects), and (b) no
# open-ended stub can shadow a real optional import elsewhere in the
# process.
STUB_MODULES = ("scipy", "scipy.interpolate", "requests")


def load(name):
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    import types
    for missing in STUB_MODULES:
        if missing in sys.modules:
            continue
        stub = types.ModuleType(missing)
        sys.modules[missing] = stub
        parent = missing.rsplit(".", 1)
        if len(parent) == 2 and parent[0] in sys.modules:
            setattr(sys.modules[parent[0]], parent[1], stub)
    spec.loader.exec_module(mod)
    return mod


def bench(fixture):
    """Time the reference's own pandas chain (filters -> locprob ->
    expand -> log2 -> median-center) on the fixture. Compare with the
    PIPELINE_SECONDS line ParityDump prints for the same chain."""
    import time
    filters = load("filters")
    process = load("process")
    df = pd.read_csv(fixture, sep="\t", index_col="id")
    t0 = time.time()
    s = filters.remove_rows_containing(df, "Reverse", "+")
    s = filters.remove_rows_matching(s, "Potential contaminant", "+")
    s = filters.filter_localization_probability(s)
    s = process.expand_side_table(s)
    expr_cols = [c for c in s.columns if c.startswith("Intensity ")]
    s[expr_cols] = np.log2(s[expr_cols])
    s[expr_cols] = s[expr_cols].replace([np.inf, -np.inf], np.nan)
    s[expr_cols] = s[expr_cols] - s[expr_cols].median(axis=0)
    n = s[expr_cols].notna().sum().sum()
    print(f"PANDAS_SECONDS={time.time() - t0:.3f} CELLS={int(n)}")


def gen(path, n=40):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(n):
        base = 50.0 * (i + 1)
        rows.append({
            "id": i,
            "Proteins": "P%05d;Q%05d extra" % (i, i + 1),
            "Amino acid": "STY"[i % 3],
            "Localization prob": [0.99, 0.8, 0.6, 0.3][i % 4],
            "Reverse": "+" if i % 11 == 0 else "",
            "Potential contaminant": "+" if i % 13 == 0 else "",
            "Intensity A1___1": base * (1 + 0.1 * rng.rand()),
            "Intensity A1___2": base * 0.5 * (1 + 0.1 * rng.rand()),
            "Intensity B1___1": base * 2 * (1 + 0.1 * rng.rand()),
            "Intensity B1___2": base * (1 + 0.1 * rng.rand()),
        })
    df = pd.DataFrame(rows)
    # a couple of missing cells
    df.loc[3, "Intensity A1___1"] = np.nan
    df.loc[7, "Intensity B1___2"] = np.nan
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df.to_csv(path, sep="\t", index=False)
    print(f"wrote fixture {path} ({len(df)} rows)")


def read_spark_csv(d):
    files = glob.glob(f"{d}/*.csv")
    assert files, f"no csv in {d}"
    return pd.concat([pd.read_csv(f) for f in files], ignore_index=True)


def check(fixture, outdir):
    filters = load("filters")
    process = load("process")
    normalization = load("normalization")

    df = pd.read_csv(fixture, sep="\t", index_col="id")
    failures = []

    # stage 1: flags (reference remove_contaminants is broken on modern
    # pandas — SURVEY §4.1 — so apply the documented intent via
    # remove_rows_matching, identical semantics)
    s1 = filters.remove_rows_containing(df, "Reverse", "+")
    s1 = filters.remove_rows_matching(s1, "Potential contaminant", "+")
    got1 = sorted(read_spark_csv(f"{outdir}/after_flags")["id"].tolist())
    want1 = sorted(s1.index.tolist())
    ok1 = got1 == want1
    print(("ok  " if ok1 else "FAIL") + f" after_flags: {len(got1)} rows")
    if not ok1:
        failures.append("after_flags")

    # stage 2: localization probability
    s2 = filters.filter_localization_probability(s1)
    got2 = sorted(read_spark_csv(f"{outdir}/after_locprob")["id"].tolist())
    ok2 = got2 == sorted(s2.index.tolist())
    print(("ok  " if ok2 else "FAIL") + f" after_locprob: {len(got2)} rows")
    if not ok2:
        failures.append("after_locprob")

    # stage 3: expand side table (reference id -> "id___k")
    s3 = process.expand_side_table(s2)
    got3 = read_spark_csv(f"{outdir}/after_expand")
    ref_ids = sorted(str(i) for i in s3.index.tolist())
    got_ids = sorted(str(i) for i in got3["id"].tolist())
    ok3 = ref_ids == got_ids and len(s3) == len(got3)
    print(("ok  " if ok3 else "FAIL") +
          f" after_expand: {len(got3)} rows (ref {len(s3)})")
    if not ok3:
        failures.append("after_expand")
        print("   ref sample:", ref_ids[:6], "got:", got_ids[:6])
    # value parity on a column
    refv = s3.reset_index().set_index("index")["Intensity A1"] \
        if "index" in s3.reset_index() else None
    merged = got3.set_index("id")["Intensity A1"]
    ref_series = s3["Intensity A1"]
    ref_map = {str(k): v for k, v in ref_series.items()}
    bad = 0
    for k, v in merged.items():
        rv = ref_map.get(str(k))
        if rv is None or (isinstance(rv, float) and math.isnan(rv)):
            if not (isinstance(v, float) and math.isnan(v)):
                bad += 1
        elif abs(rv - v) > 1e-9:
            bad += 1
    print(("ok  " if bad == 0 else "FAIL") + f" after_expand values ({bad} diffs)")
    if bad:
        failures.append("after_expand_values")

    # stage 4: log2 + per-column median centering vs reference
    expr_cols = [c for c in s3.columns if c.startswith("Intensity ")]
    s4 = s3.copy()
    s4[expr_cols] = np.log2(s4[expr_cols])
    s4[expr_cols] = s4[expr_cols].replace([np.inf, -np.inf], np.nan)
    # normalization.subtract_column_median crashes on modern pandas
    # (boolean mask into .iloc); apply its documented intent directly
    s4n = s4.copy()
    s4n[expr_cols] = s4n[expr_cols] - s4n[expr_cols].median(axis=0)
    got4 = read_spark_csv(f"{outdir}/after_median")
    bad4 = 0
    for _, row in got4.iterrows():
        rv = s4n.loc[row["id"] if row["id"] in s4n.index else str(row["id"]),
                     row["sample"]]
        gv = row["value"]
        gv = float(str(gv).replace(",", "")) if isinstance(gv, str) else gv
        if isinstance(rv, float) and math.isnan(rv):
            if not (isinstance(gv, float) and math.isnan(gv)):
                bad4 += 1
        elif abs(rv - gv) > 1e-6:
            bad4 += 1
    print(("ok  " if bad4 == 0 else "FAIL") + f" after_median values ({bad4} diffs)")
    if bad4:
        failures.append("after_median")

    # stage 5: search — the reference's own function
    s5 = filters.search(df, "P00012")
    got5 = sorted(read_spark_csv(f"{outdir}/after_search")["id"].tolist())
    want5 = sorted(s5.index.tolist())
    ok5 = got5 == want5
    print(("ok  " if ok5 else "FAIL") + f" after_search: {len(got5)} rows")
    if not ok5:
        failures.append("after_search")

    # stage 6: transform_expression_columns — the reference's own function
    s6 = process.transform_expression_columns(df)
    got6 = read_spark_csv(f"{outdir}/after_log2").set_index("id")
    expr6 = [c for c in df.columns if c.startswith("Intensity ")]
    bad6 = 0
    for rid, row in got6.iterrows():
        for c in expr6:
            rv = s6.loc[rid, c]
            gv = row[c]
            gv = float(str(gv).replace(",", "")) if isinstance(gv, str) else gv
            if isinstance(rv, float) and math.isnan(rv):
                if not (isinstance(gv, float) and math.isnan(gv)):
                    bad6 += 1
            elif abs(rv - gv) > 1e-6:
                bad6 += 1
    print(("ok  " if bad6 == 0 else "FAIL") + f" after_log2 values ({bad6} diffs)")
    if bad6:
        failures.append("after_log2")

    # stage 7: strip_index_labels — the reference's own function
    s7 = process.strip_index_labels(df, "Intensity ")
    got7 = read_spark_csv(f"{outdir}/after_strip")
    want_cols = sorted(list(s7.columns) + ["id"])
    ok7 = sorted(got7.columns.tolist()) == want_cols
    print(("ok  " if ok7 else "FAIL") + " after_strip column labels")
    if not ok7:
        failures.append("after_strip")
        print("   want:", want_cols, "got:", sorted(got7.columns.tolist()))

    # stage 8: get_index_list + build_combined_label — the reference's
    # own functions (utils.py loads with stubbed scipy/requests)
    utils = load("utils")
    got8 = read_spark_csv(f"{outdir}/after_labels").set_index("id")
    want_idx = utils.get_index_list(
        list(df.reset_index().columns), ["Amino acid", "No such column", "Proteins"])
    bad8 = 0
    got_idx = str(got8["index_list"].iloc[0])
    if got_idx != ";".join(str(i) for i in want_idx):
        bad8 += 1
        print("   index_list want:", want_idx, "got:", got_idx)
    for rid, row in got8.iterrows():
        sl = {0: df.loc[rid, "Proteins"], 1: df.loc[rid, "Amino acid"]}
        want_sep = utils.build_combined_label(sl, [0, 1])
        want_fmt = utils.build_combined_label(sl, [0, 1], label_format="%s [%s]")
        if row["label_sep"] != want_sep or row["label_fmt"] != want_fmt:
            bad8 += 1
            print("   label want:", (want_sep, want_fmt),
                  "got:", (row["label_sep"], row["label_fmt"]))
    print(("ok  " if bad8 == 0 else "FAIL") + f" after_labels ({bad8} diffs)")
    if bad8:
        failures.append("after_labels")

    print(f"\nparity: {'PASS' if not failures else 'FAIL ' + str(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 40)
    elif sys.argv[1] == "bench":
        bench(sys.argv[2])
    else:
        sys.exit(check(sys.argv[2], sys.argv[3]))
