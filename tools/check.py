#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, then
compares: columns sorted by name, exact values, dtypes, and row order.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_spark(path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    con = duckdb.connect()
    return con.execute(
        f"SELECT * FROM read_parquet({files!r})").df()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    dirs = sorted(d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d)))
    # A query that throws in Verify writes no dir — count it as a failure,
    # don't let it silently vanish from the report (ADVICE r1). Use the
    # full query list when Verify wrote one (covers rows-only queries too).
    names_path = os.path.join(out_dir, "query_names.json")
    expected = set(json.load(open(names_path))) if os.path.exists(names_path) \
        else set(oracle)
    missing = sorted((expected | set(oracle)) - set(dirs))
    n_pass = n_fail = n_noracle = 0
    for name in missing:
        print(f"✗ {name}: NO OUTPUT DIR (query failed in Verify)")
        n_fail += 1
    for name in dirs:
        try:
            # a dir with no committed part files (write failed mid-way)
            # must count as ONE failure, not abort the whole report
            spark_df = load_spark(os.path.join(out_dir, name))
        except Exception as e:
            print(f"✗ {name}: UNREADABLE OUTPUT: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            n_noracle += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
        d = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
        probs = []
        if list(s.columns) != list(d.columns):
            probs.append(f"columns spark={list(s.columns)} duck={list(d.columns)}")
        elif len(s) != len(d):
            probs.append(f"rowcount spark={len(s)} duck={len(d)}")
        else:
            for c in s.columns:
                sv, dv = s[c], d[c]
                if str(sv.dtype) != str(dv.dtype):
                    probs.append(f"dtype[{c}] spark={sv.dtype} duck={dv.dtype}")
                try:
                    if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                        # tolerance, not exact: parallel summation order can
                        # flip the last rounded digit (ADVICE r1)
                        a, b = sv.astype(float), dv.astype(float)
                        # the driver hash is BIT-sensitive: -0.0 != +0.0
                        # there even though isclose passes here. Engines
                        # disagree on the sign of zero after round() on
                        # tiny-negative sums (q_modularity, VERDICT r10) —
                        # flag any -0.0 on either side so the gate adds a
                        # `+ 0.0` normalization on BOTH engines.
                        for side, v in (("spark", a), ("duck", b)):
                            nz = (v == 0.0) & np.signbit(v) & ~v.isna()
                            if nz.any():
                                probs.append(
                                    f"negzero[{c}] on {side}: "
                                    f"{int(nz.sum())} rows (driver hash "
                                    f"is bit-sensitive; add `+ 0.0`)")
                        close = pd.Series(
                            np.isclose(a, b, rtol=1e-9, atol=1e-9),
                            index=a.index)
                        neq = ~(close | (a.isna() & b.isna()))
                        if neq.any():
                            md = float(np.nanmax(np.abs(a - b)))
                            probs.append(f"values[{c}]: {int(neq.sum())} diff, maxabs={md:.3e}")
                    else:
                        neq = ~((sv == dv) | (sv.isna() & dv.isna()))
                        if neq.any():
                            i = int(neq.idxmax())
                            probs.append(f"values[{c}]: {int(neq.sum())} diff, first@{i}: "
                                         f"spark={sv[i]!r} duck={dv[i]!r}")
                except Exception as e:
                    probs.append(f"compare[{c}] error: {e}")
        if probs:
            print(f"✗ {name}: " + "; ".join(probs[:4]))
            n_fail += 1
        else:
            print(f"✓ {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
