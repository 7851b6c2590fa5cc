#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, and compares: row count, column names, and value hash
(columns sorted by name, rows sorted by all columns). Dev tool only —
python/duckdb are driver-side; the shipped library is pure Scala/Spark.
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # fillna before sorting: pandas appends NaN-keyed rows in original
    # order, ignoring secondary sort keys, which misaligns frames whose
    # row order differs
    key = df.fillna(-1.5e308)
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)

def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # STRICT column-class check: the driver hashes typed renderings, so
    # a Spark long 3 vs a DuckDB HUGEINT->float64 3.0 must FAIL here
    # too (the r14 q_moving_avg/q_json_extract gap). int vs float is a
    # mismatch even when the values compare equal.
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, float) != isinstance(b, float):
        return False
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = n_rowsonly = 0
    for name in names:
        got = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            status = "ROWS_ONLY" if len(got) > 0 else "ROWS_ONLY_EMPTY!"
            if len(got) > 0: n_rowsonly += 1
            else: n_bad += 1
            print(f"{status:18s} {name:28s} rows={len(got)}")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE_ERR         {name:28s} {e}")
            n_bad += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_schema = sorted(got.columns) == sorted(exp.columns)
        ok_hash = False
        if ok_rows and ok_schema:
            g, e2 = canon(got), canon(exp)
            # coerce dtypes loosely (int32 vs int64 etc.)
            ok_hash = True
            diffs = 0
            for col in g.columns:
                gv, ev = g[col].tolist(), e2[col].tolist()
                for i, (x, y) in enumerate(zip(gv, ev)):
                    if not values_equal(x, y):
                        if diffs < 3:
                            print(f"    diff {name}.{col}[{i}]: spark={x!r} duck={y!r}")
                        diffs += 1
                        ok_hash = False
            if diffs > 3:
                print(f"    ... {diffs} total diffs in {name}")
        ok = ok_rows and ok_schema and ok_hash
        if ok: n_ok += 1
        else: n_bad += 1
        print(f"{'OK' if ok else 'FAIL':18s} {name:28s} rows={len(got)}/{len(exp)}"
              f" schema={ok_schema} hash={ok_hash}")
    print(f"\n{n_ok} ok, {n_rowsonly} rows-only, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
