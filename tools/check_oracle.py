#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB with views named
after the tables in <sfDir>, sorts columns by name and rows by all
columns, and compares values (exact; floats exact too — our queries are
designed to be cross-engine exact). Exit 1 on any mismatch.

This file is developer tooling only — the engine itself is pure Scala.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    ok, bad = [], []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            bad.append((name, "no parquet written"))
            continue
        got = pq.ParquetDataset(files).read().to_pandas()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            (ok if len(got) > 0 else bad).append((name, "rows-only"))
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            bad.append((name, f"oracle SQL failed: {e}"))
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            bad.append((name, f"columns differ: {list(g.columns)} vs {list(w.columns)}"))
            continue
        if len(g) != len(w):
            bad.append((name, f"row count {len(g)} vs {len(w)}"))
            continue
        mismatch = None
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            if gv != wv:
                for i, (a, b) in enumerate(zip(gv, wv)):
                    if a != b and not (a != a and b != b):  # NaN==NaN ok
                        mismatch = f"col {c} row {i}: {a!r} vs {b!r}"
                        break
                if mismatch:
                    break
        if mismatch:
            bad.append((name, mismatch))
        else:
            ok.append((name, "exact"))
    for n, m in ok:
        print(f"PASS {n} ({m})")
    for n, m in bad:
        print(f"FAIL {n}: {m}")
    print(f"\n{len(ok)} pass / {len(bad)} fail")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
