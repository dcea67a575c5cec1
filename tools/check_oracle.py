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
import sys, os, json, glob, re
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Oracle output-dtype lint (round-12, from the r11 verdict): DuckDB
# types SUM(BIGINT) as HUGEINT, which pandas materializes as float64
# while the engine's parquet is int64 — values compare equal (10 ==
# 10.0, so the value loop below passes) but the driver's
# dtype-sensitive hash flips on every row (t13_bm25 was red for three
# rounds this way). Every oracle result column must land in a safe
# type; anything exotic is an error at the emission boundary even
# when values match.
BAD_DUCK_TYPE = re.compile(
    r"HUGEINT|DECIMAL|^FLOAT$|UTINYINT|USMALLINT|UINTEGER|UBIGINT", re.I)


def dtype_lint(name, rel_types, g, w):
    """Return a list of dtype issues for one gate: exotic DuckDB output
    types, and engine-vs-oracle pandas dtype KIND mismatches. Kind
    (integer / float / bool / object / datetime), not width: a
    repr-sensitive hash sees 10 == 10 for int32-vs-int64 (13 such
    gates have been driver-green for 11 rounds) but 10 != 10.0 for
    int-vs-float — which is exactly how t13_bm25's HUGEINT→float64
    column stayed red for three rounds while every value compared
    equal."""
    issues = []
    for c, t in rel_types:
        if BAD_DUCK_TYPE.search(str(t)):
            issues.append(f"oracle col {c} has exotic DuckDB type {t}")

    def kind(dt):
        k = dt.kind  # i/u -> integer, f float, b bool, O object, M datetime
        return "i" if k in "iu" else k
    for c in g.columns:
        if kind(g[c].dtype) != kind(w[c].dtype):
            issues.append(
                f"col {c} dtype-kind mismatch: engine {g[c].dtype} vs oracle {w[c].dtype}")
    return issues


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
            rel = con.sql(oracle[name])
            rel_types = list(zip(rel.columns, rel.types))
            want = rel.df()
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
            continue
        lint = dtype_lint(name, rel_types, g, w)
        if lint:
            bad.append((name, "; ".join(lint)))
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
