#!/usr/bin/env python3
"""Rounding-boundary audit: forbid `round(<transcendental>)` in gates.

Round 9's only red driver row (t13_bm25) came from `round(ln(...)·x, 6)`:
a raw transcendental feeding a decimal rounding. libm builds disagree in
the last ulp, so when a true value sits ~1e-9 from a round boundary the
two engines flip different ways and the hash check fails — the repo's t9
discipline (quantize the ln ONCE with a nudged floor, then pure IEEE
arithmetic) exists exactly to prevent this. t13 was the SECOND gate
family to slip; this audit makes the class structurally impossible.

What it checks, statically:
  1. every oracle SQL in <verify_out>/oracle_sql.json — any `round(`
     whose (balanced-paren) argument contains a transcendental call
     (ln/log/log2/log10/exp/power) is an error;
  2. every Scala source under src/main/scala — any `round(` whose
     argument contains `log(`, `exp(`, or `pow(` is an error.

Gates that need transcendental output quantize with the nudged floor
(`floor(ln(...)*1e6 + 1e-4)` as int64) on BOTH sides — floor of a
bit-identical double is deterministic, and the nudge absorbs libm drift
(see TextAnalysis.unigramLogProb). floor()/exact-rational rounding are
fine; sqrt is correctly rounded per IEEE-754 and therefore exact.

Usage:  python3 tools/round_audit.py [verify_out_dir] [repo_root]
        python3 tools/round_audit.py --selftest
Exit 1 on any hit (prints gate/file and the offending snippet).
"""
import json
import os
import re
import sys

# transcendental call tokens whose last-ulp value is NOT guaranteed
# identical across libm builds (sqrt is IEEE-correctly-rounded: exempt)
SQL_TRANSCENDENTAL = re.compile(
    r"\b(ln|log|log2|log10|log1p|exp|power|pow)\s*\(", re.I)
SCALA_TRANSCENDENTAL = re.compile(r"\b(log|log2|log10|log1p|exp|expm1|pow)\s*\(")


def round_args(text):
    """Yield the balanced-paren argument text of every `round(` call."""
    for m in re.finditer(r"\bround\s*\(", text, re.I):
        depth, start = 1, m.end()
        i = start
        while i < len(text) and depth > 0:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        yield text[start:i - 1]


def audit_sql(oracle_sql):
    """[(gate, snippet)] for round() args containing a transcendental."""
    hits = []
    for gate, sql in sorted(oracle_sql.items()):
        for arg in round_args(sql):
            t = SQL_TRANSCENDENTAL.search(arg)
            if t:
                hits.append((gate, arg.strip().replace("\n", " ")[:120]))
    return hits


def audit_scala(root):
    """[(path, snippet)] for round(...) wrapping a transcendental."""
    hits = []
    for dirpath, _, names in os.walk(os.path.join(root, "src", "main", "scala")):
        for name in sorted(names):
            if not name.endswith(".scala"):
                continue
            path = os.path.join(dirpath, name)
            with open(path) as f:
                text = f.read()
            for arg in round_args(text):
                t = SCALA_TRANSCENDENTAL.search(arg)
                if t:
                    rel = os.path.relpath(path, root)
                    hits.append((rel, arg.strip().replace("\n", " ")[:120]))
    return hits


def selftest():
    bad_sql = {"g1": "SELECT round(ln(x) * 2, 6) FROM t",
               "g1b": "SELECT round(pow(x, y), 6) FROM t",  # DuckDB's pow( alias
               "g1c": "SELECT round(log1p(x), 6) FROM t"}
    ok_sql = {
        "g2": "SELECT round(a / b, 6) FROM t",                      # rational: fine
        "g3": "SELECT floor(ln(x) * 1e6 + 1e-4) / 1e6 FROM t",      # quantized: fine
        "g4": "SELECT round(sqrt(a), 6) FROM t",                    # sqrt exact: fine
        "g5": "SELECT ln(round(a, 2)) FROM t",                      # ln OUTSIDE round: fine
    }
    assert [g for g, _ in audit_sql(bad_sql)] == ["g1", "g1b", "g1c"], \
        audit_sql(bad_sql)
    assert audit_sql(ok_sql) == [], audit_sql(ok_sql)
    # nested parens resolve correctly
    nested = {"g6": "SELECT round(exp((a + b) * (c - d)), 3), round(e, 2) FROM t"}
    assert [g for g, _ in audit_sql(nested)] == ["g6"]
    scala_bad = 'df.select(round(log(col("x")) * lit(2.0), 6))'
    assert SCALA_TRANSCENDENTAL.search(next(round_args(scala_bad)))
    scala_ok = 'df.select(floor(log(col("x")) * lit(1e6) + lit(1e-4)))'
    assert list(round_args(scala_ok)) == []
    print("round_audit selftest OK")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
        return 0
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    root = sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    hits = []
    sql_path = os.path.join(out_dir, "oracle_sql.json")
    if os.path.exists(sql_path):
        with open(sql_path) as f:
            hits += [(f"oracle:{g}", s) for g, s in audit_sql(json.load(f))]
    else:
        print(f"note: {sql_path} missing — run graft.Verify first "
              "(auditing Scala sources only)")
    hits += [(f"scala:{p}", s) for p, s in audit_scala(root)]
    if hits:
        print("ROUND-OF-TRANSCENDENTAL hits (quantize with the nudged "
              "floor on both sides instead — see TextAnalysis.bm25):")
        for where, snippet in hits:
            print(f"  {where}: round({snippet}...)")
        return 1
    print("round_audit: clean — no round() wraps a transcendental")
    return 0


if __name__ == "__main__":
    sys.exit(main())
