#!/usr/bin/env python3
"""Round-over-round bench comparison (the variance-guard ritual).

Usage: python3 tools/bench_delta.py BENCH_rPREV.json BENCH_rCUR.json

Compares per-entry best-of-N times between two bench JSONs and flags
regressions, using the spread (min/med/max, present since round 5) to
separate host noise from real movement:

- REGRESSED:  cur.min > prev.min * THRESHOLD — the best observed run
  got slower; that is a code/plan change, not scheduler noise.
- NOISY:      cur.med > cur.min * 2 — the entry's own repeats disagree;
  distrust the number before reading anything into it (round 4's
  "3.1x stream_rollup regression" was exactly this shape).
- IMPROVED:   cur.min < prev.min / THRESHOLD.

Exit 1 iff any entry REGRESSED (noise alone never fails the ritual).
"""
import json
import sys

THRESHOLD = 1.5


def load(path):
    with open(path) as f:
        doc = json.load(f)
    parsed = doc.get("parsed", doc)
    return parsed.get("queries", {}), parsed.get("spread", {})


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    prev_q, _ = load(sys.argv[1])
    cur_q, cur_s = load(sys.argv[2])
    regressed = []
    for name, cur in sorted(cur_q.items()):
        prev = prev_q.get(name)
        spread = cur_s.get(name, {})
        noisy = spread and spread.get("med", cur) > spread.get("min", cur) * 2
        tag = "NEW"
        if prev is not None and prev > 0 and cur > 0:
            ratio = cur / prev
            if ratio > THRESHOLD:
                tag = "REGRESSED"
                regressed.append(name)
            elif ratio < 1 / THRESHOLD:
                tag = "improved"
            else:
                tag = "ok"
            detail = f"{prev:8.2f}s -> {cur:8.2f}s  ({ratio:5.2f}x)"
        else:
            detail = f"{'':8} -> {cur:8.2f}s"
        noise = "  [NOISY: med >> min, distrust]" if noisy else ""
        print(f"{tag:>9}  {name:<22} {detail}{noise}")
    if regressed:
        print(f"\nREGRESSED: {', '.join(regressed)}")
        sys.exit(1)
    print("\nno regressions")


if __name__ == "__main__":
    main()
