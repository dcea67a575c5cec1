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
- FAILED:     cur <= 0 — the entry's pipeline errored this round.
- REMOVED:    entry present last round, absent now.

Exit 1 iff any entry REGRESSED, FAILED, or was REMOVED (noise alone
never fails the ritual).

Driver artifacts sometimes arrive with "parsed": null and the bench
JSON line truncated into the "tail" string (the head of the line is
cut, so the "queries" key may be gone entirely). Recovery order:

1. the compact "BENCHMIN {...}" line graft.Bench prints LAST (tails
   keep the end, so it survives any head truncation);
2. the balanced "spread" object scraped out of the tail — its mins
   ARE the best-of-N values queries records. The artifact's OWN tail
   always outranks the sibling file: the sibling is overwritten by
   whatever run happened last, so trusting it for an older artifact
   compares a round to itself (recorded: the r7-vs-r8 ritual printed
   uniform 1.00x because r7's load fell through to r8's sibling);
3. a sibling bench_out.json next to the artifact — accepted ONLY when
   the "wall" run stamp Bench writes into both the line tail and the
   sibling matches, proving same-run provenance;
4. scalar name:number pairs scraped from a pre-spread-era tail.
"""
import json
import os
import re
import sys

THRESHOLD = 1.5


def _balanced_object(text, start):
    """Return the JSON object starting at text[start] == '{' (balanced
    braces; bench names/numbers contain no braces or quoted braces)."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return json.loads(text[start:i + 1])
    raise ValueError("unbalanced object in bench tail")


def _spread_from_tail(tail):
    """Recover (queries, spread) from the spread map in a truncated
    bench JSON line; (None, None) when no spread survived."""
    m = re.search(r'"spread"\s*:\s*\{', tail)
    if m:
        spread = _balanced_object(tail, m.end() - 1)
        queries = {k: v.get("min") for k, v in spread.items()
                   if isinstance(v, dict) and "min" in v}
        if queries:
            return queries, spread
    # truncation can cut the line INSIDE the spread map (the round-6
    # artifact lost everything through the first entry's name, including
    # the "spread" key itself): scrape the per-entry spread objects —
    # self-delimiting, so every entry whose NAME survived is recovered
    ent = re.findall(
        r'"([a-z0-9_]+)"\s*:\s*\{\s*"min"\s*:\s*(-?[0-9.eE+]+)\s*,'
        r'\s*"med"\s*:\s*(-?[0-9.eE+]+)\s*,\s*"max"\s*:\s*(-?[0-9.eE+]+)\s*\}',
        tail)
    if ent:
        spread = {k: {"min": float(a), "med": float(b), "max": float(c)}
                  for k, a, b, c in ent}
        queries = {k: v["min"] for k, v in spread.items()}
        # a failed entry's spread times are crash artifacts; restore the
        # -1 sentinel the full "queries" map would have carried
        mf = re.search(r'"failed"\s*:\s*\[([^\]]*)\]', tail)
        if mf:
            for name in re.findall(r'"([a-z0-9_]+)"', mf.group(1)):
                if name in queries:
                    queries[name] = -1.0
        return queries, spread
    return None, None


def _scalars_from_tail(tail):
    """Pre-spread shape: scrape scalar "name":number pairs."""
    queries = {k: float(v) for k, v in
               re.findall(r'"([a-z0-9_]+)"\s*:\s*(-?[0-9.]+)', tail)
               if k not in ("metric", "value", "sf", "n", "rc", "cpus",
                            "wall")}
    return queries, {}


def load(path):
    with open(path) as f:
        doc = json.load(f)
    parsed = doc.get("parsed", doc)
    if parsed is None:
        tail = doc.get("tail", "")
        # 1. the BENCHMIN line Bench prints last: same run, guaranteed
        #    provenance, survives head truncation by construction
        m = re.search(r"BENCHMIN\s*\{", tail)
        if m:
            obj = _balanced_object(tail, m.end() - 1)
            if obj.get("queries"):
                return obj["queries"], obj.get("spread", {})
        # 2. the artifact's OWN tail spread — same run by construction.
        #    This MUST outrank the sibling file: bench_out.json is
        #    overwritten by whichever run happened last, so falling
        #    through to it for an older artifact self-compares rounds
        #    (the recorded r7-vs-r8 uniform-1.00x incident).
        q, s = _spread_from_tail(tail)
        if q:
            return q, s
        # 3. the dual-written full line beside the artifact — trusted
        #    ONLY when its "wall" run stamp matches one visible in the
        #    tail (Bench writes the same stamp to both; an sf match
        #    alone cannot distinguish rounds, they all run sf0.1)
        sib = os.path.join(os.path.dirname(os.path.abspath(path)),
                           "bench_out.json")
        tail_wall = re.search(r'"wall"\s*:\s*(\d+)', tail)
        if os.path.exists(sib) and tail_wall:
            try:
                with open(sib) as f:
                    obj = json.load(f)
                if obj.get("queries") and \
                        obj.get("wall") == int(tail_wall.group(1)):
                    print(f"[bench_delta] {path}: parsed null, "
                          f"recovered from stamp-matched sibling {sib}",
                          file=sys.stderr)
                    return obj["queries"], obj.get("spread", {})
            except (OSError, ValueError):
                pass
        # 4. scrape scalar pairs from a pre-spread-era tail
        if not tail:
            sys.exit(f"{path}: parsed is null and no tail to recover from")
        return _scalars_from_tail(tail)
    return parsed.get("queries", {}), parsed.get("spread", {})


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    prev_q, _ = load(sys.argv[1])
    cur_q, cur_s = load(sys.argv[2])
    failing = []
    for name, cur in sorted(cur_q.items()):
        prev = prev_q.get(name)
        spread = cur_s.get(name, {})
        noisy = spread and spread.get("med", cur) > spread.get("min", cur) * 2
        if cur is None or cur <= 0:
            tag = "FAILED"
            failing.append(name)
            detail = f"{'':8} -> {cur!r}"
        elif prev is not None and prev > 0:
            ratio = cur / prev
            if ratio > THRESHOLD:
                tag = "REGRESSED"
                failing.append(name)
            elif ratio < 1 / THRESHOLD:
                tag = "improved"
            else:
                tag = "ok"
            detail = f"{prev:8.2f}s -> {cur:8.2f}s  ({ratio:5.2f}x)"
        else:
            tag = "NEW"
            detail = f"{'':8} -> {cur:8.2f}s"
        noise = "  [NOISY: med >> min, distrust]" if noisy else ""
        print(f"{tag:>9}  {name:<22} {detail}{noise}")
    for name in sorted(set(prev_q) - set(cur_q)):
        print(f"{'REMOVED':>9}  {name:<22} {prev_q[name]:8.2f}s -> (absent)")
        failing.append(name)
    if failing:
        print(f"\nFAILING: {', '.join(failing)}")
        sys.exit(1)
    print("\nno regressions")


if __name__ == "__main__":
    main()
