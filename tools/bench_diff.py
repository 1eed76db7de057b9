#!/usr/bin/env python3
"""Dev-only bench regression diff (NOT part of the Scala library).

Compare per-query timings between two bench artifacts — BENCH_r{N}.json
files or bench_history.jsonl entries (default: last two history lines).
Prints queries sorted by ratio, flagging >1.5x drifts above noise floor.

Usage: python3 tools/bench_diff.py [old.json new.json]
"""
import json, sys


def load(path):
    with open(path) as f:
        if path.endswith(".jsonl"):
            lines = [json.loads(l) for l in f if l.strip()]
            return lines[-2], lines[-1]
        return json.load(f), None


def main(argv):
    if len(argv) == 3:
        old, new = json.load(open(argv[1])), json.load(open(argv[2]))
    else:
        old, new = load("bench_history.jsonl")
    oq, nq = old.get("queries", {}), new.get("queries", {})
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((float("inf"), name, a, b, "ADDED" if a is None else "REMOVED"))
        else:
            ratio = b / a if a > 0 else float("inf")
            flag = "REGRESSED" if ratio > 1.5 and b > 0.5 else ""
            rows.append((ratio, name, a, b, flag))
    rows.sort(key=lambda r: -r[0])
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for ratio, name, a, b, flag in rows:
        fa = "-" if a is None else f"{a:8.2f}"
        fb = "-" if b is None else f"{b:8.2f}"
        fr = "-" if ratio == float("inf") else f"{ratio:7.2f}"
        print(f"{name:40s} {fa:>8s} {fb:>8s} {fr:>7s} {flag}")
    print(f"{'TOTAL':40s} {sum(oq.values()):8.2f} {sum(nq.values()):8.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
