#!/usr/bin/env python3
"""Compare a clean bench pair against BASELINE.md pins.

usage: tools/bench_pair.py runA.json runB.json

Prints canary drifts, per-query pair-min vs pin ratios (sorted,
worst first), the >2x offenders, unpinned queries, and totals —
the round-close readout BASELINE.md's protocol asks for.
"""
import json
import re
import sys


def load(p):
    return json.load(open(p))


def pins(path="BASELINE.md"):
    out = {}
    for line in open(path):
        m = re.match(r"\| (q[0-9]+[a-z]?_[a-z0-9_]+) \| ([0-9.]+) \|", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    p = pins()
    print(f"canary drifts: {a.get('canary_drift')} / {b.get('canary_drift')}")
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    rows = []
    for q in common:
        mn = min(qa[q], qb[q])
        pin = p.get(q)
        rows.append((q, mn, pin, (mn / pin) if pin else None))
    pinned = [r for r in rows if r[3] is not None]
    pinned.sort(key=lambda r: -r[3])
    print("worst ratios (pair-min / pin):")
    for q, mn, pin, ratio in pinned[:12]:
        print(f"  {q:34s} {mn:7.3f} vs {pin:6.2f} = {ratio:.2f}x")
    over = [r for r in pinned if r[3] > 2.0]
    print(f"over 2x: {len(over)} -> {[r[0] for r in over]}")
    unpinned = [r for r in rows if r[3] is None]
    print("unpinned (new, pair-min):")
    for q, mn, _, _ in unpinned:
        print(f"  {q:34s} {mn:7.3f}")
    tot = sum(r[1] for r in pinned)
    totp = sum(r[2] for r in pinned)
    print(f"pair-min total {tot:.1f} s vs pinned total {totp:.1f} s = {tot/totp:.2f}x")


if __name__ == "__main__":
    main()
