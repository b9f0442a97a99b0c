"""Compute the per-query sf0.1 -> sf1 ratio table for the round-5
10x scale point (VERDICT round-4 item #6). Reads the two bench JSON
lines and prints a markdown table with the expected-scaling class of
each headliner, flagging outliers.

Classes:
  data  — input scales 10x with the corpus; linear expectation ~10x
          (less, where fixed JVM/stats overhead amortizes)
  fixed — bench-internal fixed-size input (the 57k-row link corpus);
          expectation ~1x
Flag: ratio > 2x the class expectation (i.e. >20x data / >2x fixed).

Usage: python tools/sf1_ratios.py bench_sf01.json bench_sf1.json
"""

from __future__ import annotations

import json
import sys

FIXED = {"kg_link_mentions"}


def main(a: str, b: str) -> None:
    small = json.load(open(a))
    big = json.load(open(b))
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in qs:
        if name not in qb:
            continue
        cls = "fixed" if name in FIXED else "data"
        ratio = qb[name] / qs[name] if qs[name] else float("inf")
        cap = 2.0 if cls == "fixed" else 20.0
        flag = " **OUTLIER**" if ratio > cap else ""
        rows.append((name, cls, qs[name], qb[name], ratio, flag))
    print("| query | class | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|---|")
    for name, cls, s, bb, r, flag in rows:
        print(f"| {name} | {cls} | {s:.3f} | {bb:.3f} | "
              f"{r:.1f}x{flag} |")
    ds = [r for _, c, _, _, r, _ in rows if c == "data"]
    print(f"\ndata-class median ratio: "
          f"{sorted(ds)[len(ds) // 2]:.1f}x over a 10x corpus; "
          f"triples/sec {small.get('triples_per_sec')} -> "
          f"{big.get('triples_per_sec')}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
