#!/usr/bin/env python3
"""Render the complete per-query baseline table from BENCH_SELF.json.

Usage: python3 tools/baseline_table.py [bench_json]

Prints a markdown section (header with the run's control ratios + one
row per query, sorted by key) ready to append to BASELINE.md.
"""
import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SELF.json"
    d = json.load(open(path))
    qs = d["queries"]
    ctl = d.get("controls", {})
    ratios = ", ".join(
        f"`{k}` {v['ratio']:.2f}x" for k, v in sorted(ctl.items()))
    total = sum(qs.values())
    print(f"Total this run: {total:.1f} s over {len(qs)} queries; "
          f"pinned control ratios vs their r8 recordings: {ratios}.")
    print()
    print("| query | min-of-3 sec |")
    print("|---|---|")
    for k in sorted(qs):
        print(f"| `{k}` | {qs[k]:.2f} |")


if __name__ == "__main__":
    main()
