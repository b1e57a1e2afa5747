#!/usr/bin/env python3
"""Round-over-round overlap ratio between two Bench JSON artifacts.

Usage: python3 tools/overlap.py <old.json> <new.json> [topN]

Sums per-query medians over the queries PRESENT IN BOTH artifacts
(the only honest round-over-round comparison — new gates are not
regressions), prints the ratio, and lists the biggest per-query
movers in each direction.
"""
import json
import sys


def main() -> None:
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    shared = sorted(set(old) & set(new))
    if not shared:
        sys.exit("no shared queries between the two artifacts "
                 "(different metric families?) — nothing to compare")
    so, sn = sum(old[q] for q in shared), sum(new[q] for q in shared)
    print(f"shared queries: {len(shared)}")
    print(f"old total {so:.1f} s, new total {sn:.1f} s, "
          f"ratio {sn / so:.3f}x")
    movers = sorted(shared, key=lambda q: new[q] - old[q])
    print("\nbiggest regressions (old -> new):")
    for q in movers[-top_n:][::-1]:
        print(f"  {q}: {old[q]:.2f} -> {new[q]:.2f}")
    print("\nbiggest improvements (old -> new):")
    for q in movers[:top_n]:
        print(f"  {q}: {old[q]:.2f} -> {new[q]:.2f}")
    only_new = sorted(set(new) - set(old), key=lambda q: -new[q])
    if only_new:
        print(f"\nnew-this-round ({len(only_new)}), cost: "
              f"{sum(new[q] for q in only_new):.1f} s total")
        for q in only_new:
            print(f"  {q}: {new[q]:.2f}")


if __name__ == "__main__":
    main()
