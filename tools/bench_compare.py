"""Diff two bench JSON artifacts (bench.py output lines or the
driver's BENCH_r{N}.json wrappers) and report per-query deltas.

Handles both shapes: a raw ``{"queries": {...}, ...}`` line, or the
driver wrapper ``{"n", "rc", "cpus", "sf", "tail"}`` whose ``tail``
holds a (possibly head-truncated) bench line — truncated dicts are
recovered query-by-query with a regex, so partially captured rounds
still compare.

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 0.3]
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    raw = open(path).read()
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict) and "queries" in obj:
        return {k: float(v) for k, v in obj["queries"].items()}
    text = obj.get("tail", raw) if isinstance(obj, dict) else raw
    # recover per-query entries from a possibly truncated JSON line
    out = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"(q\d+[a-z]?_[a-z0-9_]+)":\s*([0-9.]+)', text)
    }
    if not out:
        raise SystemExit(f"{path}: no per-query timings found")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--threshold",
        type=float,
        default=0.3,
        help="flag queries whose time changed by more than this fraction "
        "AND by more than 0.5s absolute (filters noise on fast queries)",
    )
    args = ap.parse_args()
    a, b = load_queries(args.old), load_queries(args.new)
    common = sorted(set(a) & set(b))
    only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))

    sum_a, sum_b = sum(a[n] for n in common), sum(b[n] for n in common)
    # a truncated/renamed artifact can leave no common queries (or an
    # all-zero baseline) — report what overlap exists rather than
    # dividing by zero before the removed/added lists print
    pct = f"{(sum_b - sum_a) / sum_a * 100:+.0f}%" if sum_a else "n/a"
    print(
        f"common {len(common)} queries: {sum_a:.1f}s -> {sum_b:.1f}s ({pct})"
    )
    if only_a:
        print(f"removed ({len(only_a)}): {', '.join(only_a)}")
    if only_b:
        print(f"added ({len(only_b)}): {', '.join(only_b)}")

    flagged = [
        (b[n] - a[n], n)
        for n in common
        if abs(b[n] - a[n]) > max(args.threshold * a[n], 0.5)
    ]
    for d, n in sorted(flagged, key=lambda x: -abs(x[0])):
        print(f"{d:+6.2f}s  {n}  {a[n]} -> {b[n]}")
    if not flagged:
        print("no per-query change beyond threshold")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # `| head` closing early is not an error
        sys.exit(0)
