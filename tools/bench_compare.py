"""Diff two bench JSON artifacts (bench.py output lines or the
driver's BENCH_r{N}.json wrappers) and report per-query deltas.

Handles both shapes: a raw ``{"queries": {...}, ...}`` line, or the
driver wrapper ``{"n", "rc", "cpus", "sf", "tail"}`` whose ``tail``
holds a (possibly head-truncated) bench line — truncated dicts are
recovered query-by-query with a regex, so partially captured rounds
still compare.

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 0.3]
       python tools/bench_compare.py --dump ARTIFACT.json OUT.json
       python tools/bench_compare.py --solo ARTIFACT.json

``--solo`` adjudicates a bench artifact's headline queries against the
committed quiet-host solo medians (SOLO_BASELINE.json, produced by
tools/solo_bench.py): a tracked query is flagged ONLY when its suite
time exceeds solo-median x 1.5 — anything under that band is ambient
session noise by the round-7..11 precedent and needs no verdict
cycle. Regenerate the baseline (and its host-load metadata) whenever
a tracked query's code actually changes.

``--dump`` writes the parsed per-query map to OUT as a standalone
``BENCH_r{N}_full.json`` — run it once per round against the driver's
truncated wrapper (or against the full ``BENCH_full_latest.json`` the
local bench run leaves behind) so cross-round comparison never again
depends on how much of the line the driver's head-truncation kept.
The dump records whether it was recovered from a truncated tail
(``"partial": true``) or parsed from a complete queries dict.
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load_queries(path: str, *, meta: dict | None = None) -> dict[str, float]:
    raw = open(path).read()
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict) and "queries" in obj:
        if meta is not None:
            meta["partial"] = False
            for k in ("sf", "value", "cold_total", "timing_mode"):
                if k in obj:
                    meta[k] = obj[k]
        return {k: float(v) for k, v in obj["queries"].items()}
    text = obj.get("tail", raw) if isinstance(obj, dict) else raw
    # recover per-query entries from a possibly truncated JSON line
    out = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"(q\d+[a-z]?_[a-z0-9_]+)":\s*([0-9.]+)', text)
    }
    if not out:
        raise SystemExit(f"{path}: no per-query timings found")
    if meta is not None:
        meta["partial"] = True
        if isinstance(obj, dict) and "sf" in obj:
            meta["sf"] = obj["sf"]
        m = re.search(r'"value":\s*([0-9.]+)', text)
        if m:
            meta["value"] = float(m.group(1))
    return out


def dump_full(artifact: str, out_path: str) -> int:
    meta: dict = {}
    queries = load_queries(artifact, meta=meta)
    doc = {
        "source": artifact,
        "n_queries": len(queries),
        **meta,
        "queries": dict(sorted(queries.items())),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    kind = "PARTIAL (regex-recovered from truncated tail)" if meta.get(
        "partial"
    ) else "complete"
    print(f"{out_path}: {len(queries)} queries, {kind}")
    return 0


def solo_adjudicate(
    artifact: str,
    solo_path: str = "SOLO_BASELINE.json",
    factor: float = 1.5,
) -> int:
    """Mechanical ambient-vs-real adjudication: compare a bench
    artifact's times for the tracked headline queries against the
    committed quiet-host solo medians. Returns 1 (and prints FLAG
    lines) only for queries beyond solo-median x ``factor`` — those
    need either a code-diff explanation or a fresh solo re-measure;
    everything else is within the established same-tree session
    spread and closes without a verdict cycle."""
    solo = json.load(open(solo_path))
    medians = {
        name: row["median"] for name, row in solo["queries"].items()
    }
    b = load_queries(artifact)
    missing = sorted(set(medians) - set(b))
    flagged = 0
    for name in sorted(medians):
        if name not in b:
            continue
        med = medians[name]
        ratio = b[name] / med if med else float("inf")
        mark = "FLAG" if ratio > factor else "ok  "
        flagged += mark == "FLAG"
        print(
            f"{mark} {name}: suite {b[name]:.2f}s vs solo median "
            f"{med:.2f}s (x{ratio:.2f}, band x{factor})"
        )
    if missing:
        print(f"not in artifact ({len(missing)}): {', '.join(missing)}")
    host = solo.get("host", {})
    print(
        f"baseline: {solo_path} (sf={solo.get('sf')}, load at measure="
        f"{host.get('load1')}, {len(medians)} tracked)"
    )
    print(
        f"{flagged} flagged" if flagged else
        "all tracked queries within the ambient band"
    )
    return 1 if flagged else 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--solo":
        if len(sys.argv) not in (3, 4):
            raise SystemExit(
                "usage: bench_compare.py --solo ARTIFACT.json "
                "[SOLO_BASELINE.json]"
            )
        return solo_adjudicate(sys.argv[2], *sys.argv[3:])
    if len(sys.argv) > 1 and sys.argv[1] == "--dump":
        if len(sys.argv) != 4:
            raise SystemExit(
                "usage: bench_compare.py --dump ARTIFACT.json OUT.json"
            )
        return dump_full(sys.argv[2], sys.argv[3])
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
