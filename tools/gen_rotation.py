#!/usr/bin/env python
"""Derive the driver-window rotation list from CORRECTNESS history.

The driver's CORRECTNESS artifact truncates at 50 rows, so the order
in which ``__spark_entry__.queries()`` yields names decides which
queries get a fresh driver confirmation each round. That order used
to be a hand-maintained ~100-line ``_FIRST`` list whose correctness
was load-bearing for the staleness contract (every query re-confirmed
within ceil(N/50) rounds). This tool derives it mechanically:

1. scan every *git-tracked* ``CORRECTNESS_r*.json`` in the repo root
   and record, per query, the latest round with a green driver row
   (hash_match, or rows_match with no error for oracle-less queries);
   untracked working-tree drops are ignored so the driver landing the
   round-N artifact after the final commit can't desync the check;
2. emit every REGISTRY name ordered by debt: queries with **no**
   driver row yet lead (new-row debt outranks stale-row debt), then
   ascending by last-green round; ties broken by registry insertion
   order, which is stable (module import order + definition order).

``tests/test_rotation.py`` asserts the committed ``_FIRST`` list in
``__spark_entry__.py`` equals this derivation, so the list can never
silently drift from the contract. Regenerate with::

    python tools/gen_rotation.py            # print the ordered list
    python tools/gen_rotation.py --check    # exit 1 if _FIRST stale
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _correctness_paths(repo: str) -> list[str]:
    """CORRECTNESS_r*.json paths that feed the derivation.

    Only *git-tracked* artifacts count: the driver drops the round-N
    artifact into the working tree AFTER the builder's final commit,
    and an untracked file changing the derivation would turn
    ``tests/test_rotation.py`` red at every round boundary before the
    builder can regenerate ``_FIRST`` (round-9 advice item). Reading
    ``git ls-files`` means the derivation only moves when the artifact
    is committed — which happens in the same history the regenerated
    ``_FIRST`` lands in. Falls back to a plain glob outside a git
    checkout so the tool still works on an exported tree.
    """
    try:
        out = subprocess.run(
            ["git", "-C", repo, "ls-files", "CORRECTNESS_r*.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return sorted(os.path.join(repo, p) for p in out.split() if p)
    except (OSError, subprocess.CalledProcessError):
        return sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))


def _load_registry_names() -> list[str]:
    sys.path.insert(0, REPO)
    import etl_guiacores_spark.queries_analytics  # noqa: F401
    import etl_guiacores_spark.queries_corpus  # noqa: F401
    import etl_guiacores_spark.queries_eval  # noqa: F401
    import etl_guiacores_spark.queries_extra  # noqa: F401
    import etl_guiacores_spark.queries_scale  # noqa: F401
    from etl_guiacores_spark.queries import REGISTRY

    return list(REGISTRY)


def last_green_rounds(repo: str = REPO) -> dict[str, int]:
    """Latest round with a green driver row, per query name."""
    hist: dict[str, int] = {}
    for path in _correctness_paths(repo):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = bool(row.get("hash_match")) or (
                bool(row.get("rows_match")) and row.get("err") is None
            )
            if green:
                hist[name] = max(hist.get(name, 0), rnd)
    return hist


def _qnum(name: str) -> int:
    """Numeric id from a registry name (``q101_pagerank`` → 101)."""
    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else 10**9


#: Queries whose IMPLEMENTATION changed in a given round — maintained
#: by the round that touches them. A name whose touched round is LATER
#: than its last driver-green round carries re-verification debt that
#: outranks ordinary staleness (the r13 verdict, item 5: the driver's
#: rotating 50-row window must re-hash a changed query before plain
#: stale rows). Entries become inert once the driver re-confirms the
#: query (last green >= touched round) — no need to delete them.
TOUCHED_SINCE: dict[str, int] = {
    # round-13 optimization session (VERDICT.md r13, correctness gate
    # caveat): plan-shape/persist changes, locally oracle-proven at
    # sf0.01+sf0.1 but not yet re-hashed by the driver's window
    "q107_bloom_decontaminate": 13,
    "q92_semantic_dup_groups": 13,
    "q131_bm25_batch": 13,
    "q132_retrieval_metrics": 13,
    "q137_triangle_counts": 13,
    "q143_cohen_kappa": 13,
    "q152_confusion_metrics": 13,
    "q162_kcore_dedup": 13,
    # round-14 optimization session (OPTIMIZATION_r14.md): adaptive
    # local pagerank, streaming fold trim, gram-key narrowing,
    # repartition skip, footer-metadata sizing, audit restructures —
    # each oracle-proven at sf0.01+sf0.1 locally, awaiting a driver
    # re-hash
    "q101_pagerank_neardup": 14,
    "q199_streaming_acquisition_twin": 14,
    "q200_prechunked_span_strip": 14,
    "q134_repeated_spans": 14,
    "q135_span_strip": 14,
    "q177_span_decontam": 14,
    "q127_ewma_global": 14,
    "q158_vocab_jaccard": 14,
    "q168_countmin_audit": 14,
    "q175_hll_audit": 14,
}


def debt_key(name: str, hist: dict[str, int]) -> tuple:
    """Sort key encoding driver-verification debt: (group, last-green
    round, numeric id, name). Group 0 = never driver-confirmed (new-row
    debt leads), group 1 = implementation touched AFTER the last green
    round (changed-code debt), group 2 = ordinary staleness."""
    last = hist.get(name, -1)
    if last < 0:
        group = 0
    elif TOUCHED_SINCE.get(name, -1) > last:
        group = 1
    else:
        group = 2
    return (group, last, _qnum(name), name)


def generate(repo: str = REPO) -> list[str]:
    """Full registry ordering: never-driver-confirmed first, then
    touched-after-last-green (changed code the driver has not
    re-hashed), then ascending last-green round; numeric query id
    breaks ties.

    The tie-break must NOT be REGISTRY insertion order: that order is
    whatever the first importer of the query modules happened to use
    (``__spark_entry__`` vs this tool import them differently), so it
    differs between a CLI run and a pytest run that imported the entry
    module first — the round-10 root cause of a check/pytest split.
    The numeric id is canonical regardless of import state.
    """
    names = _load_registry_names()
    hist = last_green_rounds(repo)
    return sorted(names, key=lambda n: debt_key(n, hist))


def committed_first() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    return list(entry._FIRST)


def main() -> int:
    rotation = generate()
    if "--check" in sys.argv:
        committed = committed_first()
        if committed != rotation:
            for i, (a, b) in enumerate(zip(committed, rotation)):
                if a != b:
                    print(f"first divergence at position {i}: committed={a} derived={b}")
                    break
            print(f"STALE: committed _FIRST ({len(committed)}) != derived ({len(rotation)})")
            return 1
        print(f"OK: _FIRST matches derivation ({len(rotation)} names)")
        return 0
    for name in rotation:
        print(name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
