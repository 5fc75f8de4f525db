"""The driver-window rotation list must match its mechanical derivation.

``__spark_entry__._FIRST`` decides which 50 queries get a fresh driver
CORRECTNESS row each round (the artifact truncates at 50). Round 8's
verdict asked for the list to be generated, not hand-rotated:
``tools/gen_rotation.py`` derives it from the CORRECTNESS_r*.json
history (never-confirmed queries first, then ascending last-green
round, registry order as tie-break). These tests pin the committed
list to that derivation so it cannot silently drift.
"""

from __future__ import annotations

import __spark_entry__ as entry

from tools.gen_rotation import debt_key, generate, last_green_rounds


def test_first_matches_derivation():
    assert list(entry._FIRST) == generate()


def test_first_covers_whole_registry():
    # _FIRST is the full ordering now — no names outside the registry,
    # no registry names missing.
    from etl_guiacores_spark.queries import REGISTRY

    assert sorted(entry._FIRST) == sorted(REGISTRY)
    assert len(set(entry._FIRST)) == len(entry._FIRST)


def test_window_closes_driver_debt():
    # The 50-row window must lead with the highest-debt cohort under
    # the shared debt ordering (never-confirmed first, then
    # touched-after-last-green, then stalest): nothing in the window
    # may carry LESS debt than something outside it.
    hist = last_green_rounds()
    order = list(entry._FIRST)
    window, rest = order[:50], order[50:]
    max_in_window = max(debt_key(n, hist)[:2] for n in window)
    min_outside = (
        min(debt_key(n, hist)[:2] for n in rest) if rest else (9, 10**9)
    )
    assert max_in_window <= min_outside
    # every never-confirmed query is in the window
    missing = [n for n in rest if n not in hist]
    assert missing == []


def test_touched_queries_lead_window():
    # Round-13-touched queries the driver has not re-hashed since must
    # all sit inside the 50-row window (r13 verdict item 5).
    hist = last_green_rounds()
    from tools.gen_rotation import TOUCHED_SINCE

    window = set(entry._FIRST[:50])
    unverified = [
        n
        for n, rnd in TOUCHED_SINCE.items()
        if rnd > hist.get(n, -1)
    ]
    assert set(unverified) <= window
