"""Unit tests for tools/plan_audit.py's window-spec detector.

The detector reads executed-plan strings; these tests feed it plan
fragments with the exact shapes that broke the round-9 regex version
(nested parens in sort keys, function calls before the first top-level
comma) plus the shapes it must still flag and still pass.
"""

from __future__ import annotations

from tools.plan_audit import (
    first_top_level_arg,
    iter_window_specs,
    unpartitioned_window_in,
)


def test_iter_window_specs_balances_nested_parens():
    plan = (
        "Window [row_number() windowspecdefinition("
        "coalesce(a#1, b#2) ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())"
        ")], [coalesce(a#1, b#2) ASC NULLS FIRST]"
    )
    specs = list(iter_window_specs(plan))
    assert len(specs) == 1
    # the full arg list survives the nested parens — the old regex cut
    # it at "coalesce(a#1, b#2" and never saw the frame
    assert specs[0].startswith("coalesce(a#1, b#2) ASC")
    assert specs[0].endswith("currentrow$())")


def test_first_top_level_arg_ignores_nested_commas():
    args = (
        "coalesce(a#1, b#2) ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, x$(), y$())"
    )
    assert first_top_level_arg(args) == "coalesce(a#1, b#2) ASC NULLS FIRST"


def test_flags_expression_valued_unpartitioned_sort():
    # no PARTITION BY, sort key is a function call: the round-9 regex
    # false-negative case — MUST be flagged
    plan = (
        "windowspecdefinition(coalesce(a#1, b#2) ASC NULLS FIRST, "
        "specifiedwindowframe(RangeFrame, unboundedpreceding$(), "
        "currentrow$()))"
    )
    assert unpartitioned_window_in(plan)


def test_flags_frame_only_window():
    # no PARTITION BY and no ORDER BY at all: whole-table reducer
    plan = (
        "windowspecdefinition(specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), unboundedfollowing$()))"
    )
    assert unpartitioned_window_in(plan)


def test_partitioned_window_passes():
    plan = (
        "windowspecdefinition(__pid#5, k#6 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$()))"
    )
    assert not unpartitioned_window_in(plan)


def test_partitioned_window_with_expression_key_passes():
    # partition key that is itself a function call must not be
    # mistaken for a sort order
    plan = (
        "windowspecdefinition(coalesce(p#1, q#2), v#3 DESC NULLS LAST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$()))"
    )
    assert not unpartitioned_window_in(plan)


def test_partition_expression_containing_asc_substring_passes():
    # a partitioned spec whose partition expression merely CONTAINS
    # " ASC" (e.g. a sort_array sub-expression) must not be mistaken
    # for a sort order — the tail-anchored match (round-10 advice)
    plan = (
        "windowspecdefinition(sort_array(v#1, a#2 ASC NULLS FIRST), "
        "k#3 ASC NULLS FIRST, specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), currentrow$()))"
    )
    assert not unpartitioned_window_in(plan)


def test_multiple_specs_any_bad_flags():
    good = (
        "windowspecdefinition(p#1, v#2 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, a$(), b$()))"
    )
    bad = (
        "windowspecdefinition(v#2 DESC NULLS LAST, "
        "specifiedwindowframe(RowFrame, a$(), b$()))"
    )
    assert not unpartitioned_window_in(good)
    assert unpartitioned_window_in(good + " ... " + bad)
