"""Executable-margin-law gate (round 9, VERDICT r08 item 4).

scripts/margin_audit.py is the harness that turned docstring overflow
laws into measurements; this test keeps it honest in CI: every law's
SQL must parse and run on the graded fixture, report a positive
measurement, and hold ≥1 decade of headroom against its declared
carrier — so a new operator whose law drifts (or a law whose SQL rots
when a fixture column changes) fails the suite, not the next decade
sweep."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "margin_audit", os.path.join(REPO, "scripts", "margin_audit.py")
)
margin_audit = importlib.util.module_from_spec(spec)
spec.loader.exec_module(margin_audit)


def test_all_laws_green_at_graded_fixture():
    report = margin_audit.run("/root/testdata/sf0.01")
    bad = {
        name: row
        for name, row in report["laws"].items()
        if row["status"] != "ok"
    }
    assert report["green"] and not bad, f"margin laws not green: {bad}"
    # every law actually measured something (an empty/NULL aggregate
    # would vacuously pass the headroom check)
    zero = [
        n for n, r in report["laws"].items() if not (r["measured"] or 0) > 0
    ]
    assert not zero, f"laws measured nothing: {zero}"


def test_events_only_scale_subset_is_the_moment_family():
    assert margin_audit.EVENTS_ONLY_LAWS <= set(margin_audit.LAWS)
    for name in margin_audit.EVENTS_ONLY_LAWS:
        assert "events" in margin_audit.LAWS[name]["sql"], name


def test_lineitem_family_subset_reads_only_lineitem_orders():
    assert margin_audit.LINEITEM_FAMILY_LAWS <= set(margin_audit.LAWS)
    for name in margin_audit.LINEITEM_FAMILY_LAWS:
        sql = margin_audit.LAWS[name]["sql"]
        assert "lineitem" in sql or "orders" in sql, name
        assert "events" not in sql and "documents" not in sql, name
