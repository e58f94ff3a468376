"""As-of (nearest-predecessor) join — SURVEY.md §4.2.1.

Spark SQL has no native ASOF JOIN (DuckDB does, which makes it a
perfect oracle). The scalable idiom implemented here is the
union-tag + windowed last(ignoreNulls) forward-fill:

    1. Tag right rows (the "quotes") and left rows (the "probes").
    2. Union them on (by-key, time) — ONE shuffle, no row explosion.
    3. last(right_payload, ignoreNulls=True) over
       (partition by key order by time, tag) fills each probe with the
       most recent quote at-or-before it.
    4. Keep probe rows.

Contrast with join+row_number: that materializes |L|x|matching R|
intermediate rows; the union idiom is linear in |L|+|R| and shuffles
each input exactly once — the shape that survives 100 TB.

Ties: right rows sort BEFORE left rows at equal times (tag 0 < 1), so a
quote exactly at the probe's timestamp matches (inclusive <=), and
among equal-time quotes the one with the highest ``tiebreak`` wins —
pass a unique column to make results deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__khose_asof_tag"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | None = None,
    value_cols: Sequence[str] | None = None,
    right_on: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach ``value_cols`` of
    the latest right row with ``right[right_on] <= left[on]`` within the
    same ``by`` group. Unmatched left rows keep NULLs (left-join shape).
    """
    right_on = right_on or on
    by = list(by or [])
    value_cols = list(value_cols or [c for c in right.columns if c != right_on and c not in by])

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_TAG),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.col(c).alias(c) if c in by else F.col(c) for c in by],
        F.col(right_on).alias(on),
        F.lit(0).alias(_TAG),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    # Align the union schema: left columns missing on the right become NULL.
    l_only = [c for c in left.columns if c not in by and c != on]
    r_full = r_tagged.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_only],
        *by,
        on,
        _TAG,
        *[f"__r_{c}" for c in value_cols],
    )
    unioned = l_tagged.select(*l_only, *by, on, _TAG, *[f"__r_{c}" for c in value_cols]).unionByName(
        r_full
    )

    order: list[Column] = [F.col(on).asc(), F.col(_TAG).asc()]
    if tiebreak is not None:
        # among equal-time right rows, highest tiebreak wins: sort asc and
        # let last() pick the final one.
        order.insert(1, F.when(F.col(_TAG) == 0, F.col(f"__r_{tiebreak}")).asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *l_only,
        *by,
        on,
        _TAG,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col(_TAG) == 1).select(
        *l_only,
        *by,
        on,
        *[F.col(f"__f_{c}").alias(c) for c in value_cols],
    )
