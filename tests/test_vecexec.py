"""Exactness contract of the r13 Arrow/numpy kernels (khose_spark.vecexec).

The fixed-k embedding family moved its distance/round inner loops from
Catalyst higher-order-function folds to vectorized numpy inside
mapInArrow.  Hash parity is bit-level, so the kernels must replicate
Spark's expression semantics EXACTLY.  These tests pin the three laws
the module relies on:

1. ``round_half_up`` == Spark ``F.round(double, s)`` (HALF_UP over the
   shortest-decimal representation), including the adversarial
   near-``.5``-boundary values that the fast path routes through
   ``decimal.Decimal``.
2. The ``seq_*`` fold kernels == the Catalyst
   ``aggregate(zip_with(...), 0.0, acc + f(x))`` strict left-to-right
   fp64 folds (bit-identical, not approximately equal).
3. ``np.argmin`` first-wins tiebreak == the ``row_number() OVER
   (ORDER BY metric, cid)`` contract on a cid-ascending codebook.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from khose_spark.vecexec import (
    matrix_to_list_array,
    pair_metric,
    round_half_up,
    seq_dot,
    seq_l2sq,
    seq_sq,
)

RNG = np.random.default_rng(20260817)


def _spark_round(spark, values: np.ndarray, scale: int) -> np.ndarray:
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    out = df.select(F.round("x", scale).alias("r")).toPandas()["r"]
    return out.to_numpy(dtype=np.float64)


def test_round_half_up_matches_spark_adversarial(spark):
    # Adversarial mass right at the rounding boundary plus random mass.
    base = np.concatenate(
        [
            (np.arange(4000) + 0.5) / 1e6,            # exact .5 boundaries at scale 6
            (np.arange(4000) + 0.5) / 1e6 + 1e-13,    # just above
            (np.arange(4000) + 0.5) / 1e6 - 1e-13,    # just below
            RNG.uniform(-100, 100, 4000),
            RNG.uniform(-1, 1, 4000) * 1e-6,
        ]
    )
    for scale in (4, 6):
        ours = round_half_up(base.copy(), scale)
        theirs = _spark_round(spark, base, scale)
        mism = np.nonzero(ours != theirs)[0]
        assert mism.size == 0, (
            f"scale={scale}: {mism.size} mismatches, first "
            f"x={base[mism[0]]!r} ours={ours[mism[0]]!r} "
            f"spark={theirs[mism[0]]!r}"
        )


def test_seq_folds_match_catalyst_fold(spark):
    V = RNG.standard_normal((40, 16))
    C = RNG.standard_normal((8, 16))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(V)],
        "rid bigint, v array<double>",
    )
    rows = []
    for j, c in enumerate(C):
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        rows.append(
            df.select(
                "rid",
                F.lit(j).alias("cid"),
                F.aggregate(
                    F.zip_with("v", lit_c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("l2sq"),
                F.aggregate(
                    F.zip_with("v", lit_c, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dot"),
            )
        )
    got = rows[0]
    for r in rows[1:]:
        got = got.unionAll(r)
    pdf = got.toPandas().sort_values(["rid", "cid"]).reset_index(drop=True)
    l2 = seq_l2sq(V, C)
    dt = seq_dot(V, C)
    for _, row in pdf.iterrows():
        i, j = int(row["rid"]), int(row["cid"])
        assert l2[i, j] == row["l2sq"], (i, j, l2[i, j], row["l2sq"])
        assert dt[i, j] == row["dot"], (i, j, dt[i, j], row["dot"])
    # seq_sq is the dot of a row with itself
    assert np.array_equal(seq_sq(V), np.array([seq_dot(V, V)[i, i] for i in range(len(V))]))


def test_argmin_first_wins_tiebreak():
    d2 = np.array([[3.0, 1.0, 1.0, 2.0]])
    assert int(d2.argmin(axis=1)[0]) == 1  # first minimum == smallest cid


def test_matrix_roundtrip_and_pair_metric(spark):
    import pandas as pd

    V = RNG.standard_normal((32, 8))
    W = RNG.standard_normal((32, 8))
    arr = matrix_to_list_array(V)
    back = np.array(arr.to_pylist())
    assert np.array_equal(back, V)

    pdf = pd.DataFrame(
        {
            "pid": np.arange(32, dtype=np.int64),
            "a": [list(map(float, r)) for r in V],
            "b": [list(map(float, r)) for r in W],
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        pair_metric(df, ["pid"], "a", "b", "cos", 6, "sim", dim=8)
        .toPandas()
        .sort_values("pid")["sim"]
        .to_numpy()
    )
    # Spark expression twin: round(seq-fold cosine, 6)
    lit_expr = (
        "round(aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d,"
        " (acc, x) -> acc + x) / (sqrt(aggregate(transform(a, x -> x * x),"
        " 0.0d, (acc, x) -> acc + x)) * sqrt(aggregate(transform(b, x -> x * x),"
        " 0.0d, (acc, x) -> acc + x))), 6)"
    )
    want = (
        df.selectExpr("pid", f"{lit_expr} as sim")
        .toPandas()
        .sort_values("pid")["sim"]
        .to_numpy()
    )
    assert np.array_equal(got, want)


def test_pair_metric_rejects_unknown_metric(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"pid": [0], "a": [[1.0, 2.0]], "b": [[3.0, 4.0]]}
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception):
        pair_metric(df, ["pid"], "a", "b", "mahalanobis", 6, "m", dim=2).collect()
