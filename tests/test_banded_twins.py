"""Recall certificate for the candidate-bounded exact-verify twins
(round 9, VERDICT r08 item 2).

q_llm_neardup_jaccard_banded / q_llm_containment_banded generate
candidates from the md5-MinHash 8×2 band join and exact-verify only
those, so at the ≥0.8 thresholds they can in principle MISS a truth
pair whose 16 signatures disagree in ≥11 positions (probability
≤ C(16,6)·0.8¹⁰·0.2⁶ ≈ tail mass — tiny but nonzero). This test pins
the measured reality on the fixtures the board grades: the banded
pair set EQUALS the all-pairs truth twin's pair set, i.e. recall is
1000‰ where both are affordable to compute.

DuckDB-only on purpose (the threshold-sweep precedent): Spark-vs-
oracle parity of each banded key is the regular sweep's job; what
needs certifying HERE is banded-SQL == truth-SQL on one engine, so a
divergence is the band algebra / recall, not engine drift.
"""

from __future__ import annotations

import duckdb
import pytest

from khose_spark.registry import ORACLES, load_all

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

PAIRS = [
    # (banded key, all-pairs truth key, compared columns)
    (
        "q_llm_neardup_jaccard_banded",
        "q_llm_neardup_jaccard",
        ["id_a", "id_b", "jaccard"],
    ),
    (
        "q_llm_containment_banded",
        "q_llm_containment",
        ["id_a", "id_b", "n_common", "n_small", "containment_permille"],
    ),
]


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize("banded_key,truth_key,cols", PAIRS)
def test_banded_twin_matches_all_pairs_truth(
    sf_dir, banded_key, truth_key, cols
):
    load_all()
    con = duckdb.connect()
    for tname in TABLES:
        con.sql(
            f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'"
        )
    key = ["id_a", "id_b"]
    a = (
        con.sql(ORACLES[banded_key])
        .df()[cols]
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        con.sql(ORACLES[truth_key])
        .df()[cols]
        .sort_values(key)
        .reset_index(drop=True)
    )
    con.close()
    assert len(b) > 0, f"{truth_key} truth set empty — test is vacuous"
    assert a.equals(b), (
        f"{banded_key} diverged from {truth_key} at {sf_dir}: "
        f"{len(a)} banded rows vs {len(b)} truth rows"
    )
