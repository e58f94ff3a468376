"""Losslessness certificate for the banded q_llm_lsh_threshold_sweep
registration (round 8, VERDICT r07 item 1).

The registered oracle generates candidate pairs with 16 single-slot
band equi-joins (a pair agreeing in k >= 1 of 16 signature slots
collides in exactly k of them — pigeonhole makes 16x1 banding lossless
for every threshold in the 8..16 grid) and takes the agreement-0 mass
as the closed form n(n-1)/2 - |candidates|. This test certifies that
form against the retired all-pairs histogram (SWEEP_ALL_PAIRS_SQL, the
pre-round-8 registration) in DuckDB at fixture scale, where the
quadratic form is still affordable — the q_llm_minhash_det precedent:
the banded plan ships, the all-pairs plan is the test-only ground
truth.

DuckDB-only on purpose: Spark-vs-oracle parity of the banded form is
the regular sweep's job; what needs certifying HERE is banded-SQL ==
all-pairs-SQL on the same engine, so any divergence is the band
algebra, not engine drift.
"""

from __future__ import annotations

import duckdb
import pytest

from khose_spark.operators.dedup_audit import SWEEP_ALL_PAIRS_SQL
from khose_spark.registry import ORACLES, load_all

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_banded_sweep_equals_all_pairs_truth(sf_dir):
    load_all()
    banded = ORACLES["q_llm_lsh_threshold_sweep"]
    con = duckdb.connect()
    for tname in TABLES:
        con.sql(
            f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'"
        )
    a = con.sql(banded).df().sort_values("threshold").reset_index(drop=True)
    b = (
        con.sql(SWEEP_ALL_PAIRS_SQL)
        .df()
        .sort_values("threshold")
        .reset_index(drop=True)
    )
    con.close()
    assert list(a.columns) == list(b.columns)
    assert a.equals(b), f"banded vs all-pairs diverged:\n{a}\nvs\n{b}"
