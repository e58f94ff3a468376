"""Third-implementation check for BPE merge induction.

The driver parity gate already cross-checks the Spark pipeline against
the unrolled DuckDB CTE chain — but both were written from the same
window-function derivation, so a shared misreading of greedy-leftmost
merge semantics would pass. This file re-derives the semantics with an
IMPERATIVE pure-Python reference (the textbook greedy scan) and drives
the Spark pipeline over handcrafted corpora chosen to hit the
overlap/tie edge cases:

- runs of a self-pair ("a a a a" — merge 1&2, 3&4; "a a a" — merge 1&2
  only),
- alternating pairs ("a b a b" — both (a,b) occurrences merge, the
  middle (b,a) is consumed),
- count ties broken (count desc, left asc, right asc),
- single-token and empty-ish documents (no pairs contributed).
"""

from __future__ import annotations

import pytest

from khose_spark.operators.textindex import bpe_merge_rounds


def _ref_bpe(docs: list[list[str]], rounds: int) -> list[tuple]:
    """Textbook BPE: count adjacent pairs, pick (count desc, pair asc),
    merge greedily left-to-right (a merged position consumes its right
    neighbor, so the scan skips it), repeat."""
    out = []
    toks = [list(d) for d in docs]
    for r in range(1, rounds + 1):
        counts: dict[tuple, int] = {}
        for d in toks:
            for i in range(len(d) - 1):
                counts[(d[i], d[i + 1])] = counts.get((d[i], d[i + 1]), 0) + 1
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((r, left, right, c))
        merged_docs = []
        for d in toks:
            nd, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == left and d[i + 1] == right:
                    nd.append(f"{left}+{right}")
                    i += 2
                else:
                    nd.append(d[i])
                    i += 1
            merged_docs.append(nd)
        toks = merged_docs
    return out


CORPORA = {
    "self_pair_runs": ["a a a a", "a a a", "b c"],
    "alternating": ["a b a b a b", "a b", "c"],
    "tie_break": ["x y", "y x", "p q", "q p"],
    "mixed": [
        "the quick brown fox",
        "the quick quick fox",
        "quick quick quick quick",
        "solo",
    ],
    "merged_token_cascade": ["a a a a a a a a", "a a b a a b"],
}


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_bpe_matches_greedy_reference(spark, name):
    docs = CORPORA[name]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, text) for i, text in enumerate(docs)], "doc_id long, text string"
    )
    stream = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok")
    got = [
        (r["merge_round"], r["left_tok"], r["right_tok"], r["pair_count"])
        for r in bpe_merge_rounds(stream, 3)
        .orderBy("merge_round")
        .collect()
    ]
    want = _ref_bpe([d.split(" ") for d in docs], 3)
    assert got == want, f"{name}: spark={got} reference={want}"


def test_bpe_compact_mode_restores_session_confs(spark, sf_dir):
    """The small-corpus execution mode flips AQE/shuffle-partition confs
    around its eager materialization; the driver hands us ITS session,
    so both must be restored no matter what."""
    from khose_spark import registry

    registry.load_all()
    before = {
        k: spark.conf.get(k)
        for k in ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    }
    registry.QUERIES["q_llm_bpe_merges"](spark, sf_dir).count()
    after = {k: spark.conf.get(k) for k in before}
    assert after == before, f"compact mode leaked conf changes: {after}"
