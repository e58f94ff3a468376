"""Multimodal decode plumbing tests (khose_spark.operators.multimodal):
the Arrow-batch shape, schema, payload-drop behavior, and the
real-decoder stubs. The value-level correctness of the fake decoder is
covered by the q_mm_decode_features oracle parity test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from khose_spark.operators.multimodal import (
    decode_image,
    fake_decode,
    map_decode,
    sample_frames,
)
from khose_spark.tables import t


def test_real_decoders_are_explicit_stubs():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
    with pytest.raises(NotImplementedError):
        sample_frames(b"\x00\x00\x00\x18ftyp")


def test_fake_decode_deterministic_and_bounded():
    w1, h1, f1, feat1 = fake_decode(b"payload")
    w2, h2, f2, feat2 = fake_decode(b"payload")
    assert (w1, h1, f1, feat1) == (w2, h2, f2, feat2)
    assert 16 <= w1 <= 271 and 16 <= h1 <= 271 and 1 <= f1 <= 8
    assert len(feat1) == 8 and all(0.0 <= x <= 1.0 for x in feat1)
    assert fake_decode(b"other")[:3] != (w1, h1, f1) or fake_decode(b"other")[3] != feat1


def test_map_decode_schema_and_payload_drop(spark, sf_dir):
    d = (
        t(spark, sf_dir, "documents")
        .limit(50)
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    )
    out = map_decode(d)
    # Features land as SCALAR columns f1..f8 (not array<double>): array
    # outputs are banned at the query boundary since the driver canon
    # cannot sort ndarray cells.
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_bytes", "width", "height", "n_frames",
        "f1", "f2", "f3", "f4", "f5", "f6", "f7", "f8",
    ]
    assert "payload" not in out.columns  # blobs never survive the decode stage
    rows = out.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r["n_bytes"] > 0 and all(0.0 <= r[f"f{i}"] <= 1.0 for i in range(1, 9))


def test_map_decode_handles_multiple_batches(spark, sf_dir):
    # Force several small Arrow batches through the decode iterator.
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        d = (
            t(spark, sf_dir, "documents")
            .limit(40)
            .select("doc_id", F.encode("text", "utf-8").alias("payload"))
        )
        assert map_decode(d).count() == 40
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
