"""Multimodal plumbing invariants at sf0.001: schema, Arrow batch shape,
and the decode stub contract (oracle hash parity is the driver's job)."""

from __future__ import annotations

import pytest

from uw_hadoop_aglorithms_spark.operators import multimodal
from tests.conftest import SF_TEST


def test_media_table_schema_and_metadata(spark):
    mt = multimodal.media_table(spark, SF_TEST)
    kinds = dict(mt.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media_type"] == "string"
    rows = mt.collect()
    assert {r.media_type for r in rows} == set(multimodal.MEDIA_TYPES)
    for r in rows:
        # typed metadata is modality-dependent and null elsewhere
        if r.media_type == "image":
            assert r.meta.width is not None and r.meta.sample_rate is None
        elif r.media_type == "audio":
            assert r.meta.sample_rate == 16_000 and r.meta.width is None
        else:
            assert r.meta.fps == 30 and r.meta.width is None
        assert bytes(r.payload)  # payload is real bytes


def test_media_features_survives_small_arrow_batches(spark):
    """The mapInPandas fn must be correct per-batch with no cross-batch
    state — force many small Arrow batches and compare."""
    baseline = {r.doc_id: r for r in multimodal.media_features(spark, SF_TEST).collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small = {r.doc_id: r for r in multimodal.media_features(spark, SF_TEST).collect()}
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert small.keys() == baseline.keys()
    for k in baseline:
        assert small[k] == baseline[k]
    for r in baseline.values():
        # hist is a '|'-joined scalar string (driver canonicalizer can't
        # hash list cells); bins must still sum to the byte count
        bins = [int(x) for x in r.hist.split("|")]
        assert len(bins) == multimodal.HIST_BINS
        assert sum(bins) == r.n_bytes
        assert 0.0 <= r.byte_mean <= 255.0


def test_frame_sample_covers_stride(spark):
    rows = multimodal.frame_sample(spark, SF_TEST).collect()
    assert rows
    for r in rows:
        assert r.frame_idx % multimodal.FRAME_STRIDE == 0
        assert 1 <= r.n_bytes <= multimodal.FRAME_BYTES
        assert 0 <= r.frame_hash < multimodal.P


def test_decode_media_is_an_explicit_stub(spark):
    mt = multimodal.media_table(spark, SF_TEST)
    with pytest.raises(NotImplementedError, match="decode"):
        multimodal.decode_media(mt)
