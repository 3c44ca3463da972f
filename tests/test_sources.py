"""Source/sink roundtrips: .tbl text, postings index, model codecs
(SURVEY.md §2.1 S2/S5/S6, P10)."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.operators import index, ml
from uw_hadoop_aglorithms_spark.sources import jsonl, sinks, tbl
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog
from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def tmp(spark):
    return tempfile.mkdtemp(prefix="sources_")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("table", ["nation", "orders", "lineitem"])
def test_tbl_roundtrip(spark, tmp, table):
    """parquet → .tbl text → named-schema read == original (dates and
    timestamps included)."""
    src = Catalog(spark, SF_TEST).table(table)
    path = f"{tmp}/{table}_tbl"
    tbl.write_tbl(src, path)
    back = tbl.read_tbl(spark, path, table)
    assert back.schema == src.schema or [
        (f.name, f.dataType) for f in back.schema.fields
    ] == [(f.name, f.dataType) for f in src.schema.fields]
    assert _rows(back) == _rows(src)


def test_text_sink_writes_lines(spark, tmp):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    tbl.write_text(df, f"{tmp}/lines")
    got = {r.value for r in spark.read.text(f"{tmp}/lines").collect()}
    assert got == {"1\ta", "2\tb"}


def test_postings_sink_roundtrip_and_pruned_lookup(spark, tmp):
    postings = index.postings_table(spark, SF_TEST)
    path = f"{tmp}/postings"
    sinks.save_postings(postings, path)
    back = sinks.load_postings(spark, path)
    assert back.count() == postings.count()
    some_term = postings.select("term").orderBy("term").first().term
    hit = sinks.lookup_term(spark, path, some_term)
    rows = hit.collect()
    assert len(rows) == 1 and rows[0].term == some_term
    # the physical scan must prune to ONE bucket directory
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_model_codecs_roundtrip(spark, tmp):
    model = ml.spam_train(spark, SF_TEST)
    sinks.save_model(model, f"{tmp}/model_pq")
    assert _rows(sinks.load_model(spark, f"{tmp}/model_pq")) == _rows(model)
    # reference-compatible text codec: (feature,weight) lines + regex parse
    sinks.save_model_text(model, f"{tmp}/model_txt")
    back = sinks.load_model_text(spark, f"{tmp}/model_txt")
    want = {r.feature: r.weight for r in model.collect()}
    got = {r.feature: r.weight for r in back.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_sql_entry_matches_dataframe_entry(spark):
    """Catalog.register_views + spark.sql is a first-class query path:
    the reference's Q1/Q6 SQL specs run verbatim-ish and agree with the
    DataFrame operators."""
    from uw_hadoop_aglorithms_spark.operators import relational

    Catalog(spark, SF_TEST).register_views()
    sql_q1 = spark.sql(
        f"SELECT count(*) AS count_items FROM lineitem "
        f"WHERE l_shipdate = TIMESTAMP '{relational.SHIP_DATE}'"
    )
    assert _rows(sql_q1) == _rows(relational.q1(spark, SF_TEST))


def test_declared_schemas_match_disk(spark):
    """Schema-drift guard: the declared StructTypes must agree with the
    parquet footers field-for-field (the reference had no schema system
    at all — this is the contract that replaces ordinal constants)."""
    assert Catalog(spark, SF_TEST).validate_schemas() == []


@pytest.mark.parametrize("table", ["nation", "orders", "events"])
def test_jsonl_roundtrip(spark, tmp, table):
    """parquet -> JSONL -> named-schema read == original, including
    microsecond timestamps and the nested-JSON props string."""
    src = Catalog(spark, SF_TEST).table(table)
    path = f"{tmp}/{table}_jsonl"
    jsonl.write_jsonl(src, path)
    back = jsonl.read_jsonl(spark, path, table)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in src.schema.fields
    ]
    assert _rows(back) == _rows(src)


@pytest.mark.parametrize("table", ["nation", "orders", "events", "documents"])
def test_csv_roundtrip(spark, tmp, table):
    """parquet -> headered CSV -> named-schema read == original,
    including micros timestamps and quoted free-text columns. (Array
    columns are out of scope for CSV — embeddings stay Parquet/ORC.)"""
    from uw_hadoop_aglorithms_spark.sources import csv as csv_src

    src = Catalog(spark, SF_TEST).table(table)
    path = f"{tmp}/{table}_csv"
    csv_src.write_csv(src, path)
    back = csv_src.read_csv(spark, path, table)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in src.schema.fields
    ]
    assert _rows(back) == _rows(src)


def test_csv_failfast_on_malformed(spark, tmp):
    """A 100 TB ingest must fail loudly on a corrupt row, not null it:
    the named-schema CSV reader runs FAILFAST."""
    bad = f"{tmp}/bad_csv"
    import os

    os.makedirs(bad, exist_ok=True)
    with open(f"{bad}/part-00000.csv", "w") as f:
        f.write("n_nationkey,n_name,n_regionkey,n_comment\n")
        f.write("not_a_number,FRANCE,1,ok\n")
    from uw_hadoop_aglorithms_spark.sources import csv as csv_src

    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        csv_src.read_csv(spark, bad, "nation").collect()


@pytest.mark.parametrize("table", ["nation", "events", "embeddings"])
def test_orc_roundtrip(spark, tmp, table):
    """parquet -> ORC -> named-schema read == original, including
    timestamps and float-array embedding columns."""
    from uw_hadoop_aglorithms_spark.sources import orc

    src = Catalog(spark, SF_TEST).table(table)
    path = f"{tmp}/{table}_orc"
    orc.write_orc(src, path)
    back = orc.read_orc(spark, path, table)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in src.schema.fields
    ]
    assert _rows(back) == _rows(src)
