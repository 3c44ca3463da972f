"""Inverted-index invariants beyond the flat oracle comparison."""

from __future__ import annotations

from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.operators import index
from tests.conftest import SF_TEST


def test_postings_sorted_and_consistent(spark):
    """postings_table rows: docnos strictly ascending, df == len(postings),
    and flattening reproduces the flat index exactly."""
    rows = index.postings_table(spark, SF_TEST).collect()
    assert rows
    flat_from_postings = set()
    for r in rows:
        docnos = [p.docno for p in r.postings]
        assert docnos == sorted(docnos)
        assert len(docnos) == len(set(docnos)), "duplicate docno in postings"
        assert r.df == len(r.postings)
        flat_from_postings.update((r.term, p.docno, p.tf) for p in r.postings)
    flat = {
        (r.term, r.doc_id, r.tf)
        for r in index.inverted_index(spark, SF_TEST).collect()
    }
    assert flat == flat_from_postings


def test_boolean_retrieval_set_semantics(spark):
    """AND ⊆ each term's doc set; OR ⊇ AND; engine result matches a
    Python-set evaluation of the same postfix query."""
    tf = index.term_frequencies(spark, SF_TEST)
    docs = {
        t: {r.doc_id for r in tf.where(F.col("term") == t).select("doc_id").collect()}
        for t in ("spark", "join", "filter")
    }
    expected = (docs["spark"] & docs["join"]) | docs["filter"]
    got = {r.doc_id for r in index.eval_postfix(tf, "spark join AND filter OR").collect()}
    assert got == expected
    assert got, "fixture should match at least one document"
