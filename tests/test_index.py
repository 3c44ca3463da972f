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


def test_phrase_and_proximity_match_python_scan(spark):
    """Positional retrieval vs a direct Python scan of the token
    streams: phrase occurrence counts and within-window pair counts
    agree doc by doc."""
    from uw_hadoop_aglorithms_spark.functions.text import tokens

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    toks = {
        r.doc_id: r.ts
        for r in docs.select("doc_id", tokens("text").alias("ts")).collect()
    }

    terms = index.PHRASE_QUERY.split()
    exp_phrase = {}
    for d, ts in toks.items():
        n = sum(
            1
            for i in range(len(ts) - len(terms) + 1)
            if ts[i : i + len(terms)] == terms
        )
        if n:
            exp_phrase[d] = n
    got = {r.doc_id: r.matches for r in index.phrase_search(spark, SF_TEST).collect()}
    assert got == exp_phrase

    x, y = index.PROX_TERMS
    exp_prox = {}
    for d, ts in toks.items():
        px = [i for i, t in enumerate(ts) if t == x]
        py = [i for i, t in enumerate(ts) if t == y]
        n = sum(1 for a in px for b in py if abs(a - b) <= index.PROX_WINDOW)
        if n:
            exp_prox[d] = n
    got = {
        r.doc_id: r.matches for r in index.proximity_search(spark, SF_TEST).collect()
    }
    assert got == exp_prox
