"""Dataset-assembly operators: hash sampling, splits, stratification.

The load-bearing property (why hash splits beat RNG or row-number
splits): membership is a pure function of the row key, so growing the
corpus never reassigns existing rows. Oracle value-parity is covered by
tests/test_oracle_parity.py; these tests pin the semantic guarantees.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_TEST
from uw_hadoop_aglorithms_spark.operators import pipeline
from uw_hadoop_aglorithms_spark.operators.textstats import tfidf_top_terms
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

SF_MID = "/root/testdata/sf0.01"


def _assignments(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    bucket = pipeline._bucket("doc_id", pipeline.SPLIT_SEED, 100)
    rows = docs.select("doc_id", bucket.alias("b")).collect()
    return {r.doc_id: r.b for r in rows}


def test_split_assignment_stable_under_corpus_growth(spark):
    """A doc's split bucket is identical whether computed in the small or
    the 10x corpus — appending data never reassigns existing rows."""
    small = _assignments(spark, SF_TEST)
    big = _assignments(spark, SF_MID)
    assert set(small) <= set(big)
    for doc_id, b in small.items():
        assert big[doc_id] == b


def test_split_fractions_and_totals(spark):
    rows = pipeline.split_assign(spark, SF_MID).collect()
    n = {s: 0 for s in ("train", "val", "test")}
    for r in rows:
        n[r.split] += r.n_docs
    total = sum(n.values())
    assert total == Catalog(spark, SF_MID).documents.count()
    # 80/10/10 within binomial noise at 500 docs
    assert 0.70 <= n["train"] / total <= 0.90
    assert 0.04 <= n["val"] / total <= 0.16
    assert 0.04 <= n["test"] / total <= 0.16


def test_hash_sample_rate_and_determinism(spark):
    s1 = {r.doc_id for r in pipeline.hash_sample(spark, SF_MID).collect()}
    s2 = {r.doc_id for r in pipeline.hash_sample(spark, SF_MID).collect()}
    assert s1 == s2  # no RNG state anywhere
    n_total = Catalog(spark, SF_MID).documents.count()
    assert 0.05 <= len(s1) / n_total <= 0.15  # ~10%


def test_stratified_sample_caps_majority_language(spark):
    docs = Catalog(spark, SF_MID).documents
    before = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    after = {
        r.lang: r.cnt
        for r in pipeline.stratified_sample(spark, SF_MID)
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    # capped language was thinned to ~25%; uncapped languages kept whole
    assert after["en"] / before["en"] < 0.5
    for lang, cnt in before.items():
        if lang not in pipeline.STRATA_RATES:
            assert after[lang] == cnt


def test_tfidf_topk_shape_and_monotonicity(spark):
    rows = tfidf_top_terms(spark, SF_TEST).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        assert [r.pos for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        scores = [r.tfidf for r in rs]
        assert scores == sorted(scores, reverse=True)
        # df of a kept term can never exceed the corpus size; tf >= 1
        assert all(r.tf >= 1 for r in rs)
