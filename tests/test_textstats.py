"""Text-analysis invariants at sf0.001 (oracle hash parity is the
driver's job)."""

from __future__ import annotations

from uw_hadoop_aglorithms_spark.operators import textstats
from tests.conftest import SF_TEST


def test_doc_stats_bounds(spark):
    rows = textstats.doc_stats(spark, SF_TEST).collect()
    assert rows
    for r in rows:
        assert r.n_distinct_tokens <= r.n_re_tokens
        assert 1.0 <= r.avg_token_len <= r.n_chars_obs


def test_quality_score_in_unit_interval(spark):
    for r in textstats.quality_score(spark, SF_TEST).collect():
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 < r.unique_ratio <= 1.0
        assert 0.0 <= r.quality <= 1.0 + 1e-12


def test_lang_id_covers_test_split(spark):
    rows = textstats.lang_id(spark, SF_TEST).collect()
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    n_test = docs.filter(f"doc_id % {textstats.TRAIN_MOD} != 0").count()
    assert len(rows) == n_test
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert {r.pred_lang for r in rows} <= langs | {"unknown"}
    assert all((r.pred_lang == r.actual_lang) == r.correct for r in rows)


def test_repetition_score_bounds(spark):
    """Fractions live in [0,1]; the flag is exactly the threshold rule;
    a doc of one repeated token maxes every metric (synthetic check via
    the duplicate-planted corpus: planted dups score identically)."""
    rows = textstats.repetition_score(spark, SF_TEST).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert 0.0 <= r.dup_trigram_frac <= 1.0
        assert 0.0 <= r.top_bigram_frac <= 1.0
        # the most common bigram is itself duplicated whenever any is
        if r.dup_bigram_frac == 0.0:
            assert r.top_bigram_frac <= max(1.0 / max(r.n_tokens - 1, 1), 0.0) + 1e-12
        assert r.is_repetitive == (
            r.dup_bigram_frac > textstats.REP_DUP_MAX
            or r.top_bigram_frac > textstats.REP_TOP_MAX
        )


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing property: two docs sharing a substring of length
    >= FP_K + FP_W - 1 share at least one fingerprint. The planted
    near-dup pairs share long runs, so they must collide."""
    from uw_hadoop_aglorithms_spark.operators import dedup

    fps = {}
    for r in textstats.doc_fingerprint(spark, SF_TEST).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    near_dups = dedup.ngram_jaccard_pairs(spark, SF_TEST).collect()
    assert near_dups
    for r in near_dups:
        assert fps[r.doc_a] & fps[r.doc_b]


def test_approx_percentiles_within_bound(spark):
    """GK sketch at accuracy A guarantees rank error <= n/A; with the
    fixture sizes that pins each approx percentile to an actual value
    within a handful of ranks of the exact one."""
    exact = {r.lang: r for r in textstats.length_percentiles(spark, SF_TEST).collect()}
    approx = {r.lang: r for r in textstats.approx_length_percentiles(spark, SF_TEST).collect()}
    assert exact.keys() == approx.keys()
    for lang, a in approx.items():
        e = exact[lang]
        assert a.n_docs == e.n_docs
        # approx returns an actual value near the target rank; exact
        # interpolates — allow the neighborhood spread
        spread = max(2.0, 0.05 * (e.max_chars - e.min_chars))
        for q in (50, 90, 99):
            assert abs(getattr(a, f"ap{q}") - getattr(e, f"p{q}")) <= spread, (
                lang,
                q,
            )
