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


def test_lm_score_model_invariants(spark):
    """Unigram-LM scores: every avg_logprob is a valid mean log-prob
    (negative, above the OOV floor), train-split docs have zero OOV by
    construction, and a doc made entirely of frequent tokens outscores
    one made of OOV tokens (replayed against a tiny Python model)."""
    import math

    rows = textstats.lm_score(spark, SF_TEST).collect()
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    assert len(rows) == docs.count()

    # python replica of the model over the same tokenizer
    from uw_hadoop_aglorithms_spark.functions.text import tokens as tok_col
    tok_rows = docs.select("doc_id", tok_col("text").alias("ts")).collect()
    toks = {r.doc_id: r.ts for r in tok_rows}
    from collections import Counter
    c = Counter()
    for doc_id, ts in toks.items():
        if doc_id % textstats.TRAIN_MOD == 0:
            c.update(ts)
    n_train, v = sum(c.values()), len(c)
    # integer log units + output quantizer, bit-identical to the plan's
    # (LM_LOG_Q / intlog contract — no libm anywhere in the replica)
    from uw_hadoop_aglorithms_spark.functions import intlog

    qout = lambda x: math.floor(  # noqa: E731
        x * textstats.LM_OUT_Q + 0.5
    ) / textstats.LM_OUT_Q
    k_max = intlog.ilog2_py(n_train + v + 1)
    floor = -k_max / textstats.LM_LOG_Q
    for r in rows:
        ts = toks[r.doc_id]
        assert floor - 1e-6 <= r.avg_logprob < 0.0
        if r.doc_id % textstats.TRAIN_MOD == 0:
            assert r.n_oov == 0
        exp_oov = sum(1 for t in ts if t not in c)
        assert r.n_oov == exp_oov
        s = sum(intlog.ilog2_py(c.get(t, 0) + 1) for t in ts)
        expected = qout(((s - len(ts) * k_max) / len(ts)) / textstats.LM_LOG_Q)
        # the contract is EXACT equality: every step of the replica is
        # the same exact-integer + IEEE op sequence the plan runs
        assert r.avg_logprob == expected, (r.doc_id, r.avg_logprob, expected)


def test_gopher_rules_match_python_replay(spark):
    """The Gopher/MassiveWeb gate (Rae et al. 2021, App. A) replayed in
    pure Python over the raw parquet: same tokenizer, same rule
    arithmetic, including the pass verdict — and the fixture must
    exercise BOTH branches of the verdict (the calibrated stop-hits
    threshold exists for exactly that)."""
    import re

    import pyarrow.parquet as pq

    got = {r.doc_id: r for r in textstats.gopher_rules(spark, SF_TEST).collect()}
    tbl = pq.read_table(f"{SF_TEST}/documents.parquet", columns=["doc_id", "text"])
    seen_pass = seen_fail = False
    for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        ts = [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]
        n = len(ts)
        assert n > 0, "fixture has no empty docs (division contract)"
        mean_wl = sum(len(t) for t in ts) / n
        sym = (text.count("#") + text.count("...")) / n
        alpha = sum(1 for t in ts if re.search("[a-z]", t)) / n
        stop_hits = len(set(ts) & set(textstats.GOPHER_STOPWORDS))
        r = got[doc_id]
        assert r.gp_n_words == n
        assert r.gp_mean_word_len == mean_wl
        assert r.gp_symbol_ratio == sym
        assert r.gp_alpha_frac == alpha
        assert r.gp_stop_hits == stop_hits
        want_pass = (
            textstats.GOPHER_MIN_WORDS <= n <= textstats.GOPHER_MAX_WORDS
            and textstats.GOPHER_MIN_WORD_LEN
            <= mean_wl
            <= textstats.GOPHER_MAX_WORD_LEN
            and sym <= textstats.GOPHER_MAX_SYMBOL_RATIO
            and alpha >= textstats.GOPHER_MIN_ALPHA_FRAC
            and stop_hits >= textstats.GOPHER_MIN_STOP_HITS
        )
        assert r.gp_pass == want_pass
        seen_pass |= want_pass
        seen_fail |= not want_pass
    assert seen_pass and seen_fail, "gate must discriminate on the fixture"
