"""Property tests for text analytics (SURVEY.md §5.4).

- PMI symmetry: (a,b) present iff (b,a) present, with equal PMI (the
  reference emits both orderings, PairsPMI.scala:60-68 permutations).
- Bigram relative frequencies sum to 1 per left word (the invariant the
  reference's stripe normalization maintains,
  ComputeBigramRelativeFrequencyStripes.scala:58-61).
- pairs and stripes PMI agree (two implementations, one semantics).
"""

from __future__ import annotations

from uw_hadoop_aglorithms_spark.operators import text
from tests.conftest import SF_TEST


def test_pmi_symmetry(spark):
    rows = text.pmi_pairs(spark, SF_TEST).collect()
    by_pair = {(r.w1, r.w2): r.pmi for r in rows}
    assert by_pair, "PMI output should be non-empty on the fixture"
    for (a, b), pmi in by_pair.items():
        assert (b, a) in by_pair, f"missing symmetric pair {(b, a)}"
        assert abs(by_pair[(b, a)] - pmi) < 1e-9


def test_bigram_relfreq_sums_to_one(spark):
    rows = text.bigram_relative_frequency(spark, SF_TEST).collect()
    sums: dict[str, float] = {}
    for r in rows:
        sums[r.w1] = sums.get(r.w1, 0.0) + r.rel_freq
    assert sums
    for w1, s in sums.items():
        # rel_freq is rounded to 6 decimals per row; tolerance scales with
        # the number of w2 entries (~vocab size)
        assert abs(s - 1.0) < 1e-4, f"P(w2|{w1}) sums to {s}"


def test_pmi_stripes_equals_pairs(spark):
    pairs = {(r.w1, r.w2): (r.pmi, r.pair_docs) for r in text.pmi_pairs(spark, SF_TEST).collect()}
    stripes = {(r.w1, r.w2): (r.pmi, r.pair_docs) for r in text.pmi_stripes(spark, SF_TEST).collect()}
    assert pairs == stripes
