"""Count-min sketch: structural guarantees on the sf0.001 fixture.

Cross-engine value parity runs via test_oracle_parity; here we assert
the sketch-theoretic properties that make CMS trustworthy at scale.
"""

from __future__ import annotations

from tests.conftest import SF_TEST
from uw_hadoop_aglorithms_spark.operators import sketches


def test_cms_never_underestimates_and_collides(spark):
    rows = sketches.cms_token_counts(spark, SF_TEST).collect()
    assert rows
    # one-sided error: the estimate can only overcount
    assert all(r.cms_count >= r.exact_count for r in rows)
    # W is sized below the vocabulary so at least one bucket collision
    # must inflate an estimate — the property the sketch is FOR
    assert any(r.cms_count > r.exact_count for r in rows)


def test_cms_estimate_bounded_by_total_mass(spark):
    from pyspark.sql import functions as F

    from uw_hadoop_aglorithms_spark.functions.text import tokens
    from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

    rows = sketches.cms_token_counts(spark, SF_TEST).collect()
    total = (
        Catalog(spark, SF_TEST)
        .documents.select(F.explode(tokens("text")))
        .count()
    )
    # any single-bucket sum is at most the whole stream's mass
    assert all(r.cms_count <= total for r in rows)
