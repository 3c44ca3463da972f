"""Text analytics over `documents` (SURVEY.md §2 Phase 2).

Re-expresses the reference's MapReduce/RDD text programs — word count,
bigram relative frequency, PMI pairs/stripes, perfect-follower — as
declarative DataFrame plans. The reference's hand-built machinery
(in-mapper combining, special `(w,*)` marginal rows, custom partitioners +
secondary sort, reducer-side side-files) all collapses into groupBy
aggregation and window functions (SURVEY.md §4 table).

Scale notes (100 TB design):
- Tokenization is pure Catalyst expression work — no Python, no shuffle.
- Word/bigram counts shuffle only the distinct-key space (vocab², not
  corpus size) thanks to automatic partial aggregation.
- PMI broadcasts the unigram doc-frequency table (|vocab| rows) instead of
  the reference's reducer-setup side-file reads (reference MapReduce/PMI/
  PairsPMI.java:163-184).
- The doc-count N is computed inside the plan (cross-join of one scalar
  row, broadcast by Catalyst) — no `.collect()` round-trip to the driver,
  unlike the reference's job-counter side channel (PairsPMI.java:279).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.functions import intlog
from uw_hadoop_aglorithms_spark.functions.text import bigrams, tokens
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

#: Perfect-follower pivot (reference MapReduce/Counting/PerfectX.java:61-71
#: emits words directly following "perfect"); our synthetic vocab pivots on
#: "spark" instead — parameterized, same operator.
FOLLOWER_PIVOT = "spark"

#: PMI co-occurrence window: first 40 tokens per document, deduplicated
#: (reference MapReduce/PMI/PairsPMI.java:72-85, MAX_WORDS=40).
PMI_MAX_WORDS = 40

#: Minimum co-occurrence count for a pair to be emitted (threshold path of
#: reference PairsPMI.java:194).
PMI_THRESHOLD = 10


def _tokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return cat.documents.select("doc_id", tokens("text").alias("toks"))


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word count (reference WordCount.java:53-66: map→combine→reduce).

    explode → groupBy: partial HashAggregate before the shuffle replaces
    both the combiner and the hand-rolled in-mapper-combining variant
    (reference WordCount.java:68-99).
    """
    return (
        _tokenized(spark, sf_dir)
        .select(F.explode("toks").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy("word")
    )


def word_count_having(spark: SparkSession, sf_dir: str, min_count: int = 100) -> DataFrame:
    """Word count with a HAVING filter (reference PerfectX.java:122-125
    emits only sums > 1). Same plan as word_count + post-agg filter."""
    return (
        word_count(spark, sf_dir)
        .where(F.col("cnt") > min_count)
        .orderBy("word")
    )


def perfect_follower(
    spark: SparkSession, sf_dir: str, pivot: str = FOLLOWER_PIVOT
) -> DataFrame:
    """Count words that directly follow `pivot` within a document, keeping
    followers seen more than once (reference PerfectX.java:61-71 mapper +
    :122-125 HAVING; quirk 2.12.2: only the non-IMC mapper is correct, and
    that's the semantics implemented here).

    The stateful within-line scan becomes a bigram generation + filter —
    no order-sensitive reducer logic.
    """
    return (
        _tokenized(spark, sf_dir)
        .select(F.explode(bigrams(F.col("toks"))).alias("bg"))
        .where(F.col("bg.w1") == pivot)
        .groupBy(F.col("bg.w2").alias("follower"))
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
        .orderBy("follower")
    )


def bigram_relative_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(w2 | w1) over adjacent token pairs.

    The reference needs special `(w,*)` marginal rows, a custom partitioner
    and sort order so the reducer sees the marginal first (reference
    ComputeBigramRelativeFrequency.java:60-117; Scala variant
    ComputeBigramRelativeFrequencyPairs.scala:70-82). A window sum over the
    pair counts replaces all of it: one shuffle on (w1, w2), one on w1 —
    both over vocab-sized data after partial aggregation.
    """
    counts = (
        _tokenized(spark, sf_dir)
        .select(F.explode(bigrams(F.col("toks"))).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )
    total_w1 = Window.partitionBy("w1")
    return counts.select(
        "w1",
        "w2",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(total_w1), 6).alias("rel_freq"),
    ).orderBy("w1", "w2")


def _pmi_neighborhoods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc co-occurrence neighborhood: distinct first-40 tokens
    (reference PairsPMI.java:72-85; PairsPMI.scala:24,48)."""
    return _tokenized(spark, sf_dir).select(
        "doc_id",
        F.array_distinct(F.slice("toks", 1, PMI_MAX_WORDS)).alias("ts"),
    )


def pmi_pairs(
    spark: SparkSession, sf_dir: str, threshold: int = PMI_THRESHOLD
) -> DataFrame:
    """Pointwise mutual information over co-occurring word pairs.

    pmi(a,b) = log2( N · c(a,b) / (c(a) · c(b)) ) in BITS — computed as
    (ilog2(N·c(a,b)) − ilog2(c(a)·c(b))) / 2^30, the engine-neutral
    integer log (functions/intlog.py, round 8): both arguments are
    integer count products, so no query-time log10()/ln() runs on
    either engine and no libm version can flip a value. The reference
    emits log10 (PairsPMI.java:85); bits is a monotone constant
    rescale — same co-occurrence ranking, information-theoretic units.
    Counts are *document* frequencies (per-doc distinct, reference
    PairsPMI.java:77-85) and pairs are ordered (both (a,b) and (b,a)
    emitted, reference PairsPMI.scala:60-68 permutations).

    Plan shape: neighborhoods → double explode (ordered pairs) → count;
    unigram doc-freqs broadcast-joined twice; N injected via a broadcast
    single-row cross join (no driver collect; contrast the reference's
    counter side channel + reducer side-files, PairsPMI.java:163-197,279).
    """
    hoods = _pmi_neighborhoods(spark, sf_dir)
    uni = (
        hoods.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("docs"))
    )
    n_docs = hoods.agg(F.count("*").alias("n_docs"))
    pairs = (
        hoods.select("doc_id", F.explode("ts").alias("w1"), F.col("ts"))
        .select("doc_id", "w1", F.explode("ts").alias("w2"))
        .where(F.col("w1") != F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_docs"))
        .where(F.col("pair_docs") >= threshold)
    )
    joined = (
        pairs.join(F.broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("docs", "docs1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("docs", "docs2")), "w2")
        .crossJoin(F.broadcast(n_docs))
    )
    # the two ilog2 chains run per PAIR row (post-threshold, bounded by
    # vocab², not corpus size) — pure int64 codegen, no extra shuffle
    joined = intlog.with_ilog2(joined, "n_docs * pair_docs", "k_num")
    joined = intlog.with_ilog2(joined, "docs1 * docs2", "k_den")
    return (
        joined.select(
            "w1",
            "w2",
            (
                (F.col("k_num") - F.col("k_den")).cast("double")
                / F.lit(float(intlog.ILOG2_Q))
            ).alias("pmi"),
            F.col("pair_docs"),
        )
        .orderBy("w1", "w2")
    )


def pmi_stripes(
    spark: SparkSession, sf_dir: str, threshold: int = PMI_THRESHOLD
) -> DataFrame:
    """Stripe-shaped PMI (reference StripesPMI.java:90-126: map-valued rows
    merged element-wise), flattened back to rows for comparison.

    The stripe representation is built with map_from_entries — demonstrating
    the §2.4 A6 shape — then exploded, so the result equals pmi_pairs and
    shares its oracle. Implements the *intended* semantics: the reference's
    stripes variant has two acknowledged bugs we deliberately do not
    replicate (SURVEY.md §2.12.1/.3: full-token-list iteration and
    Unit-valued empty stripes).
    """
    flat = pmi_pairs(spark, sf_dir, threshold)
    stripes = (
        flat.groupBy("w1")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("w2", F.struct("pmi", "pair_docs")))
                )
            ).alias("stripe")
        )
    )
    return (
        stripes.select("w1", F.explode("stripe").alias("w2", "entry"))
        .select("w1", "w2", F.col("entry.pmi").alias("pmi"), F.col("entry.pair_docs").alias("pair_docs"))
        .orderBy("w1", "w2")
    )
