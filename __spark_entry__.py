"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``uw_hadoop_aglorithms_spark/``; this module is
pure registry wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from uw_hadoop_aglorithms_spark.operators import (
    cluster,
    dedup,
    graph,
    graphstats,
    index,
    ml,
    multimodal,
    pipeline,
    relational,
    similarity,
    sketches,
    temporal,
    text,
    textstats,
)
from uw_hadoop_aglorithms_spark.oracles import all_oracles
from uw_hadoop_aglorithms_spark.streaming import windows as stream_windows

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the Q6 pricing-summary report."""
    return relational.q6(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        # Relational suite (SURVEY §2.2-§2.6, reference Spark/SparkSQL/Q1-Q7)
        "q1": relational.q1,
        "q2": relational.q2,
        "q3": relational.q3,
        "q4": relational.q4,
        "q5": relational.q5,
        "q6": relational.q6,
        "q7": relational.q7,
        "semi_join": relational.semi_join_orders_with_shipments,
        "anti_join": relational.anti_join_orders_without_shipments,
        "rollup_revenue": relational.rollup_revenue,
        "set_ops": relational.set_ops_customers,
        "distinct_users": relational.distinct_users,
        # rows-only: HLL sketches have no cross-engine oracle; the error
        # bound is asserted in tests/test_plans.py
        "approx_distinct_users": relational.approx_distinct_users,
        "cube_revenue": relational.cube_revenue,
        "customer_order_stats": relational.customer_order_stats,
        # Text analytics (SURVEY §2.2/§2.4, reference MapReduce+Spark text jobs)
        "word_count": text.word_count,
        "word_count_having": text.word_count_having,
        "perfect_follower": text.perfect_follower,
        "bigram_relfreq": text.bigram_relative_frequency,
        "pmi_pairs": text.pmi_pairs,
        "pmi_stripes": text.pmi_stripes,
        # Inverted index + boolean retrieval (SURVEY §2.7/§2.6)
        "inverted_index": index.inverted_index,
        "boolean_retrieval": index.boolean_retrieval,
        "bm25_rank": index.bm25_rank,
        # Personalized PageRank (SURVEY §2.8; iterative → no SQL oracle,
        # validated against a sequential Python oracle in tests/test_graph.py)
        "ppr_top20": graph.ppr_top20,
        "pagerank_top20": graph.pagerank_top20,
        # Graph statistics over the synthetic-deterministic interaction
        # graph (degree-ordered triangle counting; naive-join oracle)
        "degree_distribution": graphstats.degree_distribution,
        "triangle_count": graphstats.triangle_count,
        # Spam classifier (SURVEY §2.9; order-sensitive serial SGD fold →
        # no SQL oracle, validated against a Python oracle in tests/test_ml.py)
        "spam_train": ml.spam_train,
        "spam_apply": ml.spam_apply,
        "spam_ensemble": ml.spam_ensemble,
        # Streaming analytics, batch event-time form (SURVEY §2.10 T1-T3;
        # true Structured Streaming runners live in streaming/runner.py and
        # streaming/trending.py, equivalence-tested in tests/test_streaming.py)
        "event_count": stream_windows.event_count,
        "sliding_event_count": stream_windows.sliding_event_count,
        "region_event_count": stream_windows.region_event_count,
        "geo_region_count": stream_windows.geo_region_count,
        "trending_arrivals": stream_windows.trending_arrivals,
        # Training-data pipeline: dedup family (beyond-reference; full
        # DuckDB oracles via the engine-neutral polyhash)
        "exact_dedup": dedup.exact_dedup,
        "ngram_jaccard": dedup.ngram_jaccard_pairs,
        "minhash_lsh_dedup": dedup.minhash_lsh_dedup,
        # connected components over the near-dup pair graph
        "dedup_clusters": dedup.dedup_clusters,
        "simhash_dedup": dedup.simhash_dedup,
        "embedding_cosine_dups": dedup.embedding_cosine_dups,
        # test-set decontamination: token-8-gram overlap vs held-out docs
        "decontaminate": dedup.decontaminate,
        # Training-data pipeline: similarity search (exact baseline +
        # LSH-bucketed ANN, both fully oracle-checked)
        "ann_brute_topk": similarity.ann_brute_topk,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        # int8 affine quantization + reconstruction-error stats
        "embed_quantize": similarity.embed_quantize,
        # Lloyd's k-means with per-iteration centroid rounding — an
        # ITERATIVE algorithm that is still fully value-hash oracle-
        # checked (the generated CTE oracle replays every iteration)
        "kmeans_clusters": cluster.kmeans_clusters,
        # Training-data pipeline: text analysis (token counting, quality
        # scoring, lang-ID, winnowing fingerprints)
        "doc_stats": textstats.doc_stats,
        "quality_score": textstats.quality_score,
        "lang_id": textstats.lang_id,
        "doc_fingerprint": textstats.doc_fingerprint,
        "repetition_score": textstats.repetition_score,
        "length_percentiles": textstats.length_percentiles,
        # rows-only: GK sketches have no cross-engine oracle; error bound
        # vs the exact form is asserted in tests/test_textstats.py
        "approx_length_percentiles": textstats.approx_length_percentiles,
        # count-min sketch heavy hitters (fixed D×W state, engine-neutral
        # hashes → the sketch itself is value-hash oracle-checked)
        "cms_token_counts": sketches.cms_token_counts,
        "tfidf_top_terms": textstats.tfidf_top_terms,
        # Training-data pipeline: deterministic dataset assembly (hash
        # sampling / splits / stratified rebalancing) + JSON metadata
        # extraction over events
        "hash_sample": pipeline.hash_sample,
        "split_assign": pipeline.split_assign,
        "stratified_sample": pipeline.stratified_sample,
        # weighted domain-mixture rebalancing (integer-exact keep rates)
        "mixture_sample": pipeline.mixture_sample,
        "events_props_stats": pipeline.events_props_stats,
        # distributed prefix-sum context packing + dedup/quality curation
        # + overlapping token-window chunking
        # PII scrubbing (deterministically injected synthetic spans)
        "pii_redact": pipeline.pii_redact,
        "pack_sequences": pipeline.pack_sequences,
        "corpus_curation": pipeline.corpus_curation,
        "doc_chunks": pipeline.doc_chunks,
        # Training-data pipeline: multimodal binary-column plumbing
        # (Arrow-batched mapInPandas feature extraction + frame sampling;
        # decode itself is stubbed — no media libs in this container)
        "media_features": multimodal.media_features,
        "frame_sample": multimodal.frame_sample,
        # Temporal: sessionization + as-of join (beyond-reference;
        # oracle uses DuckDB's native ASOF JOIN)
        "user_sessions": temporal.user_sessions,
        "asof_last_order": temporal.asof_last_order,
        "range_join_nearby_events": temporal.range_join_nearby_events,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per queries() key (where expressible)."""
    return all_oracles()
