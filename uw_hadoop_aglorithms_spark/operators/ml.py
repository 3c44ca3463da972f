"""SGD spam classifier: train / apply / ensemble (SURVEY.md §2.9, M1-M4).

Reference semantics (reference Spark/Spam Classifier/
TrainSpamClassifier.scala): online logistic SGD over sparse integer
features, single sequential fold — groupByKey to ONE group (:46-47),
score = Σ w[f], p = 1/(1+e^-score), w[f] += (y − p)·δ with δ = 0.002 (:19,
:56-66). Scoring broadcasts the weights and predicts spam iff score > 0
(ApplySpamClassifier.scala:43-49); the ensemble averages scores or takes a
majority vote across 3 models (ApplyEnsembleSpamClassifier.scala:47-73).

Deviations (documented, SURVEY.md §2.12.5): the reference's `--shuffle`
uses an UNSEEDED Random (TrainSpamClassifier.scala:35-37) — training order,
and therefore the model, was irreproducible. Here the shuffle key is a
content-derived hash (crc32 of doc_id), so the fold order is deterministic
on any cluster layout — unlike F.rand(seed), whose values depend on
partition assignment.

Instance derivation (FIXTURES.md): label = embeddings.label % 2 joined on
doc_id; features = stable crc32 hashes of the doc's distinct tokens into a
bounded space (the reference hashed byte 4-grams); train/test split by
doc_id % 5.

Scale notes: the trainer is *inherently* serial (order-sensitive fold —
SURVEY.md §4.2): one partition, one Python pass, by design; it is the one
deliberately non-parallel stage in the engine. Feature extraction, scoring
and ensembling are fully distributed (explode → broadcast-join weights →
groupBy sum), so the expensive sides (corpus size, many models) scale out.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.functions.text import tokens
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

DELTA = 0.002  # learning rate, reference TrainSpamClassifier.scala:19
FEATURE_SPACE = 10007  # bounded hash space (prime), overlapping sparse features


def instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: (doc_id, label, features array<int>) per FIXTURES.md."""
    cat = Catalog(spark, sf_dir)
    feats = F.array_sort(
        F.array_distinct(
            F.transform(
                tokens("text"),
                lambda w: (F.crc32(F.encode(w, "utf-8")) % FEATURE_SPACE).cast("int"),
            )
        )
    )
    labels = cat.embeddings.select(
        F.col("vec_id").alias("doc_id"), (F.col("label") % 2).cast("int").alias("label")
    )
    return (
        cat.documents.select("doc_id", feats.alias("features"))
        .join(labels, "doc_id")
        .select("doc_id", "label", "features")
    )


def _train_split(inst: DataFrame) -> DataFrame:
    return inst.where(F.col("doc_id") % 5 != 0)


def _test_split(inst: DataFrame) -> DataFrame:
    return inst.where(F.col("doc_id") % 5 == 0)


def _sgd_fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Sequential logistic-SGD fold over one partition (M2).

    Runs on the executor inside mapInPandas; Arrow streams the (ordered)
    partition through in batches while the weight dict persists across
    them — the Spark-native form of the reference's foldLeft over a single
    groupByKey group (TrainSpamClassifier.scala:46-70).
    """
    w: dict[int, float] = {}
    for pdf in batches:
        for feats, label in zip(pdf["features"], pdf["label"]):
            score = sum(w.get(int(f), 0.0) for f in feats)
            # clamp: exp overflow guard; reference relies on small scores
            p = 1.0 / (1.0 + math.exp(-max(min(score, 709.0), -709.0)))
            g = (float(label) - p) * DELTA
            for f in feats:
                w[int(f)] = w.get(int(f), 0.0) + g
    yield pd.DataFrame(
        {"feature": list(w.keys()), "weight": list(w.values())}
    ).astype({"feature": "int32", "weight": "float64"})


def _train_on(inst: DataFrame) -> DataFrame:
    """Deterministic-order serial fold: content-hash shuffle → single
    partition → ordered pass (O5 seeded-shuffle + M2)."""
    ordered = (
        inst.withColumn("shuffle_key", F.crc32(F.col("doc_id").cast("string")))
        .repartition(1)
        .sortWithinPartitions("shuffle_key", "doc_id")
        .select("features", "label")
    )
    return ordered.mapInPandas(_sgd_fold, "feature int, weight double")


def spam_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: train on the %5!=0 split; returns the (feature, weight) model."""
    model = _train_on(_train_split(instances(spark, sf_dir)))
    return model.select("feature", F.round("weight", 9).alias("weight")).orderBy("feature")


def _score(inst: DataFrame, model: DataFrame) -> DataFrame:
    """M3 core: score = Σ w[f] via explode → broadcast weight join → sum.

    The reference broadcast a driver-side HashMap (ApplySpamClassifier
    .scala:32-41); here the model is a DataFrame and Catalyst's
    BroadcastExchange ships it — same physics, no driver materialization.
    """
    exploded = inst.select("doc_id", "label", F.explode("features").alias("feature"))
    return (
        exploded.join(F.broadcast(model), "feature", "left")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("score"))
    )


def spam_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: score the held-out split; spam iff score > 0
    (reference ApplySpamClassifier.scala:43-49)."""
    inst = instances(spark, sf_dir)
    model = _train_on(_train_split(inst))
    return (
        _score(_test_split(inst), model)
        .select(
            "doc_id",
            "label",
            F.round("score", 9).alias("score"),
            F.when(F.col("score") > 0, "spam").otherwise("ham").alias("prediction"),
        )
        .orderBy("doc_id")
    )


def spam_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: 3 models on doc_id%3 shards; average + majority vote
    (reference ApplyEnsembleSpamClassifier.scala:47-73, vote = 2·pos − 3)."""
    inst = instances(spark, sf_dir)
    train = _train_split(inst)
    test = _test_split(inst)
    scored = None
    for shard in range(3):
        model = _train_on(train.where(F.col("doc_id") % 3 == shard))
        s = _score(test, model).select(
            "doc_id", "label", F.col("score").alias(f"score_{shard}")
        )
        scored = s if scored is None else scored.join(
            s.drop("label"), "doc_id"
        )
    votes = sum(
        F.when(F.col(f"score_{i}") > 0, 1).otherwise(0) for i in range(3)
    )
    avg = (F.col("score_0") + F.col("score_1") + F.col("score_2")) / 3
    return (
        scored.select(
            "doc_id",
            "label",
            F.round(avg, 9).alias("score_avg"),
            (2 * votes - 3).alias("vote"),
            F.when(avg > 0, "spam").otherwise("ham").alias("prediction_avg"),
            F.when(2 * votes - 3 > 0, "spam").otherwise("ham").alias("prediction_vote"),
        )
        .orderBy("doc_id")
    )
