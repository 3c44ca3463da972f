"""Dataset-assembly operators: deterministic sampling, train/val/test
splits, stratified rebalancing, and semi-structured metadata extraction
(beyond-reference training-data-pipeline capability).

The reference's only sampling machinery is an UNSEEDED random shuffle
before SGD training (reference Spark/Spam Classifier/
TrainSpamClassifier.scala:34-40) — non-reproducible by construction
(SURVEY.md §2.12.5). This module does the opposite: every membership
decision is a pure function of the row's key via the engine-neutral
universal hash family (functions/hashing.py), so samples and splits are

- reproducible across runs, engines, partitionings, and cluster sizes
  (no RNG state, no partition-index dependence — unlike `df.sample`,
  whose output changes with the split layout);
- map-side only: membership is column arithmetic inside whole-stage
  codegen, no shuffle, no driver round-trip — at 100 TB a 1% sample
  costs one scan, and Parquet column pruning means only the key and the
  projected columns are read;
- exactly oracle-able in DuckDB (same integer arithmetic, same rows).

Hash-based splits are the published standard for ML dataset assembly
precisely because resampling stays stable as the corpus grows: a
document's split assignment never changes when other documents are
added, which row-number or RNG schemes cannot guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.functions.hashing import P, polyhash
from uw_hadoop_aglorithms_spark.functions.text import tokens
from uw_hadoop_aglorithms_spark.plans.layout import spread_for_cpu
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

#: Universal-hash family members (distinct per use so the operators'
#: membership decisions are pairwise independent).
SAMPLE_SEED = 101
SPLIT_SEED = 102
STRATA_SEED = 103

#: Membership buckets: rates/fractions are expressed out of 10_000.
BUCKETS = 10_000

#: hash_sample: keep 10% of documents.
SAMPLE_KEEP = 1_000

#: split_assign: 80 / 10 / 10 train / val / test, out of 100.
TRAIN_PCT, VAL_PCT = 80, 90

#: stratified_sample: per-language keep-rates out of BUCKETS. The corpus
#: is ~50% English (testdata strata); capping `en` while keeping the
#: tail rebalances the language mix — the canonical training-data use.
STRATA_RATES = {"en": 2_500}
STRATA_DEFAULT = 10_000


# Shared engine-neutral bucket helpers (functions/hashing.py) — one
# definition, identical arithmetic in Spark and every oracle.
from uw_hadoop_aglorithms_spark.functions.hashing import (  # noqa: E402
    bucket as _bucket,
    bucket_sql as _bucket_sql,
)


def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli sample of `documents` by doc_id.

    One map-side filter — the 100 TB plan is scan + filter with the
    predicate inside codegen; no shuffle, no RNG, stable under resizing.
    """
    docs = Catalog(spark, sf_dir).documents
    return docs.filter(
        _bucket("doc_id", SAMPLE_SEED, BUCKETS) < F.lit(SAMPLE_KEEP)
    ).select("doc_id", "lang", "source", "n_chars")


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment, summarized per (split, lang).

    A document's split is a pure function of doc_id: adding documents
    never reassigns existing ones (the property that makes hash splits
    the standard over row-number or RNG splits). The summary aggregate
    is one shuffle over |splits|×|langs| groups.
    """
    docs = Catalog(spark, sf_dir).documents
    bucket = _bucket("doc_id", SPLIT_SEED, 100)
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keep-rates: cap the dominant language, keep the tail.

    The rate table is a literal CASE cascade (broadcast-free); membership
    stays map-side column arithmetic. At 100 TB this is how a corpus's
    language mix is rebalanced in a single scan.
    """
    docs = Catalog(spark, sf_dir).documents
    rate = F.lit(STRATA_DEFAULT)
    for lang, r in sorted(STRATA_RATES.items()):
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    return docs.filter(
        _bucket("doc_id", STRATA_SEED, BUCKETS) < rate
    ).select("doc_id", "lang", "source")


#: mixture_sample: target WEIGHT per source (relative proportions of the
#: final mix); sources not listed get weight 1. The fixture's 20 sources
#: are uniform, so unequal weights force unequal keep-rates.
MIX_SEED = 104
MIX_WEIGHTS = {"src0": 5, "src1": 3}
MIX_DEFAULT_WEIGHT = 1


def _mix_weight_col() -> F.Column:
    w = F.lit(MIX_DEFAULT_WEIGHT)
    for src, wt in sorted(MIX_WEIGHTS.items()):
        w = F.when(F.col("source") == src, wt).otherwise(w)
    return w


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture rebalancing: per-source hash keep-rates sized so
    the kept corpus approaches target proportions w_s — the
    domain-reweighting step of training-data assembly (e.g. upweight
    curated sources, downweight crawl).

    K = min_s floor(n_s / w_s) is the binding constraint (the source
    that runs out first at its target share); each source then keeps
    ~w_s·K docs via rate_buckets_s = floor(BUCKETS·w_s·K / n_s) — all
    integer arithmetic, so the oracle reproduces it bit-for-bit.

    Scale: per-source counts are a |sources|-row aggregate; rates come
    back via broadcast; membership is map-side hash arithmetic — the
    corpus is scanned twice (count + filter) and shuffled never. Output
    is the per-source summary (|sources| rows).
    """
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "source")
    counts = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("w", _mix_weight_col())
    )
    # integer division throughout (`div`, not `/`): double rounding must
    # never leak into membership thresholds
    k = counts.agg(F.min(F.expr("n_docs div w")).alias("k"))
    rates = counts.crossJoin(F.broadcast(k)).select(
        "source",
        "n_docs",
        F.least(
            F.lit(BUCKETS).cast("long"),
            F.expr(f"(cast({BUCKETS} as bigint) * w * k) div n_docs"),
        ).alias("rate_buckets"),
    )
    kept = (
        docs.join(F.broadcast(rates.select("source", "rate_buckets")), "source")
        .where(_bucket("doc_id", MIX_SEED, BUCKETS) < F.col("rate_buckets"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "rate_buckets",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("source")
    )


#: pack_sequences: token budget per shard, and the doc-id range width of
#: the distributed prefix-sum (each range's cumsum runs in parallel; the
#: cross-range offsets are a |docs|/PACK_RANGE-row window — the classic
#: two-phase scan that replaces a single-partition global window).
PACK_BUDGET = 1_000
PACK_RANGE = 100

#: corpus_curation: minimum quality score a document must reach (median
#: of the fixture corpus is ~0.78; 0.75 keeps ~70%).
CURATION_MIN_QUALITY = 0.75

#: doc_chunks: chunk width and stride in tokens (overlap = width-stride).
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/context-window
    chunking step of an LLM data pipeline: windows of CHUNK_TOKENS
    tokens every CHUNK_STRIDE, trailing partial chunk kept. Each chunk
    carries a content hash (31-fold over per-token polyhashes) so
    downstream chunk-level dedup is oracle-checkable.

    Plan shape: entirely map-side — tokenize, explode chunk starts,
    slice + fold per row; rows multiply by ~n_tokens/stride BEFORE any
    shuffle (only the final orderBy). Linear in corpus bytes at 100 TB.
    """
    docs = spread_for_cpu(Catalog(spark, sf_dir).documents, "doc_id")
    ts = tokens("text")
    th = F.transform(ts, lambda t: polyhash(t))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(th), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    exploded = docs.select(
        "doc_id", th.alias("th"), F.explode(starts).alias("start")
    )
    cs = F.slice(F.col("th"), F.col("start"), CHUNK_TOKENS)
    return (
        exploded.select(
            "doc_id",
            F.expr(f"(start - 1) div {CHUNK_STRIDE}").alias("chunk_idx"),
            cs.alias("cs"),
        )
        .where(F.size("cs") > 0)
        .select(
            "doc_id",
            "chunk_idx",
            F.size("cs").cast("long").alias("n_tokens"),
            F.aggregate(
                F.col("cs"),
                F.lit(0).cast("long"),
                lambda acc, h: (acc * F.lit(31) + h) % F.lit(P),
            ).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: assign documents (in doc_id order) to
    fixed token-budget shards — the sequence-packing step of an LLM
    training pipeline, as a DISTRIBUTED prefix sum.

    shard_id = exclusive-cumulative-tokens div PACK_BUDGET. A naive
    global ordered window would single-partition the corpus; instead the
    cumsum is two-phase: per-range windows (parallel, partitioned by
    doc_id div PACK_RANGE) plus broadcast cross-range offsets computed
    from the tiny per-range totals. Integer arithmetic end-to-end, so
    the two-phase result is EXACTLY the global cumsum the DuckDB oracle
    computes in one window.
    """
    docs = Catalog(spark, sf_dir).documents
    counts = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    return pack_from_counts(counts)


def pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack_sequences on TRUE learned-tokenizer counts: train the serial
    BPE vocabulary (bpe.bpe_train — the exact trainer the bpe_vocab
    oracle replays), read each distinct word's piece count straight off
    the FINAL SYMBOL STATE (training already segmented every corpus
    word, so no separate encode pass exists to drift from the trainer),
    and pack on per-doc piece totals. Whitespace-proxy packing misses
    that token budgets are consumed by TOKENIZER pieces — at N_MERGES=10
    most words stay near character-level, so the two legs produce
    materially different shard layouts (~5× the token mass).

    Scale: the piece table is vocabulary-sized (Heaps-law sublinear in
    corpus bytes — large, so it is NOT broadcast-hinted; AQE decides),
    the (doc_id, word) aggregation shuffles the same volume word_count
    does, and the prefix sum is the shared two-phase form. Piece counts
    include the end-of-word sentinel unless merged into the final piece
    (standard BPE-with-EOW accounting, identical in the oracle replay).
    """
    from uw_hadoop_aglorithms_spark.operators import bpe

    _, st = bpe.bpe_train(spark, sf_dir)
    pieces = st.groupBy("w").agg(F.count(F.lit(1)).alias("np"))
    docs = Catalog(spark, sf_dir).documents
    wcnt = (
        docs.select("doc_id", F.explode_outer(tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    counts = (
        wcnt.join(pieces, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.coalesce(F.col("np"), F.lit(0)))
            .cast("long")
            .alias("n_tokens")
        )
    )
    return pack_from_counts(counts)


def pack_from_counts(counts: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) → (doc_id, n_tokens, shard_id): the two-phase
    distributed prefix sum shared by the whitespace and learned-BPE
    packing legs (and reusable for any per-doc cost measure)."""
    # materialize the 3-int projection ONCE (localCheckpoint, not
    # cache: released by the ContextCleaner when the Python ref dies —
    # suites.pack_sequences calls this twice per invocation and a
    # .cache() stranded two frames per call, ADVICE r6 #3): it feeds
    # BOTH the per-range totals and the final assignment — without it
    # the corpus is scanned (and tokenized) twice. ~24 bytes/doc.
    toks = counts.select(
        "doc_id", "n_tokens", F.expr(f"doc_id div {PACK_RANGE}").alias("rng")
    ).localCheckpoint(eager=True)
    per_range = toks.groupBy("rng").agg(F.sum("n_tokens").alias("rng_tokens"))
    # exclusive prefix over ranges: |docs|/PACK_RANGE rows — tiny by
    # construction, so the unpartitioned window is a non-issue at scale
    w_rng = Window.orderBy("rng").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_range.select(
        "rng",
        F.coalesce(F.sum("rng_tokens").over(w_rng), F.lit(0)).alias("offset"),
    )
    w_in = Window.partitionBy("rng").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        toks.join(F.broadcast(offsets), "rng")
        .withColumn(
            "cum_excl",
            F.col("offset") + F.sum("n_tokens").over(w_in) - F.col("n_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"cum_excl div {PACK_BUDGET}").alias("shard_id"),
        )
        .orderBy("doc_id")
    )


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation report: the FULL dedup stack composed with the
    quality bar, summarized per (lang, source) — the pipeline a
    training-data run executes before packing:

        exact dedup (keep min-id per normalized text)
        ∧ near-dup canonical selection (keep argmax quality per
          MinHash+LSH cluster — dedup.canonical_per_cluster, round 6)
        ∧ Gopher rule gate (textstats.gopher_rules gp_pass — the
          published Rae et al. 2021 filter, round 6)
        ∧ quality >= CURATION_MIN_QUALITY

    Built by COMPOSING the registered operators (exact_dedup,
    canonical_per_cluster, gopher_rules, quality_score), so the pipeline
    is the same plan fragments the driver already verifies individually.
    The near-dup leg is an anti-join on keep = FALSE ids: unclustered
    docs pass untouched. Composition is conjunctive by design — a
    cluster's canonical doc can still fail the rule gate or the quality
    bar (then the whole group is dropped: its other members were worse
    copies of a bad doc).

    Scale: survivor membership joins on doc_id (32-byte digests did the
    exact-dedup shuffle; the near-dup drop list is pair-graph-sized),
    the rule gate and quality are map-side arithmetic, and the final
    aggregate is |langs × sources| groups with map-side partials.
    """
    kept = curation_survivors(spark, sf_dir)
    # dyadic-quantized quality units -> DECIMAL(38,0) exact sum: the
    # average is summation-order-independent at any corpus size (the
    # relational.py money-contract shape for an arbitrary-double measure)
    qunits = F.floor(F.col("quality") * F.lit(float(1073741824)) + F.lit(0.5)).cast(
        "long"
    )
    return (
        kept.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (
                F.sum(qunits.cast("decimal(38,0)")).cast("double")
                / F.lit(float(1073741824))
                / F.count("*")
            ).alias("avg_quality"),
        )
        .orderBy("lang", "source")
    )


def curation_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source, n_chars, quality) for every document the
    curation pipeline KEEPS — the frame a training run actually feeds
    downstream (tokenize → pack → shard), exposed so users compose on
    the decision set instead of re-deriving it from the aggregate
    report. corpus_curation is exactly a groupBy over this frame."""
    from uw_hadoop_aglorithms_spark.operators.dedup import (
        canonical_per_cluster,
        exact_dedup,
    )
    from uw_hadoop_aglorithms_spark.operators.textstats import (
        gopher_rules,
        quality_score,
    )

    survivors = exact_dedup(spark, sf_dir).select("doc_id")
    rule_pass = (
        gopher_rules(spark, sf_dir).where(F.col("gp_pass")).select("doc_id")
    )
    # ONE quality computation feeds both the canonical selection and the
    # report's threshold/average (localCheckpointed: per-doc rows,
    # executor-side — the doc_profile stitch pattern; without it the
    # tokenize subtree executes once per consumer)
    quality = (
        quality_score(spark, sf_dir)
        .select("doc_id", "quality")
        .localCheckpoint(eager=False)
    )
    neardup_drops = (
        canonical_per_cluster(spark, sf_dir, quality=quality)
        .where(~F.col("keep"))
        .select("doc_id")
    )
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", "lang", "source", "n_chars"
    )
    return (
        docs.join(survivors, "doc_id")
        .join(neardup_drops, "doc_id", "left_anti")
        .join(rule_pass, "doc_id")
        .join(quality, "doc_id")
        .where(F.col("quality") >= CURATION_MIN_QUALITY)
    )


#: PII patterns — written in the common Java-regex ∩ RE2 subset ([.] not
#: backslash-escapes) so Spark and DuckDB match identical spans.
PII_EMAIL = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IP = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"


def _pii_raw() -> F.Column:
    """documents.text + deterministically injected PII spans.

    The fixture corpus is synthetic word-salad with no PII, so (like the
    geo query's synthetic lon/lat) each doc gets spans derived purely
    from doc_id: every third doc an email (every other of those, two
    emails — exercising global replace), phone, or IPv4. Pure column
    concat/printf — reproducible in DuckDB verbatim.
    """
    d = F.col("doc_id")
    email = F.concat(
        F.lit(" contact user"), d.cast("string"),
        F.lit("@mail"), (d % 7).cast("string"), F.lit(".com"),
        F.when(
            (d % 6 == 0),
            F.concat(F.lit(" cc user"), d.cast("string"), F.lit("b@mail0.com")),
        ).otherwise(""),
    )
    phone = F.concat(
        F.lit(" call "),
        F.format_string("555-%03d-%04d", (d * 7) % 1000, (d * 13) % 10000),
    )
    ip = F.concat(
        F.lit(" from 10."), (d % 256).cast("string"),
        F.lit("."), ((d * 3) % 256).cast("string"),
        F.lit("."), ((d * 5) % 256).cast("string"),
    )
    return F.concat(
        F.col("text"),
        F.when(d % 3 == 0, email).when(d % 3 == 1, phone).otherwise(ip),
    )


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact email/phone/IP spans per document.

    The cleaning step every training-data pipeline runs before release.
    Counts come from `regexp_count` on the raw text; redaction is three
    chained `regexp_replace`s to typed markers; `md5(redacted)` proves
    span-exact replacement against the oracle. All JVM-side regex inside
    whole-stage codegen — map-only, no shuffle except the final orderBy;
    linear in corpus bytes at 100 TB.
    """
    docs = spread_for_cpu(Catalog(spark, sf_dir).documents, "doc_id")
    raw = _pii_raw()
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
        ),
        PII_IP,
        "[IP]",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(raw, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(raw, F.lit(PII_IP)).cast("long").alias("n_ips"),
        F.length(red).cast("long").alias("n_chars_red"),
        F.md5(red).alias("redacted_md5"),
    ).orderBy("doc_id")


def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract the JSON `props` payload of `events` and aggregate per type.

    Semi-structured metadata riding alongside typed columns is the norm
    in event/training logs; `get_json_object` keeps extraction JVM-side
    (no Python), and the aggregate is one shuffle over |event_type|
    groups with map-side partials — scan-bound at scale.
    """
    events = Catalog(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            # exact-sum forms (relational.py money contract): avg as
            # exact long total / count, value summed in exact 1e-2 units
            (F.sum("k").cast("double") / F.count("*")).alias("avg_k"),
            (
                F.sum(
                    F.round(F.col("value") * 100)
                    .cast("long")
                    .cast("decimal(38,0)")
                ).cast("double")
                / F.lit(100.0)
            ).alias("sum_value"),
        )
    )


#: DuckDB token-array fragment (canonical tokenizer parity).
from uw_hadoop_aglorithms_spark.functions.hashing import polyhash_sql  # noqa: E402
from uw_hadoop_aglorithms_spark.functions.text import TOKENS_SQL  # noqa: E402

#: DuckDB oracles (same arithmetic; json_extract_string for `props`).
#: Integer sums are CAST to BIGINT: DuckDB's sum() over integers returns
#: HUGEINT, which the driver canonicalizes differently than Spark's long.
#: pack_sequences' oracle is the NAIVE single-window global cumsum — the
#: engine's two-phase distributed form must equal it exactly (integers).
PIPELINE_ORACLES: dict[str, str] = {
    "hash_sample": f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE {_bucket_sql('doc_id', SAMPLE_SEED, BUCKETS)} < {SAMPLE_KEEP}
        ORDER BY doc_id
    """,
    "split_assign": f"""
        WITH s AS (
            SELECT CASE
                     WHEN {_bucket_sql('doc_id', SPLIT_SEED, 100)} < {TRAIN_PCT}
                       THEN 'train'
                     WHEN {_bucket_sql('doc_id', SPLIT_SEED, 100)} < {VAL_PCT}
                       THEN 'val'
                     ELSE 'test'
                   END AS split,
                   lang, n_chars
            FROM documents
        )
        SELECT split, lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM s GROUP BY split, lang ORDER BY split, lang
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang, source FROM documents
        WHERE {_bucket_sql('doc_id', STRATA_SEED, BUCKETS)} < (CASE
            {' '.join(f"WHEN lang = '{lang}' THEN {r}" for lang, r in sorted(STRATA_RATES.items()))}
            ELSE {STRATA_DEFAULT} END)
        ORDER BY doc_id
    """,
    "mixture_sample": f"""
        WITH c AS (
            SELECT source, count(*) AS n_docs,
                   CASE {' '.join(f"WHEN source = '{s}' THEN {w}" for s, w in sorted(MIX_WEIGHTS.items()))}
                        ELSE {MIX_DEFAULT_WEIGHT} END AS w
            FROM documents GROUP BY source
        ),
        kk AS (SELECT min(n_docs // w) AS k FROM c),
        r AS (
            SELECT source, n_docs,
                   least({BUCKETS}::BIGINT, ({BUCKETS}::BIGINT * w * k) // n_docs)
                     AS rate_buckets
            FROM c, kk
        ),
        kept AS (
            SELECT d.source, count(*) AS n_kept
            FROM documents d JOIN r ON d.source = r.source
            WHERE {_bucket_sql('d.doc_id', MIX_SEED, BUCKETS)} < r.rate_buckets
            GROUP BY d.source
        )
        SELECT r.source, r.n_docs, r.rate_buckets,
               coalesce(kept.n_kept, 0) AS n_kept
        FROM r LEFT JOIN kept USING (source) ORDER BY source
    """,
    "pack_sequences": f"""
        WITH t AS (SELECT doc_id, len({TOKENS_SQL}) AS n_tokens FROM documents),
        c AS (
            SELECT doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS cum_excl
            FROM t
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(cum_excl // {PACK_BUDGET} AS BIGINT) AS shard_id
        FROM c ORDER BY doc_id
    """,
    "doc_chunks": f"""
        WITH t AS (SELECT doc_id, {TOKENS_SQL} AS ts FROM documents),
        th AS (
            SELECT doc_id, list_transform(ts, t -> {polyhash_sql('t')}) AS hls
            FROM t
        ),
        st AS (
            SELECT doc_id, hls,
                   unnest(range(1, greatest(len(hls), 1) + 1, {CHUNK_STRIDE}))
                     AS start
            FROM th
        ),
        ch AS (
            SELECT doc_id,
                   CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
                   hls[start:start + {CHUNK_TOKENS - 1}] AS cs
            FROM st
        )
        SELECT doc_id, chunk_idx,
               CAST(len(cs) AS BIGINT) AS n_tokens,
               list_reduce(list_prepend(0::BIGINT, cs),
                           (a, h) -> (a * 31 + h) % {P}) AS chunk_hash
        FROM ch WHERE len(cs) > 0
        ORDER BY doc_id, chunk_idx
    """,
    "pii_redact": f"""
        WITH r AS (
            SELECT doc_id,
                   text || CASE
                     WHEN doc_id % 3 = 0 THEN
                       ' contact user' || doc_id || '@mail' || (doc_id % 7) || '.com'
                       || CASE WHEN doc_id % 6 = 0
                               THEN ' cc user' || doc_id || 'b@mail0.com'
                               ELSE '' END
                     WHEN doc_id % 3 = 1 THEN
                       ' call ' || printf('555-%03d-%04d',
                                          (doc_id * 7) % 1000,
                                          (doc_id * 13) % 10000)
                     ELSE
                       ' from 10.' || (doc_id % 256) || '.'
                       || ((doc_id * 3) % 256) || '.' || ((doc_id * 5) % 256)
                   END AS raw
            FROM documents
        ),
        red AS (
            SELECT doc_id, raw,
                   regexp_replace(regexp_replace(regexp_replace(raw,
                       '{PII_EMAIL}', '[EMAIL]', 'g'),
                       '{PII_PHONE}', '[PHONE]', 'g'),
                       '{PII_IP}', '[IP]', 'g') AS redacted
            FROM r
        )
        SELECT doc_id,
               len(regexp_extract_all(raw, '{PII_EMAIL}')) AS n_emails,
               len(regexp_extract_all(raw, '{PII_PHONE}')) AS n_phones,
               len(regexp_extract_all(raw, '{PII_IP}')) AS n_ips,
               length(redacted) AS n_chars_red,
               md5(redacted) AS redacted_md5
        FROM red ORDER BY doc_id
    """,
    "events_props_stats": """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS DOUBLE) / count(*) AS avg_k,
               CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}


#: Per-epoch shuffle: uhash family members EPOCH_SEED+epoch order the
#: corpus differently every epoch, deterministically — the training-data
#: analogue of dataloader shuffling, with no RNG whose value depends on
#: partition layout (ml.py's seeded-shuffle rationale, corpus-wide).
EPOCH_SEED = 301


def epoch_order(docs: DataFrame, epoch: int, id_col: str = "doc_id") -> DataFrame:
    """Assign the deterministic training order for `epoch`: a dense
    0-based `position` from the universal-hash permutation key of the
    id column. The id is reduced mod P BEFORE uhash — uhash's contract
    (hashing.py) needs input < P to stay inside int64; a raw id beyond
    ~2^33 (inside the 100 TB regime) would overflow id*A_i and wrap
    negative. Post-reduction the key is no longer injective for
    corpora > P docs, but ordering stays a deterministic permutation:
    `id_col` breaks every residue collision.

    Scale shape (round 5): the permutation key is map-side arithmetic;
    the dense rank is a DISTRIBUTED two-phase rank — range-partition on
    (key, id), rank locally inside each range (a partition-scoped
    window, never the single-partition global WindowExec), and add the
    collected per-partition row counts as offsets (one |partitions|-row
    collect — bounded driver state, the pack_sequences prefix-sum
    pattern). The resulting position is a pure function of the total
    order (key, id), independent of where the sampled range boundaries
    land. Downstream shard writers still skip the rank entirely
    (write_epoch_shards range-clusters by the key alone).
    """
    from pyspark.sql import Window

    from uw_hadoop_aglorithms_spark.functions.hashing import P as _P, uhash

    key = uhash(F.col(id_col) % F.lit(_P), EPOCH_SEED + epoch)
    keyed = (
        docs.withColumn("sort_key", key)
        .withColumn("epoch", F.lit(epoch))
        .repartitionByRange("sort_key", id_col)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin pid across the two phases
    )
    counts = sorted(
        keyed.groupBy("pid").count().collect(), key=lambda r: r.pid
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r.pid] = acc
        acc += r["count"]
    if not offsets:
        return keyed.drop("pid").withColumn("position", F.lit(0).cast("long"))
    omap = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("pid").orderBy("sort_key", id_col)
    return (
        keyed.withColumn(
            "position",
            # long, not int: position exceeds 2^31 inside the 100 TB
            # regime this rewrite exists for
            (omap[F.col("pid")] + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("pid")
    )


def write_epoch_shards(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    epoch: int,
    n_shards: int = 8,
) -> None:
    """End of the pipeline: write one training epoch as `n_shards`
    parquet shard files, each holding a contiguous range of the epoch's
    deterministic shuffle order (epoch_order) with documents sorted by
    their order key inside the file — what a data loader streams
    sequentially per worker.

    Scale shape: the epoch permutation key is map-side arithmetic; the
    ONLY shuffle is the range repartition that forms the shards (the
    zorder.py write pattern — no global sort barrier, no dense-rank
    window). Re-running the same epoch is byte-deterministic; a
    different epoch reshuffles. Shard membership is carried by file
    boundaries, so the loader needs no index — file k IS order-range k.
    """
    from uw_hadoop_aglorithms_spark.functions.hashing import P as _P, uhash

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    # mod-P reduction first: uhash input must stay < P (epoch_order note)
    key = uhash(F.col("doc_id") % F.lit(_P), EPOCH_SEED + epoch)
    (
        docs.withColumn("sort_key", key)
        .repartitionByRange(n_shards, "sort_key", "doc_id")
        .sortWithinPartitions("sort_key", "doc_id")
        .drop("sort_key")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
