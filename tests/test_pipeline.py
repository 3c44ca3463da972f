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


def test_pack_sequences_is_a_valid_packing(spark):
    """Shard ids must be monotone in doc order, start at 0, skip nothing,
    and each shard's exclusive token start must sit in [shard*B, (shard+1)*B)."""
    rows = pipeline.pack_sequences(spark, SF_TEST).collect()
    assert rows
    cum = 0
    seen = set()
    prev = 0
    for r in rows:
        shard = cum // pipeline.PACK_BUDGET
        assert r.shard_id == shard, f"doc {r.doc_id}: {r.shard_id} != {shard}"
        assert r.shard_id >= prev
        prev = r.shard_id
        seen.add(r.shard_id)
        cum += r.n_tokens
    assert seen == set(range(max(seen) + 1)), "shard ids must be contiguous"
    assert len(seen) > 1, "fixture should span multiple shards"


def test_corpus_curation_composes_dedup_and_quality(spark):
    """Curation counts must equal the conjunction of the component
    operators' decisions: exact-dedup survivors, minus near-dup
    non-canonical members (round 6), intersected with the Gopher
    rule-gate passers (round 6) and the above-threshold quality set."""
    from uw_hadoop_aglorithms_spark.operators.dedup import (
        canonical_per_cluster,
        exact_dedup,
    )
    from uw_hadoop_aglorithms_spark.operators.textstats import (
        gopher_rules,
        quality_score,
    )

    survivors = {r.doc_id for r in exact_dedup(spark, SF_TEST).collect()}
    nd_drops = {
        r.doc_id
        for r in canonical_per_cluster(spark, SF_TEST).collect()
        if not r.keep
    }
    gated = {
        r.doc_id for r in gopher_rules(spark, SF_TEST).collect() if r.gp_pass
    }
    good = {
        r.doc_id
        for r in quality_score(spark, SF_TEST).collect()
        if r.quality >= pipeline.CURATION_MIN_QUALITY
    }
    expect = len((survivors - nd_drops) & gated & good)
    got = sum(r.n_docs for r in pipeline.corpus_curation(spark, SF_TEST).collect())
    assert got == expect
    assert 0 < got
    assert nd_drops, "fixture should exercise the near-dup drop leg"
    n_docs = spark.read.parquet(f"{SF_TEST}/documents.parquet").count()
    assert 0 < len(gated) < n_docs, (
        "fixture should exercise both rule-gate branches"
    )


def test_doc_chunks_cover_every_token(spark):
    """Chunks are stride-spaced windows: chunk i holds
    min(CHUNK_TOKENS, n - i*CHUNK_STRIDE) tokens, where n (the doc's
    token count) is implied by the last chunk; indexes are contiguous
    and the last chunk reaches token n exactly."""
    chunks = pipeline.doc_chunks(spark, SF_TEST).collect()
    ndocs = spark.read.parquet(f"{SF_TEST}/documents.parquet").count()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == ndocs
    W, S = pipeline.CHUNK_TOKENS, pipeline.CHUNK_STRIDE
    for doc_id, lst in by_doc.items():
        lst.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in lst] == list(range(len(lst)))
        n = lst[-1].chunk_idx * S + lst[-1].n_tokens  # last chunk ends at n
        for r in lst:
            assert r.n_tokens == min(W, n - r.chunk_idx * S), (
                f"doc {doc_id} chunk {r.chunk_idx}: {r.n_tokens} tokens, n={n}"
            )
        # one more stride-start would fall past the end
        assert len(lst) * S + 1 > n


def test_pii_redact_counts_and_markers(spark):
    """Every doc gets exactly the spans its doc_id class injects; the
    redacted text carries matching typed markers and no residual span."""
    rows = pipeline.pii_redact(spark, SF_TEST).collect()
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet").count()
    assert len(rows) == docs
    for r in rows:
        m = r.doc_id % 3
        if m == 0:
            assert r.n_emails == (2 if r.doc_id % 6 == 0 else 1)
            assert r.n_phones == 0 and r.n_ips == 0
        elif m == 1:
            assert (r.n_emails, r.n_phones, r.n_ips) == (0, 1, 0)
        else:
            assert (r.n_emails, r.n_phones, r.n_ips) == (0, 0, 1)
        assert len(r.redacted_md5) == 32


def test_mixture_sample_respects_weights(spark):
    """Keep-counts track w_s·K within hash-sampling noise; the binding
    source keeps (nearly) everything it is entitled to."""
    rows = pipeline.mixture_sample(spark, SF_TEST).collect()
    by_src = {r.source: r for r in rows}
    assert all(0 <= r.n_kept <= r.n_docs for r in rows)
    assert all(0 <= r.rate_buckets <= pipeline.BUCKETS for r in rows)
    k = min(
        r.n_docs // pipeline.MIX_WEIGHTS.get(r.source, pipeline.MIX_DEFAULT_WEIGHT)
        for r in rows
    )
    for r in rows:
        w = pipeline.MIX_WEIGHTS.get(r.source, pipeline.MIX_DEFAULT_WEIGHT)
        expect = pipeline.BUCKETS * w * k // r.n_docs
        assert r.rate_buckets == min(pipeline.BUCKETS, expect)
    # the heaviest source must keep more than an unweighted one
    assert by_src["src0"].rate_buckets > by_src["src2"].rate_buckets


def test_epoch_order_is_deterministic_distinct_permutations(spark):
    """Each epoch is a permutation of the corpus; different epochs give
    different orders; the same epoch reproduces bit-identically under a
    different partition layout (no layout-dependent RNG)."""
    from uw_hadoop_aglorithms_spark.operators.pipeline import epoch_order
    from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

    docs = Catalog(spark, SF_TEST).documents.select("doc_id")
    n = docs.count()

    def order(epoch, parts):
        d = docs.repartition(parts)
        return [
            r.doc_id
            for r in epoch_order(d, epoch).orderBy("position").collect()
        ]

    e0, e1 = order(0, 4), order(1, 4)
    assert sorted(e0) == sorted(e1)
    assert len(e0) == n
    assert e0 != e1, "epochs must reorder"
    assert order(0, 2) == e0, "order must not depend on partitioning"


def test_write_epoch_shards_partitions_the_epoch_order(spark, tmp_path):
    """Shard files carry the epoch permutation: every doc appears
    exactly once, each file is internally ordered by the epoch key, and
    file key-ranges are disjoint (file k IS order-range k — the loader
    contract). Re-writing the same epoch is deterministic; the next
    epoch orders differently."""
    import os

    from uw_hadoop_aglorithms_spark.functions.hashing import uhash
    from uw_hadoop_aglorithms_spark.operators.pipeline import (
        EPOCH_SEED,
        write_epoch_shards,
    )
    from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

    out = str(tmp_path / "ep0")
    write_epoch_shards(spark, SF_TEST, out, epoch=0, n_shards=4)

    docs = Catalog(spark, SF_TEST).documents
    n = docs.count()
    rd = spark.read.parquet(out)
    assert rd.count() == n
    assert {r.doc_id for r in rd.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }

    key_of = {
        r.doc_id: r.k
        for r in docs.select(
            "doc_id", uhash(F.col("doc_id"), EPOCH_SEED).alias("k")
        ).collect()
    }
    files = sorted(
        f for f in os.listdir(out)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    assert len(files) == 4
    ranges = []
    for f in files:
        ids = [r.doc_id for r in spark.read.parquet(f"{out}/{f}").collect()]
        ks = [key_of[i] for i in ids]
        assert ks == sorted(ks), f"{f} not internally ordered"
        if ks:
            ranges.append((min(ks), max(ks)))
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, "shard key-ranges must be disjoint"

    # determinism + epoch distinctness
    out_again = str(tmp_path / "ep0b")
    write_epoch_shards(spark, SF_TEST, out_again, epoch=0, n_shards=4)
    a = [r.doc_id for r in spark.read.parquet(out).collect()]
    b = [r.doc_id for r in spark.read.parquet(out_again).collect()]
    assert sorted(a) == sorted(b)
    out1 = str(tmp_path / "ep1")
    write_epoch_shards(spark, SF_TEST, out1, epoch=1, n_shards=4)
    first_file_e0 = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and not f.endswith(".crc")
    )[0]
    first_file_e1 = sorted(
        f for f in os.listdir(out1) if f.startswith("part-") and not f.endswith(".crc")
    )[0]
    ids0 = {r.doc_id for r in spark.read.parquet(f"{out}/{first_file_e0}").collect()}
    ids1 = {r.doc_id for r in spark.read.parquet(f"{out1}/{first_file_e1}").collect()}
    assert ids0 != ids1, "different epochs must shard differently"


def test_pack_sequences_bpe_counts_true_pieces(spark):
    """The 'bpe' packing leg must (a) be a valid packing under the same
    prefix-sum law, (b) count AT LEAST one piece per word occurrence
    (every word segments to >= 1 symbol, so BPE mass dominates the
    whitespace proxy), and (c) agree word-for-word with piece counts
    recomputed directly from the trainer's final symbol state."""
    from uw_hadoop_aglorithms_spark.operators import bpe
    from uw_hadoop_aglorithms_spark.functions.text import tokens
    from pyspark.sql import functions as F

    rows = sorted(
        pipeline.pack_sequences_bpe(spark, SF_TEST).collect(),
        key=lambda r: r.doc_id,
    )
    assert rows
    cum = 0
    for r in rows:
        assert r.shard_id == cum // pipeline.PACK_BUDGET
        cum += r.n_tokens
    ws = {r.doc_id: r.n_tokens for r in pipeline.pack_sequences(spark, SF_TEST).collect()}
    assert all(r.n_tokens >= ws[r.doc_id] for r in rows)
    assert sum(r.n_tokens for r in rows) > sum(ws.values()), (
        "10 merges cannot compress the corpus to the whitespace count"
    )
    # word-level recount straight off the final trainer state
    _, st = bpe.bpe_train(spark, SF_TEST)
    pieces = {r.w: r.np for r in st.groupBy("w").agg(F.count(F.lit(1)).alias("np")).collect()}
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    toks = {
        r.doc_id: r.ts
        for r in docs.select("doc_id", tokens("text").alias("ts")).collect()
    }
    for r in rows:
        assert r.n_tokens == sum(pieces[w] for w in toks[r.doc_id])


def test_curation_survivors_is_the_reports_base(spark):
    """curation_survivors exposes the kept-document decision set; the
    registered report must be exactly its (lang, source) aggregate, and
    every surviving doc must individually pass all four conjuncts."""
    kept = pipeline.curation_survivors(spark, SF_TEST).collect()
    assert kept
    report = {
        (r.lang, r.source): r.n_docs
        for r in pipeline.corpus_curation(spark, SF_TEST).collect()
    }
    agg: dict[tuple, int] = {}
    for r in kept:
        assert r.quality >= pipeline.CURATION_MIN_QUALITY
        agg[(r.lang, r.source)] = agg.get((r.lang, r.source), 0) + 1
    assert agg == report
