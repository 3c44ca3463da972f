"""Similarity search over `embeddings` (beyond-reference capability).

Two operators per the training-data-pipeline brief:

- ann_brute_topk — exact cosine top-k for a query subset. The query side
  is tiny and broadcast; the big side streams map-side with no shuffle
  of the corpus. The verifiable baseline.
- ann_lsh_topk  — random-hyperplane LSH: 4 sign bits → 16 buckets;
  multiprobe (own bucket + hamming-1) → candidates → exact-cosine
  rerank → top-k. The scale path: bucket assignment is map-side
  arithmetic, candidate generation is an equi-join on the bucket key,
  and the rerank touches ~5/16 of the corpus per query instead of all
  of it. Recall vs. brute force is property-tested in
  tests/test_similarity.py.

Hyperplanes are DETERMINISTIC: weights derive from the universal-hash
constants (functions/hashing.py) and are embedded as double literals in
both the Spark plan and the DuckDB oracle — so even the ANN pipeline is
value-checked end to end. Dot products and norms use identical
sequential folds in both engines (bit-identical doubles, no rounding).

Ranking is made deterministic by ordering on (cosine DESC, neighbor id
ASC): cosines are bit-identical across engines, so ties break the same
way everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.functions.hashing import P, hash_params
from uw_hadoop_aglorithms_spark.plans.layout import spread_for_cpu
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog
from uw_hadoop_aglorithms_spark.functions.rounding import fround

#: Every QUERY_STRIDE-th vector is a query point, capped at
#: ANN_MAX_QUERIES: the query side is BROADCAST, so it must be a bounded
#: external query set, never a fraction of the corpus (a |corpus|/50
#: broadcast grows linearly and dies at lake scale). The cap bounds the
#: broadcast at ANN_MAX_QUERIES × (NPLANES+1) rows regardless of corpus
#: size; the cap is inactive at fixture scale (vec_id < 50 000 always),
#: so oracle results are unchanged.
QUERY_STRIDE = 50
ANN_MAX_QUERIES = 1_000
TOP_K = 10
#: LSH: NPLANES sign bits → 2^NPLANES buckets; probe own + hamming-1.
NPLANES = 4
EMBED_DIM = 64
#: Probe masks: own bucket plus each single-bit flip.
PROBE_MASKS = [0] + [1 << p for p in range(NPLANES)]

#: IVF: coarse quantizer = up to IVF_NLIST corpus vectors sampled by id
#: (standing in for an offline-trained quantizer); every vector is
#: assigned to its max-cosine centroid; queries probe IVF_NPROBE cells.
IVF_CENTROID_MOD = 97
IVF_NLIST = 8
IVF_NPROBE = 2


def hyperplanes() -> list[list[float]]:
    """NPLANES deterministic pseudo-random unit-free hyperplanes in
    [-0.5, 0.5]^EMBED_DIM, derived from the shared hash constants so
    Spark and the DuckDB oracle embed the SAME literals."""
    planes = []
    for p in range(NPLANES):
        a, b = hash_params(p + 301)
        planes.append([((a * (d + 1) + b) % P) / P - 0.5 for d in range(EMBED_DIM)])
    return planes


def _dot_lit(vec: Column, plane: list[float]) -> Column:
    lit_arr = F.array(*[F.lit(x) for x in plane])
    return F.aggregate(
        F.zip_with(vec, lit_arr, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _bucket(vec: Column) -> Column:
    """Sign-bit bucket id in [0, 2^NPLANES)."""
    expr = F.lit(0)
    for p, plane in enumerate(hyperplanes()):
        expr = expr + F.when(_dot_lit(vec, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return expr


def _is_query(vec_id: Column) -> Column:
    """Bounded deterministic query set: stride-sampled AND id-capped so
    the broadcast side never grows with the corpus."""
    return (vec_id % QUERY_STRIDE == 0) & (
        vec_id < QUERY_STRIDE * ANN_MAX_QUERIES
    )


def _normed(
    spark: SparkSession, sf_dir: str, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    # spread the interpreted fold expressions across cores only when the
    # scan is under-parallel (plans/layout.spread_for_cpu)
    return (
        spread_for_cpu(Catalog(spark, sf_dir).embeddings, "vec_id")
        .select(
            "vec_id",
            *extra_cols,
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("v"), lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
        )
    )


def _cosine(a: str, b: str) -> Column:
    dot = F.aggregate(
        F.zip_with(F.col(f"{a}.v"), F.col(f"{b}.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.col(f"{a}.nrm") * F.col(f"{b}.nrm"))


def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors for each query vector.

    The query set is broadcast and BOUNDED (<= ANN_MAX_QUERIES rows), so
    the corpus is scanned once map-side — the only shuffle is the
    per-query top-k window over |queries|×|corpus| scored rows. Still
    the ground-truth baseline: scoring is linear in the corpus per
    query; ann_lsh_topk is the scale path.
    """
    emb = _normed(spark, sf_dir)
    q = emb.filter(_is_query(F.col("vec_id"))).alias("q")
    c = emb.alias("c")
    scored = (
        F.broadcast(q)
        .join(c, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cosine("q", "c").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[float], float]]:
    """(centroid_idx, vector, norm) for the ≤IVF_NLIST quantizer rows.

    The collect is a BOUNDED quantizer load (≤8 rows), the IVF analog
    of loading an offline-trained codebook — not a data collect. Norms
    fold left-to-right like the engine/oracle folds, so every double
    matches bit-for-bit.
    """
    rows = (
        Catalog(spark, sf_dir)
        .embeddings.filter(
            (F.col("vec_id") % IVF_CENTROID_MOD == 0)
            & (F.col("vec_id") < IVF_CENTROID_MOD * IVF_NLIST)
        )
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    out = []
    for idx, r in enumerate(rows):
        acc = 0.0
        for x in r.v:
            acc = acc + x * x
        out.append((idx, list(r.v), acc ** 0.5))
    return out


def _ivf_assign_structs(vec: Column, nrm: Column, cents) -> Column:
    """array<struct(c: cosine, nj: -idx)> per vector — array_max /
    sorted order give argmax with (cosine DESC, idx ASC) tie-break,
    matching the oracle's row_number ordering."""
    entries = []
    for idx, cvec, cnorm in cents:
        cos = _dot_lit(vec, cvec) / (nrm * F.lit(cnorm))
        entries.append(F.struct(cos.alias("c"), F.lit(-idx).alias("nj")))
    return F.array(*entries)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: coarse-quantizer cells + 2-cell probing.

    Corpus vectors are assigned MAP-SIDE to their max-cosine centroid
    (the centroid table is a ≤IVF_NLIST literal codebook — no shuffle,
    no |corpus|×C join). Queries probe their IVF_NPROBE nearest cells;
    candidates come from an equi-join on the cell id (shuffle ∝ probed
    fraction ≈ NPROBE/NLIST of the corpus), then exact cosine reranks.
    At 100 TB: raise IVF_NLIST so cells stay bounded and pre-partition
    the corpus by cell on write — the standard IVF deployment shape.
    """
    return _ivf_probe_topk(spark, sf_dir)


def _ivf_probe_topk(
    spark: SparkSession, sf_dir: str, match_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The IVF probe pipeline shared by ann_ivf_topk and the filtered
    variant: map-side cell assignment, per-query NPROBE probes, the
    broadcast candidate join (cell match + one equi-predicate per
    `match_cols` entry — the pre-filter hook), exact-cosine rerank,
    top-K window. One body so the variants can never drift."""
    cents = _ivf_centroids(spark, sf_dir)
    emb = _normed(spark, sf_dir, extra_cols=match_cols).withColumn(
        "cell",
        -F.array_max(_ivf_assign_structs(F.col("v"), F.col("nrm"), cents))["nj"],
    )
    probe_structs = F.reverse(
        F.array_sort(_ivf_assign_structs(F.col("v"), F.col("nrm"), cents))
    )
    q = (
        emb.filter(_is_query(F.col("vec_id")))
        .select(
            "vec_id",
            *match_cols,
            "v",
            "nrm",
            F.explode(
                F.slice(probe_structs, 1, IVF_NPROBE)
            ).alias("pr"),
        )
        .select(
            "vec_id", *match_cols, "v", "nrm", (-F.col("pr.nj")).alias("probe")
        )
        .alias("q")
    )
    c = emb.alias("c")
    cond = (F.col("q.probe") == F.col("c.cell")) & (
        F.col("q.vec_id") != F.col("c.vec_id")
    )
    for mc in match_cols:
        cond = cond & (F.col(f"q.{mc}") == F.col(f"c.{mc}"))
    scored = (
        F.broadcast(q)
        .join(c, cond)
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cosine("q", "c").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def ann_ivf_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — the production "metadata predicate +
    vector" ask (every vector store grows a WHERE clause): per query,
    the top-10 cosine neighbors AMONG VECTORS SHARING ITS LABEL, found
    with the PRE-FILTER strategy (predicate composed into candidate
    generation, not applied after the fact): candidates must match a
    probed cell AND the query's label, so a ~1/|labels| selective
    predicate shrinks the rerank set ~10× instead of starving a
    post-filtered top-k. Post-filtering the unfiltered IVF top-k would
    return <k (often 0) same-label rows — the classic filtered-ANN
    failure this operator exists to avoid.

    Scale: same plan as ann_ivf_topk plus the label equi-predicate in
    the candidate join (one body — _ivf_probe_topk — so the variants
    can never drift); at lake scale the codes/cells table is
    partitioned by (label, cell) so the predicate becomes partition
    pruning on the same layout the persisted-IVF index already uses
    (save_ann_index partitions by cell; a label-filtered deployment
    adds it to the partition spec).
    """
    return _ivf_probe_topk(spark, sf_dir, match_cols=("label",))


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10: sign-bucket + multiprobe.

    Corpus vectors get a bucket map-side; each query probes its own
    bucket and the NPLANES hamming-1 buckets. Candidates come from an
    equi-join on the bucket key (shuffle ∝ probed fraction, ~5/16 of
    the corpus per query), then exact cosine reranks. The broadcast
    query side is bounded by ANN_MAX_QUERIES — it never scales with the
    corpus. At 100 TB, raise NPLANES so bucket population stays bounded;
    the plan shape is unchanged.
    """
    emb = _normed(spark, sf_dir).withColumn("bucket", _bucket(F.col("v")))
    q = (
        emb.filter(_is_query(F.col("vec_id")))
        .select(
            "vec_id",
            "v",
            "nrm",
            F.explode(F.array(*[F.lit(m) for m in PROBE_MASKS])).alias("mask"),
            F.col("bucket"),
        )
        .withColumn("probe", F.col("bucket").bitwiseXOR(F.col("mask")))
        .alias("q")
    )
    c = emb.alias("c")
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.probe") == F.col("c.bucket"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cosine("q", "c").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector affine int8 quantization of the embedding column, with
    reconstruction-error stats — the compression step a 100 TB embedding
    store runs before ANN serving (4× smaller than float32).

    code_i = floor((x_i − vmin)/scale + 0.5) with scale = (vmax−vmin)/255
    (floor(z+0.5) instead of round(): identical semantics in Java and
    DuckDB, no banker's-rounding divergence). Entirely map-side array
    lambdas inside the scan — no shuffle but the final orderBy; codes are
    emitted '|'-joined (registered outputs must stay scalar-typed), and
    the MSE / max-abs-error folds are sequential in both engines, so the
    doubles are bit-identical.

    Internal columns carry an ``_i`` suffix: a projection whose OUTPUT
    alias shadows an input column name that a higher-order-function
    lambda references makes Spark's interpreted HOF path bind the lambda
    to the OUTPUT value (here: err would silently use round(scale, 9)
    instead of scale — observed, not hypothetical).
    """
    emb = spread_for_cpu(Catalog(spark, sf_dir).embeddings, "vec_id")
    vmin = F.array_min("embedding").cast("double")
    vmax = F.array_max("embedding").cast("double")
    base = emb.select(
        "vec_id",
        "embedding",
        vmin.alias("vmin_i"),
        vmax.alias("vmax_i"),
        ((vmax - vmin) / F.lit(255.0)).alias("scale_i"),
    )
    code = lambda e: (  # noqa: E731
        F.when(
            F.col("scale_i") > 0,
            F.floor(
                (e.cast("double") - F.col("vmin_i")) / F.col("scale_i") + F.lit(0.5)
            ).cast("int"),
        ).otherwise(F.lit(0))
    )
    q = base.withColumn("codes_i", F.transform(F.col("embedding"), code))
    err = lambda e, c: (  # noqa: E731
        e.cast("double") - (F.col("vmin_i") + c.cast("double") * F.col("scale_i"))
    )
    err2 = F.zip_with(F.col("embedding"), F.col("codes_i"), lambda e, c: err(e, c) * err(e, c))
    errabs = F.zip_with(F.col("embedding"), F.col("codes_i"), lambda e, c: F.abs(err(e, c)))
    mse = F.aggregate(err2, F.lit(0.0), lambda acc, x: acc + x) / F.size("embedding")
    return q.select(
        "vec_id",
        fround("vmin_i", 9).alias("vmin"),
        fround("vmax_i", 9).alias("vmax"),
        F.round("scale_i", 9).alias("scale"),
        F.concat_ws("|", F.transform(F.col("codes_i"), lambda c: c.cast("string"))).alias(
            "codes"
        ),
        F.round(mse, 12).alias("mse"),
        F.round(F.array_max(errabs), 12).alias("max_abs_err"),
    ).orderBy("vec_id")


# --- product quantization (PQ-ADC) -------------------------------------------
#
# The third leg of the 100 TB ANN stack (alongside IVF cells and int8
# affine codes): each vector compresses to PQ_M one-byte codes (a 64×
# reduction from float64), and query scoring becomes PQ_M table lookups
# + adds per candidate instead of a 64-dim dot product — the classic
# asymmetric-distance computation (ADC) of Jégou et al., TPAMI'11.
# Codebook entries are corpus vectors sampled by id (the offline-
# trained-codebook stand-in _ivf_centroids established); every fold
# below is left-associative from 0.0 so the DuckDB oracle, which
# derives the same codebook relationally, matches bit-for-bit.

#: PQ geometry: PQ_M subspaces of PQ_SUBDIM dims; ≤PQ_K codebook rows.
PQ_M = 8
PQ_SUBDIM = EMBED_DIM // PQ_M
PQ_CB_MOD = 89
PQ_K = 16
#: ADC shortlist size per query before the exact rerank.
PQ_SHORTLIST = 50


def _pq_codebook(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """Up to PQ_K full codebook vectors (bounded quantizer load, the
    _ivf_centroids pattern); entry k of subspace m is vector k's m-th
    subvector."""
    rows = (
        Catalog(spark, sf_dir)
        .embeddings.filter(
            (F.col("vec_id") % PQ_CB_MOD == 0)
            & (F.col("vec_id") < PQ_CB_MOD * PQ_K)
        )
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    return [list(r.v) for r in rows]


# All codebook-literal expressions are built as SQL STRINGS and parsed
# JVM-side in one selectExpr: the Column-API form (thousands of
# F.lit/F.struct py4j round-trips for PQ_M×K×SUBDIM literals) measured
# 5.1 s of pure DRIVER time per call at sf0.1 — the plan was fine, its
# construction wasn't. (A flat scalar-chain rewrite of the folds was
# also tried and measured SLOWER than the HOF form — 14.7 s vs 8.7 s
# standalone: ~1000-term trees blow up analysis.) Shared between the
# full-scan ADC (ann_pq_topk) and the persisted IVF-ADC index
# (save_pq_index / ann_ivfpq_topk).

def _pq_lits(cb, k: int, m: int) -> str:
    lo = m * PQ_SUBDIM
    return ", ".join(f"{x!r}D" for x in cb[k][lo:lo + PQ_SUBDIM])


def _pq_d2_sql(cb, k: int, m: int) -> str:
    lo = m * PQ_SUBDIM
    return (
        f"aggregate(zip_with(slice(v, {lo + 1}, {PQ_SUBDIM}),"
        f" array({_pq_lits(cb, k, m)}), (x, c) -> (x - c) * (x - c)),"
        " 0.0D, (a, x) -> a + x)"
    )


def _pq_enc_exprs(cb) -> list[str]:
    """`c{m} = argmin_k L2²(subvector_m, cb[m][k])` — struct-min with
    (d2 ASC, k ASC) tie-break, map-side, no |corpus|×K join."""
    out = []
    for m in range(PQ_M):
        structs = ", ".join(
            f"named_struct('d', {_pq_d2_sql(cb, k, m)}, 'k', {k})"
            for k in range(len(cb))
        )
        out.append(f"array_min(array({structs})).k AS c{m}")
    return out


def _pq_recon_expr(cb) -> str:
    """norm² of the reconstruction, selected by the stored codes: the
    per-subvector norms are Python left folds — the same IEEE sequence
    as the oracle's list_reduce (the _ivf_centroids argument)."""
    recon_terms = []
    for m in range(PQ_M):
        n2 = []
        for k in range(len(cb)):
            acc = 0.0
            lo = m * PQ_SUBDIM
            for x in cb[k][lo:lo + PQ_SUBDIM]:
                acc = acc + x * x
            n2.append(acc)
        arr = ", ".join(f"{x!r}D" for x in n2)
        recon_terms.append(f"element_at(array({arr}), c{m} + 1)")
    return "0.0D + " + " + ".join(recon_terms) + " AS recon2"


def _pq_tab_sql(cb, m: int) -> str:
    """ADC lookup table for subspace m: tab_m[k] = dot(q_m, cb[m][k]).
    Each table entry is the same fold the oracle computes per pair, so
    the looked-up double is bit-identical."""
    lo = m * PQ_SUBDIM
    dots = ", ".join(
        f"aggregate(zip_with(slice(v, {lo + 1}, {PQ_SUBDIM}),"
        f" array({_pq_lits(cb, k, m)}), (x, y) -> x * y),"
        " 0.0D, (a, x) -> a + x)"
        for k in range(len(cb))
    )
    return f"array({dots}) AS tab{m}"


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate top-10: encode map-side, score by lookup.

    Encoding: code_m = argmin_k L2²(subvector_m, codebook[m][k]) — a
    literal-codebook expression inside the scan (struct-min with
    (d2 ASC, k ASC) tie-break), no shuffle, no |corpus|×K join; the
    reconstruction norm² accumulates at the same time. Scoring: the
    bounded query set broadcasts against the coded corpus and each
    pair costs PQ_M selected-literal subvector dots (the ADC tables);
    adc_cosine = Σ_m dot(q_m, cb[m][code_m]) / (|q| · |reconstruction|).
    At 100 TB the coded corpus is what you STORE (PQ_M bytes + one
    float per vector); candidates come from an IVF cell join and ADC
    replaces the exact dot until a final small rerank — that deployment
    shape is the persisted `ann_ivfpq_topk` below.
    """
    cb = _pq_codebook(spark, sf_dir)
    emb = _normed(spark, sf_dir)

    enc = emb.selectExpr("*", *_pq_enc_exprs(cb))
    enc = enc.selectExpr("*", _pq_recon_expr(cb)).localCheckpoint(eager=True)

    # THE ADC trick proper: each query precomputes its lookup tables
    # tab_m[k] = dot(q_m, cb[m][k]) ONCE (|queries|×PQ_M×K dots — the
    # broadcast side), so each of the |queries|×|corpus| pairs costs
    # PQ_M array lookups + adds instead of PQ_M subvector dots.
    q = (
        enc.filter(_is_query(F.col("vec_id")))
        .selectExpr(
            "vec_id", "v", "nrm", *[_pq_tab_sql(cb, m) for m in range(PQ_M)]
        )
        .alias("q")
    )
    c = enc.alias("c")
    adc = F.expr(
        "0.0D + "
        + " + ".join(f"element_at(q.tab{m}, c.c{m} + 1)" for m in range(PQ_M))
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            (adc / (F.col("q.nrm") * F.sqrt(F.col("c.recon2")))).alias("adc_cos"),
        )
    )
    # ADC shortlist → exact rerank (the standard deployment: compressed
    # scoring prunes the corpus to PQ_SHORTLIST rows per query, exact
    # cosine touches only those — same output contract as the IVF/LSH
    # variants, whose cosines are exact for every emitted pair)
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neighbor_id")
    )
    shortlist = (
        scored.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qv = enc.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cv = enc.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    exact = (
        shortlist.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "cosine",
            F.aggregate(
                F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / (F.col("qn") * F.col("cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


# --- persisted IVF index: the lake-maintenance form --------------------------
#
# At 100 TB the corpus' cell assignments are not recomputed per query
# run: the quantizer is trained once and FROZEN, and the assigned
# vectors are PERSISTED partitioned by cell — the standard IVF
# deployment shape (Jégou et al.; the docstring promise in
# ann_ivf_topk). Queries then prune to their probed cells at the scan
# (PartitionFilters), so a 2-of-8 probe reads 2/8 of the files, and at
# a realistic NLIST (thousands of cells) reads a vanishing fraction.
# Ingest batches are assigned against the frozen codebook and appended
# into the same partition layout; takedowns tombstone; compaction
# applies tombstones physically and bounds file counts — the same
# lifecycle contract as the near-dup band index (dedup.py), tested with
# the same maintenance invariants in tests/test_similarity.py.

def _ann_tombstone_table(prefix: str) -> str:
    return f"{prefix}_cells_tombstones"


def _write_cells(df: DataFrame, table: str, mode: str) -> None:
    """(Re)write/append `(vec_id, v, nrm, cell)` rows as a catalog table
    partitioned by cell — partition pruning is the probe mechanism.
    Rows are pre-clustered by cell first, so every write (initial
    build, ingest append, compaction generation) lands ONE file per
    cell per holding task instead of |tasks|×|cells| fragments — the
    file-count discipline an ingest-heavy index needs (measured: the
    un-clustered save wrote ≤256 files for 8 cells and doubled the
    member's wall-clock on fixed per-file costs)."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # an orphaned location from a previous session (in-memory
        # catalog) blocks managed-table creation; clear it
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    (
        df.select("vec_id", "v", "nrm", "cell")
        .repartition(IVF_NLIST, F.col("cell"))
        .write.mode(mode)
        .partitionBy("cell")
        .format("parquet")
        .saveAsTable(table)
    )


def save_ann_index(
    spark: SparkSession, vectors: DataFrame, prefix: str, cents
) -> None:
    """Persist an IVF index over `vectors` ((vec_id, v, nrm) rows, e.g.
    a slice of `_normed`): `{prefix}_centroids` stores the FROZEN
    quantizer (idx, v, nrm — doubles roundtrip parquet exactly, so
    later assignments bit-match build-time ones), `{prefix}_cells`
    stores the assigned vectors partitioned by cell."""
    cent_df = spark.createDataFrame(
        [(i, list(v), float(n)) for i, v, n in cents],
        "idx int, v array<double>, nrm double",
    )
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_centroids")
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{prefix}_centroids", ignore_errors=True)
    cent_df.write.mode("overwrite").format("parquet").saveAsTable(
        f"{prefix}_centroids"
    )
    assigned = vectors.withColumn(
        "cell",
        -F.array_max(
            _ivf_assign_structs(F.col("v"), F.col("nrm"), cents)
        )["nj"],
    )
    _write_cells(assigned, f"{prefix}_cells", "overwrite")


def load_ann_centroids(
    spark: SparkSession, prefix: str
) -> list[tuple[int, list[float], float]]:
    """The frozen quantizer back from the catalog — a BOUNDED collect
    (≤IVF_NLIST rows), the codebook-load analog of _ivf_centroids."""
    return [
        (int(r.idx), list(r.v), float(r.nrm))
        for r in spark.table(f"{prefix}_centroids").orderBy("idx").collect()
    ]


def extend_ann_index(
    spark: SparkSession, vectors: DataFrame, prefix: str
) -> None:
    """Ingest a batch: assign against the FROZEN codebook (never
    retrained — retraining would silently shift every prior cell
    boundary) and append into the same partition layout. Fresh-build
    equivalence is tested: index(old) extended with new answers every
    query exactly like index(old ∪ new)."""
    cents = load_ann_centroids(spark, prefix)
    assigned = vectors.withColumn(
        "cell",
        -F.array_max(
            _ivf_assign_structs(F.col("v"), F.col("nrm"), cents)
        )["nj"],
    )
    _write_cells(assigned, f"{prefix}_cells", "append")


def remove_from_ann_index(spark: SparkSession, prefix: str, vec_ids) -> None:
    """Retract vectors (takedowns, re-embeds): O(|retractions|) append
    to a tombstone table consulted by every subsequent query — logical
    immediately, physical at the next compact_ann_index. `vec_ids` is
    an iterable of ids or a DataFrame with a vec_id column."""
    if isinstance(vec_ids, DataFrame):
        ids = vec_ids.select(F.col("vec_id").cast("long").alias("vec_id"))
    else:
        ids = spark.createDataFrame(
            [(int(i),) for i in vec_ids], "vec_id long"
        )
    ids.write.mode("append").format("parquet").saveAsTable(
        _ann_tombstone_table(prefix)
    )


def _live_cells(spark: SparkSession, prefix: str) -> DataFrame:
    """Index minus retracted vectors: a BROADCAST anti-join against the
    tombstone table (map-side — partition pruning on cell survives).
    Reads the raw table when no retraction has ever happened."""
    df = spark.table(f"{prefix}_cells")
    tomb = _ann_tombstone_table(prefix)
    if spark.catalog.tableExists(tomb):
        df = df.join(F.broadcast(spark.table(tomb)), "vec_id", "left_anti")
    return df


def compact_ann_index(spark: SparkSession, prefix: str) -> None:
    """Apply tombstones physically and bound file counts after many
    appends: the live rows are rewritten ONCE pre-clustered by cell
    (each output task holds whole cells, so the compacted layout is one
    file per cell per holding task) and swapped in via ALTER TABLE
    RENAME — the session-catalog form of a lake format's
    rewrite-then-commit. The tombstone table is dropped once applied."""
    table = f"{prefix}_cells"
    tmp = f"{table}__gen"
    # _write_cells pre-clusters by cell, so the generation lands one
    # file per cell per holding task
    live = _live_cells(spark, prefix)
    _write_cells(live, tmp, "overwrite")
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    # renaming a PARTITIONED managed table leaves the catalog's
    # per-partition locations pointing at the old path (observed: the
    # renamed table scans to 0 rows); re-derive them from the files
    spark.sql(f"ALTER TABLE {table} RECOVER PARTITIONS")
    spark.sql(f"DROP TABLE IF EXISTS {_ann_tombstone_table(prefix)}")


def ann_index_topk(
    spark: SparkSession, sf_dir: str, prefix: str
) -> DataFrame:
    """IVF top-10 answered FROM THE PERSISTED INDEX: queries probe
    their IVF_NPROBE nearest frozen-codebook cells; the probed cell set
    (bounded: ≤IVF_NLIST distinct values) is collected and pushed as a
    LITERAL partition filter, so the index scan prunes to the probed
    partitions (PartitionFilters — certified in
    tests/test_similarity.py); candidates equi-join on the cell id and
    exact cosine reranks. With the live index covering the corpus this
    is bit-identical to ann_ivf_topk (same frozen quantizer, same
    folds), which is exactly the maintenance contract: persisting,
    growing, retracting, and compacting the index must never change
    what a query answers."""
    cents = load_ann_centroids(spark, prefix)
    emb = _normed(spark, sf_dir)
    probe_structs = F.reverse(
        F.array_sort(_ivf_assign_structs(F.col("v"), F.col("nrm"), cents))
    )
    q = (
        emb.filter(_is_query(F.col("vec_id")))
        .select(
            "vec_id",
            "v",
            "nrm",
            F.explode(F.slice(probe_structs, 1, IVF_NPROBE)).alias("pr"),
        )
        .select("vec_id", "v", "nrm", (-F.col("pr.nj")).alias("probe"))
        .alias("q")
    )
    # bounded collect (≤IVF_NLIST ints): the probed-cell set, pushed as
    # partition-pruning literals. The implicit alternative is dynamic
    # partition pruning off the broadcast join; the literal form makes
    # the pruning assertable in the plan.
    probes = sorted(
        r.probe for r in q.select("probe").distinct().collect()
    )
    c = (
        _live_cells(spark, prefix)
        .filter(F.col("cell").isin(probes))
        .alias("c")
    )
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.probe") == F.col("c.cell"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cosine("q", "c").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


# --- persisted IVF-ADC index: compressed codes at rest -----------------------
#
# The production vector-lake layout (Jégou et al.'s IVFADC): what the
# lake STORES per vector is PQ_M code bytes + one reconstruction float,
# partitioned by IVF cell — ~60× smaller than the float64 vectors. A
# query probes its IVF_NPROBE cells (partition pruning), scores the
# probed codes in the COMPRESSED domain (ADC lookups — the original
# vectors are never read for scoring), and only the per-query shortlist
# touches the source embeddings table for the exact rerank. Both
# quantizers are FROZEN in catalog tables at save time, the same
# contract as save_ann_index.

def save_pq_index(spark: SparkSession, sf_dir: str, prefix: str) -> None:
    """Build the IVF-ADC index over the corpus at `sf_dir`:
    `{prefix}_centroids` (the frozen IVF coarse quantizer),
    `{prefix}_pqcb` (the frozen PQ codebook, k-ordered),
    `{prefix}_pqcodes` (vec_id, c0..c{PQ_M-1} TINYINT codes, recon2)
    partitioned by cell — one file per cell per holding task."""
    import shutil
    from urllib.parse import urlparse

    cents = _ivf_centroids(spark, sf_dir)
    cb = _pq_codebook(spark, sf_dir)
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path

    cent_df = spark.createDataFrame(
        [(i, list(v), float(n)) for i, v, n in cents],
        "idx int, v array<double>, nrm double",
    )
    cb_df = spark.createDataFrame(
        [(k, list(v)) for k, v in enumerate(cb)], "k int, v array<double>"
    )
    for name, df in ((f"{prefix}_centroids", cent_df), (f"{prefix}_pqcb", cb_df)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        df.write.mode("overwrite").format("parquet").saveAsTable(name)

    _write_pq_codes(_pq_encode(_normed(spark, sf_dir), cents, cb),
                    f"{prefix}_pqcodes", "overwrite")


def _pq_encode(vectors: DataFrame, cents, cb) -> DataFrame:
    """(vec_id, v, nrm) → (vec_id, c0.., recon2, cell): one map-side
    pass computes the IVF cell and the PQ codes together."""
    enc = vectors.withColumn(
        "cell",
        -F.array_max(
            _ivf_assign_structs(F.col("v"), F.col("nrm"), cents)
        )["nj"],
    )
    enc = enc.selectExpr("*", *_pq_enc_exprs(cb))
    return enc.selectExpr("*", _pq_recon_expr(cb))


def _write_pq_codes(enc: DataFrame, table: str, mode: str) -> None:
    spark = enc.sparkSession
    if mode == "overwrite":
        import shutil
        from urllib.parse import urlparse

        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    code_cols = [f"CAST(c{m} AS TINYINT) AS c{m}" for m in range(PQ_M)]
    (
        enc.selectExpr("vec_id", *code_cols, "recon2", "cell")
        .repartition(IVF_NLIST, F.col("cell"))
        .write.mode(mode)
        .partitionBy("cell")
        .format("parquet")
        .saveAsTable(table)
    )


def load_pq_codebook(spark: SparkSession, prefix: str) -> list[list[float]]:
    """The frozen PQ codebook back from the catalog — a BOUNDED collect
    (≤PQ_K rows), the codebook-load analog of _pq_codebook."""
    return [
        list(r.v)
        for r in spark.table(f"{prefix}_pqcb").orderBy("k").collect()
    ]


def extend_pq_index(
    spark: SparkSession, vectors: DataFrame, prefix: str
) -> None:
    """Ingest a batch: encode against BOTH frozen quantizers and append
    into the same cell-partition layout — fresh-build equivalence is
    tested like the other two indexes'."""
    cents = load_ann_centroids(spark, prefix)
    cb = load_pq_codebook(spark, prefix)
    _write_pq_codes(_pq_encode(vectors, cents, cb), f"{prefix}_pqcodes", "append")


def ann_ivfpq_topk(
    spark: SparkSession, sf_dir: str, prefix: str
) -> DataFrame:
    """IVF-ADC top-10 answered FROM THE PERSISTED CODES: queries probe
    their IVF_NPROBE frozen-codebook cells (the probed-cell set pushed
    as literal PartitionFilters, as in ann_index_topk), ADC-score the
    probed partitions' codes in the compressed domain (PQ_M lookups +
    adds per candidate — no vector column in the scan at all), shortlist
    PQ_SHORTLIST per query, and rerank the shortlist with exact cosine
    against the SOURCE embeddings table (the only place original
    vectors are read). Every emitted cosine is exact; approximation
    affects only which candidates reach the rerank."""
    cents = load_ann_centroids(spark, prefix)
    cb = load_pq_codebook(spark, prefix)
    emb = _normed(spark, sf_dir)
    probe_structs = F.reverse(
        F.array_sort(_ivf_assign_structs(F.col("v"), F.col("nrm"), cents))
    )
    q = (
        emb.filter(_is_query(F.col("vec_id")))
        .select(
            "vec_id",
            "v",
            "nrm",
            F.explode(F.slice(probe_structs, 1, IVF_NPROBE)).alias("pr"),
        )
        .select("vec_id", "v", "nrm", (-F.col("pr.nj")).alias("probe"))
        .selectExpr(
            "vec_id", "v", "nrm", "probe",
            *[_pq_tab_sql(cb, m) for m in range(PQ_M)],
        )
        .alias("q")
    )
    probes = sorted(
        r.probe for r in q.select("probe").distinct().collect()
    )
    c = (
        spark.table(f"{prefix}_pqcodes")
        .filter(F.col("cell").isin(probes))
        .alias("c")
    )
    adc = F.expr(
        "0.0D + "
        + " + ".join(f"element_at(q.tab{m}, c.c{m} + 1)" for m in range(PQ_M))
    )
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.probe") == F.col("c.cell"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            (adc / (F.col("q.nrm") * F.sqrt(F.col("c.recon2")))).alias(
                "adc_cos"
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neighbor_id")
    )
    shortlist = (
        scored.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qv = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    exact = (
        shortlist.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "cosine",
            F.aggregate(
                F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / (F.col("qn") * F.col("cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )
