"""Inverted index + boolean retrieval (SURVEY.md §2.7, §2.6).

The reference builds a positional MapFile index with hand-rolled gap + VInt
compression (reference MapReduce/Inverted Index/
BuildInvertedIndexCompressed.java:100-143) and evaluates postfix boolean
queries by seeking MapFile partitions (BooleanRetrievalCompressed.java:
68-158). Here:

- the index is a Parquet postings table `term → array<struct<docno,tf>>`
  (Parquet's dictionary/RLE encodings replace VInt, SURVEY.md §4);
- point lookup is a pushed-down `term = x` filter (optionally bucketBy);
- the postfix stack evaluator survives as ~20 lines of *client-side control
  flow* driving DataFrame set ops — the stack never touches data-plane code;
- document fetch joins on doc_id instead of seeking byte offsets
  (reference BooleanRetrievalCompressed.java:160-166 used the line's byte
  offset AS the docno; our docno is the stable `doc_id`).

Scale notes: the index build is explode → two-level groupBy — partial
aggregation keeps the shuffle at |distinct (doc,term)|; per-term set ops in
retrieval are semi-joins over postings, never driver-side materialization
of full posting lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.functions import intlog
from uw_hadoop_aglorithms_spark.functions.text import tokens
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

#: Default demo query, postfix notation (reference BooleanRetrievalCompressed
#: .java:68-87 pops 2 / pushes 1 per operator): (spark AND join) OR filter.
DEFAULT_QUERY = "spark join AND filter OR"

#: Preview truncation width (reference BooleanRetrievalCompressed.java:
#: 160-166 prints the first 80 chars of the fetched line).
PREVIEW_CHARS = 80


def term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document term frequency — I1 (reference
    BuildInvertedIndexCompressed.java:64-81 builds the same histogram with a
    per-mapper HMapStIW)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.documents.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat postings relation (term, doc_id, tf) — the oracle-checked form
    of the index. Sorted by (term, doc_id), mirroring the reference's
    secondary sort (BuildInvertedIndexCompressed.java:58-82)."""
    return term_frequencies(spark, sf_dir).orderBy("term", "doc_id")


def postings_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized index: term → sorted array<struct<docno,tf>> — I2.

    array_sort(collect_list(...)) replaces the composite-key secondary sort;
    Parquet encodings replace the gap+VInt bytes (reference
    BuildInvertedIndexCompressed.java:106-137). Written with
    `.write.parquet(...)` this IS the on-disk index; `filter(term = x)`
    reaches it via predicate pushdown (I3).
    """
    return (
        term_frequencies(spark, sf_dir)
        .groupBy("term")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("doc_id").alias("docno"), F.col("tf")))
            ).alias("postings"),
            F.count("*").alias("df"),
        )
    )


def _term_docs(tf: DataFrame, term: str) -> DataFrame:
    """Doc-id set for one term — the engine's point lookup (I3). On a
    materialized postings table this is a pushed-down term filter."""
    return tf.where(F.col("term") == term).select("doc_id")


def eval_postfix(tf: DataFrame, query: str = DEFAULT_QUERY) -> DataFrame:
    """Postfix boolean query → doc_id DataFrame — SO1–SO3.

    The stack is client-side control flow over lazy DataFrames (the plan
    composes; nothing executes until an action). AND = INTERSECT, OR =
    UNION DISTINCT, exactly the set semantics of reference
    BooleanRetrievalCompressed.java:93-123.
    """
    stack: list[DataFrame] = []
    for tok in query.split():
        if tok == "AND":
            b, a = stack.pop(), stack.pop()
            stack.append(a.intersect(b))
        elif tok == "OR":
            b, a = stack.pop(), stack.pop()
            stack.append(a.union(b).distinct())
        else:
            stack.append(_term_docs(tf, tok))
    if len(stack) != 1:
        raise ValueError(f"malformed postfix query {query!r}")
    return stack[0]


#: Positional retrieval demo queries: an exact phrase that occurs
#: multiple times in several fixture docs, and a term pair with a
#: position window (both verified non-trivial on the testdata).
PHRASE_QUERY = "slow hash batch"
PROX_TERMS = ("spark", "filter")
PROX_WINDOW = 4


def positional_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id, pos) — the positional index the reference's
    (docno, tf) postings stop short of (BuildInvertedIndexCompressed
    .java:106-137 stores frequencies only). Written to Parquet this is
    the on-disk positional index; term filters push down exactly like
    the tf postings."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.documents
        .select("doc_id", F.posexplode(tokens("text")).alias("pos", "term"))
        .select("term", "doc_id", F.col("pos").cast("long").alias("pos"))
    )


def phrase_search(
    spark: SparkSession, sf_dir: str, phrase: str = PHRASE_QUERY
) -> DataFrame:
    """Exact-phrase retrieval: (doc_id, matches) where matches counts
    phrase occurrences. Each phrase term contributes one term-filtered
    postings frame with positions SHIFTED to the phrase start, so the
    whole phrase is an equi-join chain on (doc_id, pos) — pushed-down
    term filters bound each side by that term's posting list, never the
    corpus, and AQE broadcasts rare-term sides. Shuffle keys are
    (doc_id, pos) — high-cardinality, skew-free."""
    terms = phrase.split()
    pp = positional_postings(spark, sf_dir)
    matches = pp.where(F.col("term") == terms[0]).select("doc_id", "pos")
    for i, t in enumerate(terms[1:], 1):
        nxt = pp.where(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("pos")
        )
        matches = matches.join(nxt, ["doc_id", "pos"])
    return (
        matches.groupBy("doc_id")
        .agg(F.count("*").alias("matches"))
        .orderBy("doc_id")
    )


def proximity_search(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, str] = PROX_TERMS,
    window: int = PROX_WINDOW,
) -> DataFrame:
    """Proximity retrieval: pairs of the two terms within `window`
    token positions, counted per document. The doc_id equi-join bounds
    candidates by per-doc posting lengths (tiny for real vocabularies);
    pathological per-doc repetition would call for the banded interval
    join (operators/temporal.range_join machinery) — not the common
    case for a term pair."""
    pp = positional_postings(spark, sf_dir)
    a = pp.where(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("pa")
    )
    b = pp.where(F.col("term") == terms[1]).select(
        "doc_id", F.col("pos").alias("pb")
    )
    return (
        a.join(b, "doc_id")
        .where(F.abs(F.col("pa") - F.col("pb")) <= window)
        .groupBy("doc_id")
        .agg(F.count("*").alias("matches"))
        .orderBy("doc_id")
    )


#: BM25 ranking constants (Robertson/Sparck-Jones defaults) and the
#: ranked-retrieval demo query (the boolean query's terms, bag-of-words).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "join", "filter")
BM25_TOP = 20


def bm25_term_scores(
    spark: SparkSession, sf_dir: str, terms: tuple[str, ...] = BM25_TERMS
) -> DataFrame:
    """(doc_id, s_raw): the pre-quantization per-term BM25 score double
    — the frame bm25_rank floors onto the 2^-30 grid, exposed so the
    boundary-margin audit (tests/test_quantizer_margins.py) can measure
    grid-boundary distances."""
    cat = Catalog(spark, sf_dir)
    tfq = term_frequencies(spark, sf_dir).where(F.col("term").isin(*terms))
    dl = cat.documents.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("dl")
    )
    stats = intlog.with_ilog2(
        cat.documents.select(
            F.count("*").alias("n_docs"),
            F.avg(F.size(tokens("text"))).alias("avgdl"),
        ),
        "2 * n_docs + 2",
        "k_num",
    )
    df_t = intlog.with_ilog2(
        tfq.groupBy("term").agg(F.countDistinct("doc_id").alias("df")),
        "2 * df + 1",
        "k_den",
    )
    idf = (F.col("k_num") - F.col("k_den")).cast("double") / F.lit(
        float(intlog.ILOG2_Q)
    )
    norm = F.col("tf") * (BM25_K1 + 1) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tfq.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * norm).alias("s_raw"))
    )


def bm25_rank(
    spark: SparkSession, sf_dir: str, terms: tuple[str, ...] = BM25_TERMS
) -> DataFrame:
    """BM25 ranked retrieval over the inverted index — the scored upgrade
    of boolean_retrieval (the reference only ever ranks implicitly by
    doc order, BooleanRetrievalCompressed.java:145-158).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = log2((N − df + 0.5)/(df + 0.5) + 1)
           = (ilog2(2N+2) − ilog2(2df+1)) / 2^30   (bits, round 8).

    The idf's argument simplifies to the integer ratio (2N+2)/(2df+1),
    so the log is two engine-neutral ilog2 chains (functions/intlog.py)
    — zero query-time ln() on either engine; a log-base change is a
    constant factor, so the RANKING is unchanged from the Robertson
    ln() form. Everything else is exact-integer until the final
    per-term expression: N, df, tf, dl are counts, and avgdl = exact
    integer sum / N, so both engines compute identical doubles; each
    per-term score is dyadic-quantized (floor(s*2^30+0.5), exact
    integer units) so the per-doc sum is exact and summation-order-
    independent before ordering.

    Scale: postings for the query terms come from a pushed-down
    isin-filter on the index (touches |terms| posting lists, not the
    corpus); doc lengths are a map-side projection; df/N/avgdl are tiny
    aggregates broadcast back. The only shuffle is the per-doc sum over
    |terms|-row groups.
    """
    # dyadic-quantized per-term score (functions/rounding.py
    # DYADIC_SUM_Q contract): exact integer-unit sums are
    # summation-order-independent, unlike the retired
    # round(sum(double), 6) form
    scored = bm25_term_scores(spark, sf_dir, terms).select(
        "doc_id",
        F.floor(F.col("s_raw") * F.lit(float(1 << 30)) + F.lit(0.5))
        .cast("long")
        .alias("su"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            (F.sum("su").cast("double") / F.lit(float(1 << 30))).alias("score"),
            F.count("*").alias("n_terms"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOP)
    )


def boolean_retrieval(
    spark: SparkSession, sf_dir: str, query: str = DEFAULT_QUERY
) -> DataFrame:
    """Evaluate a postfix boolean query and fetch matching documents with an
    80-char preview (I4 — join on doc_id, not byte-offset seek)."""
    cat = Catalog(spark, sf_dir)
    docs = eval_postfix(term_frequencies(spark, sf_dir), query)
    return (
        docs.join(cat.documents, "doc_id")
        .select("doc_id", F.substring("text", 1, PREVIEW_CHARS).alias("preview"))
        .orderBy("doc_id")
    )
