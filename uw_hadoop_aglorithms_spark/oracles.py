"""DuckDB oracle SQL for every SQL-expressible query (SURVEY.md §5.1).

Each string is ANSI SQL runnable by DuckDB against the same parquet tables
the Spark queries read (views: region nation customer supplier part orders
lineitem events documents embeddings). Column aliases match the Spark
queries EXACTLY — the driver's comparison sorts columns by name and hashes
values, so name drift == failure.

Float discipline: money/measure aggregates sum EXACT integer units
(BIGINT per row -> DECIMAL(38,0)/HUGEINT totals; see the money
determinism contract in operators/relational.py) so they are
summation-order-independent with no final round(); remaining float
aggregates are rounded (or dyadic-quantized) to the same fixed scale in
both engines because double summation order differs between Spark and
DuckDB, and negative-capable rounded outputs append + 0.0 in both
engines (functions/rounding.py signed-zero contract).
"""

from __future__ import annotations

from uw_hadoop_aglorithms_spark.functions import intlog
from uw_hadoop_aglorithms_spark.operators.relational import Q5_NATIONS, Q7_DATE, SHIP_DATE

RELATIONAL_ORACLES: dict[str, str] = {
    "q1": f"""
        SELECT count(*) AS count_items
        FROM lineitem
        WHERE l_shipdate = TIMESTAMP '{SHIP_DATE}'
    """,
    "q2": f"""
        SELECT o_orderpriority, o_orderkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate = TIMESTAMP '{SHIP_DATE}'
        ORDER BY o_orderkey
        LIMIT 20
    """,
    "q3": f"""
        SELECT l_orderkey, p_name, s_name
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_shipdate = TIMESTAMP '{SHIP_DATE}'
        ORDER BY l_orderkey, p_name, s_name
        LIMIT 20
    """,
    "q4": f"""
        SELECT n_nationkey, n_name, count(*) AS count_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_shipdate = TIMESTAMP '{SHIP_DATE}'
        GROUP BY n_nationkey, n_name
        ORDER BY n_nationkey
    """,
    "q5": f"""
        SELECT n_name, strftime(l_shipdate, '%Y-%m') AS ship_month,
               count(*) AS count_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE n_name IN ('{Q5_NATIONS[0]}', '{Q5_NATIONS[1]}')
        GROUP BY n_name, ship_month
        ORDER BY n_name, ship_month
    """,
    "q6": f"""
        SELECT
            l_returnflag,
            l_linestatus,
            -- exact integer-unit sums (relational.py money contract):
            -- BIGINT units per row, HUGEINT totals, one exact division
            CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
              / 1.0 AS sum_qty,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
              / 100.0 AS sum_base_price,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 1e4 AS sum_disc_price,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE)
              / 1e6 AS sum_charge,
            CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
              / 1.0 / count(*) AS avg_qty,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
              / 100.0 / count(*) AS avg_price,
            CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
              / 100.0 / count(*) AS avg_disc,
            count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate = TIMESTAMP '{SHIP_DATE}'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q7": f"""
        WITH per_order AS (
            SELECT l_orderkey, o_custkey, o_orderdate, o_orderpriority,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 1e4 AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderdate < TIMESTAMP '{Q7_DATE}'
              AND l_shipdate > TIMESTAMP '{Q7_DATE}'
            GROUP BY l_orderkey, o_custkey, o_orderdate, o_orderpriority
        )
        SELECT c_name, l_orderkey, revenue, o_orderdate, o_orderpriority
        FROM per_order JOIN customer ON o_custkey = c_custkey
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "semi_join": f"""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            WHERE l_shipdate > TIMESTAMP '{Q7_DATE}'
        )
        ORDER BY o_orderkey
    """,
    "anti_join": f"""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o.o_orderkey
              AND l_shipdate > TIMESTAMP '{Q7_DATE}'
        )
        ORDER BY o_orderkey
    """,
    "rollup_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 1e4 AS revenue
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "cube_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 1e4 AS revenue
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "customer_order_stats": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0
                 AS running_spend,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS order_seq,
               datediff('day',
                        lag(o_orderdate) OVER (
                            PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey),
                        o_orderdate) AS days_since_prev
        FROM orders
        ORDER BY o_custkey, order_seq
    """,
    "set_ops": """
        SELECT 'intersect' AS op, c_custkey FROM (
            SELECT DISTINCT o_custkey AS c_custkey FROM orders
            INTERSECT
            SELECT c_custkey FROM customer WHERE c_acctbal > 0
        )
        UNION ALL
        SELECT 'except' AS op, c_custkey FROM (
            SELECT c_custkey FROM customer WHERE c_acctbal > 0
            EXCEPT
            SELECT DISTINCT o_custkey AS c_custkey FROM orders
        )
        ORDER BY op, c_custkey
    """,
}


# --- text analytics (operators/text.py) ------------------------------------

#: DuckDB token-array fragment — MUST stay in lockstep with
#: functions/text.py TOKENS_SQL (same regex, same empty-filter).
_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), t -> t <> '')"

#: Shared CTE prologues.
_TOKS_CTE = f"WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)"
_BIGRAMS_CTE = f"""{_TOKS_CTE},
    bg AS (
        SELECT z[1] AS w1, z[2] AS w2
        FROM (
            SELECT unnest(list_zip(t[1:greatest(len(t)-1, 0)], t[2:len(t)])) AS z
            FROM toks
        )
    )"""
_PMI_CTE = f"""{_TOKS_CTE},
    hoods AS (SELECT doc_id, list_distinct(t[1:40]) AS ts FROM toks),
    ex AS (SELECT doc_id, unnest(ts) AS w FROM hoods),
    uni AS (SELECT w, count(*) AS docs FROM ex GROUP BY w),
    n AS (SELECT count(*) AS n_docs FROM hoods),
    pairs AS (
        SELECT a.w AS w1, b.w AS w2, count(*) AS pair_docs
        FROM ex a JOIN ex b USING (doc_id)
        WHERE a.w <> b.w
        GROUP BY a.w, b.w
        HAVING count(*) >= 10
    ),
    -- pmi in BITS via the engine-neutral integer ilog2 (round 8):
    -- (ilog2(N·c(a,b)) − ilog2(c(a)·c(b))) / 2^30 — exact integer
    -- units, no query-time log10() (see functions/intlog.py)
    pmi_joined AS (
        SELECT w1, w2, pair_docs, n_docs,
               d1.docs AS docs1, d2.docs AS docs2
        FROM pairs
        CROSS JOIN n
        JOIN uni d1 ON w1 = d1.w
        JOIN uni d2 ON w2 = d2.w
    ),
    pmi_units AS ({intlog.ilog2_oracle_sql(
        intlog.ilog2_oracle_sql(
            "SELECT * FROM pmi_joined", "n_docs * pair_docs", "k_num"),
        "docs1 * docs2", "k_den")}),
    pmi_flat AS (
        SELECT w1, w2,
               CAST(k_num - k_den AS DOUBLE) / {float(1 << 30)} AS pmi,
               pair_docs
        FROM pmi_units
    )"""

TEXT_ORACLES: dict[str, str] = {
    "word_count": f"""
        {_TOKS_CTE}
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(t) AS word FROM toks)
        GROUP BY word
        ORDER BY word
    """,
    "word_count_having": f"""
        {_TOKS_CTE}
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(t) AS word FROM toks)
        GROUP BY word
        HAVING count(*) > 100
        ORDER BY word
    """,
    "perfect_follower": f"""
        {_BIGRAMS_CTE}
        SELECT w2 AS follower, count(*) AS cnt
        FROM bg
        WHERE w1 = 'spark'
        GROUP BY w2
        HAVING count(*) > 1
        ORDER BY follower
    """,
    "bigram_relfreq": f"""
        {_BIGRAMS_CTE}
        SELECT w1, w2, cnt,
               round(cnt / sum(cnt) OVER (PARTITION BY w1), 6) AS rel_freq
        FROM (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2)
        ORDER BY w1, w2
    """,
    "pmi_pairs": f"""
        {_PMI_CTE}
        SELECT * FROM pmi_flat ORDER BY w1, w2
    """,
    "pmi_stripes": f"""
        {_PMI_CTE}
        SELECT * FROM pmi_flat ORDER BY w1, w2
    """,
}


# --- inverted index + boolean retrieval (operators/index.py) ----------------

INDEX_ORACLES: dict[str, str] = {
    "inverted_index": f"""
        {_TOKS_CTE}
        SELECT term, doc_id, count(*) AS tf
        FROM (SELECT doc_id, unnest(t) AS term FROM toks)
        GROUP BY term, doc_id
        ORDER BY term, doc_id
    """,
    # (spark AND join) OR filter — postfix 'spark join AND filter OR'
    "boolean_retrieval": f"""
        {_TOKS_CTE},
        ex AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM toks)
        SELECT d.doc_id, substring(d.text, 1, 80) AS preview
        FROM documents d
        WHERE d.doc_id IN (
            SELECT doc_id FROM ex WHERE term = 'spark'
            INTERSECT
            SELECT doc_id FROM ex WHERE term = 'join'
            UNION
            SELECT doc_id FROM ex WHERE term = 'filter'
        )
        ORDER BY d.doc_id
    """,
}


def _bm25_oracle() -> str:
    """idf via engine-neutral ilog2 (round 8): log2((2N+2)/(2df+1)) as
    integer-unit difference — no query-time ln(). Per-term expression
    mirrors the Spark plan operand-for-operand, with every constant a
    DOUBLE literal (``e0``): the retired form's bare decimal literals
    made DuckDB compute ``tf * DECIMAL(2.2)`` exactly where Spark
    rounds ``tf * double(2.2)`` — a latent 1-ulp channel."""
    from uw_hadoop_aglorithms_spark.operators.index import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOP,
    )

    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    stats_src = "SELECT count(*) AS n_docs, avg(len(t)) AS avgdl FROM toks"
    dft_src = "SELECT term, count(DISTINCT doc_id) AS df FROM tfq GROUP BY term"
    return f"""
        {_TOKS_CTE},
        tfq AS (
            SELECT term, doc_id, count(*) AS tf
            FROM (SELECT doc_id, unnest(t) AS term FROM toks)
            WHERE term IN ({terms})
            GROUP BY term, doc_id
        ),
        dl AS (SELECT doc_id, len(t) AS dl FROM toks),
        stats AS ({intlog.ilog2_oracle_sql(stats_src, "2 * n_docs + 2", "k_num")}),
        dft AS ({intlog.ilog2_oracle_sql(dft_src, "2 * df + 1", "k_den")})
        SELECT tfq.doc_id,
               CAST(sum(CAST(floor((
                   (CAST(k_num - k_den AS DOUBLE) / {float(1 << 30)})
                   * (tf * {BM25_K1 + 1}e0
                      / (tf + {BM25_K1}e0
                         * (1 - {BM25_B}e0 + {BM25_B}e0 * dl.dl / avgdl)))
               ) * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824.0 AS score,
               count(*) AS n_terms
        FROM tfq JOIN dft USING (term) JOIN dl ON dl.doc_id = tfq.doc_id, stats
        GROUP BY tfq.doc_id
        ORDER BY score DESC, tfq.doc_id
        LIMIT {BM25_TOP}
    """


INDEX_ORACLES["bm25_rank"] = _bm25_oracle()

#: positional postings CTE: (doc_id, pos, term), 0-based positions like
#: Spark's posexplode
_POS_CTE = f"""{_TOKS_CTE},
    p AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS term
        FROM toks, unnest(range(1, len(t) + 1)) AS r(i)
    )"""


def _phrase_oracle() -> str:
    from uw_hadoop_aglorithms_spark.operators.index import PHRASE_QUERY

    terms = PHRASE_QUERY.split()
    joins = "".join(
        f"\n            JOIN (SELECT doc_id, pos - {i} AS pos FROM p"
        f" WHERE term = '{t}') p{i} USING (doc_id, pos)"
        for i, t in enumerate(terms[1:], 1)
    )
    return f"""{_POS_CTE},
        m AS (
            SELECT p0.doc_id, p0.pos
            FROM (SELECT doc_id, pos FROM p WHERE term = '{terms[0]}') p0{joins}
        )
        SELECT doc_id, count(*) AS matches FROM m GROUP BY doc_id ORDER BY doc_id
    """


def _proximity_oracle() -> str:
    from uw_hadoop_aglorithms_spark.operators.index import PROX_TERMS, PROX_WINDOW

    return f"""{_POS_CTE}
        SELECT doc_id, count(*) AS matches
        FROM (SELECT doc_id, pos FROM p WHERE term = '{PROX_TERMS[0]}') a
        JOIN (SELECT doc_id, pos FROM p WHERE term = '{PROX_TERMS[1]}') b
          USING (doc_id)
        WHERE abs(a.pos - b.pos) <= {PROX_WINDOW}
        GROUP BY doc_id ORDER BY doc_id
    """


INDEX_ORACLES["phrase_search"] = _phrase_oracle()
INDEX_ORACLES["proximity_search"] = _proximity_oracle()


# --- streaming batch forms (streaming/windows.py) ---------------------------

#: Epoch-floor window start — identical to Spark's F.window() alignment for
#: timezone-naive timestamps in a UTC session.
def _win(seconds: int) -> str:
    return (
        "TIMESTAMP '1970-01-01 00:00:00' + "
        f"(floor(epoch(ts)/{seconds})*{seconds})::BIGINT * INTERVAL 1 SECOND"
    )


from uw_hadoop_aglorithms_spark.functions.geo import (
    region_case_sql,
    synth_lonlat_sql,
)

_GEO_LON, _GEO_LAT = synth_lonlat_sql("event_id")

STREAMING_ORACLES: dict[str, str] = {
    "geo_region_count": f"""
        WITH pts AS (
            SELECT ts, {_GEO_LON} AS lon, {_GEO_LAT} AS lat FROM events
        ),
        tagged AS (
            SELECT ts, {region_case_sql('lon', 'lat')} AS region FROM pts
        )
        SELECT {_win(3600)} AS window_start, region, count(*) AS cnt
        FROM tagged
        WHERE region IS NOT NULL
        GROUP BY window_start, region
        ORDER BY window_start, region
    """,
    "distinct_users": """
        SELECT event_type, count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "event_count": f"""
        SELECT {_win(3600)} AS window_start, count(*) AS cnt
        FROM events
        GROUP BY window_start
        ORDER BY window_start
    """,
    # sliding 60/30: every event belongs to exactly two windows — its
    # 30-min bucket and the one 30 min earlier (both cover ts since
    # width = 2×slide); unnest replicates, then a plain tumbling count
    "sliding_event_count": f"""
        WITH starts AS (
            SELECT unnest([
                {_win(1800)},
                {_win(1800)} - INTERVAL 30 MINUTE
            ]) AS window_start
            FROM events
        )
        SELECT window_start, count(*) AS cnt
        FROM starts
        GROUP BY window_start
        ORDER BY window_start
    """,
    "region_event_count": f"""
        SELECT {_win(3600)} AS window_start, event_type, count(*) AS cnt
        FROM events
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    "trending_arrivals": f"""
        WITH w AS (
            SELECT event_type, {_win(600)} AS window_start, count(*) AS cnt
            FROM events
            GROUP BY event_type, window_start
        ),
        lagged AS (
            SELECT event_type, window_start, cnt,
                   coalesce(lag(cnt) OVER (
                       PARTITION BY event_type ORDER BY window_start), 0) AS prev
            FROM w
        )
        SELECT event_type, window_start, cnt, prev,
               (cnt >= 10 AND cnt >= 2 * prev) AS alert
        FROM lagged
        ORDER BY event_type, window_start
    """,
}


# --- temporal (operators/temporal.py) ---------------------------------------
# ts is normalized to its UTC wall via integer epoch arithmetic
# (functions/days.utc_wall_sql): identical for TIMESTAMP / TIMESTAMPTZ /
# TIMESTAMP_NS fixture typings under any harness TimeZone, and it
# truncates nanos to micros exactly like the catalog's normalization.

from uw_hadoop_aglorithms_spark.functions.days import utc_wall_sql
from uw_hadoop_aglorithms_spark.operators.temporal import (
    RANGE_WINDOW_S,
    SESSION_GAP_S,
)

_TS_WALL = utc_wall_sql("ts")

TEMPORAL_ORACLES: dict[str, str] = {
    "range_join_nearby_events": f"""
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   (epoch_us(ts) // 1000000) AS es
            FROM events
        ),
        p AS (
            SELECT event_id AS purchase_id, user_id, es AS ps
            FROM e WHERE event_type = 'purchase'
        )
        SELECT DISTINCT purchase_id, o.event_id AS other_id, p.user_id,
               o.event_type AS other_type
        FROM p JOIN e o
          ON p.user_id = o.user_id
         AND abs(o.es - p.ps) <= {RANGE_WINDOW_S}
         AND o.event_id <> p.purchase_id
        ORDER BY purchase_id, other_id
    """,
    "user_sessions": f"""
        WITH e AS (SELECT user_id, {_TS_WALL} AS ts FROM events),
        gaps AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts - lag(ts) OVER w) >= {SESSION_GAP_S}
                        THEN 1 ELSE 0 END AS brk
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM gaps
        )
        SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts,
               count(*) AS n_events
        FROM sess GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
    "asof_last_order": f"""
        WITH e AS (SELECT event_id, user_id, {_TS_WALL} AS ts FROM events),
        od AS (
            SELECT o_custkey AS user_id, o_orderdate,
                   max(o_orderkey) AS o_orderkey
            FROM orders GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey AS last_order_key,
               o.o_orderdate AS last_order_date
        FROM e ASOF LEFT JOIN od o
          ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
        ORDER BY event_id
    """,
}


# --- dedup family (operators/dedup.py) --------------------------------------
# The engine-neutral polyhash (functions/hashing.py) lets these oracles
# replicate the EXACT MinHash/SimHash pipelines — same constants, same
# arithmetic — so hash-based dedup is value-checked, not just row-counted.

from uw_hadoop_aglorithms_spark.functions.hashing import polyhash_sql, uhash_sql
from uw_hadoop_aglorithms_spark.operators.dedup import (
    BAND_BUCKET_CAP,
    BANDS,
    BLOOM_BITS,
    BLOOM_K,
    BLOOM_SEED,
    BLOOM_WORD_BITS,
    COSINE_THRESHOLD,
    DECON_NGRAM,
    DECON_TEST_MOD,
    HAMMING_MAX,
    JACCARD_THRESHOLD,
    NUM_PERMS,
    ROWS_PER_BAND,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_HALF,
    SIMHASH_MEMBER,
    SIMHASH_MEMBER_HI,
)
from uw_hadoop_aglorithms_spark.functions.hashing import bucket_sql
from uw_hadoop_aglorithms_spark.functions.hashing import P as _P

#: CONTENT-CLASS reduction prefix (round 11, VERDICT r10 §Next 1).
#: Every pair-producing dedup oracle below derives its per-doc features
#: purely from `text` (or `embedding`), so docs with byte-identical
#: content are interchangeable: the oracles group them into classes,
#: run the quadratic machinery on one representative per class, and
#: expand class pairs back to doc pairs at the end. Semantics are
#: preserved EXACTLY on any input (scores are computed by the original
#: expressions on representative rows; multiplicity-sensitive gates —
#: the LSH bucket cap, the winnow df cap — weight classes by size), and
#: the driver re-proves value parity vs the Spark engine at sf0.01
#: every round. The payoff is at the sf1 stress replica, where every
#: doc has 9 exact twins: class space is 10× smaller and the quadratic
#: legs 100× cheaper, which is what lets the full neardup oracle run
#: inside the sandbox instead of spilling >79 GB (the round-10
#: rows-only gap). tests/test_oracle_classreduce.py pins equivalence
#: against the naive quadratic forms on adversarial fixtures.
_DCLS_CTE = """
    dcls AS MATERIALIZED (
        SELECT min(doc_id) AS rep, count(*) AS csize,
               list_sort(list(doc_id)) AS ids, text
        FROM documents GROUP BY text
    ),
    cdocs AS (SELECT rep AS doc_id, text FROM dcls)
"""

#: embeddings analogue: classes of byte-identical vectors. Both
#: prefixes aggregate the corpus ONCE (cdocs/cemb project off the
#: MATERIALIZED class table rather than re-grouping the scan —
#: code-review r11).
_ECLS_CTE = """
    ecls AS MATERIALIZED (
        SELECT min(vec_id) AS rep, count(*) AS csize,
               list_sort(list(vec_id)) AS ids, embedding
        FROM embeddings GROUP BY embedding
    ),
    cemb AS (SELECT rep AS vec_id, embedding FROM ecls)
"""


def _class_expand(pairs_cte: str, score_cols: str, a: str, b: str,
                  cls: str = "dcls") -> str:
    """Expansion suffix: class-pair rows (rep_a, rep_b, scores…) →
    doc-pair rows. rep_a <> rep_b expands to the full cross product of
    the two member lists (each unordered pair once, ordered via
    least/greatest — members of distinct classes interleave by id);
    rep_a = rep_b expands to the within-class x < y pairs, which is
    naturally empty for singleton classes, so self-rows need no csize
    gate. DuckDB zips multiple unnests in one SELECT, hence the two-step
    lateral expansion."""
    return f"""
    ex1 AS (
        SELECT p.rep_a, p.rep_b, {score_cols}, ca.ids AS ids_a, cb.ids AS ids_b
        FROM {pairs_cte} p
        JOIN {cls} ca ON ca.rep = p.rep_a
        JOIN {cls} cb ON cb.rep = p.rep_b
    ),
    ex2 AS (
        SELECT rep_a, rep_b, {score_cols}, unnest(ids_a) AS x, ids_b
        FROM ex1
    ),
    ex3 AS (
        SELECT rep_a, rep_b, {score_cols}, x, unnest(ids_b) AS y
        FROM ex2
    )
    SELECT least(x, y) AS {a}, greatest(x, y) AS {b}, {score_cols}
    FROM ex3
    WHERE rep_a <> rep_b OR x < y
    ORDER BY {a}, {b}
    """


#: Distinct word-bigram shingles per CLASS representative (mirrors
#: dedup._grams; class-reduced since round 11 — _DCLS_CTE note).
_GRAMS_CTE = """
    toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                           t -> t <> '') AS ts
        FROM cdocs
    ),
    grams AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(ts) - 1),
                             i -> ts[i + 1] || ' ' || ts[i + 2])) AS gs
        FROM toks
    )
"""

#: Mirrors dedup._gram_hash_sets: per-token polyhash, bigram combine
#: (th1*31 + th2) % P, distinct per doc.
_HASHED_CTE = f"""
    th AS (
        SELECT doc_id, list_transform(ts, t -> {polyhash_sql('t')}) AS hls
        FROM toks
    ),
    hsets AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(hls) - 1),
                   i -> (hls[i + 1] * 31 + hls[i + 2]) % {_P})) AS gset
        FROM th
    ),
    hashed AS (SELECT doc_id, unnest(gset) AS ph FROM hsets)
"""


def _minhash_lsh_sql() -> str:
    """Class-reduced (round 11, _DCLS_CTE note): signatures/bands per
    content class; the hot-bucket cap counts DOC occupancy (sum of
    class sizes — identical to the per-doc form, since twins share
    every band row); candidates and the exact-verify jaccard compute on
    representatives (a self-pair verifies rep-vs-rep: intersect(g,g)/
    (n+n−n) = the exact 1.0 the per-doc form emits for twins); doc
    pairs come from the expansion suffix."""
    sig_cols = ",\n               ".join(
        f"min({uhash_sql('ph', i)}) AS s{i}" for i in range(NUM_PERMS)
    )
    band_selects = "\n        UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_no, s{b * ROWS_PER_BAND} AS h1, "
        f"s{b * ROWS_PER_BAND + 1} AS h2 FROM sigs"
        for b in range(BANDS)
    )
    return f"""
    WITH {_DCLS_CTE}, {_GRAMS_CTE}, {_HASHED_CTE},
    sigs AS (
        SELECT doc_id, {sig_cols}
        FROM hashed GROUP BY doc_id
    ),
    bands AS ({band_selects}),
    -- hot-bucket guard, mirrored from dedup.capped_bands: buckets with
    -- DOC occupancy > BAND_BUCKET_CAP are excluded from candidate
    -- generation in BOTH engines (inert below sf1 — max observed doc
    -- occupancy is 87 at sf0.1; at the sf1 twin replica it FIRES, in
    -- both engines symmetrically)
    bands_capped AS (
        SELECT doc_id, band_no, h1, h2
        FROM (SELECT b.*, sum(c.csize) OVER (PARTITION BY band_no, h1, h2)
                     AS bsz
              FROM bands b JOIN dcls c ON c.rep = b.doc_id)
        WHERE bsz <= {BAND_BUCKET_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS rep_a, b.doc_id AS rep_b
        FROM bands_capped a JOIN bands_capped b
          ON a.band_no = b.band_no AND a.h1 = b.h1 AND a.h2 = b.h2
         AND a.doc_id <= b.doc_id
    ),
    cp AS (
        SELECT rep_a, rep_b,
               len(list_intersect(ga.gset, gb.gset))
                 / (len(ga.gset) + len(gb.gset)
                    - len(list_intersect(ga.gset, gb.gset)))
                 AS jaccard
        FROM cand
        JOIN hsets ga ON ga.doc_id = rep_a
        JOIN hsets gb ON gb.doc_id = rep_b
        WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    {_class_expand("cp", "jaccard", "doc_a", "doc_b")}
    """


def _simhash_sql() -> str:
    def bit(j: int) -> str:
        col, off = ("g", j) if j < SIMHASH_HALF else ("g2", j - SIMHASH_HALF)
        return f"({col} >> {off}) & 1"

    bit_sums = ",\n               ".join(
        f"sum(CASE WHEN {bit(j)} = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH {_DCLS_CTE}, {_GRAMS_CTE}, {_HASHED_CTE},
    uh AS (SELECT doc_id, {uhash_sql('ph', SIMHASH_MEMBER)} AS g,
                  {uhash_sql('ph', SIMHASH_MEMBER_HI)} AS g2 FROM hashed),
    votes AS (SELECT doc_id, {bit_sums} FROM uh GROUP BY doc_id),
    sigs AS (SELECT doc_id, ({sig})::BIGINT AS sig FROM votes),
    -- class-reduced (round 11, _DCLS_CTE note): the all-pairs scan runs
    -- over class signatures (<= allows self-pairs: twins' hamming is
    -- the same bit_count(xor(s,s)) = 0 the per-doc form computes)
    cp AS (
        SELECT a.doc_id AS rep_a, b.doc_id AS rep_b,
               bit_count(xor(a.sig, b.sig)) AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id <= b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= {HAMMING_MAX}
    ),
    {_class_expand("cp", "hamming", "doc_a", "doc_b")}
    """


#: Sequential left-fold dot/norm — mirrors Spark's `aggregate` order so
#: doubles come out bit-identical (no rounding needed).
def _fold_sum(items: str) -> str:
    return f"list_reduce(list_prepend(0.0::DOUBLE, {items}), (acc, x) -> acc + x)"


#: Distinct token-8-gram hashes per doc (mirrors
#: dedup._token_ngram_hashes): the chain ends with sh(doc_id, gh).
_DECON_SH_CTE = f"""toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                               t -> t <> '') AS ts
            FROM documents
        ),
        th AS (
            SELECT doc_id, list_transform(ts, t -> {polyhash_sql('t')}) AS hs
            FROM toks
        ),
        gr AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(hs) - {DECON_NGRAM - 1}, 0) + 1),
                       i -> list_reduce(
                           list_prepend(0::BIGINT, hs[i:i + {DECON_NGRAM - 1}]),
                           (a, h) -> (a * 31 + h) % {_P}))) AS gs
            FROM th
        ),
        sh AS (SELECT doc_id, unnest(gs) AS gh FROM gr)"""


DEDUP_ORACLES: dict[str, str] = {
    "exact_dedup": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM (SELECT doc_id,
                     trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
              FROM documents)
        GROUP BY norm
        ORDER BY doc_id
    """,
    # class-reduced (round 11, _DCLS_CTE note): the shingle self-join
    # runs over class representatives (<= keeps self-pairs, whose i = n
    # gives the same exact n/n jaccard the per-doc form emits for
    # twins; gram-less classes never reach `sh`, exactly like gram-less
    # docs before); the expansion suffix restores doc pairs
    "ngram_jaccard": f"""
        WITH {_DCLS_CTE}, {_GRAMS_CTE},
        sh AS (SELECT doc_id, unnest(gs) AS g FROM grams),
        sizes AS (SELECT doc_id, len(gs) AS n FROM grams),
        inter AS (
            SELECT a.doc_id AS rep_a, b.doc_id AS rep_b, count(*) AS i
            FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id <= b.doc_id
            GROUP BY rep_a, rep_b
        ),
        cp AS (
            SELECT rep_a, rep_b, i / (sa.n + sb.n - i) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = rep_a
            JOIN sizes sb ON sb.doc_id = rep_b
            WHERE i / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
        ),
        {_class_expand("cp", "jaccard", "doc_a", "doc_b")}
    """,
    "decontaminate": f"""
        WITH {_DECON_SH_CTE},
        test AS (SELECT DISTINCT gh FROM sh WHERE doc_id % {DECON_TEST_MOD} = 0)
        SELECT doc_id, count(*) AS n_shared_ngrams
        FROM sh JOIN test USING (gh)
        WHERE doc_id % {DECON_TEST_MOD} <> 0
        GROUP BY doc_id ORDER BY doc_id
    """,
    # Bloom-bitmap decontamination: same report, the broadcast-filter
    # scale mechanism (deterministic FPs — mirrored exactly; see
    # dedup.decontaminate_bloom). Membership = the k probe joins all
    # find their bit set; MATERIALIZED sh because it feeds both sides.
    "decontaminate_bloom": f"""
        WITH {_DECON_SH_CTE.replace("sh AS (", "sh AS MATERIALIZED (", 1)},
        bm AS (
            SELECT pos // {BLOOM_WORD_BITS} AS widx,
                   bit_or(1::BIGINT << (pos % {BLOOM_WORD_BITS})::INT) AS bits
            FROM (
                SELECT unnest([{", ".join(
                    bucket_sql("gh", BLOOM_SEED + i, BLOOM_BITS)
                    for i in range(BLOOM_K))}]) AS pos
                FROM (SELECT DISTINCT gh FROM sh
                      WHERE doc_id % {DECON_TEST_MOD} = 0)
            ) GROUP BY widx
        ),
        tr AS (
            SELECT doc_id, {", ".join(
                f"{bucket_sql('gh', BLOOM_SEED + i, BLOOM_BITS)} AS p{i}"
                for i in range(BLOOM_K))}
            FROM sh WHERE doc_id % {DECON_TEST_MOD} <> 0
        )
        SELECT doc_id, count(*) AS n_shared_ngrams
        FROM tr
        {" ".join(
            f"JOIN bm b{i} ON b{i}.widx = tr.p{i} // {BLOOM_WORD_BITS} "
            f"AND (b{i}.bits & (1::BIGINT << (tr.p{i} % {BLOOM_WORD_BITS})::INT)) <> 0"
            for i in range(BLOOM_K))}
        GROUP BY doc_id ORDER BY doc_id
    """,
    "minhash_lsh_dedup": _minhash_lsh_sql(),
    # connected components over the SAME pair graph, via recursive-CTE
    # reachability closure (min reachable id = cluster id)
    "dedup_clusters": f"""
        WITH RECURSIVE mh AS ({_minhash_lsh_sql()}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM mh
            UNION ALL
            SELECT doc_b, doc_a FROM mh
        ),
        reach(id, m) AS (
            SELECT DISTINCT src, src FROM edges
            UNION
            SELECT r.id, e.dst FROM reach r JOIN edges e ON e.src = r.m
        )
        SELECT id AS doc_id, min(m) AS cluster_id
        FROM reach GROUP BY id ORDER BY doc_id
    """,
    "simhash_dedup": _simhash_sql(),
    # class-reduced (round 11, _ECLS_CTE note): the all-pairs cosine
    # scan runs over distinct-vector representatives (<= keeps
    # self-pairs, computing the identical dot(v,v)/(nrm·nrm) expression
    # the per-vec form emits for twins — NOT a literal 1.0, so the
    # sqrt(S)² ulp matches bit-for-bit); expansion restores vec pairs
    "embedding_cosine_dups": f"""
        WITH {_ECLS_CTE},
        e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt({_fold_sum('list_transform(embedding::DOUBLE[], x -> x * x)')})
                     AS nrm
            FROM cemb
        ),
        cp AS (
            SELECT a.vec_id AS rep_a, b.vec_id AS rep_b,
                   {_fold_sum('list_transform(range(len(a.v)), i -> a.v[i + 1] * b.v[i + 1])')}
                     / (a.nrm * b.nrm) AS cosine
            FROM e a JOIN e b ON a.vec_id <= b.vec_id
            WHERE {_fold_sum('list_transform(range(len(a.v)), i -> a.v[i + 1] * b.v[i + 1])')}
                     / (a.nrm * b.nrm) >= {COSINE_THRESHOLD}
        ),
        {_class_expand("cp", "cosine", "vec_a", "vec_b", cls="ecls")}
    """,
}


def _span_dedup_sql() -> str:
    """Span-level exact dedup (mirrors dedup.span_dedup): positional
    SPAN_L-token rolling-gram hashes, corpus-wide frequency >= 2 marks
    duplicated starts, gaps-and-islands merges them into maximal
    ranges, and the cleaned text (covered tokens removed) is
    re-polyhashed — bit-identical to the Spark column pipeline."""
    from uw_hadoop_aglorithms_spark.operators.dedup import SPAN_L

    L = SPAN_L
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                               t -> t <> '') AS ts
            FROM documents
        ),
        th AS (
            SELECT doc_id, list_transform(ts, t -> {polyhash_sql('t')}) AS hs
            FROM toks
        ),
        gr AS (
            SELECT doc_id,
                   list_transform(
                       range(1, greatest(len(hs) - {L - 1}, 0) + 1),
                       i -> list_reduce(
                           list_prepend(0::BIGINT, hs[i:i + {L - 1}]),
                           (a, h) -> (a * 31 + h) % {_P})) AS gs
            FROM th
        ),
        st0 AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(gs) + 1),
                                         i -> {{'s': i, 'gh': gs[i]}})) AS r
            FROM gr
        ),
        st AS (SELECT doc_id, r['s'] AS s, r['gh'] AS gh FROM st0),
        hot AS (SELECT gh FROM st GROUP BY gh HAVING count(*) >= 2),
        ds AS (SELECT st.doc_id, st.s FROM st JOIN hot USING (gh)),
        brk AS (
            SELECT doc_id, s,
                   CASE WHEN s > coalesce(max(s) OVER (
                            PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING),
                            -{L + 1}) + {L}
                        THEN 1 ELSE 0 END AS nb
            FROM ds
        ),
        isl AS (
            SELECT doc_id, s,
                   sum(nb) OVER (PARTITION BY doc_id ORDER BY s) AS g
            FROM brk
        ),
        spans AS (
            SELECT doc_id, g, count(*) AS n_starts,
                   min(s) AS b, max(s) + {L - 1} AS e
            FROM isl GROUP BY doc_id, g
        ),
        tp0 AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ts) + 1),
                                         i -> {{'pos': i, 'tok': ts[i]}})) AS r
            FROM toks
        ),
        tp AS (SELECT doc_id, r['pos'] AS pos, r['tok'] AS tok FROM tp0),
        cov AS (
            SELECT tp.doc_id, tp.pos, tp.tok, (sp.b IS NOT NULL) AS c
            FROM tp LEFT JOIN spans sp
              ON sp.doc_id = tp.doc_id AND tp.pos BETWEEN sp.b AND sp.e
        ),
        prof AS (
            SELECT doc_id,
                   count(*) FILTER (WHERE c) AS dup_toks,
                   coalesce(string_agg(tok, ' ' ORDER BY pos)
                            FILTER (WHERE NOT c), '') AS kept
            FROM cov GROUP BY doc_id
        ),
        per AS (
            SELECT t.doc_id, len(t.ts) AS n,
                   coalesce(ss.n_starts, 0) AS sp_dup_starts,
                   coalesce(ss.n_spans, 0) AS sp_spans,
                   coalesce(p.dup_toks, 0) AS sp_dup_tokens,
                   coalesce(p.kept, '') AS kept
            FROM toks t
            -- CAST: duckdb sum(BIGINT) returns HUGEINT (int128), which
            -- python fetchall() hides (converts to int) but a pandas/
            -- arrow fetch renders as float/decimal — the ONLY two
            -- driver-red keys were exactly the two whose oracle output
            -- typed HUGEINT (round-9 finding; tests/test_oracle_types.py
            -- pins the invariant)
            LEFT JOIN (SELECT doc_id, CAST(sum(n_starts) AS BIGINT) AS n_starts,
                              count(*) AS n_spans
                       FROM spans GROUP BY doc_id) ss USING (doc_id)
            LEFT JOIN prof p USING (doc_id)
        )
        SELECT doc_id, sp_dup_starts, sp_spans, sp_dup_tokens,
               CASE WHEN n > 0 THEN sp_dup_tokens / n ELSE 0e0 END
                 AS sp_dup_ratio,
               {polyhash_sql('kept')} AS sp_kept_hash
        FROM per ORDER BY doc_id
    """


def _winnow_pairs_sql() -> str:
    """Cross-doc winnowing match: the doc_fingerprint oracle feeds a
    DF-capped fp self-join (mirrors dedup.winnow_dup_pairs).
    Class-reduced (round 11, _DCLS_CTE note): fingerprints are a pure
    function of text, so they compute once per class (the
    doc_fingerprint CTE re-targeted at `cdocs`); the document-frequency
    cap weights each class by size (df still counts DOCS, identical to
    the per-doc form since twins carry identical fp sets); the fp
    self-join runs in class space (<= keeps self-pairs: twins share
    exactly the class's rare fps, the same count(*) the per-doc form
    yields); expansion restores doc pairs."""
    from uw_hadoop_aglorithms_spark.operators.dedup import (
        WINNOW_DF_FRAC,
        WINNOW_MAX_DF,
        WINNOW_MIN_SHARED,
    )

    cap = (
        f"greatest({WINNOW_MAX_DF}, floor({WINNOW_DF_FRAC!r}::DOUBLE"
        f" * (SELECT count(*) FROM documents))::BIGINT)"
    )
    fp_over_classes = TEXTSTATS_ORACLES["doc_fingerprint"].replace(
        "FROM documents", "FROM cdocs"
    )
    assert "FROM cdocs" in fp_over_classes  # doc_fingerprint shape canary
    return f"""
        WITH {_DCLS_CTE},
        fps AS ({fp_over_classes}),
        rare AS (
            SELECT doc_id, fp FROM (
                SELECT f.doc_id, f.fp,
                       sum(c.csize) OVER (PARTITION BY f.fp) AS df
                FROM fps f JOIN dcls c ON c.rep = f.doc_id
            ) WHERE df <= {cap}
        ),
        cp AS (
            SELECT a.doc_id AS rep_a, b.doc_id AS rep_b,
                   count(*) AS n_shared
            FROM rare a JOIN rare b
              ON a.fp = b.fp AND a.doc_id <= b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= {WINNOW_MIN_SHARED}
        ),
        {_class_expand("cp", "n_shared", "doc_a", "doc_b")}
    """


def _semantic_dedup_sql() -> str:
    """SemDeDup: the k-means oracle's CTE prefix (identical trained
    codebook in both engines), multi-probe assignment, within-cell
    cosine (mirrors dedup.semantic_dedup_pairs)."""
    from uw_hadoop_aglorithms_spark.operators.cluster import (
        KM_ITERS,
        _dist_sql,
        kmeans_prefix_sql,
    )
    from uw_hadoop_aglorithms_spark.operators.dedup import SEM_PROBES

    d = _dist_sql("e.v", "cf.v")
    dot = _fold_sum(
        "list_transform(range(len(a.v)), i -> a.v[i + 1] * b.v[i + 1])"
    )
    # class-reduced (round 11, _ECLS_CTE note): k-means TRAINING stays
    # over all vectors (linear; multiplicity legitimately weights the
    # centroids), but assignment + the quadratic within-cell cosine run
    # once per distinct vector — identical vectors get identical probed
    # cells (distance and the cid tie-break are functions of v), so the
    # class pair set and every cosine match the per-vec form exactly
    return f"""
        {kmeans_prefix_sql()},
        {_ECLS_CTE},
        ce AS (SELECT e.* FROM e JOIN ecls ON ecls.rep = e.vec_id),
        probed AS (
            SELECT vec_id, v, cid FROM (
                SELECT e.vec_id, e.v, cf.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {d}, cf.cid
                       ) AS rn
                FROM ce e, c{KM_ITERS} cf
            ) WHERE rn <= {SEM_PROBES}
        ),
        n AS (
            SELECT vec_id, cid, v,
                   sqrt({_fold_sum('list_transform(v, x -> x * x)')}) AS nrm
            FROM probed
        ),
        cp AS (
            SELECT DISTINCT a.vec_id AS rep_a, b.vec_id AS rep_b,
                   {dot} / (a.nrm * b.nrm) AS cosine
            FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id <= b.vec_id
            WHERE {dot} / (a.nrm * b.nrm) >= {COSINE_THRESHOLD}
        ),
        {_class_expand("cp", "cosine", "vec_a", "vec_b", cls="ecls")}
    """


def _semantic_dedup_scaled_sql(n_cells: int = 64) -> str:
    """Scaled SemDeDup (round 5): sampled DataFrame codebook (same id
    rule as the Spark side), join-based top-probes assignment, same
    within-cell cosine — every fold mirrors the zip_with+aggregate
    order (mirrors dedup.semantic_dedup_pairs_scaled)."""
    from uw_hadoop_aglorithms_spark.operators.dedup import SEM_CB_MOD, SEM_PROBES

    d = (
        "list_reduce(list_prepend(0.0::DOUBLE, "
        "list_transform(range(len(e.v)), "
        "i -> (e.v[i + 1] - cb.cv[i + 1]) * (e.v[i + 1] - cb.cv[i + 1]))), "
        "(a, x) -> a + x)"
    )
    dot = _fold_sum(
        "list_transform(range(len(a.v)), i -> a.v[i + 1] * b.v[i + 1])"
    )
    # class-reduced like _semantic_dedup_sql (round 11): the codebook is
    # a vec_id-selected FIXTURE subset (not content-derived), so it
    # stays per-vec; assignment + within-cell pairs run per distinct
    # vector and expand back
    return f"""
        WITH {_ECLS_CTE},
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM cemb),
        cb AS (
            SELECT vec_id AS cb_id, embedding::DOUBLE[] AS cv FROM embeddings
            WHERE vec_id % {SEM_CB_MOD} = 0
              AND vec_id < {SEM_CB_MOD * n_cells}
        ),
        probed AS (
            SELECT vec_id, v, cid FROM (
                SELECT e.vec_id, e.v, cb.cb_id AS cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {d}, cb.cb_id
                       ) AS rn
                FROM e, cb
            ) WHERE rn <= {SEM_PROBES}
        ),
        n AS (
            SELECT vec_id, cid, v,
                   sqrt({_fold_sum('list_transform(v, x -> x * x)')}) AS nrm
            FROM probed
        ),
        cp AS (
            SELECT DISTINCT a.vec_id AS rep_a, b.vec_id AS rep_b,
                   {dot} / (a.nrm * b.nrm) AS cosine
            FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id <= b.vec_id
            WHERE {dot} / (a.nrm * b.nrm) >= {COSINE_THRESHOLD}
        ),
        {_class_expand("cp", "cosine", "vec_a", "vec_b", cls="ecls")}
    """


# --- multimodal plumbing (operators/multimodal.py) --------------------------
# The media table derives payloads from ASCII text (bytes == chars), so
# the byte-level features the Pandas UDFs compute are expressible over
# the text column in SQL — the Arrow/mapInPandas path is value-checked.

from uw_hadoop_aglorithms_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    HIST_BINS,
    MEDIA_TYPES,
)

_MEDIA_TYPE_SQL = (
    "[" + ", ".join(f"'{t}'" for t in MEDIA_TYPES) + "][(doc_id % 3 + 1)::INT]"
)

MULTIMODAL_ORACLES: dict[str, str] = {
    "media_features": f"""
        WITH m AS (
            SELECT doc_id, {_MEDIA_TYPE_SQL} AS media_type,
                   list_transform(string_split(text, ''),
                                  c -> ascii(c)::BIGINT) AS codes
            FROM documents
        )
        SELECT doc_id, media_type,
               len(codes)::BIGINT AS n_bytes,
               list_reduce(list_prepend(0::BIGINT, codes), (a, b) -> a + b)
                 / len(codes) AS byte_mean,
               array_to_string(
                   list_transform(range(0, {HIST_BINS}),
                                  b -> len(list_filter(codes, c -> c // 16 = b))),
                   '|') AS hist
        FROM m ORDER BY doc_id
    """,
    "frame_sample": f"""
        WITH v AS (
            SELECT doc_id, text,
                   unnest(range(0, (length(text) + {FRAME_BYTES - 1}) // {FRAME_BYTES},
                                {FRAME_STRIDE})) AS idx
            FROM documents WHERE doc_id % 3 = 2
        ),
        fr AS (
            SELECT doc_id, idx,
                   substr(text, (idx * {FRAME_BYTES} + 1)::INT, {FRAME_BYTES}) AS f
            FROM v
        )
        SELECT doc_id, idx AS frame_idx, length(f)::BIGINT AS n_bytes,
               {polyhash_sql('f')} AS frame_hash
        FROM fr ORDER BY doc_id, frame_idx
    """,
    # media_real ships ACTUAL PNG/WAV container bytes through the binary
    # column (multimodal.media_real_table) and decodes them with the
    # stdlib codecs; the decoded content is the text bytes laid into the
    # container (image: metadata extent, zero-padded/truncated; audio:
    # exactly-invertible (b-128)*256 int16 samples), so the oracle
    # recomputes every feature from the text column in closed form —
    # pad zeros land in histogram bin 0 and add nothing to the sum.
    "media_real": """
        WITH m0 AS (
            -- coalesce mirrors the Spark projection's NULL guard; the
            -- n = 0 CASE avoids duckdb's string_split('', '') = ['']
            -- putting a phantom ascii('') = 0 code into histogram bin 0
            -- for a doc whose text is empty (or becomes empty after the
            -- non-ASCII strip) — ADVICE r8
            SELECT doc_id,
                   coalesce(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'),
                            '') AS t
            FROM documents WHERE doc_id % 3 != 2
        ),
        m AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                        ELSE 'audio/wav' END AS container,
                   CASE WHEN length(t) = 0 THEN []::BIGINT[]
                        ELSE list_transform(string_split(t, ''),
                                            c -> ascii(c)::BIGINT)
                   END AS codes,
                   length(t) AS n
            FROM m0
        ),
        x AS (
            SELECT doc_id, container,
                   CASE WHEN container = 'image/png'
                        THEN (n % 64 + 1) * (n % 48 + 1) ELSE n END AS nv,
                   CASE WHEN container = 'image/png'
                        THEN codes[1:LEAST(n, (n % 64 + 1) * (n % 48 + 1))]
                        ELSE codes END AS used,
                   CASE WHEN container = 'image/png'
                        THEN GREATEST(0, (n % 64 + 1) * (n % 48 + 1) - n)
                        ELSE 0 END AS pad
            FROM m
        )
        SELECT doc_id, container,
               nv::BIGINT AS n_values,
               list_reduce(list_prepend(0::BIGINT, used),
                           (a, b) -> a + b)::BIGINT AS byte_sum,
               array_to_string(
                   list_transform(range(0, 16),
                                  b -> len(list_filter(used, c -> c // 16 = b))
                                       + CASE WHEN b = 0 THEN pad ELSE 0 END),
                   '|') AS hist
        FROM x ORDER BY doc_id
    """,
}


# --- similarity search (operators/similarity.py) ----------------------------
# Hyperplane weights are embedded as the SAME double literals Spark uses
# (repr round-trips exactly), and all dots/norms are sequential folds, so
# even the approximate-NN pipeline is value-checked.

from uw_hadoop_aglorithms_spark.operators.similarity import (
    ANN_MAX_QUERIES,
    IVF_CENTROID_MOD,
    IVF_NLIST,
    IVF_NPROBE,
    PQ_CB_MOD,
    PQ_K,
    PQ_M,
    PQ_SHORTLIST as _PQ_SHORTLIST,
    PQ_SUBDIM,
    PROBE_MASKS,
    QUERY_STRIDE,
    TOP_K,
    hyperplanes,
)

#: Bounded query set — mirrors similarity._is_query exactly (the cap is
#: inactive at fixture scale, so results match the uncapped form there).
_IS_QUERY = (
    f"vec_id % {QUERY_STRIDE} = 0 AND vec_id < {QUERY_STRIDE * ANN_MAX_QUERIES}"
)

_NORMED_CTE = f"""
    e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt({_fold_sum('list_transform(embedding::DOUBLE[], x -> x * x)')})
                 AS nrm
        FROM embeddings
    )
"""

_COS_QC = _fold_sum("list_transform(range(len(q.v)), i -> q.v[i + 1] * c.v[i + 1])")


def sql_double(x: float) -> str:
    """Embed a Python double in DuckDB SQL BIT-EXACTLY as m·2^e.

    DuckDB parses a decimal literal into DECIMAL first and the
    DECIMAL→DOUBLE cast double-rounds once the scaled integer exceeds
    2^53 — i.e. any value whose repr needs 17 significant digits can
    come back 1 ulp off (measured: 25 of the 256 hyperplane
    coordinates; found by the dyadic-quantizer property test). The
    integer-mantissa × power-of-two form has no decimal step: the
    mantissa < 2^53 casts exactly and pow(2, e) is an exact power."""
    import math as _math

    if x == 0.0:
        # preserve the zero's sign: DuckDB parses -0.0 to +0.0
        if _math.copysign(1.0, x) < 0:
            return "(0.0::DOUBLE * -1.0::DOUBLE)"
        return "0.0::DOUBLE"
    m, e = _math.frexp(x)
    mi, e53 = int(m * (1 << 53)), e - 53
    if e53 >= -1022:
        return f"({mi}::DOUBLE * pow(2.0::DOUBLE, {e53}::DOUBLE))"
    # subnormal target: a single pow would underflow — scale in two
    # exact steps (the intermediate stays normal; the final product is
    # exactly representable, so its rounding is exact too)
    return (
        f"({mi}::DOUBLE * pow(2.0::DOUBLE, -1022::DOUBLE)"
        f" * pow(2.0::DOUBLE, {e53 + 1022}::DOUBLE))"
    )


def _bucket_sql(vcol: str) -> str:
    terms = []
    for p, plane in enumerate(hyperplanes()):
        lit = "[" + ", ".join(sql_double(x) for x in plane) + "]::DOUBLE[]"
        dot = _fold_sum(f"list_transform(range(len({vcol})), i -> {vcol}[i + 1] * ({lit})[i + 1])")
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


def _ann_brute_sql() -> str:
    return f"""
    WITH {_NORMED_CTE},
    q AS (SELECT * FROM e WHERE {_IS_QUERY}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_COS_QC} / (q.nrm * c.nrm) AS cosine
        FROM q JOIN e c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM ranked WHERE "rank" <= {TOP_K}
    ORDER BY query_id, "rank"
    """


def _ann_lsh_sql() -> str:
    masks = ", ".join(str(m) for m in PROBE_MASKS)
    return f"""
    WITH {_NORMED_CTE},
    eb AS (SELECT *, ({_bucket_sql('v')}) AS bucket FROM e),
    q AS (
        SELECT vec_id, v, nrm, xor(bucket, mask) AS probe
        FROM eb, unnest([{masks}]) AS t(mask)
        WHERE {_IS_QUERY}
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_COS_QC} / (q.nrm * c.nrm) AS cosine
        FROM q JOIN eb c ON q.probe = c.bucket AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM ranked WHERE "rank" <= {TOP_K}
    ORDER BY query_id, "rank"
    """


def _ann_ivf_sql() -> str:
    """IVF: centroid set derived relationally (same ids/values as the
    Spark side's collected codebook); assignment and probing use the
    same (cosine DESC, idx ASC) ordering as the engine's struct-max."""
    dot_ec = _fold_sum(
        "list_transform(range(len(e.v)), i -> e.v[i + 1] * cents.v[i + 1])"
    )
    return f"""
    WITH {_NORMED_CTE},
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v, nrm
        FROM e
        WHERE vec_id % {IVF_CENTROID_MOD} = 0
          AND vec_id < {IVF_CENTROID_MOD * IVF_NLIST}
    ),
    ass AS (
        SELECT e.vec_id, cents.cidx,
               {dot_ec} / (e.nrm * cents.nrm) AS cos
        FROM e, cents
    ),
    ranked_ass AS (
        SELECT vec_id, cidx, row_number() OVER (
            PARTITION BY vec_id ORDER BY cos DESC, cidx) AS rn
        FROM ass
    ),
    cellof AS (SELECT vec_id, cidx AS cell FROM ranked_ass WHERE rn = 1),
    probes AS (
        SELECT vec_id, cidx AS probe FROM ranked_ass
        WHERE rn <= {IVF_NPROBE} AND {_IS_QUERY}
    ),
    q AS (
        SELECT e.vec_id, e.v, e.nrm, probes.probe
        FROM e JOIN probes USING (vec_id)
    ),
    cc AS (SELECT e.*, cellof.cell FROM e JOIN cellof USING (vec_id)),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_COS_QC} / (q.nrm * c.nrm) AS cosine
        FROM q JOIN cc c ON q.probe = c.cell AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM ranked WHERE "rank" <= {TOP_K}
    ORDER BY query_id, "rank"
    """


def _ann_ivf_filtered_sql() -> str:
    """Filtered IVF (similarity.ann_ivf_filtered_topk): the IVF replay
    with the query's label composed into the candidate join — the
    pre-filter strategy, mirrored predicate-for-predicate."""
    dot_ec = _fold_sum(
        "list_transform(range(len(e.v)), i -> e.v[i + 1] * cents.v[i + 1])"
    )
    return f"""
    WITH {_NORMED_CTE},
    lab AS (SELECT vec_id, label FROM embeddings),
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v, nrm
        FROM e
        WHERE vec_id % {IVF_CENTROID_MOD} = 0
          AND vec_id < {IVF_CENTROID_MOD * IVF_NLIST}
    ),
    ass AS (
        SELECT e.vec_id, cents.cidx,
               {dot_ec} / (e.nrm * cents.nrm) AS cos
        FROM e, cents
    ),
    ranked_ass AS (
        SELECT vec_id, cidx, row_number() OVER (
            PARTITION BY vec_id ORDER BY cos DESC, cidx) AS rn
        FROM ass
    ),
    cellof AS (SELECT vec_id, cidx AS cell FROM ranked_ass WHERE rn = 1),
    probes AS (
        SELECT vec_id, cidx AS probe FROM ranked_ass
        WHERE rn <= {IVF_NPROBE} AND {_IS_QUERY}
    ),
    q AS (
        SELECT e.vec_id, lab.label, e.v, e.nrm, probes.probe
        FROM e JOIN probes USING (vec_id) JOIN lab USING (vec_id)
    ),
    cc AS (
        SELECT e.*, lab.label, cellof.cell
        FROM e JOIN cellof USING (vec_id) JOIN lab USING (vec_id)
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_COS_QC} / (q.nrm * c.nrm) AS cosine
        FROM q JOIN cc c
          ON q.probe = c.cell AND q.label = c.label
         AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM ranked WHERE "rank" <= {TOP_K}
    ORDER BY query_id, "rank"
    """


def _ann_pq_sql() -> str:
    """PQ-ADC: codebook derived relationally (same ids/values as the
    Spark side's collected literals); every cross-subspace combination
    is an ORDERED left fold (list(x ORDER BY m) → list_reduce from 0.0)
    mirroring the engine's explicit m-ascending expression chain."""
    sd = PQ_SUBDIM

    def subfold(expr: str) -> str:
        return (
            "list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range({sd}), i -> {expr})), (a, x) -> a + x)"
        )

    d2 = subfold(
        f"(e.v[t.m*{sd} + i + 1] - cb.v[t.m*{sd} + i + 1])"
        f" * (e.v[t.m*{sd} + i + 1] - cb.v[t.m*{sd} + i + 1])"
    )
    n2 = subfold(f"cb.v[b.m*{sd} + i + 1] * cb.v[b.m*{sd} + i + 1]")
    dm = subfold(f"q.v[b.m*{sd} + i + 1] * cb.v[b.m*{sd} + i + 1]")
    mfold = "list_reduce(list_prepend(0.0::DOUBLE, list({x} ORDER BY m)), (a, x) -> a + x)"
    return f"""
    WITH {_NORMED_CTE},
    cb AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v
        FROM e WHERE vec_id % {PQ_CB_MOD} = 0 AND vec_id < {PQ_CB_MOD * PQ_K}
    ),
    ass AS (
        SELECT e.vec_id, t.m, cb.k, {d2} AS d2
        FROM e, unnest(range({PQ_M})) AS t(m), cb
    ),
    best AS (
        SELECT vec_id, m, k FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id, m ORDER BY d2, k) AS rn
            FROM ass) WHERE rn = 1
    ),
    n2t AS (
        SELECT b.vec_id, b.m, {n2} AS n2
        FROM best b JOIN cb ON cb.k = b.k
    ),
    recon AS (
        SELECT vec_id, {mfold.format(x='n2')} AS recon2
        FROM n2t GROUP BY vec_id
    ),
    qd AS (SELECT vec_id, v, nrm FROM e WHERE {_IS_QUERY}),
    dots AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, b.m, {dm} AS dm
        FROM qd q, best b JOIN cb ON cb.k = b.k
        WHERE q.vec_id <> b.vec_id
    ),
    adcs AS (
        SELECT query_id, neighbor_id, {mfold.format(x='dm')} AS adc
        FROM dots GROUP BY query_id, neighbor_id
    ),
    adc_scored AS (
        SELECT a.query_id, a.neighbor_id,
               a.adc / (q.nrm * sqrt(r.recon2)) AS adc_cos
        FROM adcs a
        JOIN qd q ON q.vec_id = a.query_id
        JOIN recon r ON r.vec_id = a.neighbor_id
    ),
    shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY adc_cos DESC, neighbor_id) AS arank
            FROM adc_scored) WHERE arank <= {_PQ_SHORTLIST}
    ),
    scored AS (
        SELECT s.query_id, s.neighbor_id,
               {_fold_sum("list_transform(range(len(q.v)), i -> q.v[i + 1] * c.v[i + 1])")}
                 / (q.nrm * c.nrm) AS cosine
        FROM shortlist s
        JOIN e q ON q.vec_id = s.query_id
        JOIN e c ON c.vec_id = s.neighbor_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM ranked WHERE "rank" <= {TOP_K}
    ORDER BY query_id, "rank"
    """


def _ann_ivfpq_sql() -> str:
    """IVF-ADC (the persisted vector-lake layout): the IVF oracle's
    cell/probe CTEs restrict which (query, neighbor) pairs exist, the
    PQ oracle's code/ADC CTEs score them in the compressed domain, the
    shortlist reranks exactly. Both quantizers derive relationally
    with the same ids/values the engine freezes into its catalog
    tables at save time."""
    sd = PQ_SUBDIM

    def subfold(expr: str) -> str:
        return (
            "list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range({sd}), i -> {expr})), (a, x) -> a + x)"
        )

    d2 = subfold(
        f"(e.v[t.m*{sd} + i + 1] - cb.v[t.m*{sd} + i + 1])"
        f" * (e.v[t.m*{sd} + i + 1] - cb.v[t.m*{sd} + i + 1])"
    )
    n2 = subfold(f"cb.v[b.m*{sd} + i + 1] * cb.v[b.m*{sd} + i + 1]")
    dm = subfold(f"q.v[b.m*{sd} + i + 1] * cb.v[b.m*{sd} + i + 1]")
    mfold = "list_reduce(list_prepend(0.0::DOUBLE, list({x} ORDER BY m)), (a, x) -> a + x)"
    dot_ec = _fold_sum(
        "list_transform(range(len(e.v)), i -> e.v[i + 1] * cents.v[i + 1])"
    )
    return f"""
    WITH {_NORMED_CTE},
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v, nrm
        FROM e
        WHERE vec_id % {IVF_CENTROID_MOD} = 0
          AND vec_id < {IVF_CENTROID_MOD * IVF_NLIST}
    ),
    ass_ivf AS (
        SELECT e.vec_id, cents.cidx,
               {dot_ec} / (e.nrm * cents.nrm) AS cos
        FROM e, cents
    ),
    ranked_ass AS (
        SELECT vec_id, cidx, row_number() OVER (
            PARTITION BY vec_id ORDER BY cos DESC, cidx) AS rn
        FROM ass_ivf
    ),
    cellof AS (SELECT vec_id, cidx AS cell FROM ranked_ass WHERE rn = 1),
    probes AS (
        SELECT vec_id, cidx AS probe FROM ranked_ass
        WHERE rn <= {IVF_NPROBE} AND {_IS_QUERY}
    ),
    cb AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v
        FROM e WHERE vec_id % {PQ_CB_MOD} = 0 AND vec_id < {PQ_CB_MOD * PQ_K}
    ),
    ass AS (
        SELECT e.vec_id, t.m, cb.k, {d2} AS d2
        FROM e, unnest(range({PQ_M})) AS t(m), cb
    ),
    best AS (
        SELECT vec_id, m, k FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id, m ORDER BY d2, k) AS rn
            FROM ass) WHERE rn = 1
    ),
    n2t AS (
        SELECT b.vec_id, b.m, {n2} AS n2
        FROM best b JOIN cb ON cb.k = b.k
    ),
    recon AS (
        SELECT vec_id, {mfold.format(x='n2')} AS recon2
        FROM n2t GROUP BY vec_id
    ),
    qd AS (SELECT vec_id, v, nrm FROM e WHERE {_IS_QUERY}),
    cand AS (
        SELECT p.vec_id AS query_id, co.vec_id AS neighbor_id
        FROM probes p JOIN cellof co ON co.cell = p.probe
        WHERE p.vec_id <> co.vec_id
    ),
    dots AS (
        SELECT ca.query_id, ca.neighbor_id, b.m, {dm} AS dm
        FROM cand ca
        JOIN qd q ON q.vec_id = ca.query_id
        JOIN best b ON b.vec_id = ca.neighbor_id
        JOIN cb ON cb.k = b.k
    ),
    adcs AS (
        SELECT query_id, neighbor_id, {mfold.format(x='dm')} AS adc
        FROM dots GROUP BY query_id, neighbor_id
    ),
    adc_scored AS (
        SELECT a.query_id, a.neighbor_id,
               a.adc / (q.nrm * sqrt(r.recon2)) AS adc_cos
        FROM adcs a
        JOIN qd q ON q.vec_id = a.query_id
        JOIN recon r ON r.vec_id = a.neighbor_id
    ),
    shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY adc_cos DESC, neighbor_id) AS arank
            FROM adc_scored) WHERE arank <= {_PQ_SHORTLIST}
    ),
    scored AS (
        SELECT s.query_id, s.neighbor_id,
               {_fold_sum("list_transform(range(len(q.v)), i -> q.v[i + 1] * c.v[i + 1])")}
                 / (q.nrm * c.nrm) AS cosine
        FROM shortlist s
        JOIN e q ON q.vec_id = s.query_id
        JOIN e c ON c.vec_id = s.neighbor_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM ranked WHERE "rank" <= {TOP_K}
    ORDER BY query_id, "rank"
    """


SIMILARITY_ORACLES: dict[str, str] = {
    "ann_brute_topk": _ann_brute_sql(),
    "ann_lsh_topk": _ann_lsh_sql(),
    "ann_ivf_topk": _ann_ivf_sql(),
    "ann_ivf_filtered_topk": _ann_ivf_filtered_sql(),
    "ann_pq_topk": _ann_pq_sql(),
    "ann_ivfpq_topk": _ann_ivfpq_sql(),
    # mirrors operators/similarity.embed_quantize: floor(z+0.5) coding,
    # sequential error folds, 255e0/0e0 literals pin DOUBLE
    "embed_quantize": """
        WITH b AS (
            SELECT vec_id, embedding,
                   CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS vmin,
                   CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS vmax
            FROM embeddings
        ),
        s AS (
            SELECT vec_id, embedding, vmin, vmax,
                   (vmax - vmin) / 255e0 AS scale
            FROM b
        ),
        q AS (
            SELECT vec_id, embedding, vmin, vmax, scale,
                   list_transform(embedding, e -> CASE WHEN scale > 0
                       THEN CAST(floor((CAST(e AS DOUBLE) - vmin) / scale
                                       + 0.5e0) AS INT)
                       ELSE 0 END) AS codes
            FROM s
        ),
        e AS (
            SELECT vec_id, vmin, vmax, scale, codes, len(embedding) AS dim,
                   list_transform(range(1, len(embedding) + 1),
                       i -> (CAST(embedding[i] AS DOUBLE)
                             - (vmin + CAST(codes[i] AS DOUBLE) * scale))
                            * (CAST(embedding[i] AS DOUBLE)
                               - (vmin + CAST(codes[i] AS DOUBLE) * scale)))
                     AS err2,
                   list_transform(range(1, len(embedding) + 1),
                       i -> abs(CAST(embedding[i] AS DOUBLE)
                                - (vmin + CAST(codes[i] AS DOUBLE) * scale)))
                     AS errabs
            FROM q
        )
        SELECT vec_id,
               round(vmin, 9) + 0.0 AS vmin, round(vmax, 9) + 0.0 AS vmax,
               round(scale, 9) AS scale,
               array_to_string(list_transform(codes, c -> CAST(c AS VARCHAR)),
                               '|') AS codes,
               round(list_reduce(list_prepend(0e0, err2), (a, x) -> a + x)
                     / dim, 12) AS mse,
               round(list_aggregate(errabs, 'max'), 12) AS max_abs_err
        FROM e ORDER BY vec_id
    """,
}


# --- text analysis (operators/textstats.py) ---------------------------------

from uw_hadoop_aglorithms_spark.functions.text import TOKENS_SQL
from uw_hadoop_aglorithms_spark.operators.textstats import (
    BPE_PATTERN,
    FP_K,
    FP_W,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORD_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_FRAC,
    GOPHER_MIN_STOP_HITS,
    GOPHER_MIN_WORD_LEN,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
    LANG_NGRAM,
    LEN_SATURATION,
    LM_LOG_Q,
    LM_OUT_Q,
    PROFILE_K,
    REP_DUP_MAX,
    REP_TOP_MAX,
    STOPWORDS,
    TRAIN_MOD,
    W_DIV,
    W_LEN,
    W_STOP,
)

_STOP_LIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
_GOPHER_STOP_LIST = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"

_CHAR_NGRAMS_SQL = (
    f"list_transform(range(1, greatest(length(text) - {LANG_NGRAM - 1}, 0) + 1),"
    f" i -> substr(text, i, {LANG_NGRAM}))"
)

TEXTSTATS_ORACLES: dict[str, str] = {
    "doc_stats": f"""
        WITH t AS (SELECT doc_id, text, {TOKENS_SQL} AS ts FROM documents)
        SELECT doc_id,
               length(text) AS n_chars_obs,
               len(string_split(text, ' ')) AS n_ws_tokens,
               len(ts) AS n_re_tokens,
               len(regexp_extract_all(lower(text), '{BPE_PATTERN}'))
                 AS n_bpe_tokens,
               len(list_distinct(ts)) AS n_distinct_tokens,
               list_reduce(list_prepend(0, list_transform(ts, t -> length(t))),
                           (acc, x) -> acc + x) / len(ts) AS avg_token_len
        FROM t ORDER BY doc_id
    """,
    "quality_score": f"""
        WITH t AS (SELECT doc_id, {TOKENS_SQL} AS ts FROM documents),
        m AS (
            SELECT doc_id,
                   len(list_filter(ts, t -> list_contains({_STOP_LIST}, t)))
                     / len(ts) AS stopword_ratio,
                   len(list_distinct(ts)) / len(ts) AS unique_ratio,
                   least(len(ts) / {LEN_SATURATION}, 1.0) AS length_score
            FROM t
        )
        SELECT doc_id, stopword_ratio, unique_ratio, length_score,
               {W_LEN} * length_score + {W_STOP} * (1.0 - stopword_ratio)
                 + {W_DIV} * unique_ratio AS quality
        FROM m ORDER BY doc_id
    """,
    # Gopher/MassiveWeb rule gate (textstats.gopher_rules): every
    # division mirrors the Spark plan operand-for-operand (int sums /
    # int counts -> double), so the measurements hash bit-identically
    "gopher_rules": f"""
        WITH t AS (SELECT doc_id, text, {TOKENS_SQL} AS ts FROM documents),
        m AS (
            SELECT doc_id,
                   len(ts) AS gp_n_words,
                   list_reduce(list_prepend(0, list_transform(ts, t -> length(t))),
                               (a, x) -> a + x) / len(ts) AS gp_mean_word_len,
                   ((length(text) - length(replace(text, '#', '')))
                    + (length(text) - length(replace(text, '...', ''))) / 3)
                     / len(ts) AS gp_symbol_ratio,
                   len(list_filter(ts, t -> regexp_matches(t, '[a-z]')))
                     / len(ts) AS gp_alpha_frac,
                   len(list_intersect(list_distinct(ts), {_GOPHER_STOP_LIST}))
                     AS gp_stop_hits
            FROM t
        )
        SELECT doc_id, CAST(gp_n_words AS BIGINT) AS gp_n_words,
               gp_mean_word_len, gp_symbol_ratio, gp_alpha_frac,
               CAST(gp_stop_hits AS BIGINT) AS gp_stop_hits,
               (gp_n_words >= {GOPHER_MIN_WORDS}
                AND gp_n_words <= {GOPHER_MAX_WORDS}
                AND gp_mean_word_len >= {GOPHER_MIN_WORD_LEN}
                AND gp_mean_word_len <= {GOPHER_MAX_WORD_LEN}
                AND gp_symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
                AND gp_alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
                AND gp_stop_hits >= {GOPHER_MIN_STOP_HITS}) AS gp_pass
        FROM m ORDER BY doc_id
    """,
    # same intlog/LM_OUT_Q contract as the Spark plan (round 8): per-term
    # log units k = ilog2_units(c+1) via the shared EXACT INTEGER
    # shift-and-square chain — zero query-time ln() in either engine,
    # so no libm version can flip a value (VERDICT r7 §What's wrong 1).
    # The per-doc sum is exact BIGINT; mean and the 2^-20 quantizer are
    # the identical correctly-rounded IEEE steps, operand-for-operand —
    # see textstats.LM_LOG_Q contract note
    "lm_score": f"""
        WITH t AS (SELECT doc_id, {TOKENS_SQL} AS ts FROM documents),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest(ts) AS term FROM t)
            GROUP BY doc_id, term
        ),
        tc AS (
            SELECT term, sum(tf) AS c FROM tf
            WHERE doc_id % {TRAIN_MOD} = 0 GROUP BY term
        ),
        tck AS ({intlog.ilog2_oracle_sql(
            "SELECT term, c FROM tc", "c + 1", "k")}),
        sc AS ({intlog.ilog2_oracle_sql(
            "SELECT sum(c) AS n_train, count(*) AS v FROM tc",
            "n_train + v + 1", "k_max")}),
        agg AS (
            SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
                   sum(CASE WHEN c IS NULL THEN tf ELSE 0 END) AS n_oov,
                   CAST(sum(tf * coalesce(k, 0)) AS BIGINT) AS s
            FROM tf LEFT JOIN tck USING (term) GROUP BY doc_id
        )
        SELECT doc_id, CAST(n_oov AS BIGINT) AS n_oov,
               floor((((s - n_tok * k_max) / n_tok) / {float(LM_LOG_Q)})
                     * {LM_OUT_Q} + 0.5) / {float(LM_OUT_Q)}
                 AS avg_logprob
        FROM agg, sc ORDER BY doc_id
    """,
    "lang_id": f"""
        WITH d AS (SELECT doc_id, lang, {_CHAR_NGRAMS_SQL} AS grams FROM documents),
        tr AS (SELECT lang, unnest(grams) AS g FROM d WHERE doc_id % {TRAIN_MOD} = 0),
        gc AS (SELECT lang, g, count(*) AS cnt FROM tr GROUP BY lang, g),
        prof AS (
            SELECT lang, g FROM (
                SELECT lang, g, row_number() OVER (
                    PARTITION BY lang ORDER BY cnt DESC, g) AS rk FROM gc)
            WHERE rk <= {PROFILE_K}
        ),
        te AS (SELECT doc_id, unnest(grams) AS g FROM d WHERE doc_id % {TRAIN_MOD} <> 0),
        hits AS (
            SELECT te.doc_id, prof.lang AS cand_lang, count(*) AS score
            FROM te JOIN prof ON te.g = prof.g
            GROUP BY te.doc_id, prof.lang
        ),
        pred AS (
            SELECT doc_id, cand_lang AS pred_lang FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rk
                FROM hits)
            WHERE rk = 1
        )
        SELECT d.doc_id,
               coalesce(pred_lang, 'unknown') AS pred_lang,
               d.lang AS actual_lang,
               (coalesce(pred_lang, '?') = d.lang) AS correct
        FROM d LEFT JOIN pred USING (doc_id)
        WHERE d.doc_id % {TRAIN_MOD} <> 0
        ORDER BY doc_id
    """,
    "doc_fingerprint": f"""
        WITH kh AS (
            SELECT doc_id,
                   list_transform(
                       range(1, greatest(length(text) - {FP_K - 1}, 0) + 1),
                       i -> {polyhash_sql(f'substr(text, i, {FP_K})')}) AS khs
            FROM documents
        ),
        wm AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(khs) - {FP_W - 1}, 0) + 1),
                       j -> list_min(khs[j:j + {FP_W - 1}]))) AS fps
            FROM kh
        )
        SELECT doc_id, unnest(fps) AS fp FROM wm ORDER BY doc_id, fp
    """,
    # Spark's exact `percentile` == DuckDB `quantile_cont` (rank q·(n−1),
    # linear interpolation); stddev from exact integer Σx/Σx² so no
    # float-accumulation drift; the same (s2 − s·s/n)/(n−1) op order
    "length_percentiles": """
        SELECT lang, count(*) AS n_docs,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars,
               round(CAST(sum(n_chars) AS BIGINT) / count(*), 9) AS avg_chars,
               round(quantile_cont(n_chars, 0.5), 9) AS p50,
               round(quantile_cont(n_chars, 0.9), 9) AS p90,
               round(quantile_cont(n_chars, 0.99), 9) AS p99,
               round(sqrt((CAST(sum(n_chars * n_chars) AS BIGINT)
                           - CAST(sum(n_chars) AS BIGINT)
                             * CAST(sum(n_chars) AS BIGINT) / count(*))
                          / (count(*) - 1)), 9) AS stddev_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    # same two-branch shape as the Spark plan: map-side trigram distinct,
    # grouped bigram counts, left join on doc_id; 0e0 pins DOUBLE (plain
    # decimal literals parse as DECIMAL in DuckDB)
    "repetition_score": f"""
        WITH t AS (SELECT doc_id, {TOKENS_SQL} AS ts FROM documents),
        b AS (
            SELECT doc_id, len(ts) AS n_tokens,
                   list_transform(range(1, greatest(len(ts) - 1, 0) + 1),
                                  i -> ts[i] || ' ' || ts[i + 1]) AS bg,
                   list_transform(range(1, greatest(len(ts) - 2, 0) + 1),
                                  i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]) AS tg
            FROM t
        ),
        cnt AS (
            SELECT doc_id, g, count(*) AS c
            FROM (SELECT doc_id, unnest(bg) AS g FROM b)
            GROUP BY doc_id, g
        ),
        bi AS (
            SELECT doc_id, sum(c) AS n_bg, count(*) AS n_bg_d, max(c) AS top_c
            FROM cnt GROUP BY doc_id
        ),
        m AS (
            SELECT b.doc_id, n_tokens,
                   CASE WHEN coalesce(n_bg, 0) > 0
                        THEN (n_bg - n_bg_d) / n_bg ELSE 0e0 END
                     AS dup_bigram_frac,
                   CASE WHEN len(tg) > 0
                        THEN (len(tg) - len(list_distinct(tg))) / len(tg)
                        ELSE 0e0 END AS dup_trigram_frac,
                   CASE WHEN coalesce(n_bg, 0) > 0
                        THEN top_c / n_bg ELSE 0e0 END AS top_bigram_frac
            FROM b LEFT JOIN bi USING (doc_id)
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               dup_bigram_frac, dup_trigram_frac, top_bigram_frac,
               (dup_bigram_frac > {REP_DUP_MAX}e0
                OR top_bigram_frac > {REP_TOP_MAX}e0) AS is_repetitive
        FROM m ORDER BY doc_id
    """,
    # idf in engine-neutral ilog2 units (round 8): tfidf = tf·(k_N −
    # k_df)/2^30 — exact BIGINT units, one exact dyadic division, no
    # query-time ln() (the Spark side computes k_N with the identical
    # integer algorithm in Python — intlog.ilog2_py)
    "tfidf_top_terms": f"""
        WITH t AS (SELECT doc_id, unnest({TOKENS_SQL}) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        dfq AS ({intlog.ilog2_oracle_sql(
            "SELECT term, count(*) AS df FROM tf GROUP BY term",
            "df", "k_df")}),
        nk AS ({intlog.ilog2_oracle_sql(
            "SELECT count(*) AS n FROM documents", "n", "k_n")}),
        s AS (
            SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                   CAST(tf.tf * (nk.k_n - dfq.k_df) AS DOUBLE)
                     / {float(1 << 30)} AS tfidf
            FROM tf JOIN dfq USING (term) CROSS JOIN nk
        ),
        r AS (SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY tfidf DESC, term) AS pos
              FROM s)
        SELECT doc_id, pos, term, tf, df, tfidf FROM r
        WHERE pos <= 3 ORDER BY doc_id, pos
    """,
}


# --- curation composition (operators/pipeline.py corpus_curation) -----------
# Filled AFTER the canonical_per_cluster oracle exists (below): the live
# SQL composes the exact_dedup, canonical, and quality oracles — one
# definition each, so the "bit-identical doubles" threshold contract
# cannot drift between copies.

from uw_hadoop_aglorithms_spark.operators.pipeline import CURATION_MIN_QUALITY

CURATION_ORACLES: dict[str, str] = {}


# Registered here (after TEXTSTATS_ORACLES exists — the winnow oracle
# composes the doc_fingerprint CTE); both ride the neardup suite key.
DEDUP_ORACLES["winnow_dup_pairs"] = _winnow_pairs_sql()
DEDUP_ORACLES["span_dedup"] = _span_dedup_sql()
DEDUP_ORACLES["semantic_dedup_pairs"] = _semantic_dedup_sql()
DEDUP_ORACLES["semantic_dedup_scaled"] = _semantic_dedup_scaled_sql()
# canonical selection (dedup.canonical_per_cluster): the reachability
# closure joined with the quality oracle; keep = argmax quality per
# cluster, ties toward min doc_id — replayed as the identical window
DEDUP_ORACLES["canonical_per_cluster"] = f"""
    WITH cl AS ({DEDUP_ORACLES["dedup_clusters"]}),
    q AS ({TEXTSTATS_ORACLES["quality_score"]})
    SELECT cl.doc_id, cl.cluster_id, q.quality,
           (row_number() OVER (PARTITION BY cl.cluster_id
                               ORDER BY q.quality DESC, cl.doc_id) = 1) AS keep
    FROM cl JOIN q USING (doc_id)
    ORDER BY cl.doc_id
"""

# corpus_curation composes the FULL dedup stack (round 6) from the
# component oracles — exact_dedup survivors, canonical keep=FALSE
# drops, quality threshold — defined here because the canonical oracle
# must exist first.
CURATION_ORACLES["corpus_curation"] = f"""
    WITH q AS (
        SELECT doc_id, quality FROM ({TEXTSTATS_ORACLES["quality_score"]})
    ),
    surv AS (
        SELECT doc_id FROM ({DEDUP_ORACLES["exact_dedup"]})
    ),
    nd_drop AS (
        SELECT doc_id FROM ({DEDUP_ORACLES["canonical_per_cluster"]})
        WHERE NOT keep
    ),
    gr AS (
        SELECT doc_id FROM ({TEXTSTATS_ORACLES["gopher_rules"]})
        WHERE gp_pass
    )
    SELECT d.lang, d.source, count(*) AS n_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CAST(floor(q.quality * 1073741824 + 0.5) AS BIGINT))
                AS DOUBLE) / 1073741824.0 / count(*) AS avg_quality
    FROM documents d JOIN surv USING (doc_id) JOIN q USING (doc_id)
         JOIN gr USING (doc_id)
    WHERE d.doc_id NOT IN (SELECT doc_id FROM nd_drop)
      AND q.quality >= {CURATION_MIN_QUALITY}
    GROUP BY d.lang, d.source
    ORDER BY d.lang, d.source
"""


def all_oracles() -> dict[str, str]:
    """Merged oracle map across operator families (driver contract).

    Keys subsumed by a consolidated suite (operators/suites.py) are
    removed and replaced by the suite's composed oracle, so the map stays
    exactly the driver registry's key set. The per-variant oracles remain
    in the family dicts — the suites compose them, and unit tests may use
    them directly.
    """
    from uw_hadoop_aglorithms_spark.operators.pipeline import PIPELINE_ORACLES

    from uw_hadoop_aglorithms_spark.operators.cluster import CLUSTER_ORACLES
    from uw_hadoop_aglorithms_spark.operators.graphstats import GRAPHSTATS_ORACLES
    from uw_hadoop_aglorithms_spark.operators.sketches import SKETCH_ORACLES
    from uw_hadoop_aglorithms_spark.operators.suites import SUBSUMED, SUITE_ORACLES

    merged: dict[str, str] = {}
    merged.update(SKETCH_ORACLES)
    merged.update(CLUSTER_ORACLES)
    merged.update(RELATIONAL_ORACLES)
    merged.update(GRAPHSTATS_ORACLES)
    merged.update(PIPELINE_ORACLES)
    merged.update(TEXT_ORACLES)
    merged.update(INDEX_ORACLES)
    merged.update(STREAMING_ORACLES)
    merged.update(DEDUP_ORACLES)
    merged.update(SIMILARITY_ORACLES)
    merged.update(TEXTSTATS_ORACLES)
    merged.update(MULTIMODAL_ORACLES)
    merged.update(TEMPORAL_ORACLES)
    merged.update(CURATION_ORACLES)
    for key in SUBSUMED:
        merged.pop(key, None)
    merged.update(SUITE_ORACLES)
    # round 6: the registered dedup_clusters key carries canonical
    # selection on top of the closure (dedup.canonical_per_cluster);
    # the bare-closure oracle stays addressable for unit tests
    merged["dedup_clusters"] = merged.pop("canonical_per_cluster")
    return merged
