"""Content-class reduction of the pair-producing dedup oracles
(round 11, VERDICT r10 §Next 1; oracles._DCLS_CTE).

The class-reduced forms must be EXACTLY equivalent to the pre-round-11
per-doc quadratic forms on any input — the reduction is what lets the
full neardup oracle run at the sf1 twin replica inside the sandbox
instead of spilling >79 GB. The fixtures here are adversarial on
purpose, covering every branch the reduction adds:

- a 200-twin class firing BAND_BUCKET_CAP (the oracle's occupancy gate
  must weight classes by size — firing for ALL of the class's band
  rows, so the class emits no MinHash candidates, while the uncapped
  ngram leg still emits all C(200,2) twin pairs);
- a 24-twin class over the winnow df cap (its fingerprints are
  non-rare, so winnow emits no self-pairs for it) and a 10-twin class
  under every cap (self-pairs emitted with the exact per-doc scores);
- singleton classes (must expand to nothing with themselves);
- empty-text and single-token classes (gram-less: absent everywhere,
  as per-doc gram-less rows were);
- a genuine near-dup pair across two classes (cross-class expansion);
- duplicate embedding vectors incl. an all-zero pair (twin cosine is
  dot(v,v)/(sqrt(S)·sqrt(S)) — ulp-exact, and the 0/0 NaN case must
  behave identically in both forms).

The naive references below are the pre-round-11 oracle tails verbatim
(pure per-doc SQL, no class machinery) over the de-reduced feature CTEs
— the frozen semantic spec the reduction is checked against. Reference
capability anchor: the dedup family is the brief's first-listed
LLM-pipeline operator family.
"""

from __future__ import annotations

import duckdb
import pytest

from uw_hadoop_aglorithms_spark import oracles as O
from uw_hadoop_aglorithms_spark.operators.dedup import (
    BAND_BUCKET_CAP,
    BANDS,
    COSINE_THRESHOLD,
    HAMMING_MAX,
    JACCARD_THRESHOLD,
    NUM_PERMS,
    ROWS_PER_BAND,
    SIMHASH_MEMBER,
    SIMHASH_MEMBER_HI,
    WINNOW_DF_FRAC,
    WINNOW_MAX_DF,
    WINNOW_MIN_SHARED,
)
from uw_hadoop_aglorithms_spark.functions.hashing import uhash_sql
from tools.canon import lines_of, vhash

#: per-doc (de-reduced) feature CTEs: the class forms read `cdocs`
_GRAMS_DOC = O._GRAMS_CTE.replace("FROM cdocs", "FROM documents")


def _naive_minhash() -> str:
    """Pre-round-11 minhash_lsh_dedup verbatim (per-doc bands, count(*)
    bucket occupancy, doc-id pair join)."""
    sig_cols = ",\n".join(
        f"min({uhash_sql('ph', i)}) AS s{i}" for i in range(NUM_PERMS)
    )
    band_selects = "\n UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_no, s{b * ROWS_PER_BAND} AS h1, "
        f"s{b * ROWS_PER_BAND + 1} AS h2 FROM sigs"
        for b in range(BANDS)
    )
    return f"""
    WITH {_GRAMS_DOC}, {O._HASHED_CTE},
    sigs AS (SELECT doc_id, {sig_cols} FROM hashed GROUP BY doc_id),
    bands AS ({band_selects}),
    bands_capped AS (
        SELECT doc_id, band_no, h1, h2
        FROM (SELECT *, count(*) OVER (PARTITION BY band_no, h1, h2) AS bsz
              FROM bands)
        WHERE bsz <= {BAND_BUCKET_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands_capped a JOIN bands_capped b
          ON a.band_no = b.band_no AND a.h1 = b.h1 AND a.h2 = b.h2
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           len(list_intersect(ga.gset, gb.gset))
             / (len(ga.gset) + len(gb.gset) - len(list_intersect(ga.gset, gb.gset)))
             AS jaccard
    FROM cand
    JOIN hsets ga ON ga.doc_id = doc_a
    JOIN hsets gb ON gb.doc_id = doc_b
    WHERE jaccard >= {JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """


def _naive_ngram() -> str:
    return f"""
    WITH {_GRAMS_DOC},
    sh AS (SELECT doc_id, unnest(gs) AS g FROM grams),
    sizes AS (SELECT doc_id, len(gs) AS n FROM grams),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b, i / (sa.n + sb.n - i) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """


def _naive_simhash() -> str:
    from uw_hadoop_aglorithms_spark.operators.dedup import (
        SIMHASH_BITS,
        SIMHASH_HALF,
    )

    def bit(j: int) -> str:
        col, off = ("g", j) if j < SIMHASH_HALF else ("g2", j - SIMHASH_HALF)
        return f"({col} >> {off}) & 1"

    bit_sums = ",\n".join(
        f"sum(CASE WHEN {bit(j)} = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH {_GRAMS_DOC}, {O._HASHED_CTE},
    uh AS (SELECT doc_id, {uhash_sql('ph', SIMHASH_MEMBER)} AS g,
                  {uhash_sql('ph', SIMHASH_MEMBER_HI)} AS g2 FROM hashed),
    votes AS (SELECT doc_id, {bit_sums} FROM uh GROUP BY doc_id),
    sigs AS (SELECT doc_id, ({sig})::BIGINT AS sig FROM votes)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.sig, b.sig)) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {HAMMING_MAX}
    ORDER BY doc_a, doc_b
    """


def _naive_winnow() -> str:
    from uw_hadoop_aglorithms_spark.oracles import TEXTSTATS_ORACLES

    cap = (
        f"greatest({WINNOW_MAX_DF}, floor({WINNOW_DF_FRAC!r}::DOUBLE"
        f" * (SELECT count(*) FROM documents))::BIGINT)"
    )
    return f"""
    WITH fps AS ({TEXTSTATS_ORACLES["doc_fingerprint"]}),
    rare AS (
        SELECT doc_id, fp FROM (
            SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
            FROM fps
        ) WHERE df <= {cap}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM rare a JOIN rare b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {WINNOW_MIN_SHARED}
    ORDER BY doc_a, doc_b
    """


def _naive_cosine() -> str:
    fold = O._fold_sum

    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt({fold('list_transform(embedding::DOUBLE[], x -> x * x)')})
                 AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {fold('list_transform(range(len(a.v)), i -> a.v[i + 1] * b.v[i + 1])')}
             / (a.nrm * b.nrm) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {fold('list_transform(range(len(a.v)), i -> a.v[i + 1] * b.v[i + 1])')}
             / (a.nrm * b.nrm) >= {COSINE_THRESHOLD}
    ORDER BY vec_a, vec_b
    """


def _adversarial_docs() -> list[tuple[int, str]]:
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "geese debate the merits of distributed stream processing near "
        "the old mill pond every tuesday afternoon without fail"
    )
    docs: list[tuple[int, str]] = []
    nid = 0

    def add(text: str, n: int = 1):
        nonlocal nid
        for _ in range(n):
            docs.append((nid, text))
            nid += 1

    add(base, 200)                     # fires BAND_BUCKET_CAP (200 > 128)
    add(base + " indeed", 24)          # over winnow df cap, under band cap
    # under every cap, and FULLY distinct text (no shared prefix): its
    # fingerprints are rare, so winnow emits its self-pairs — a class
    # sharing `base` would have df-heavy fps and emit nothing there
    add("colorless green ideas sleep furiously beneath the ancient "
        "lighthouse whose keeper counts migrating swallows at dusk and "
        "writes their numbers into a weathered ledger bound in sailcloth "
        "kept beside the brass telescope on the topmost spiral stair", 10)
    add(base.replace("tuesday", "thursday"))  # near-dup of the 200-class
    add("completely unrelated text about spark catalyst optimizer internals "
        "and adaptive query execution planning strategies for big data")
    add("", 2)                         # empty-text class: gram-less
    add("word", 2)                     # single-token class: gram-less
    add("two tokens", 1)               # singleton with exactly one gram
    return docs


def _adversarial_embeddings() -> list[tuple[int, list[float]]]:
    import math

    rows: list[tuple[int, list[float]]] = []
    vid = 0

    def add(v: list[float], n: int = 1):
        nonlocal vid
        for _ in range(n):
            rows.append((vid, v))
            vid += 1

    d = 8
    add([math.sin(i + 1) for i in range(d)], 4)   # 4-twin class
    add([math.cos(i + 1) for i in range(d)], 1)   # singleton
    add([math.sin(i + 1) * 1.0001 for i in range(d)], 1)  # near-dup of twin class
    add([0.0] * d, 2)                              # zero-vector pair: 0/0
    return rows


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    import pandas as pd

    docs = pd.DataFrame(_adversarial_docs(), columns=["doc_id", "text"])
    emb = pd.DataFrame(
        _adversarial_embeddings(), columns=["vec_id", "embedding"]
    )
    c.register("documents", docs)
    c.register("embeddings", emb)
    yield c
    c.close()


def _run(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


@pytest.mark.parametrize(
    "key,naive",
    [
        ("minhash_lsh_dedup", _naive_minhash),
        ("ngram_jaccard", _naive_ngram),
        ("simhash_dedup", _naive_simhash),
        ("winnow_dup_pairs", _naive_winnow),
        ("embedding_cosine_dups", _naive_cosine),
    ],
)
def test_classreduced_equals_naive(con, key, naive):
    ncols, nrows = _run(con, naive())
    ccols, crows = _run(con, O.DEDUP_ORACLES[key])
    assert sorted(ncols) == sorted(ccols)
    nl, cl = lines_of(ncols, nrows), lines_of(ccols, crows)
    assert vhash(nl) == vhash(cl), (
        f"{key}: class-reduced diverged from the naive per-doc form; "
        f"first naive-only={sorted(set(nl) - set(cl))[:3]} "
        f"first class-only={sorted(set(cl) - set(nl))[:3]}"
    )


def test_cap_and_expansion_structure(con):
    """The branches the reduction adds actually exercise on this corpus:
    the 200-twin class is fully capped out of MinHash but present in
    ngram; the 10-twin class self-expands to C(10,2); singleton and
    gram-less classes emit nothing."""
    _, mh = _run(con, O.DEDUP_ORACLES["minhash_lsh_dedup"])
    _, ng = _run(con, O.DEDUP_ORACLES["ngram_jaccard"])
    mh_pairs = {(r[0], r[1]) for r in mh}
    ng_pairs = {(r[0], r[1]) for r in ng}
    cap_class = set(range(200))
    ten_class = set(range(224, 234))
    # band cap: no pair with BOTH ends in the 200-class survives MinHash
    assert not any(a in cap_class and b in cap_class for a, b in mh_pairs)
    # …but the uncapped ngram leg emits all C(200,2) of them, jaccard 1.0
    assert sum(
        a in cap_class and b in cap_class for a, b in ng_pairs
    ) == 200 * 199 // 2
    # the 10-twin class self-expands to C(10,2) in BOTH legs
    for pairs in (mh_pairs, ng_pairs):
        assert sum(
            a in ten_class and b in ten_class for a, b in pairs
        ) == 45
    # gram-less classes (empty text ×2 = ids 236-237, single token ×2 =
    # ids 238-239) appear nowhere — NOT 235, which is the unrelated
    # full-sentence singleton and has grams (code-review r11: the
    # previous set was off by one and never checked doc 239)
    gramless = {236, 237, 238, 239}
    assert not any(a in gramless or b in gramless for a, b in ng_pairs)


def test_winnow_df_cap_weights_classes_by_size(con):
    """The 24-twin class exceeds the df cap (24 > max(20, 4% of 241)) so
    its fingerprints are non-rare: winnow emits NO self-pairs for it,
    while the 10-twin class (10 <= cap) self-expands to C(10,2)."""
    _, wp = _run(con, O.DEDUP_ORACLES["winnow_dup_pairs"])
    pairs = {(r[0], r[1]) for r in wp}
    over_cap = set(range(200, 224))
    under_cap = set(range(224, 234))
    assert not any(a in over_cap and b in over_cap for a, b in pairs)
    assert sum(a in under_cap and b in under_cap for a, b in pairs) == 45


def test_zero_vector_twins_behave_identically(con):
    """The 0/0 NaN cosine path: whatever the naive form does with the
    zero-vector twin pair, the class form does identically (covered by
    the hash equality above) — and the 4-twin embedding class
    self-expands to C(4,2) exact-score pairs."""
    _, cd = _run(con, O.DEDUP_ORACLES["embedding_cosine_dups"])
    twins = {(r[0], r[1]): r[2] for r in cd if r[0] in range(4) and r[1] in range(4)}
    assert len(twins) == 6
    # twin cosine is the ulp-exact dot(v,v)/(sqrt(S)*sqrt(S)) — one
    # value for the whole class
    assert len(set(twins.values())) == 1
