"""BPE vocabulary induction vs a sequential pure-Python oracle."""

from __future__ import annotations

from collections import Counter

from uw_hadoop_aglorithms_spark.functions.text import tokens
from uw_hadoop_aglorithms_spark.operators import bpe
from tests.conftest import SF_TEST


def _python_bpe(word_freq: dict[str, int], n_merges: int):
    """Classic sequential BPE (Sennrich et al.): overlapping pair counts,
    argmax with (count desc, left asc, right asc) tie-break, greedy
    left-to-right non-overlapping merge."""
    state = {w: tuple(w) + (bpe.EOW,) for w in word_freq}
    merges = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += word_freq[w]
        if not pc:
            break
        (l, r), pf = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, l, r, pf))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = tuple(out)
    return merges, state


def test_bpe_matches_sequential_oracle(spark):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    wf = Counter()
    for row in docs.select(tokens("text").alias("ts")).collect():
        wf.update(row.ts)

    exp_merges, exp_state = _python_bpe(dict(wf), bpe.N_MERGES)
    got_merges, st = bpe.bpe_train(spark, SF_TEST)
    assert got_merges == exp_merges

    # final distributed state equals the sequential state, word by word
    got_state = {}
    for r in st.collect():
        got_state.setdefault(r.w, {})[r.pos] = r.sym
    for w, syms in exp_state.items():
        got = tuple(got_state[w][i] for i in range(len(got_state[w])))
        assert got == syms, (w, got, syms)

    # registered form: merge rows in step order + top-vocab rows
    rows = bpe.bpe_vocab(spark, SF_TEST).collect()
    mrows = [r for r in rows if r.variant.startswith("bpe_merge_")]
    assert [
        (int(r.variant[-2:]), *r.word.split("+", 1), r.cnt) for r in mrows
    ] == exp_merges
    vf = Counter()
    for w, syms in exp_state.items():
        for s in syms:
            vf[s] += wf[w]
    exp_vocab = sorted(vf.items(), key=lambda kv: (-kv[1], kv[0]))[: bpe.VOCAB_TOP]
    vrows = [r for r in rows if r.variant == "bpe_vocab"]
    assert sorted(((r.word, r.cnt) for r in vrows), key=lambda kv: (-kv[1], kv[0])) == exp_vocab


def test_encode_words_applies_learned_rules(spark):
    """The apply step (tokenizer encode) must segment NEW words exactly
    as the sequential Python encoder does with the same learned rules in
    priority order — including words never seen in training."""
    from pyspark.sql import functions as F
    from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

    merges, _ = bpe.bpe_train(spark, SF_TEST)
    assert merges, "fixture corpus must yield merge rules"

    # held-out-ish mix: corpus words plus genuinely unseen strings
    corpus_words = [
        r.w
        for r in Catalog(spark, SF_TEST)
        .documents.select(F.explode(tokens("text")).alias("w"))
        .distinct()
        .limit(30)
        .collect()
    ]
    novel = ["zzzzq", "abracadabra", corpus_words[0] * 2]
    all_words = sorted(set(corpus_words + novel))
    wdf = spark.createDataFrame([(w,) for w in all_words], "w string")

    got = {r.w: list(r.syms) for r in bpe.encode_words(wdf, merges).collect()}

    def py_encode(w):
        syms = list(w) + [bpe.EOW]
        for _, l, r, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    assert set(got) == set(all_words)
    for w in all_words:
        assert got[w] == py_encode(w), w
        # lossless: concatenation restores the word + EOW marker
        assert "".join(got[w]) == w + bpe.EOW


def test_select_merge_batch_prefix_stops_at_conflict():
    """Prefix batching: walk the serial-ranked list, accept while
    symbols (incl. the created concat) are fresh, STOP at the first
    conflict — nothing after a deferred pair may jump the queue."""
    ranked = [
        ("a", "b", 100),
        ("c", "d", 90),
        ("ab", "c", 80),  # 'ab' is batch-1's concat, 'c' already used
        ("x", "y", 70),   # outranked by the deferred pair: must NOT run
    ]
    assert bpe.select_merge_batch(ranked, 8) == [
        ("a", "b", 100),
        ("c", "d", 90),
    ]
    # k caps the batch
    assert bpe.select_merge_batch(ranked, 1) == [("a", "b", 100)]


def test_bpe_train_batched_k1_is_serial(spark):
    """batch_k=1 must reproduce bpe_train EXACTLY (same merges, same
    weights): the batched trainer degenerates to the serial argmax."""
    s_m, _ = bpe.bpe_train(spark, SF_TEST, n_merges=25)
    b_m, _ = bpe.bpe_train_batched(spark, SF_TEST, n_merges=25, batch_k=1)
    assert b_m == s_m


def test_bpe_train_batched_k8_learns_serial_vocab(spark):
    """Documented approximation bound at testdata scale: 40 merges with
    batch_k=8 learn 38/40 of the serial merges; the two diffs are an
    equivalent re-bracketing of the same word ('column' segmented via
    lu+m, co+lum instead of co+lu, colu+m — the created-pair deviation
    the docstring describes), so the FINAL segmentation state is
    identical row-for-row."""
    s_m, s_st = bpe.bpe_train(spark, SF_TEST, n_merges=40)
    b_m, b_st = bpe.bpe_train_batched(spark, SF_TEST, n_merges=40, batch_k=8)
    ss = {(l, r) for _, l, r, _ in s_m}
    bs = {(l, r) for _, l, r, _ in b_m}
    assert len(ss & bs) == 38, sorted(ss ^ bs)
    assert ss - bs == {("co", "lu"), ("colu", "m")}
    assert bs - ss == {("co", "lum"), ("lu", "m")}
    key = lambda df: sorted((r.w, r.pos, r.sym) for r in df.collect())
    assert key(s_st) == key(b_st)


def test_encode_words_broadcast_equals_relational(spark):
    """The map-side rank-priority encoder must reproduce the relational
    rule-replay encoder EXACTLY — the equivalence argument (new
    adjacencies always involve the newly created, later-ranked symbol)
    made executable. 40 rules deep so created-symbol rules actually
    fire, over corpus words plus unseen strings with repeated runs."""
    from pyspark.sql import functions as F

    from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

    merges, _ = bpe.bpe_train(spark, SF_TEST, n_merges=40)
    corpus_words = [
        r.w
        for r in Catalog(spark, SF_TEST)
        .documents.select(F.explode(tokens("text")).alias("w"))
        .distinct()
        .limit(40)
        .collect()
    ]
    novel = ["zzzzq", "abracadabra", "aaaaaaa", corpus_words[0] * 3]
    wdf = spark.createDataFrame(
        [(w,) for w in sorted(set(corpus_words + novel))], "w string"
    )
    rel = {r.w: list(r.syms) for r in bpe.encode_words(wdf, merges).collect()}
    bcast = {
        r.w: list(r.syms)
        for r in bpe.encode_words_broadcast(wdf, merges).collect()
    }
    assert bcast == rel
    for w, syms in bcast.items():
        assert "".join(syms) == w + bpe.EOW


def test_encoders_share_degenerate_input_contract(spark):
    """Both encoders must agree row-for-row on arbitrary caller frames:
    NULL and '' rows drop identically (relational sequence(1,0) would
    otherwise fabricate phantom empty symbols; the pandas path would
    crash on None), duplicates collapse."""
    merges, _ = bpe.bpe_train(spark, SF_TEST, n_merges=10)
    wdf = spark.createDataFrame(
        [("the",), ("",), (None,), ("the",), ("zq",)], "w string"
    )
    rel = sorted(
        (r.w, tuple(r.syms)) for r in bpe.encode_words(wdf, merges).collect()
    )
    bc = sorted(
        (r.w, tuple(r.syms))
        for r in bpe.encode_words_broadcast(wdf, merges).collect()
    )
    assert rel == bc
    assert [w for w, _ in rel] == ["the", "zq"]
