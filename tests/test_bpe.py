"""Distributed BPE trainer vs a pure-Python reference implementation.

The reference below is the textbook Sennrich trainer (dict of word
freqs, count pairs, merge argmax left-to-right) with the same
deterministic tie-break the Spark path uses: (count desc, left asc,
right asc)."""

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.scale.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_train,
    bpe_vocab,
    word_frequencies,
)


def ref_bpe(word_freqs, num_merges, min_pair_count=2):
    words = {}
    for w, f in word_freqs.items():
        k = tuple(list(w) + [END_OF_WORD])
        words[k] = words.get(k, 0) + f
    merges = []
    for rank in range(num_merges):
        counts = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, left + right, cnt))
        out = {}
        for syms, f in words.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    ns.append(left + right)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            k = tuple(ns)
            out[k] = out.get(k, 0) + f
        words = out
    return merges, words


CORPUS = [
    (0, "low low low lower lowest"),
    (1, "new newer newest new new"),
    (2, "wide wider widest low new"),
    (3, "low lower newer newer wide"),
    (4, "newest lowest widest widest"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


def _ref_word_freqs():
    wf = {}
    for _, t in CORPUS:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    return wf


def test_word_frequencies(spark, docs):
    got = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert got == _ref_word_freqs()


def test_merge_table_matches_reference(spark, docs):
    merges_df, words_df = bpe_train(docs, num_merges=12)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    want, ref_words = ref_bpe(_ref_word_freqs(), 12)
    assert got == want
    # final encoded word table matches the reference's rewritten dict
    got_words = {
        tuple(r["syms"]): r["freq"]
        for r in words_df.select("syms", "freq").collect()
    }
    assert got_words == ref_words


def test_min_pair_count_stops_early(spark, docs):
    merges_df, _ = bpe_train(docs, num_merges=500, min_pair_count=3)
    rows = merges_df.collect()
    assert 0 < len(rows) < 500
    assert all(r["pair_count"] >= 3 for r in rows)


def test_overlapping_pairs_merge_left_to_right(spark):
    # 'aaaa' under rule (a,a): left-to-right non-overlap -> [aa, aa, </w>]
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id int, text string"
    )
    merges_df, words_df = bpe_train(docs, num_merges=1)
    m = merges_df.collect()[0]
    assert (m["left"], m["right"]) == ("a", "a")
    syms = words_df.collect()[0]["syms"]
    assert syms == ["aa", "aa", END_OF_WORD]


def test_vocab_covers_all_symbols(spark, docs):
    merges_df, words_df = bpe_train(docs, num_merges=8)
    vocab = {r["token"]: r["freq"] for r in bpe_vocab(merges_df, words_df).collect()}
    # every symbol of every encoded word is in the vocab
    for r in words_df.collect():
        for s in r["syms"]:
            assert s in vocab
    # frequency mass conserved: sum over words of len(syms)*freq
    assert sum(vocab.values()) == sum(
        len(r["syms"]) * r["freq"] for r in words_df.collect()
    )


def test_encode_roundtrip_and_oov(spark, docs):
    merges_df, words_df = bpe_train(docs, num_merges=10)
    # encode a corpus containing an UNSEEN word: falls back to char
    # split + merge folds, must equal training-side treatment
    new = spark.createDataFrame(
        [(7, "low lowest unseenword")], "doc_id int, text string"
    )
    enc = {r["id"]: r["tokens"] for r in bpe_encode(new, merges_df, words_df).collect()}
    toks = enc[7]
    # concatenating tokens and stripping markers reproduces the text
    flat = "".join(toks).replace(END_OF_WORD, "")
    assert flat == "lowlowestunseenword"
    # seen words use the trained dictionary entries verbatim
    dict_syms = {
        r["word"]: r["syms"] for r in words_df.select("word", "syms").collect()
    }
    assert toks[: len(dict_syms["low"])] == dict_syms["low"]


def test_encode_keeps_empty_documents(spark, docs):
    """Empty / whitespace-only texts must come back with tokens = []
    rather than vanishing (ADVICE r6: the word filter used to drop
    their ids before the groupBy)."""
    merges_df, words_df = bpe_train(docs, num_merges=5)
    new = spark.createDataFrame(
        [(1, "low lower"), (2, ""), (3, "   "), (4, "newest")],
        "doc_id int, text string",
    )
    enc = {r["id"]: r["tokens"] for r in bpe_encode(new, merges_df, words_df).collect()}
    assert set(enc) == {1, 2, 3, 4}
    assert enc[2] == [] and enc[3] == []
    assert len(enc[1]) > 0 and len(enc[4]) > 0


def test_determinism_across_runs(spark, docs):
    a, _ = bpe_train(docs, num_merges=6)
    b, _ = bpe_train(docs, num_merges=6)
    assert a.collect() == b.collect()


def test_artifact_lifecycle_roundtrip(spark, docs, tmp_path):
    from openeo_processes_dask_ml_spark.scale.bpe import (
        load_bpe_artifacts,
        save_bpe_artifacts,
    )

    merges, words = bpe_train(docs, num_merges=8)
    save_bpe_artifacts(merges, words, str(tmp_path / "bpe"))
    m2, w2 = load_bpe_artifacts(spark, str(tmp_path / "bpe"))
    assert sorted(map(tuple, merges.collect())) == sorted(
        map(tuple, m2.collect())
    )
    new = spark.createDataFrame([(3, "low newest wide")], "doc_id int, text string")
    direct = bpe_encode(new, merges, words).collect()
    reloaded = bpe_encode(new, m2, w2).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, reloaded))


def test_batched_rounds_match_sequential_on_fixture(spark, docs):
    """batch_merges>1 must learn the bit-identical table (VERDICT r14
    #7 equivalence condition) while issuing fewer rounds."""
    want, ref_words = ref_bpe(_ref_word_freqs(), 12)
    merges_df, words_df = bpe_train(
        docs, num_merges=12, batch_merges=8, max_driver_words=0
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    assert got == want
    got_words = {
        tuple(r["syms"]): r["freq"]
        for r in words_df.select("syms", "freq").collect()
    }
    assert got_words == ref_words


@pytest.mark.parametrize(
    "corpus,batch",
    [
        # VERIFY_r16's falsifying corpus: a pair born from an earlier
        # pick in the same batch (('abb','a</w>'), created by ab+b→abb)
        # tied a later pick's stale count and won the lexicographic
        # tie-break — the r16 window-blocker bound never saw it because
        # the scan stopped at max_picks before reaching the hazard row.
        ([("b", 3), ("ab", 3), ("bb", 3), ("abba", 3), ("baaaa", 4), ("bbb", 1)], 6),
        # run-pair hazard: pick (a,a) births (aa,aa) with count 10 — the
        # born pair's source adjacency is the pick ITSELF, so no window
        # bound covers it; (a,a) must terminate its batch.
        ([("bb", 5), ("aab", 1), ("aaaaaa", 5), ("aabbbb", 1)], 2),
        # max_picks cut the scan before the (bb,b)/(b,a</w>) hazard rows
        # that bound the (abb,b) pair born from pick (a,bb).
        ([("aa", 1), ("abbba", 4), ("ab", 2), ("b", 2)], 2),
        ([("aabbb", 4), ("bbba", 5), ("b", 7), ("aaa", 4), ("aaaab", 1), ("abb", 4)], 8),
    ],
)
def test_batched_equivalence_pinned_corpora(spark, corpus, batch):
    """Deterministic regressions for the batched-selection holes found
    by VERIFY_r16's hypothesis run and this round's 100k-trial fuzz of
    the pure-Python mirror (VERDICT r16 #1)."""
    wf = {}
    for w, f in corpus:
        wf[w] = wf.get(w, 0) + f
    text = " ".join(" ".join([w] * f) for w, f in sorted(wf.items()))
    df = spark.createDataFrame([(0, text)], "doc_id int, text string")
    want, _ = ref_bpe(wf, num_merges=10, min_pair_count=1)
    merges_df, _ = bpe_train(
        df, num_merges=10, min_pair_count=1, batch_merges=batch,
        max_driver_words=0,
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    assert got == want


def test_batched_selection_fuzz_mirror():
    """No-Spark fuzz of the REAL ``_select_safe_batch`` through a
    driver-side mirror of the distributed loop (tools/fuzz_bpe_batch):
    4k deterministic trials per suite run, versus the Spark-backed
    hypothesis test's 30 — the r16 selection hole survived four green
    12-example hypothesis runs but falls to this harness within ~200
    trials of seed 0. The full 100k-trial battery runs from the CLI."""
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "tools" / "fuzz_bpe_batch.py"
    spec = importlib.util.spec_from_file_location("fuzz_bpe_batch", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.run_fuzz(4000, 0, 4) is None


def test_batched_equivalence_hypothesis(spark):
    """Adversarial corpora from a 2-letter alphabet maximize the nasty
    cases (symbol-sharing top pairs, merged-token collisions like a
    pre-existing 'aa' symbol, ties everywhere); the batched trainer
    must match the pure-Python sequential reference on every one."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="ab", min_size=1, max_size=5)
    corpus = st.lists(
        st.tuples(word, st.integers(min_value=1, max_value=5)),
        min_size=1,
        max_size=8,
    )

    @settings(
        max_examples=30,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(corpus=corpus)
    def check(corpus):
        wf = {}
        for w, f in corpus:
            wf[w] = wf.get(w, 0) + f
        text = " ".join(
            " ".join([w] * f) for w, f in sorted(wf.items())
        )
        df = spark.createDataFrame([(0, text)], "doc_id int, text string")
        want, _ = ref_bpe(wf, num_merges=10, min_pair_count=1)
        merges_df, _ = bpe_train(
            df, num_merges=10, min_pair_count=1, batch_merges=6,
            max_driver_words=0,
        )
        got = [
            (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
            for r in merges_df.orderBy("rank").collect()
        ]
        assert got == want

    check()


def test_driver_tier_matches_distributed(spark, docs):
    """The r16 bounded driver tier (vocab <= max_driver_words collects
    once, sequential trainer) must learn the bit-identical table AND
    encoded word dictionary as the distributed merge loop."""
    m_drv, w_drv = bpe_train(docs, num_merges=12)
    m_dst, w_dst = bpe_train(docs, num_merges=12, max_driver_words=0)
    key = lambda df: [  # noqa: E731
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in df.orderBy("rank").collect()
    ]
    assert key(m_drv) == key(m_dst)
    words = lambda df: {  # noqa: E731
        r["word"]: (r["freq"], tuple(r["syms"]))
        for r in df.select("word", "freq", "syms").collect()
    }
    assert words(w_drv) == words(w_dst)
    assert dict(w_drv.dtypes) == dict(w_dst.dtypes)
