"""Property-based and randomized-oracle tests.

Hypothesis drives the pure-numpy codecs (fast, no Spark per example);
the Spark operators get seeded randomized corpora compared against
brute-force Python oracles in a single job each.
"""

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# codec round-trips (pure numpy — hypothesis-friendly)
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    data=st.data(),
)
def test_ppm_roundtrip(w, h, data):
    from openeo_processes_dask_ml_spark.scale.multimodal import decode_image

    px = data.draw(
        st.lists(
            st.tuples(*[st.integers(0, 255)] * 3),
            min_size=w * h, max_size=w * h,
        )
    )
    body = bytes(v for p in px for v in p)
    payload = f"P6\n# c\n{w} {h}\n255\n".encode() + body
    arr = decode_image(payload, "ppm")
    assert arr.shape == (h, w, 3)
    assert arr.reshape(-1, 3).tolist() == [list(p) for p in px]


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 500),
    rate=st.sampled_from([8000, 16000, 44100]),
    data=st.data(),
)
def test_wav_roundtrip(n, rate, data):
    import struct as stl

    from openeo_processes_dask_ml_spark.scale.multimodal import decode_audio

    ints = data.draw(st.lists(st.integers(-32768, 32767), min_size=n, max_size=n))
    pcm = np.array(ints, dtype="<i2").tobytes()
    fmt = stl.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    payload = (
        b"RIFF" + stl.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
        + b"fmt " + stl.pack("<I", len(fmt)) + fmt
        + b"data" + stl.pack("<I", len(pcm)) + pcm
    )
    arr, got_rate = decode_audio(payload)
    assert got_rate == rate and arr.shape == (n, 1)
    assert np.array_equal((arr[:, 0] * 32768.0).round(), np.array(ints, dtype=np.float64))


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 8), h=st.integers(1, 8),
    tw=st.integers(1, 12), th=st.integers(1, 12),
)
def test_resize_nearest_properties(w, h, tw, th):
    from openeo_processes_dask_ml_spark.scale.multimodal import resize_nearest

    arr = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    out = resize_nearest(arr, tw, th)
    assert out.shape == (th, tw, 3)
    # every output pixel exists in the input; same-size resize is identity
    assert set(map(tuple, out.reshape(-1, 3))) <= set(map(tuple, arr.reshape(-1, 3)))
    assert np.array_equal(resize_nearest(arr, w, h), arr)


@settings(max_examples=20, deadline=None)
@given(st.binary(max_size=64))
def test_decoders_reject_garbage(payload):
    from openeo_processes_dask_ml_spark.scale.multimodal import (
        _decode_bmp,
        _decode_pnm,
        decode_audio,
    )

    for dec in (_decode_pnm, _decode_bmp, decode_audio):
        try:
            dec(payload)
        except (ValueError, NotImplementedError, IndexError, Exception):
            pass  # must raise or return — never hang/crash the worker


# ---------------------------------------------------------------------------
# randomized brute-force oracles (one Spark job per test)
# ---------------------------------------------------------------------------


def test_asof_join_matches_bruteforce(spark):
    from openeo_processes_dask_ml_spark.operators.asof import asof_join

    rng = random.Random(7)
    left = [(k, rng.randint(0, 100)) for k in range(4) for _ in range(25)]
    # unique right timestamps per key: with duplicates the as-of winner
    # among equal timestamps is unspecified (same as DuckDB ASOF)
    right = [
        (k, rt, rng.random())
        for k in range(4)
        for rt in rng.sample(range(101), 10)
    ]
    ldf = spark.createDataFrame(left, ["k", "lt"])
    rdf = spark.createDataFrame(right, ["k", "rt", "val"])
    got = {
        (r["k"], r["lt"], i): r["val_right"]
        for i, r in enumerate(
            asof_join(ldf, rdf, "k", "lt", "rt").orderBy("k", "lt").collect()
        )
    }
    # brute force: latest right with rt <= lt per key
    expect = []
    for k, lt in sorted(left):
        cands = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= lt]
        expect.append(max(cands)[1] if cands else None)
    assert [got[key] for key in sorted(got)] == expect


def test_ngram_jaccard_matches_bruteforce(spark):
    from openeo_processes_dask_ml_spark.scale.dedup import ngram_jaccard_pairs

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> real overlaps
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 15))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.3).collect()
    }

    def shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    expect = {}
    for i, (ida, ta) in enumerate(docs):
        for idb, tb in docs[i + 1 :]:
            sa, sb = shingles(ta), shingles(tb)
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.3:
                expect[(ida, idb)] = round(j, 6)
    # default DF cap never triggers on 30 docs (min_df_cap=128), so the
    # exact pair set must match the brute force bit-for-bit
    assert got.keys() == expect.keys()
    for k in expect:
        assert got[k] == pytest.approx(expect[k], abs=1e-9)


def test_cumulative_processes_match_numpy(spark):
    from pyspark.sql import functions as F

    from openeo_processes_dask_ml_spark.graph.registry import default_registry

    reg = default_registry()
    rng = random.Random(3)
    arrays = [
        [rng.choice([None, round(rng.uniform(-5, 5), 3)]) for _ in range(rng.randint(1, 10))]
        for _ in range(40)
    ]
    df = spark.createDataFrame([(i, a) for i, a in enumerate(arrays)], "i long, data array<double>")
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            reg.get("cumsum")({"data": F.col("data")}, {}).alias("s"),
            reg.get("cummax")({"data": F.col("data")}, {}).alias("mx"),
        ).collect()
    }
    for i, arr in enumerate(arrays):
        acc, mx = 0.0, None
        for j, v in enumerate(arr):
            if v is None:
                assert out[i]["s"][j] is None and out[i]["mx"][j] is None
            else:
                acc += v
                mx = v if mx is None else max(mx, v)
                assert out[i]["s"][j] == pytest.approx(acc, abs=1e-9)
                assert out[i]["mx"][j] == pytest.approx(mx, abs=1e-9)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_span_removal_token_conservation(spark, texts):
    """Property: for every document, len(clean tokens) + n_removed ==
    n_tokens, n_removed >= 0, and a corpus with no duplicated 5-token
    window passes through verbatim."""
    from openeo_processes_dask_ml_spark.scale.text import (
        remove_duplicated_spans,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    out = remove_duplicated_spans(docs, span_tokens=5).collect()
    assert len(out) == len(texts)
    for r in out:
        toks = texts[r["doc_id"]]
        assert 0 <= r["n_removed"] <= r["n_tokens"]
        if not toks:
            # r15 \S+ semantics: empty text has ZERO tokens (the old
            # split kept one '' token); nothing removable either way
            assert r["n_tokens"] == 0 and r["n_removed"] == 0
            continue
        assert r["n_tokens"] == len(toks)
        n_clean = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert n_clean + r["n_removed"] == r["n_tokens"]


@given(
    fps=st.lists(
        st.integers(min_value=0, max_value=(1 << 48) - 1),
        min_size=2,
        max_size=25,
    )
)
@settings(max_examples=10, deadline=None)
def test_hamming_pairs_exact_vs_bruteforce(spark, fps):
    """Property: the banded Hamming join surfaces EXACTLY the pairs a
    brute-force O(n^2) scan finds at Hamming <= 3 — the pigeonhole
    guarantee (4 bands, radius 3) shared by SimHash, image aHash and
    audio fingerprints."""
    from openeo_processes_dask_ml_spark.scale.dedup import hamming_pairs

    rows = [(i, fp) for i, fp in enumerate(fps)]
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(df, id_col="doc_id", fp_col="fp").collect()
    }
    want = {}
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = bin(fps[i] ^ fps[j]).count("1")
            if h <= 3:
                want[(i, j)] = h
    assert got == want


def test_bin_pack_matches_bruteforce(spark):
    """Seeded random doc lengths vs a pure-Python next-fit replay."""
    rng = random.Random(61)
    rows = [(i, " ".join("w" for _ in range(rng.randint(1, 40))))
            for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    from openeo_processes_dask_ml_spark.scale.dedup import hash60  # noqa: F401
    from openeo_processes_dask_ml_spark.scale.pipeline import (
        bin_pack_sequences,
    )

    cap, n_streams = 32, 4
    got = {
        r["doc_id"]: (r["stream"], r["bin_idx"], r["bin_fill"])
        for r in bin_pack_sequences(
            df, capacity=cap, n_streams=n_streams
        ).collect()
    }
    # python oracle: same md5 stream, same next-fit
    import hashlib

    def stream_of(doc_id):
        h = hashlib.md5(f"{doc_id}#shard".encode()).hexdigest()[:15]
        return int(h, 16) % n_streams

    lens = {i: len(t.split()) for i, t in rows}
    expect = {}
    for s in range(n_streams):
        b, f = 0, 0
        for i in sorted(d for d in lens if stream_of(d) == s):
            n = lens[i]
            if f > 0 and f + n > cap:
                b += 1
                f = 0
            f += n
            expect[i] = (s, b, f)
    assert got == expect


def test_tfidf_dense_sparse_agree_on_random_corpus(spark):
    """Random corpora over a small vocabulary: the adaptive dense path
    and the forced sparse path must emit identical pairs (the
    integer-weight exactness argument, exercised beyond the fixture)."""
    rng = random.Random(17)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    from openeo_processes_dask_ml_spark.scale.text import tfidf_cosine_pairs

    kw = dict(threshold=0.8, max_df_frac=1.0)
    dense = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, **kw).collect()
    }
    sparse = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, dense_vocab_max=0, **kw).collect()
    }
    assert dense == sparse
    assert dense  # random corpus over 12 terms always yields pairs


def test_containment_matches_bruteforce(spark):
    """Random corpus: containment_pairs vs a Python set-shingle replay
    (candidacy: pairs sharing >= 1 below-cap shingle)."""
    rng = random.Random(23)
    base = ["alpha beta gamma delta epsilon zeta eta theta"]
    rows = []
    for i in range(60):
        words = base[0].split()
        k = rng.randint(3, len(words))
        rows.append((i, " ".join(words[:k]) + f" tail{rng.randint(0, 5)}"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    from openeo_processes_dask_ml_spark.scale.dedup import containment_pairs

    got = {
        (r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
        for r in containment_pairs(df, threshold=0.9).collect()
    }

    def sh(t):
        w = t.lower().split()
        return {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}

    shs = {i: sh(t) for i, t in rows}
    n = len(rows)
    from collections import Counter

    dfreq = Counter(s for v in shs.values() for s in v)
    cap = max(128.0, 0.2 * n)
    expect = {}
    for a in range(n):
        for b in range(a + 1, n):
            inter = shs[a] & shs[b]
            if not inter or not shs[a] or not shs[b]:
                continue
            if not any(dfreq[s] <= cap for s in inter):
                continue  # hot-only pairs are out of candidacy
            ca = len(inter) / len(shs[a])
            cb = len(inter) / len(shs[b])
            if max(ca, cb) >= 0.9:
                import math as m

                r6 = lambda x: m.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
                expect[(a, b)] = (r6(ca), r6(cb))
    assert got == expect
    assert expect  # prefix corpus guarantees containment pairs


# ---------------------------------------------------------------------------
# duplicate_clusters: driver union-find == distributed min-label loop
# ---------------------------------------------------------------------------


def test_duplicate_clusters_paths_agree_randomized(spark):
    """Seeded random graphs (mixed density, self-loops, duplicate and
    reversed edges): the small-graph union-find fast path and the
    distributed pointer-doubling loop must emit identical labels, and
    both must equal a brute-force Python component search."""
    rng = random.Random(77)
    for trial in range(4):
        n_nodes = rng.choice([10, 40, 80])
        n_edges = rng.randint(5, 3 * n_nodes)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        from openeo_processes_dask_ml_spark.scale.dedup import (
            duplicate_clusters,
        )

        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        fast = {
            (r["doc_id"], r["cluster_id"])
            for r in duplicate_clusters(pairs).collect()
        }
        dist = {
            (r["doc_id"], r["cluster_id"])
            for r in duplicate_clusters(
                pairs, driver_edge_threshold=0
            ).collect()
        }
        # brute-force reference: BFS components over non-self-loop edges
        adj: dict = {}
        for a, b in edges:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        expect = set()
        seen: set = set()
        for start in sorted(adj):
            if start in seen:
                continue
            comp, queue = {start}, [start]
            while queue:
                x = queue.pop()
                for y in adj[x]:
                    if y not in comp:
                        comp.add(y)
                        queue.append(y)
            seen |= comp
            label = min(comp)
            expect |= {(node, label) for node in comp}
        assert fast == expect, f"trial {trial}: fast path diverged"
        assert dist == expect, f"trial {trial}: distributed path diverged"


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    dtype=st.sampled_from(
        ["uint8", "uint16", "int16", "int32", "float32", "float64"]
    ),
    seed=st.integers(0, 2**31 - 1),
    with_geo=st.booleans(),
)
def test_gtiff_roundtrip_property(h, w, dtype, seed, with_geo):
    """decode(encode(x)) == x bit-exactly for every supported dtype and
    shape, with and without geo tags; bbox/epsg survive the trip."""
    from openeo_processes_dask_ml_spark.io.gtiff import (
        decode_gtiff,
        encode_gtiff,
    )

    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        arr = (rng.random((h, w)) * 1e3 - 500).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(
            info.min, int(info.max) + 1, (h, w), dtype=dtype
        )
    kwargs = {}
    if with_geo:
        kwargs = {"bbox": (0.0, 0.0, float(w), float(h)), "epsg": 32632}
    out, meta = decode_gtiff(encode_gtiff(arr, **kwargs))
    assert out.dtype.newbyteorder("=") == np.dtype(dtype)
    np.testing.assert_array_equal(out, arr)
    if with_geo:
        assert meta["bbox"] == (0.0, 0.0, float(w), float(h))
        assert meta["epsg"] == 32632
    else:
        assert meta == {}


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 30),
    w=st.integers(1, 30),
    dtype=st.sampled_from(["uint8", "uint16", "int32", "float64"]),
    deflate=st.booleans(),
    tiled=st.booleans(),
    n_ov=st.integers(0, 2),
    ifd_pick=st.integers(0, 2),
    seed=st.integers(0, 2**31 - 1),
)
def test_gtiff_ranged_equals_whole_file_property(
    h, w, dtype, deflate, tiled, n_ov, ifd_pick, seed
):
    """decode_gtiff_ranged must equal decode_gtiff bit-for-bit for any
    layout combination and any addressable pyramid level."""
    from openeo_processes_dask_ml_spark.io.gtiff import (
        decode_gtiff,
        decode_gtiff_ranged,
        encode_gtiff,
        gtiff_ifd_count,
    )

    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        arr = rng.random((h, w)).astype(dtype)
    else:
        arr = rng.integers(0, 100, (h, w)).astype(dtype)
    ovs = []
    lvl = arr
    for _ in range(n_ov):
        if min(lvl.shape) < 2:
            break
        lvl = lvl[::2, ::2]
        ovs.append(lvl)
    payload = encode_gtiff(
        arr,
        bbox=(0.0, 0.0, float(w), float(h)),
        compression="deflate" if deflate else None,
        tile=(4, 4) if tiled else None,
        overviews=ovs or None,
    )
    k = ifd_pick % gtiff_ifd_count(payload)
    whole_arr, whole_meta = decode_gtiff(payload, ifd=k)
    ranged_arr, ranged_meta = decode_gtiff_ranged(
        lambda o, s: payload[o : o + s], ifd=k, head_bytes=64
    )  # tiny head forces the extension-fetch paths too
    np.testing.assert_array_equal(ranged_arr, whole_arr)
    assert ranged_meta == whole_meta


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=2000))
def test_lzw_roundtrip_arbitrary_bytes(raw):
    from openeo_processes_dask_ml_spark.io.gtiff import (
        _lzw_decode,
        _lzw_encode,
    )

    assert _lzw_decode(_lzw_encode(raw)) == raw


@settings(max_examples=20, deadline=None)
@given(st.binary(max_size=200))
def test_lzw_decoder_rejects_or_returns_on_garbage(raw):
    """A foreign/corrupt stream must raise ValueError or return bytes —
    never hang or crash the worker."""
    from openeo_processes_dask_ml_spark.io.gtiff import _lzw_decode

    try:
        out = _lzw_decode(raw)
        assert isinstance(out, bytes)
    except ValueError:
        pass


def test_line_dedup_matches_pure_python_reference(spark):
    """Property: line_dedup equals a pure-Python replay (split, count,
    threshold, ordered reassembly) on randomized corpora."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from openeo_processes_dask_ml_spark.scale.text import line_dedup

    line = st.sampled_from(
        ["alpha", "beta", "SUBSCRIBE", "cookie", "x y z", "", "beta"]
    )
    docs = st.lists(
        st.lists(line, min_size=1, max_size=6), min_size=1, max_size=8
    )

    @settings(max_examples=25, deadline=None)
    @given(docs, st.integers(min_value=1, max_value=3))
    def run(texts, max_count):
        rows = [(i, "\n".join(t)) for i, t in enumerate(texts)]
        # pure-python reference
        from collections import Counter

        counts = Counter(ln for _, t in rows for ln in t.split("\n"))
        want = {}
        for i, t in rows:
            lines = t.split("\n")
            keep = [ln for ln in lines if counts[ln] <= max_count]
            want[i] = (
                "\n".join(keep),
                len(lines),
                len(lines) - len(keep),
            )
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
            for r in line_dedup(df, max_count=max_count).collect()
        }
        assert got == want

    run()


def test_robots_matches_pure_python_reference(spark):
    """Property: parse + longest-match verdicts equal a pure-Python
    RFC 9309-subset reference on randomized robots bodies and URLs —
    including '*'/'$' wildcard patterns (§2.2.3) and CRLF line
    endings (ADVICE r13: the real-world form; a bare-LF split left
    '\\r' on every value and failed every rule OPEN)."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from openeo_processes_dask_ml_spark.scale.web import (
        robots_filter,
        robots_rules,
    )

    prefix = st.sampled_from(
        [
            "/a",
            "/a/b",
            "/c",
            "/",
            "",
            # RFC 9309 §2.2.3 wildcard shapes
            "/a*",
            "/*/b",
            "/a/b$",
            "/*.x$",
            "*",
            "/c$d",  # non-trailing '$' is literal
        ]
    )
    rule_line = st.builds(
        lambda allow, p: f"{'Allow' if allow else 'Disallow'}: {p}",
        st.booleans(),
        prefix,
    )
    group = st.builds(
        lambda agents, rules: "\n".join(
            [f"User-agent: {a}" for a in agents] + rules
        ),
        st.lists(st.sampled_from(["*", "bot"]), min_size=1, max_size=2),
        st.lists(rule_line, min_size=1, max_size=3),
    )
    body = st.builds(lambda gs: "\n\n".join(gs), st.lists(group, min_size=1, max_size=3))
    paths = st.lists(
        st.sampled_from(
            ["/a", "/a/b/c", "/c/d", "/", "/zz", "/a/b", "/q.x", "/c$d/e"]
        ),
        min_size=1,
        max_size=5,
    )

    def _match(pattern, path):
        if "*" in pattern or "$" in pattern:
            anchored = pattern.endswith("$")
            core = pattern[:-1] if anchored else pattern
            rx = (
                "^"
                + ".*".join(_re.escape(p) for p in core.split("*"))
                + ("$" if anchored else "")
            )
            return _re.search(rx, path) is not None
        return path.startswith(pattern)

    def ref_verdicts(text, agent, urls_paths):
        # pure-python parse: consecutive UA lines share the block
        groups = []  # (set(agents), [(prefix, allow)])
        cur_agents, cur_rules, in_ua = [], [], False
        for raw in text.split("\n"):
            ln = raw.split("#")[0].strip()
            if not ln or ":" not in ln:
                continue
            f, _, v = ln.partition(":")
            f, v = f.strip().lower(), v.strip()
            if f == "user-agent":
                if not in_ua:
                    if cur_agents:
                        groups.append((cur_agents, cur_rules))
                    cur_agents, cur_rules = [], []
                    in_ua = True
                cur_agents.append(v.lower())
            elif f in ("allow", "disallow"):
                in_ua = False
                cur_rules.append((v, f == "allow" or v == ""))
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        # agent group selection with * fallback
        rules = [
            r for agents, rs in groups for r in rs if agent in agents
        ]
        if not rules and agent != "*":
            rules = [
                r for agents, rs in groups for r in rs if "*" in agents
            ]
        out = {}
        for p in urls_paths:
            best = None  # (pattern octets, allow)
            for pref, allow in rules:
                if _match(pref, p):
                    k = (len(pref), allow)
                    if best is None or k > best:
                        best = k
            out[p] = best is None or best[1]
        return out

    @settings(max_examples=20, deadline=None)
    @given(body, paths, st.sampled_from(["*", "bot"]), st.booleans())
    def run(text, ps, agent, crlf):
        want = ref_verdicts(text, agent, ps)
        if crlf:
            text = text.replace("\n", "\r\n")
        robots = spark.createDataFrame(
            [("d.com", text)], "domain string, robots_txt string"
        )
        urls = spark.createDataFrame(
            [(f"https://d.com{p}",) for p in set(ps)], "url string"
        )
        got = {
            r["path"]: r["allowed"]
            for r in robots_filter(
                urls, robots_rules(robots), agent=agent
            ).collect()
        }
        assert got == {p: want[p] for p in set(ps)}

    run()


def test_boilerplate_matches_pure_python_reference(spark):
    """Property: the per-line drop rules equal a pure-Python replica
    (trim, word count, uppercase/digit ratios, counter + keyword
    regexes) on randomized multi-line pages."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from openeo_processes_dask_ml_spark.scale.text import (
        _BP_COUNTER_RE,
        _BP_KEYWORD_RE,
        boilerplate_removal,
    )

    word = st.sampled_from(
        [
            "hello", "WORLD", "Spark", "a", "B", "42", "100",
            "likes", "cookie", "subscribe", "reserved", "fine",
            "READ", "MORE", "x9", "",
        ]
    )
    line = st.builds(lambda ws: " ".join(ws), st.lists(word, max_size=5))
    pages = st.lists(line, min_size=1, max_size=8)

    def ref(lines):
        kept, removed = [], 0
        for ln in lines:
            t = ln.strip()
            words = 0 if t == "" else len(_re.split(r"\s+", t))
            letters = len(_re.sub(r"[^A-Za-z]", "", t))
            uppers = len(_re.sub(r"[^A-Z]", "", t))
            nonspace = len(_re.sub(r"\s", "", t))
            digits = len(_re.sub(r"[^0-9]", "", t))
            drop = (
                words < 2
                or (letters > 0 and uppers / letters > 0.6)
                or (nonspace > 0 and digits / nonspace > 0.5)
                or _re.search(_BP_COUNTER_RE, t) is not None
                or _re.search(_BP_KEYWORD_RE, t) is not None
            )
            if drop:
                removed += 1
            else:
                kept.append(ln)
        return "\n".join(kept), len(lines), removed

    @settings(max_examples=25, deadline=None)
    @given(st.lists(pages, min_size=1, max_size=4))
    def run(docs):
        df = spark.createDataFrame(
            [(i, "\n".join(p)) for i, p in enumerate(docs)],
            "doc_id bigint, text string",
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
            for r in boilerplate_removal(df).collect()
        }
        assert got == {i: ref(p) for i, p in enumerate(docs)}

    run()


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    threshold=st.sampled_from([0.07, 0.13, 0.3, 0.5, 0.66, 0.8]),
)
def test_prefix_mode_equals_count_mode_on_random_corpora(
    spark, seed, threshold
):
    """r16 invariant: ngram_jaccard_pairs mode='prefix' is value-
    identical to mode='count' for ANY corpus and threshold (the modes
    differ in plan shape only — prefix candidate generation must be a
    superset of every float-filter-passing cold-sharing pair). Random
    corpora mix cluster templates, unique tails, near-dups, and short
    docs; thresholds include non-dyadic floats (the r16 ceil-overshoot
    regression class)."""
    import random as _random

    from openeo_processes_dask_ml_spark.scale.dedup import ngram_jaccard_pairs

    rng = _random.Random(seed)
    vocab = [f"t{i}" for i in range(30)]
    docs = []
    for i in range(rng.randint(8, 25)):
        n = rng.randint(1, 25)
        toks = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.3 and docs:
            # near-dup of an earlier doc with a small edit
            base = docs[rng.randrange(len(docs))][1].split()
            toks = base[: max(1, len(base) - rng.randint(0, 2))] + toks[:2]
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    kw = dict(
        threshold=threshold,
        max_df_frac=rng.choice([0.2, 0.5, 0.9]),
        min_df_cap=rng.choice([1, 4, 128]),
    )
    count = sorted(map(tuple, ngram_jaccard_pairs(df, mode="count", **kw).collect()))
    prefix = sorted(map(tuple, ngram_jaccard_pairs(df, mode="prefix", **kw).collect()))
    assert prefix == count
