"""Engine-vs-oracle parity on a NASTY corpus the driver testdata cannot
exercise: leading/trailing tabs and newlines, whitespace-only and empty
texts, runs of mixed whitespace. r15 moved the text featurizers to
\\S+ tokenization (lookahead regexp) and the review (r15) found the
oracle twins still split with ''-edge tokens — this suite pins the
aligned semantics by running BOTH engines on the same nasty parquet
and comparing values exactly (the driver gate only ever sees clean
text, so without this the twins could drift apart unobserved)."""

import math

import duckdb
import pytest

NASTY = [
    (0, "\tthe quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again\n"),
    (2, "\n\n  the quick brown\tfox jumps over the lazy dog again and again \t"),
    (3, "completely different text about spark and duckdb engines here"),
    (4, "completely different text about spark and duckdb engines here"),
    (5, "   "),
    (6, "\t\n"),
    (7, "one"),
    (8, "two little tokens"),
    (9, "the quick brown fox jumps over the lazy dog again and again"),
]


@pytest.fixture(scope="module")
def nasty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nasty"))
    spark.createDataFrame(NASTY, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _oracle(nasty_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{nasty_dir}/documents.parquet/*.parquet')"
    )
    return con.execute(sql).fetchall(), [
        c[0] for c in con.description
    ]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    return str(v)


def _compare(spark_df, oracle_rows, oracle_cols):
    cols = sorted(spark_df.columns)
    assert sorted(oracle_cols) == cols, (sorted(oracle_cols), cols)
    pos = {c: i for i, c in enumerate(oracle_cols)}
    want = sorted(
        tuple(_norm(r[pos[c]]) for c in cols) for r in oracle_rows
    )
    got = sorted(
        tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()
    )
    assert got == want


@pytest.mark.parametrize(
    "qname",
    [
        "dedup_ngram_jaccard",
        "containment",
        "dedup_fuzzy",
        "dup_clusters",
        "dedup_minhash_lsh",
        "incremental_minhash",
        "doc_fingerprint",
        "duplicated_spans",
        "span_removal",
        "dsir_doc_grams",
        "dsir_bucket_hist",
        "decontaminate_fuzzy",
        # tokens_expr-based twins (both sides keep ''-edge tokens —
        # pinned so the two tokenization families can't drift)
        "dedup_exact",
        "token_count",
        "repetition_stats",
        "chunk_dedup",
        "tfidf_cosine",
        "text_quality",
    ],
)
def test_nasty_corpus_engine_matches_oracle(spark, nasty_dir, qname):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "se_nasty", "/root/repo/__spark_entry__.py"
    )
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)
    q = se.queries()[qname]
    sql = se.oracle_sql()[qname]
    rows, cols = _oracle(nasty_dir, sql)
    _compare(q(spark, nasty_dir), rows, cols)
