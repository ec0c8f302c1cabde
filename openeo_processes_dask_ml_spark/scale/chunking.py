"""Document chunking as a native Python UDTF (Spark 4).

Training pipelines split documents into fixed-size overlapping token
windows before tokenization/embedding. The splitter is a genuine
one-row-to-many-rows operator, so it is expressed as a Python UDTF
(`pyspark.sql.functions.udtf`, Arrow-batched) consumed via a LATERAL
join — the engine's UDTF surface, not an explode() workaround.

Chunk rule (deterministic, engine-independent): collapse whitespace,
split on single spaces (an empty document yields one empty token —
the same semantics as DuckDB ``string_split``, which keeps the oracle
twin exact), then chunk i covers words ``[i*stride, i*stride +
chunk_size)`` for ``i in [0, ceil(n_words / stride))``.

Scale: the UDTF is a narrow map — no shuffle, no state; each task
streams its document batch through Arrow and emits chunk rows. At
100 TB the cost is one pass over the text bytes and the output is
immediately repartition-free input to tokenize/embed stages. Python
string splitting is the only non-JVM work; for ASCII-ish corpora the
Arrow batch transfer dominates and the operator stays IO-bound.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, SparkSession

CHUNK_SCHEMA = "doc_id bigint, chunk_idx int, chunk_text string, n_words int"

_WS = re.compile(r"\s+")


class ChunkDocs:
    """UDTF: (doc_id, text, chunk_size, stride) -> chunk rows."""

    def eval(self, doc_id, text, chunk_size: int, stride: int):  # noqa: D102
        words = _WS.sub(" ", (text or "").strip()).split(" ")
        n = len(words)
        for i in range(math.ceil(n / stride)):
            piece = words[i * stride : i * stride + chunk_size]
            yield doc_id, i, " ".join(piece), len(piece)


def chunk_documents(
    spark: SparkSession,
    df: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode documents into overlapping word-window chunks via a
    registered UDTF + LATERAL correlated call."""
    from pyspark.sql.functions import udtf

    from openeo_processes_dask_ml_spark.utils.partitioning import spread

    spark.udtf.register(
        "chunk_docs", udtf(ChunkDocs, returnType=CHUNK_SCHEMA, useArrow=True)
    )
    view = "__docs_to_chunk"
    # the driver testdata is a single parquet file -> one input split; the
    # UDTF is per-row Python work, so spread it across cores (real multi-
    # file corpora already arrive split)
    spread(df).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT c.doc_id, c.chunk_idx, c.chunk_text, c.n_words
        FROM {view} d,
             LATERAL chunk_docs(d.{id_col}, d.{text_col},
                                {int(chunk_size)}, {int(stride)}) c
        """
    )
