"""Embedding quantization: per-vector symmetric int8 codes.

A 100-TB embedding corpus at float32x64 is ~2.5x the size of its int8
codes + one float scale per vector; quantizing is the standard first
step before ANN index build (IVF-PQ/SQ) and cuts shuffle and cache
bytes 4x. The codes here are symmetric scalar quantization:

    scale = max(|v_i|)          (per vector)
    q_i   = floor(v_i / scale * 127 + 0.5)   in [-127, 127]

All arithmetic is Catalyst array expressions (transform/zip_with/
aggregate) with strict left-fold summation, so the DuckDB oracle twin
(list_transform/list_reduce) produces bit-identical doubles — see the
repo's parity rules. No shuffle: the operator is a pure projection
over the embeddings scan.

Zero vectors (scale == 0) are dropped — division by zero diverges
between engines (Spark gives NaN/Inf, DuckDB NULL) and a zero vector
has no meaningful code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.utils.rounding import dround


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 127,
) -> DataFrame:
    """Per-vector int8 quantization summary: scale, code stats, and the
    L2 reconstruction error.

    Emits (id, scale, code_sum, code_min, code_max, err) rather than
    the raw code array so the result is oracle-hashable; callers that
    want the codes use :func:`quantized_codes`.
    """
    lv = float(levels)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), v.alias("v"))
    base = base.withColumn(
        "scale", F.array_max(F.transform("v", F.abs))
    ).filter(F.col("scale") > 0)
    q = F.transform(
        "v", lambda x: F.floor(x / F.col("scale") * lv + F.lit(0.5)).cast("bigint")
    )
    base = base.withColumn("q", q)

    def sq_diff(a: Column, b: Column) -> Column:
        d = a - b * F.col("scale") / lv
        return d * d

    err2 = F.aggregate(
        F.zip_with("v", "q", sq_diff), F.lit(0.0), lambda acc, x: acc + x
    )
    return base.select(
        F.col(id_col),
        dround(F.col("scale"), 9).alias("scale"),
        F.aggregate("q", F.lit(0).cast("bigint"), lambda a, b: a + b).alias(
            "code_sum"
        ),
        F.array_min("q").alias("code_min"),
        F.array_max("q").alias("code_max"),
        dround(F.sqrt(err2), 6).alias("err"),
    )


def quantized_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 127,
) -> DataFrame:
    """(id, scale, codes array<tinyint>) — the storage-shaped output."""
    lv = float(levels)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.select(F.col(id_col), v.alias("v"))
    out = out.withColumn(
        "scale", F.array_max(F.transform("v", F.abs))
    ).filter(F.col("scale") > 0)
    return out.select(
        F.col(id_col),
        F.col("scale"),
        F.transform(
            "v",
            lambda x: F.floor(x / F.col("scale") * lv + F.lit(0.5)).cast("tinyint"),
        ).alias("codes"),
    )


def random_projection(
    df: DataFrame,
    out_dim: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a
    deterministic +-1 projection matrix (Achlioptas 2001's
    database-friendly random projection — sign matrices preserve
    pairwise distances within the JL bound at 1/sqrt(out_dim)
    scaling, and need no float random state).

    Row j of the matrix is ``similarity.hyperplane_coeffs(j, dim)`` —
    md5-derived signs, so the DuckDB oracle rebuilds the IDENTICAL
    matrix and the projection is reproducible across engines, runs,
    and languages. Each output coordinate is a strict left-fold
    dot product (zip_with + aggregate over a literal coefficient
    array <-> list_transform + list_reduce), the repo's bit-exact
    float pattern.

    Emits (id, p0..p{out_dim-1}) as double columns, each dround(6).
    100 TB shape: a pure projection over the embeddings scan — no
    shuffle, whole plan short of the fold stays in codegen; shrinking
    64-float vectors to out_dim floats cuts downstream ANN/cluster
    shuffle bytes by 64/out_dim.
    """
    from openeo_processes_dask_ml_spark.scale.similarity import (
        hyperplane_coeffs,
    )

    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"]) if first else 0
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cols = [F.col(id_col)]
    for j in range(out_dim):
        coeffs = hyperplane_coeffs(j, dim)
        lit = F.array(*[F.lit(c) for c in coeffs])
        dot = F.aggregate(
            F.zip_with(v, lit, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(dround(dot, 6).alias(f"p{j}"))
    return df.select(*cols)
