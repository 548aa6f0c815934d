"""Vector math over ``array<float|double>`` columns — all JVM built-ins.

No Python crosses the wire, but note: ``F.zip_with``/``F.aggregate`` are
higher-order functions, which Catalyst evaluates as CodegenFallback
(interpreted) — NOT whole-stage codegen. They are kept for the VERIFY
path only, where the sequential left-fold summation order must stay
bit-aligned with the DuckDB oracle's ``list_dot_product`` (numpy BLAS
reorders the sum; a 6-dp rounded cosine could flip at a boundary). Bulk
signature/assignment math belongs in Arrow ``pandas_udf`` batch matmuls —
see ``similarity/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (no UDF)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a·b / (|a||b|); NULL if either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot_product(a, b) / denom)


def centroid_rows(df, group_col="label", vec_col="embedding", ndigits=6):
    """Per-group mean vector in flat form: ``(group, dim, centroid,
    n_vecs)``.

    posexplode → groupBy(group, dim) avg. The explode multiplies rows by
    the dimension count, but partial (map-side) aggregation collapses each
    task's output to |groups| × dim rows before the shuffle, so the
    exchange is tiny regardless of corpus size — the classic scalable
    vector-mean plan, entirely JVM-side."""
    ex = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("dim", "v")
    )
    return ex.groupBy(group_col, F.col("dim").cast("long").alias("dim")).agg(
        F.round(F.avg(F.col("v").cast("double")), ndigits).alias("centroid"),
        F.count("*").alias("n_vecs"),
    )


def centroids(df, group_col="label", vec_col="embedding", ndigits=6):
    """Per-group mean vector re-assembled as ``array<double>`` (dim
    order): ``(group, centroid, n_vecs)`` — the API form; queries use the
    flat ``centroid_rows`` for cross-engine hashing."""
    rows = centroid_rows(df, group_col, vec_col, ndigits)
    packed = F.array_sort(F.collect_list(F.struct("dim", "centroid")))
    return rows.groupBy(group_col).agg(
        F.transform(packed, lambda s: s["centroid"]).alias("centroid"),
        F.max("n_vecs").alias("n_vecs"),
    )
