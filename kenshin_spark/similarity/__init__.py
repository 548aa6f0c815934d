"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path: queries
  only compare against vectors sharing a signature bucket (probe multiple
  buckets for recall). Hyperplanes are derived deterministically from
  md5(seed, dim), so both engines (and reruns) agree without an RNG.
- ``ivf_topk``: IVF (inverted-file) ANN — a k-means coarse quantizer
  partitions the corpus into cells; a query scans only its ``n_probe``
  nearest cells. The classic 100 TB layout: cells map to Parquet
  partitions, so a probe is a partition-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kenshin_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector: ``(query_id, neighbor_id,
    rank, cosine)``. Ties broken by neighbor id (deterministic).

    The corpus side stays partitioned; each query is broadcast against it,
    and the per-query top-k is a window rank — at scale swap the window for
    a ``groupBy(query).agg(max_heap)`` pattern, semantics identical.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cosine")
    )


def _hyperplane(dim: int, n_planes: int, seed: str = "ksp") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is derived
    from md5(f"{seed}:{p}:{d}") mapped to [-1, 1). No RNG state."""
    planes = []
    import hashlib

    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:15], 16)
            row.append(h / float(1 << 60) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Signature bucket id: bit p = sign(v · plane_p)."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(x) for x in plane]),
                lambda v, w: v.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.shiftleft(F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), p)
    return sig


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: compare only within the query's hyperplane bucket.
    Approximate — recall depends on n_planes; same output schema as
    ``brute_force_topk``."""
    planes = _hyperplane(dim, n_planes)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cosine")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: k-means coarse quantizer cells + multi-probe.

    Train a seeded k-means over the corpus, assign every corpus vector to
    its cell, and compare each query only against its ``n_probe`` closest
    cells' members. At scale: write the corpus partitioned by ``cell`` and
    the probe becomes partition pruning; the centroid table
    (n_cells x dim) broadcasts everywhere.

    Approximate (recall grows with n_probe); same output schema as
    ``brute_force_topk``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).withColumn("features", array_to_vector(F.col("_cv").cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(corpus)
    assigned = model.transform(corpus).withColumnRenamed("prediction", "cell")

    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    def _cell_dists(vec):
        """Squared L2 distance to every centroid, as an array column."""
        return F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(x) for x in c]),
                        lambda v, w: (v.cast("double") - w)
                        * (v.cast("double") - w),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in centroids
            ]
        )

    probe = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
        .withColumn("_d", _cell_dists(F.col("_qv")))
        .select(
            "query_id",
            "_qv",
            F.explode(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.transform(
                                F.col("_d"),
                                lambda d, i: F.struct(
                                    d.alias("dist"), i.alias("cell")
                                ),
                            )
                        ),
                        lambda s: s["cell"],
                    ),
                    1,
                    n_probe,
                )
            ).alias("cell"),
        )
    )

    scored = (
        assigned.join(F.broadcast(probe), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("_qv"), F.col("_cv")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cosine")
    )
