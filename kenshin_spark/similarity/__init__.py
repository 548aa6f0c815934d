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


def lsh_bucket(vec_col: str, planes: list[list[float]]):
    """Signature bucket id: bit p = sign(v · plane_p).

    ``vec_col`` is a column NAME; the whole signature builds as one SQL
    string parsed JVM-side in a single call — the Column-by-Column version
    costs ~500 ``F.lit`` Py4J round-trips for the plane constants alone
    (~1s of driver time per invocation). ``repr(float)`` round-trips IEEE
    doubles exactly, so the constants are bit-identical either way.
    """
    terms = []
    for p, plane in enumerate(planes):
        consts = ",".join(f"{x!r}D" for x in plane)
        dot = (
            f"aggregate(zip_with({vec_col}, array({consts}), "
            f"(v, w) -> CAST(v AS DOUBLE) * w), 0.0D, (acc, x) -> acc + x)"
        )
        terms.append(
            f"shiftleft(IF({dot} >= 0, CAST(1 AS BIGINT), CAST(0 AS BIGINT)), {p})"
        )
    return F.expr(" + ".join(terms))


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
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        lsh_bucket(vec_col, planes).alias("bucket"),
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

    The quantizer trains driver-side on a bounded, hash-ordered sample
    (the FAISS approach — IVF quantizers train on a subset regardless of
    corpus size), so training is one small collect + local Lloyd
    iterations instead of a multi-job distributed KMeans; assignment and
    probing stay distributed JVM-side expressions.

    Approximate (recall grows with n_probe); same output schema as
    ``brute_force_topk``.
    """
    import numpy as np

    sample = (
        embeddings.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        # hash-ordered → uniform, deterministic sample independent of layout
        .orderBy(F.xxhash64(F.col("_id").cast("string"), F.lit(seed)), F.col("_id"))
        .limit(4096)
        .collect()
    )
    X = np.array([r._v for r in sample], dtype=np.float64)
    n_cells = min(n_cells, len(X))
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=n_cells, replace=False)].copy()
    xx = (X * X).sum(axis=1)
    for _ in range(10):
        # ||x-c||² = ||x||² - 2x·c + ||c||² (matmul form, BLAS-fast)
        d2 = xx[:, None] - 2.0 * (X @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        assign = d2.argmin(axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    centroids = [list(map(float, c)) for c in cent]

    def _cell_dists(vec_col: str):
        """Squared L2 distance to every centroid, as an array column.

        One SQL string parsed JVM-side — the Column-builder version costs
        n_cells x dim ``F.lit`` Py4J round-trips. ``repr(float)``
        round-trips IEEE doubles exactly.
        """
        cells = []
        for c in centroids:
            consts = ",".join(f"{x!r}D" for x in c)
            cells.append(
                f"aggregate(zip_with({vec_col}, array({consts}), "
                f"(v, w) -> (CAST(v AS DOUBLE) - w) * (CAST(v AS DOUBLE) - w)), "
                f"0.0D, (acc, x) -> acc + x)"
            )
        return F.expr("array(" + ",".join(cells) + ")")

    # nearest-centroid assignment as a codegen-able expression: argmin of
    # the distance array (first index of the min — deterministic ties)
    assigned = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
        )
        .withColumn("_d", _cell_dists("_cv"))
        .withColumn(
            "cell",
            (F.array_position(F.col("_d"), F.array_min(F.col("_d"))) - 1).cast(
                "int"
            ),
        )
        .drop("_d")
    )

    probe = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
        .withColumn("_d", _cell_dists("_qv"))
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
