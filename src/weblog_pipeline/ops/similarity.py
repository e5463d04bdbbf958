"""Similarity search over the embeddings table (array<float> column).

* brute_force_topk — exact cosine top-k: broadcast the (small) query set
  against the full corpus; the dot product is a built-in `zip_with` +
  `aggregate` fold (JVM codegen, no Python). At 100 TB the corpus side
  stays partition-parallel and nothing shuffles except the final
  per-query top-k (tiny).
* lsh_topk — sign-random-projection LSH: 16-bit bucket from deterministic
  ±1 hyperplanes (derived from md5 bits of the dimension index, so every
  engine derives the same planes); candidates = bucket equi-join, then
  exact cosine re-rank. This is the scale path: the crossjoin shrinks by
  the bucket selectivity (~2^-16 per probe band of 16 bits; we use 4
  independent 8-bit bands for recall).

Ranking is by (cosine rounded to 6 decimals DESC, neighbor id ASC) — the
rounding + id tie-break makes the ordering reproducible across engines
whose float summation order differs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8  # bits per LSH band
N_LSH_BANDS = 4


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for each query vector (self excluded).

    queries: (query_id, query_vec) — small; broadcast side of the join.
    Output: query_id, rank, neighbor_id, cos_r6 (rounded).
    """
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vec")
    )
    joined = corpus.crossJoin(F.broadcast(queries)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col(F.col("query_vec"), F.col("vec")), 6).alias("cos_r6"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r6").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_r6")
    )


def hyperplane_signs(band: int, plane: int, dim: int = DIM) -> list[int]:
    """Deterministic ±1 hyperplane: sign of bit `plane` of
    md5('lshplane-<band>-<plane>-<d>') per dimension d. Pure public-recipe
    derivation any engine can reproduce."""
    signs = []
    for d in range(dim):
        digest = hashlib.md5(f"lshplane-{band}-{plane}-{d}".encode()).digest()
        signs.append(1 if digest[0] & 1 else -1)
    return signs


def _band_bucket(vec_col, band: int):
    """8-bit bucket id for one band: bit p = sign(dot(vec, plane_{band,p}))."""
    bucket = F.lit(0)
    for p in range(N_PLANES):
        signs = hyperplane_signs(band, p)
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: candidates share >=1 of 4 sign-LSH band buckets;
    exact cosine re-rank on candidates only."""
    def with_buckets(df, vec, id_alias):
        bands = F.array(
            *[
                F.struct(F.lit(b).alias("band"), _band_bucket(F.col(vec), b).alias("bucket"))
                for b in range(N_LSH_BANDS)
            ]
        )
        return df.select(
            F.col(df.columns[0]).alias(id_alias),
            F.col(vec).alias(f"{id_alias}_vec"),
            F.explode(bands).alias("bb"),
        ).select(id_alias, f"{id_alias}_vec", "bb.band", "bb.bucket")

    corpus_b = with_buckets(
        embeddings.select("vec_id", "embedding"), "embedding", "neighbor_id"
    )
    queries_b = with_buckets(queries, "query_vec", "query_id")

    cands = (
        corpus_b.join(F.broadcast(queries_b), ["band", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "query_id_vec", "neighbor_id", "neighbor_id_vec")
        .distinct()
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col(F.col("query_id_vec"), F.col("neighbor_id_vec")), 6).alias(
            "cos_r6"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r6").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_r6")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Coarse quantizer: n_cells deterministic centroids (every (N//n_cells)-th
    corpus vector by id order — seedless and reproducible). Each corpus
    vector is assigned to its nearest centroid with a codegen'd argmin over
    the broadcast centroid table; a query probes its n_probe nearest cells
    and re-ranks exactly within them. At 100 TB the cell assignment is a
    narrow int column computed in the scan stage, the probe join is an
    equi-join on cell id (shuffle keyed by cell), and only ~n_probe/n_cells
    of the corpus is scored per query.
    """
    n = embeddings.count()
    step = max(n // n_cells, 1)
    centroids = [
        list(map(float, r["embedding"]))
        for r in embeddings.where(F.col("vec_id") % step == 0)
        .orderBy("vec_id")
        .limit(n_cells)
        .collect()
    ]

    def nearest_cells(vec_col, top_n: int):
        """Array of the top_n nearest centroid indices (exprs only)."""
        scored = F.array(
            *[
                F.struct(
                    (-_dot(vec_col, F.array(*[F.lit(x) for x in c]))).alias("negdot"),
                    F.lit(i).alias("cell"),
                )
                for i, c in enumerate(centroids)
            ]
        )
        return F.slice(
            F.transform(F.array_sort(scored), lambda s: s["cell"]), 1, top_n
        )

    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("vec"),
        F.element_at(nearest_cells(F.col("embedding"), 1), 1).alias("cell"),
    )
    probes = queries.select(
        "query_id",
        "query_vec",
        F.explode(nearest_cells(F.col("query_vec"), n_probe)).alias("cell"),
    )
    cands = corpus.join(F.broadcast(probes), "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col(F.col("query_vec"), F.col("vec")), 6).alias("cos_r6"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r6").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_r6")
    )


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold (doc_a<doc_b).
    Brute-force baseline; the LSH band join above is the scale path."""
    a = embeddings.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = embeddings.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cos_r6"),
        )
        .where(F.col("cos_r6") >= threshold)
    )
