"""Deterministic fixed-iteration k-means over embedding columns.

Topic-clustering a corpus by embedding (cluster-then-sample curation,
SemDeDup's coarse stage done properly, MoE data routing) is Lloyd's
algorithm. Spark's MLlib KMeans is seed-dependent and float-accumulation
order-dependent — useless for cross-engine verification. This module
runs Lloyd with every nondeterminism pinned:

- init: the k lowest-id vectors are the seed centroids (k-means‖ would
  be better statistically; seeds are *verifiable*);
- vectors are quantized to integer micro-units (round-half-up spelled
  `floor(x*scale + 0.5)`, the engine-portable form) so centroid means
  are ratios of exact integer sums — no float sum order;
- per-(vector, centroid) distances are sequential folds over the dim
  axis (F.aggregate / list_sum) on deterministic doubles;
- argmin tie-breaks on centroid id via lexicographic (dist, cid)
  struct-min.

Scale: each iteration is one k-way broadcast expansion (centroids are
k×dims — always broadcastable) + one groupBy(vec) argmin + one
explode-by-dim centroid aggregation — all shuffles keyed on vec_id or
(cid, dim), never on raw vectors. The centroid table is checkpointed
per iteration (tiny) so iterations never re-derive. Fixed iteration
count = fixed shuffle count; no convergence-loop variance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**6  # micro-unit quantization of input vectors


def quantize(vec, scale: int = SCALE):
    """array<bigint> micro-units, round-half-up (engine-portable form)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(
        v, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("bigint")
    )


def _sqdist(v, m):
    """Sequential fold: squared L2 between two double arrays."""
    return F.aggregate(
        F.zip_with(v, m, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_fixed(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """Fixed-iteration Lloyd. Returns the final assignment:
    (id, cid, dist) with dist the squared L2 (in quantized-double
    units) to the chosen centroid. Clusters that empty out drop from
    the centroid table (deterministically — both engines see the same
    memberships), so assignments re-spread over the survivors."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.transform(quantize(vec_col, scale), lambda q: q.cast("double") / scale)
        .alias("v"),
        quantize(vec_col, scale).alias("q"),
    )
    # seed centroids: the k lowest-id vectors, exactly as quantized
    centroids = vecs.filter(F.col("id") < k).select(
        F.col("id").alias("cid"), F.col("v").alias("m")
    ).localCheckpoint(eager=True)

    assign = None
    for it in range(iterations):
        # broadcast k centroids against every vector; argmin by
        # lexicographic (dist, cid) — deterministic under ties
        scored = vecs.crossJoin(F.broadcast(centroids)).select(
            "id",
            "q",
            F.struct(
                _sqdist(F.col("v"), F.col("m")).alias("d"),
                F.col("cid").alias("c"),
            ).alias("dc"),
        )
        assign = scored.groupBy("id").agg(
            F.min("dc").alias("best"), F.first("q").alias("q")
        ).select(
            "id", F.col("best.c").alias("cid"), F.col("best.d").alias("dist"), "q"
        )
        if it == iterations - 1:
            break
        # centroid recompute: exact integer per-dim sums, one division
        per_dim = assign.select(
            "cid", F.posexplode("q").alias("dim", "qv")
        ).groupBy("cid", "dim").agg(
            F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n")
        )
        centroids = (
            per_dim.groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "s", "n"))
                ).alias("dims")
            )
            .select(
                "cid",
                F.transform(
                    F.col("dims"),
                    lambda p: p["s"].cast("double") / (p["n"] * scale),
                ).alias("m"),
            )
            .localCheckpoint(eager=True)  # k rows — collapse the lineage
        )
    return assign.select("id", "cid", "dist")
