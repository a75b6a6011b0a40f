"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, one shuffle, JVM-side arithmetic
via higher-order functions (F.zip_with + F.aggregate), no UDF. Scale path:
LSH-bucketed ANN — random-hyperplane signatures restrict the pair join to
matching buckets (candidate generation), brute-force re-rank inside buckets.

At 100 TB the brute-force variant is the per-bucket kernel, never the global
plan; the bucket join is the only shuffle and its key cardinality (2^planes)
is the recall/cost knob. Deterministic hyperplanes are derived from a seed via
md5 — no RNG at plan time, reproducible across runs and engines.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _spread


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_query_rows: int | None = 10_000,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine; excludes self-matches.

    Returns (query_id, vec_id, cos [rounded 6dp], rank). The cross join is
    broadcast on the (small) query side; corpus stays partitioned. This is
    the small-query-set kernel: the ENTIRE query side is collected to the
    driver and shipped to every executor, so a large query set would OOM the
    driver long before the O(|corpus| x |queries|) scoring finishes. The
    ``max_query_rows`` guard (one count job on the small side) refuses such
    misuse with a clear error instead; pass ``None`` to disable, or use
    ``ann_lsh_topk`` / ``ann_ivf_topk`` — the bucketed scale paths — for
    large query sets.
    """
    if max_query_rows is not None:
        n_q = queries.count()
        if n_q > max_query_rows:
            raise ValueError(
                f"brute_force_topk broadcasts the query side: got {n_q} query "
                f"rows > max_query_rows={max_query_rows}. Use ann_lsh_topk/"
                "ann_ivf_topk for large query sets, or raise max_query_rows "
                "explicitly (None disables the guard)."
            )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    # corpus side carries the per-pair scoring; spread an under-partitioned
    # (single-file) scan so it isn't one core's work (guide §2.5)
    c = _spread(embeddings, id_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("_cvec")
    )
    scored = c.crossJoin(F.broadcast(q.withColumn("_qvec", F.col("_qvec").cast("array<double>")))).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_cvec"), F.col("_qvec")), 6).alias("cos"),
    ).filter(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from md5(seed, plane, i)."""
    planes = []
    for p in range(n_planes):
        vec = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()
            # map 8 hex chars -> [-1, 1)
            vec.append((int(h[:8], 16) / 2**31) - 1.0)
        n = math.sqrt(sum(v * v for v in vec)) or 1.0
        planes.append([v / n for v in vec])
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Random-hyperplane signature: bit p = sign(v · plane_p)."""
    code = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        dot = _dot(F.col(vec_col).cast("array<double>"), F.array(*[F.lit(x) for x in plane]))
        code = code + (dot >= 0).cast("long") * F.lit(1 << p)
    return code


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket,
    re-ranked by exact cosine. Returns (query_id, vec_id, cos, rank)."""
    planes = _hyperplanes(dim, n_planes, seed)
    # the per-row bucket signature (n_planes x dim interpreted dot products)
    # and the per-candidate re-rank both run on the corpus side's partitions
    c = _spread(embeddings, id_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
        lsh_bucket(vec_col, planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
        lsh_bucket(vec_col, planes).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="_bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("_cvec"), F.col("_qvec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _centroids(dim: int, n_centroids: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit centroids (md5-seeded, same scheme as
    :func:`_hyperplanes` with a distinct tag so the sets differ)."""
    cents = []
    for c in range(n_centroids):
        vec = []
        for i in range(dim):
            h = hashlib.md5(f"ivf:{seed}:{c}:{i}".encode()).hexdigest()
            vec.append((int(h[:8], 16) / 2**31) - 1.0)
        n = math.sqrt(sum(v * v for v in vec)) or 1.0
        cents.append([v / n for v in vec])
    return cents


def _centroid_scores(vec_col, centroids: list[list[float]]):
    """Array of dot products against each (unit) centroid — since centroids
    are unit vectors, argmax(dot) == argmax(cosine) per row."""
    return F.array(
        *[
            _dot(F.col(vec_col).cast("array<double>"), F.array(*[F.lit(x) for x in c]))
            for c in centroids
        ]
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style ANN: corpus vectors are inverted-listed under their nearest
    centroid (one pass, JVM-side argmax over deterministic centroid
    literals); each query probes its ``n_probe`` nearest lists and re-ranks
    the candidates by exact cosine.

    The scale shape: the ONLY shuffle is the (centroid-id) candidate join,
    list sizes are ~|corpus|/n_centroids, and recall/cost tunes with
    (n_centroids, n_probe) exactly as in a real IVF index. Deterministic
    centroids (no trained k-means here) keep it cross-engine reproducible —
    an exact SQL oracle replays the same arithmetic.
    Returns (query_id, vec_id, cos, rank).
    """
    cents = _centroids(dim, n_centroids, seed)
    c_scores = _centroid_scores(vec_col, cents)
    # per-row centroid argmax (n_centroids x dim interpreted dots) runs on
    # the corpus partitions; spread a single-file scan first
    corpus = _spread(embeddings, id_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
        # first-max wins on exact ties — same rule as the oracle's list_indexof
        (F.array_position(c_scores, F.array_max(c_scores)) - 1).alias("_list"),
    )
    q_scores = _centroid_scores(vec_col, cents)
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("_list").asc()
    )
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qvec"),
            F.posexplode(q_scores).alias("_list", "_score"),
        )
        .withColumn("_pr", F.row_number().over(w_probe))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "_qvec", "_list")
    )
    scored = (
        corpus.join(F.broadcast(q), on="_list")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("_cvec"), F.col("_qvec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos >= threshold),
    LSH-bucketed candidate generation + exact cosine verify.

    Verify-stage shape (guide §2.5/§4): norms are computed ONCE per row
    before the bucket join instead of once per candidate pair — the pair
    count is quadratic in bucket occupancy, so the per-pair work drops from
    three interpreted array folds + a sqrt to one fold and a divide, with a
    bit-identical result (``_norm(v)`` is a deterministic per-row scalar and
    ``dot/(na*nb)`` is the same expression tree as ``cosine``). The probe
    side is hash-repartitioned to the session's default parallelism first:
    a single-file embeddings table scans as ONE partition, and with the
    bucket side broadcast the whole quadratic verify otherwise lands on a
    single core."""
    planes = _hyperplanes(dim, n_planes, seed)
    e = _spread(embeddings, id_col).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        lsh_bucket(vec_col, planes).alias("_bucket"),
    ).withColumn("_nrm", _norm(F.col("vec")))
    a = e.select(
        "_bucket", F.col("id").alias("id_a"), F.col("vec").alias("va"),
        F.col("_nrm").alias("_na"),
    )
    b = e.select(
        "_bucket", F.col("id").alias("id_b"), F.col("vec").alias("vb"),
        F.col("_nrm").alias("_nb"),
    )
    return (
        a.join(b, on="_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
