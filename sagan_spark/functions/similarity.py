"""Similarity search over an embedding column (``array<float>``).

* **brute_force_topk** — exact cosine top-k per query: broadcast the query
  set (small), compute dot products with ``F.aggregate``/``F.zip_with``
  (JVM-side, codegen — no Python), window top-k.  The exact baseline; at
  100 TB this is a single broadcast-join scan, no shuffle except the
  per-query top-k aggregation.
* **lsh_ann_topk** — random-hyperplane LSH buckets (sign of dot with fixed
  deterministic hyperplanes) → candidates share ≥1 band bucket → exact
  rerank within candidates.  The scale path: candidate generation is an
  equi-join on bucket keys.
* **ivf_topk** — IVF-style: k-means-lite centroids chosen deterministically
  (first C vectors as seeds, one Lloyd iteration via DataFrame ops),
  probe the nearest ``nprobe`` cells.  Approximate; recall tested vs brute
  force in pytest.
* **cosine_dup_pairs** — embedding-cosine near-duplicate pairs for the
  dedup family: LSH-banded candidate self-join + exact-cosine verify.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"),
                       lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"),
                              lambda acc, v: acc + v * v))


def with_cosine(df: DataFrame, a_col: str, b_col: str,
                out: str = "cosine") -> DataFrame:
    a, b = F.col(a_col), F.col(b_col)
    return df.withColumn(
        out, F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6))


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id",
                     max_queries: int = 10000) -> DataFrame:
    """For each query row (query_id, embedding) return its k nearest
    neighbors by cosine (excluding self-id), deterministic tie-break on
    (cosine desc, neighbor id asc).

    Plan shape: broadcast(queries) ⋈ vectors (no shuffle of the big side)
    → per-pair cosine in codegen → window top-k keyed by query_id.

    This is the EXACT baseline: |V|×|Q| scored pairs.  A large queries
    frame would silently turn it into an all-pairs scan nobody asked
    for, so |Q| is checked against ``max_queries`` up front — use
    lsh_ann_topk / ivf_topk for bulk query sets."""
    nq = queries.count()
    if nq > max_queries:
        raise ValueError(
            f"brute_force_topk got {nq} queries (> {max_queries}); the "
            "broadcast nested-loop is the exact small-Q baseline — use "
            "lsh_ann_topk or ivf_topk for bulk query sets, or raise "
            "max_queries explicitly")
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_emb"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("v_emb"))
    pairs = v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = with_cosine(pairs, "q_emb", "v_emb")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (sin-based — stable across
    runs and engines, no RNG state)."""
    return [[math.sin(0.7 * p + 1.3 * d + 0.31) for d in range(dim)]
            for p in range(n_planes)]


def lsh_ann_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 dim: int = 64, n_bands: int = 8,
                 band_bits: int = 4) -> DataFrame:
    """Random-hyperplane LSH: signature = sign bits vs n_bands*band_bits
    hyperplanes; candidates = pairs sharing any band; exact cosine rerank
    → top-k (may differ from brute force only when a true neighbor shares
    no band — recall measured in tests)."""
    planes = _hyperplanes(dim, n_bands * band_bits)

    def band_cols(emb):
        cols = []
        for b in range(n_bands):
            bits = None
            for i in range(band_bits):
                p = planes[b * band_bits + i]
                arr = F.array(*[F.lit(x) for x in p])
                bit = F.when(_dot(emb, arr) >= 0, 1).otherwise(0)
                bits = bit if bits is None else bits * 2 + bit
            cols.append(F.struct(F.lit(b).alias("band"),
                                 bits.alias("bucket")))
        return F.array(*cols)

    v = vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("v_emb"),
                       F.explode(band_cols(F.col(vec_col))).alias("bb")
                       ).select("neighbor_id", "v_emb", "bb.band", "bb.bucket")
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_emb"),
                       F.explode(band_cols(F.col(vec_col))).alias("bb")
                       ).select("query_id", "q_emb", "bb.band", "bb.bucket")
    cand = (v.join(F.broadcast(q), ["band", "bucket"])
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "q_emb", "neighbor_id", "v_emb")
            .distinct())
    scored = with_cosine(cand, "q_emb", "v_emb")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def derive_band_bits(n: int) -> int:
    """Scale-adaptive band width for cosine_dup_pairs: random-collision
    candidates grow ~ n_bands * n**2 / 2**(band_bits+1), so band_bits
    must grow ~ log2(n)/2 to keep that load ~ n_bands * n / 2 (linear in
    the corpus).  ceil, never floor — under-provisioned bands are the
    quadratic failure mode; over-provisioned ones only cost recall at
    the margin."""
    return max(2, math.ceil(math.log2(max(n, 4)) / 2))


def cosine_dup_pairs(vectors: DataFrame, threshold: float = 0.30,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     dim: int = 64, n_bands: int = 8,
                     band_bits: int | None = 4) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-family sibling of
    lsh_ann_topk): candidates are id pairs sharing >= 1 random-hyperplane
    band bucket — a bucketed SELF-join, never an all-pairs product — then
    exact-cosine verified against ``threshold``.

    Returns (id_a, id_b, cosine) with id_a < id_b, cosine rounded to 6.

    Scale shape: random (non-duplicate) vectors spread uniformly over
    2**band_bits buckets per band, so the candidate set is
    ~ n_bands * |V|**2 / 2**(band_bits+1) pairs PLUS the true duplicate
    clusters.  ``band_bits`` must therefore grow with |V| — about
    log2(|V|)/2 keeps the random-collision load ~ n_bands*|V|/2 — and
    the 4-bit default only suits corpora up to ~50k vectors.  Pass
    ``band_bits=None`` to derive it from a count of ``vectors`` (one
    extra action; wider bands trade recall for candidate volume).  A
    degenerate bucket of true duplicates is the data's own duplication,
    which is the thing being measured."""
    if band_bits is None:
        band_bits = derive_band_bits(vectors.count())
    planes = _hyperplanes(dim, n_bands * band_bits)

    def band_cols(emb):
        cols = []
        for b in range(n_bands):
            bits = None
            for i in range(band_bits):
                p = planes[b * band_bits + i]
                arr = F.array(*[F.lit(x) for x in p])
                bit = F.when(_dot(emb, arr) >= 0, 1).otherwise(0)
                bits = bit if bits is None else bits * 2 + bit
            cols.append(F.struct(F.lit(b).alias("band"),
                                 bits.alias("bucket")))
        return F.array(*cols)

    v = vectors.select(F.col(id_col).alias("vid"),
                       F.col(vec_col).alias("emb"),
                       F.explode(band_cols(F.col(vec_col))).alias("bb")
                       ).select("vid", "emb", "bb.band", "bb.bucket")
    a = v.select(F.col("vid").alias("id_a"), F.col("emb").alias("a_emb"),
                 "band", "bucket")
    b = v.select(F.col("vid").alias("id_b"), F.col("emb").alias("b_emb"),
                 "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "a_emb", "id_b", "b_emb")
            .distinct())
    return (with_cosine(cand, "a_emb", "b_emb")
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = 16, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF-lite: centroids = the first n_cells vectors by id
    (deterministic seeds, cell = rank in id order); vectors assigned to
    the nearest centroid; queries probe the nprobe nearest cells and
    rerank exactly within them.  Approximate by design — the 100 TB path
    where brute force is too wide."""
    seed_w = Window.orderBy(id_col)
    seeds = (vectors.orderBy(id_col).limit(n_cells)
             .select((F.row_number().over(seed_w) - 1).alias("cell"),
                     F.col(vec_col).alias("c_emb")))
    v = vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("v_emb"))
    # assign each vector to nearest seed (broadcast seeds)
    assign_w = Window.partitionBy("neighbor_id").orderBy(
        F.col("cosine").desc(), F.col("cell").asc())
    assigned = (with_cosine(v.crossJoin(F.broadcast(seeds)),
                            "v_emb", "c_emb")
                .withColumn("rn", F.row_number().over(assign_w))
                .filter(F.col("rn") == 1)
                .select("neighbor_id", "v_emb", "cell"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_emb"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cell").asc())
    probes = (with_cosine(q.crossJoin(F.broadcast(seeds)), "q_emb", "c_emb")
              .withColumn("rn", F.row_number().over(probe_w))
              .filter(F.col("rn") <= nprobe)
              .select("query_id", "q_emb", "cell"))
    cand = (assigned.join(F.broadcast(probes), "cell")
            .filter(F.col("neighbor_id") != F.col("query_id")))
    scored = with_cosine(cand, "q_emb", "v_emb")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
