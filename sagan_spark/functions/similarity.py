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

import pandas as pd

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


def _vec_key(col):
    """8-byte exact-duplicate collapse key (xxhash64 of the vector): the
    collapse shuffle carries the hash, not the raw array, at 100 TB.
    Collision-safe at the call site — cosine_dup_pairs re-checks true
    vector equality against the representative and re-collapses the
    (astronomically unlikely) losers by the raw vector; tests force a
    collision by monkeypatching this to a constant."""
    return F.xxhash64(col)


def derive_band_bits(n: int) -> int:
    """Scale-adaptive band width for cosine_dup_pairs.  Random
    (non-duplicate) vectors collide in a band with probability
    2**-band_bits, so the candidate self-join carries
    ~ n_bands * n**2 / 2**(band_bits+1) random pairs.  Keeping that load
    LINEAR in n needs 2**band_bits ~ n, i.e. band_bits = log2(n) - c;
    c = 3 puts the load at ~ 4 * n_bands * n pairs.  (log2(n)/2 — the
    round-3 rule — only tames it to ~n**1.5, which is 3.6e8 candidate
    pairs at 200k vectors: measured TIMEOUT in scale_smoke.)  Wider
    bands cost recall per band; the caller recovers recall by raising
    n_bands (recall ≈ 1-(1-p**band_bits)**n_bands for per-bit agreement
    probability p = 1 - angle/pi), which scales compute linearly instead
    of quadratically — derive_lsh_params does that jointly."""
    return max(2, math.ceil(math.log2(max(n, 4))) - 3)


def derive_lsh_params(n: int, threshold: float, recall_target: float = 0.9,
                      max_bands: int = 64) -> tuple[int, int, float]:
    """Joint (band_bits, n_bands, achieved_recall) for cosine_dup_pairs'
    auto mode (``band_bits=None``).

    band_bits follows derive_band_bits (keeps the random-collision
    candidate load LINEAR in the distinct-vector count n).  n_bands is
    then grown to hold ``recall_target`` for pairs AT the query
    threshold: a pair at cosine s collides in one band with probability
    p**band_bits (p = 1 - acos(s)/pi per hyperplane), so

        n_bands = ceil( ln(1-recall_target) / ln(1-p**band_bits) )

    floored at 8 and capped at ``max_bands`` — beyond the cap, plane
    compute and candidate volume grow faster than recall.  When the cap
    binds, the returned achieved_recall < recall_target is the
    documented RECALL FLOOR of the auto path at that scale: borderline
    pairs (cosine ≈ threshold) are found with that probability, while
    higher-similarity pairs converge to certainty (p → 1) and exact
    duplicates are found always (the collapse catches them before
    banding)."""
    band_bits = derive_band_bits(n)
    s = min(max(threshold, -1.0), 1.0)
    p = 1.0 - math.acos(s) / math.pi
    pb = p ** band_bits
    if pb >= 1.0:
        need = 1
    elif pb <= 1e-12:
        need = max_bands
    else:
        need = math.ceil(math.log(1.0 - recall_target) /
                         math.log(1.0 - pb))
    n_bands = min(max(8, need), max_bands)
    achieved = 1.0 - (1.0 - pb) ** n_bands
    return band_bits, n_bands, achieved


def cosine_dup_pairs(vectors: DataFrame, threshold: float = 0.30,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     dim: int = 64, n_bands: int = 8,
                     band_bits: int | None = 4) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-family sibling of
    lsh_ann_topk): candidates are id pairs sharing >= 1 random-hyperplane
    band bucket — a bucketed SELF-join, never an all-pairs product — then
    exact-cosine verified against ``threshold``.

    Returns (id_a, id_b, cosine) with id_a < id_b, cosine rounded to 6.

    Scale shape, two layers:

    * **Exact-duplicate collapse first.**  A web-scale corpus carries
      heavy exact duplication (the sf10 table: 200k rows, 2,000 distinct
      vectors, 100-member clusters).  LSH over raw rows self-joins every
      cluster in EVERY band — 8.4e9 candidate pairs measured at sf10 —
      so candidates are generated over DISTINCT vectors only; duplicate
      clusters re-expand afterwards (their pair volume is the data's own
      duplication, i.e. the answer, not wasted candidate work).
    * **Band width grows with the distinct count.**  Random vectors
      spread over 2**band_bits buckets per band → candidate load
      ~ n_bands * D**2 / 2**(band_bits+1) for D distinct vectors; see
      derive_band_bits for the log2(D)-based rule.  The 4-bit default
      suits distinct counts up to ~50k; pass ``band_bits=None`` to
      derive BOTH band_bits AND n_bands jointly (derive_lsh_params —
      n_bands then holds a 0.9 recall target at the threshold, capped
      at 64 bands; one extra count action) — the explicit ``n_bands``
      argument is ignored in that mode."""
    vv = vectors.select(F.col(id_col).alias("vid"),
                        F.col(vec_col).alias("emb"))
    # collapse exact dupes to a representative id per distinct vector.
    # The collapse shuffle is keyed by _vec_key (xxhash64 — 8 bytes on
    # the wire, not the raw array); min_by's map-side partial ships one
    # vector per (partition, key).  Hash collisions cannot corrupt the
    # output: members re-join by the hash and are CHECKED for true
    # vector equality against the representative — mismatches (a 2**-64
    # event, forced in tests by monkeypatching _vec_key) re-collapse by
    # the raw vector, a wide-key shuffle over an almost-always-empty
    # frame.
    tagged = vv.withColumn("vkey", _vec_key(F.col("emb")))
    hreps = tagged.groupBy("vkey").agg(
        F.min("vid").alias("rid"), F.min_by("emb", "vid").alias("remb"))
    joined = tagged.join(hreps, "vkey")
    eq = F.col("emb") == F.col("remb")
    mism = joined.filter(~eq)
    mreps = mism.groupBy("emb").agg(F.min("vid").alias("rid"))
    reps = (hreps.select("rid", F.col("remb").alias("emb"))
            .unionByName(mreps.select("rid", "emb"))
            .withColumnRenamed("rid", "vid"))
    # cluster map: representative id per input id
    members = (joined.filter(eq).select(F.col("rid"), F.col("vid"))
               .unionByName(mism.select("emb", "vid")
                            .join(mreps, "emb").select("rid", "vid")))
    if band_bits is None:
        band_bits, n_bands, _ = derive_lsh_params(reps.count(), threshold)
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

    if n_bands * band_bits <= 48:
        # few planes: JVM-side codegen expressions (and bit-stable with
        # the static DuckDB oracle that re-derives the same planes)
        bucketed = reps.select(
            "vid", "emb", F.explode(band_cols(F.col("emb"))).alias("bb"))
    else:
        # scale path (derived band_bits ~ log2 D): hundreds of nested
        # aggregate expressions blow past codegen limits and fall back
        # to interpreted eval — one Arrow-batched numpy matmul computes
        # every plane sign at once instead
        import numpy as np
        P = np.asarray(planes, dtype=np.float64)        # (planes, dim)
        w = (1 << np.arange(band_bits - 1, -1, -1)).astype(np.int64)

        @F.pandas_udf("array<int>")
        def bucket_vec(emb: pd.Series) -> pd.Series:
            E = np.stack(emb.to_numpy())                # (n, dim)
            bits = (E @ P.T) >= 0                       # (n, planes)
            bk = bits.reshape(len(E), n_bands, band_bits) @ w
            return pd.Series(list(bk.astype(np.int32)))

        bucketed = (reps.select(
            "vid", "emb",
            F.posexplode(bucket_vec(F.col("emb"))).alias("band", "bucket"))
            .select("vid", "emb",
                    F.struct("band", "bucket").alias("bb")))

    v = bucketed.select("vid", "emb", "bb.band", "bb.bucket")
    a = v.select(F.col("vid").alias("rid_a"), F.col("emb").alias("a_emb"),
                 "band", "bucket")
    b = v.select(F.col("vid").alias("rid_b"), F.col("emb").alias("b_emb"),
                 "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
            .filter(F.col("rid_a") < F.col("rid_b"))
            .select("rid_a", "a_emb", "rid_b", "b_emb")
            .distinct())
    rep_pairs = (with_cosine(cand, "a_emb", "b_emb")
                 .filter(F.col("cosine") >= threshold)
                 .select("rid_a", "a_emb", "rid_b", "cosine"))

    # expand duplicate clusters back to id pairs via the members map.
    # cross-cluster: every member of a × every member of b — the
    # verified rep-level cosine applies to all of them (identical vecs)
    ma, mb = members.alias("ma"), members.alias("mb")
    cross = (rep_pairs
             .join(ma, F.col("rid_a") == F.col("ma.rid"))
             .join(mb, F.col("rid_b") == F.col("mb.rid"))
             .select(F.least("ma.vid", "mb.vid").alias("id_a"),
                     F.greatest("ma.vid", "mb.vid").alias("id_b"),
                     "cosine"))
    # within-cluster: all pairs inside one duplicate cluster, cosine of
    # the vector with itself (rounded like every other pair; NaN for
    # zero vectors drops the pair, matching the raw self-join)
    w1, w2 = members.alias("w1"), members.alias("w2")
    within = (w1.join(w2, (F.col("w1.rid") == F.col("w2.rid")) &
                      (F.col("w1.vid") < F.col("w2.vid")))
              .join(reps.withColumnRenamed("vid", "rid"), "rid")
              .select(F.col("w1.vid").alias("id_a"),
                      F.col("w2.vid").alias("id_b"),
                      F.col("emb").alias("a_emb"),
                      F.col("emb").alias("b_emb")))
    within = (with_cosine(within, "a_emb", "b_emb")
              .filter(F.col("cosine") >= threshold)
              .select("id_a", "id_b", "cosine"))
    return cross.unionByName(within)


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = 16, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF-lite: centroids = the first n_cells vectors by id
    (deterministic seeds, cell = rank in id order); vectors assigned to
    the nearest centroid; queries probe the nprobe nearest cells and
    rerank exactly within them.  Approximate by design — the 100 TB path
    where brute force is too wide."""
    from pyspark.sql import types as T

    # seeds are enumerated DRIVER-side (collect of n_cells rows): a
    # row_number window over the unpartitioned seed frame would be a
    # single-partition WindowExec — harmless at 16 rows but its warning
    # drowns out real ones (a literal partitionBy key gets folded away
    # by Catalyst, so the explicit enumeration is the quiet exact form)
    seed_rows = (vectors.orderBy(id_col).limit(n_cells)
                 .select(F.col(vec_col)).collect())
    seeds = vectors.sparkSession.createDataFrame(
        [(i, r[0]) for i, r in enumerate(seed_rows)],
        T.StructType([
            T.StructField("cell", T.IntegerType(), False),
            T.StructField("c_emb", vectors.schema[vec_col].dataType)]))
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
