"""Embedding similarity search over ``array<float>`` columns.

Two strategies:

- Brute-force cosine top-k — the correctness baseline. The query set is
  broadcast (tiny); the candidate scan is embarrassingly parallel; top-k is a
  per-query-key window over scored pairs. Dot products use the JVM-side
  higher-order functions (``aggregate``/``zip_with``) in double precision —
  no Python in the loop.
- Sign-LSH bucketed ANN — the scale path: hash every vector to a bucket from
  the sign pattern of its first ``n`` dimensions (a fixed random-hyperplane
  family degenerates to coordinate hyperplanes here; deterministic and
  oracle-portable), equi-join query buckets to candidate buckets, then score
  only within the bucket. At 100 TB the equi-join replaces the full cross
  product; recall is tunable via multi-probe (hamming-adjacent buckets).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window as W

from log_agent_spark.scratch import pin, pinned_query
from log_agent_spark.sources.tables import load_table

TOP_K = 5
N_QUERIES = 10
LSH_SIGN_DIMS = 6


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


# ---------------------------------------------------------------------------
# Brute-force top-k: queries × candidates, score, rank per query.
# ---------------------------------------------------------------------------
def brute_force_topk(
    queries: DataFrame, candidates: DataFrame, k: int = TOP_K
) -> DataFrame:
    """queries: (query_id, q_emb array<double>); candidates: (vec_id, emb).

    Returns (query_id, neighbor_id, rank) — the float score is deliberately
    not in the output so value hashes are float-order-proof; rank is computed
    at full double precision with vec_id tie-break.
    """
    # Hoist the norms out of the pair loop: the higher-order-function dot
    # product is interpreted (no codegen), so computing 3 aggregates per
    # PAIR (dot + both norms) costs 3x one. Same doubles — sqrt(dot(v,v))
    # is a pure function of the row — so ranking is unchanged.
    q = F.broadcast(queries.withColumn("q_norm", _norm(F.col("q_emb"))))
    c = candidates.withColumn("c_norm", _norm(F.col("emb")))
    pairs = q.crossJoin(c).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("c_norm"))).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    # spread the dot-product scan across all cores — the fixture parquet is a
    # single split; on a real cluster input splits provide this for free
    candidates = emb.filter(F.col("vec_id") >= N_QUERIES).repartition(
        spark.sparkContext.defaultParallelism
    )
    return brute_force_topk(queries, candidates)


ORACLE_ANN_COSINE_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings WHERE vec_id >= {N_QUERIES}
), scored AS (
  SELECT query_id, vec_id AS neighbor_id,
         list_dot_product(q_emb, emb) /
           (sqrt(list_dot_product(q_emb, q_emb)) * sqrt(list_dot_product(emb, emb)))
           AS cos
  FROM q CROSS JOIN c
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# Sign-LSH bucketed ANN: bucket = sign bits of the first n dims.
# ---------------------------------------------------------------------------
def sign_bucket(emb: Column, n_dims: int = LSH_SIGN_DIMS) -> Column:
    bits = [
        F.when(F.element_at(emb, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_dims)
    ]
    return F.concat(*bits)


def probe_buckets(bucket: Column, n_dims: int = LSH_SIGN_DIMS) -> Column:
    """Multi-probe set: the query's own bucket plus every hamming-distance-1
    neighbor (one sign bit flipped) — n+1 probes instead of 2^n buckets.
    The recall knob: a near-neighbor that disagrees with the query on ONE
    borderline sign still gets scored. Candidates live in exactly one
    bucket and probes are distinct, so the probe-join creates no duplicate
    pairs."""

    def _flip(i: int) -> Column:
        flipped = F.when(
            F.substring(bucket, i + 1, 1) == "1", F.lit("0")
        ).otherwise(F.lit("1"))
        return F.concat(F.substring(bucket, 1, i), flipped, F.substring(bucket, i + 2, n_dims))

    return F.array(bucket, *[_flip(i) for i in range(n_dims)])


def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN with hamming-1 multi-probe over the query's buckets."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("emb"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    bucketed = emb.select("vec_id", "emb", sign_bucket(F.col("emb")).alias("bucket"))
    queries = (
        bucketed.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.explode(probe_buckets(F.col("bucket"))).alias("bucket"),
        )
    )
    candidates = bucketed.filter(F.col("vec_id") >= N_QUERIES)
    return _cell_topk(queries, candidates, on="bucket")


def _bucket_sql(emb: str) -> str:
    bits = " || ".join(
        f"CASE WHEN {emb}[{i + 1}] >= 0 THEN '1' ELSE '0' END"
        for i in range(LSH_SIGN_DIMS)
    )
    return f"({bits})"


_PROBES_SQL = ", ".join(
    ["bucket"]
    + [
        f"substr(bucket, 1, {i}) || "
        f"(CASE WHEN substr(bucket, {i + 1}, 1) = '1' THEN '0' ELSE '1' END) || "
        f"substr(bucket, {i + 2}, {LSH_SIGN_DIMS})"
        for i in range(LSH_SIGN_DIMS)
    ]
)

ORACLE_ANN_LSH_BUCKETED = f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         {_bucket_sql("(embedding::DOUBLE[])")} AS bucket
  FROM embeddings
), q AS (
  SELECT query_id, q_emb, UNNEST(probes) AS bucket
  FROM (SELECT vec_id AS query_id, emb AS q_emb,
               list_value({_PROBES_SQL}) AS probes
        FROM b WHERE vec_id < {N_QUERIES})
), c AS (
  SELECT vec_id, emb, bucket FROM b WHERE vec_id >= {N_QUERIES}
), scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         list_dot_product(q_emb, emb) /
           (sqrt(list_dot_product(q_emb, q_emb)) * sqrt(list_dot_product(emb, emb)))
           AS cos
  FROM q JOIN c USING (bucket)
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the classic coarse-quantizer scale path:
# assign every vector to its nearest centroid cell, then search only the
# query's cell. Here the coarse "training" is deterministic (centroids :=
# the first N_CENTROIDS vectors) so the whole operator — assignment via a
# dot-product argmax window, cell-equi-join, in-cell top-k — is declarative
# and oracle-checkable; a production deploy swaps the trainer for
# pyspark.ml KMeans on a sample without touching the search plan.
# Scale: assignment is a broadcast-join + window over n_vectors×k rows with
# map-side pruning; search shuffles only on the (tiny) cell key.
# ---------------------------------------------------------------------------
N_CENTROIDS = 16


def ivf_assign(
    vectors: DataFrame, centroids: DataFrame, nprobe: int = 1, keep_rank: bool = False
) -> DataFrame:
    """vectors (vec_id, emb) × centroids (centroid_id, c_emb) → (vec_id, emb,
    cell): the ``nprobe`` nearest centroids by dot product (vectors are
    unit-norm ⇒ same as cosine), ties to the lowest centroid_id. nprobe=1
    is index assignment; nprobe>1 is the query-side multi-probe set.
    ``keep_rank`` additionally exposes the probe rank (1 = nearest cell) as
    ``probe_rank`` so one max-nprobe assignment can serve every smaller
    setting by filtering (the nprobe-curve flatten).

    r10 form (guide §2.3/§2.4): the centroid table collapses to ONE
    broadcast array row and each vector ranks its cells in a per-row
    sorted projection — the k-fanned (n_vectors × k) intermediate and the
    row_number window's hash exchange on vec_id (a full shuffle of the
    corpus WITH its embedding payload) are gone; assignment is now a
    zero-shuffle map over the vector scan. Ordering is value-identical:
    the sort key (-dot, centroid_id) ascending IS (dot DESC, centroid_id
    ASC), the dot is the same ``_dot`` left-fold over the same doubles,
    and centroid_id is unique so ties cannot reorder. Empty centroid
    frames still assign zero rows (posexplode of an empty probe slice).
    """
    cent_arr = centroids.agg(
        F.collect_list(F.struct(F.col("centroid_id"), F.col("c_emb"))).alias(
            "_cents"
        )
    )
    ranked = (
        vectors.crossJoin(F.broadcast(cent_arr))
        .select(
            "vec_id",
            "emb",
            F.slice(
                F.array_sort(
                    F.transform(
                        F.col("_cents"),
                        lambda c: F.struct(
                            (-_dot(F.col("emb"), c["c_emb"])).alias("_negdot"),
                            c["centroid_id"].alias("_cid"),
                        ),
                    )
                ),
                1,
                nprobe,
            ).alias("_probes"),
        )
        .select("vec_id", "emb", F.posexplode("_probes").alias("_pos", "_probe"))
    )
    cols = ["vec_id", "emb", F.col("_probe._cid").alias("cell")]
    if keep_rank:
        cols.append((F.col("_pos") + 1).cast("int").alias("probe_rank"))
    return ranked.select(*cols)


def _score_pairs(
    probes: DataFrame,
    candidates: DataFrame,
    on: str = "cell",
    carry: tuple[str, ...] = (),
    broadcast_probes: bool = False,
) -> DataFrame:
    """Bucketed-search scoring half: probes (query_id, q_emb, <on>) ⋈
    candidates (vec_id, emb, <on>) on the bucket key → per-pair cosine.
    Norms hoisted out of the per-pair score (see brute_force_topk);
    ``carry`` passes extra probe-side columns through (e.g. probe_rank
    for the nprobe-curve flatten)."""
    q = probes.withColumn("q_norm", _norm(F.col("q_emb")))
    if broadcast_probes:
        q = F.broadcast(q)
    return q.join(candidates.withColumn("c_norm", _norm(F.col("emb"))), on).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("c_norm"))).alias("cos"),
        *carry,
    )


def _topk_tail(
    pairs: DataFrame, k: int = TOP_K, partition: tuple[str, ...] = ("query_id",)
) -> DataFrame:
    """Canonical per-partition cosine top-k tail: (cos DESC, neighbor_id
    ASC) tie-break, rank as long. ONE definition so a cast/tie-break
    change cannot drift between the IVF, sign-LSH, and filtered variants
    (round-6 review)."""
    w = W.partitionBy(*partition).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*partition, "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def _cell_topk(
    probes: DataFrame,
    candidates: DataFrame,
    k: int = TOP_K,
    on: str = "cell",
    broadcast_probes: bool = False,
) -> DataFrame:
    """Shared bucketed-search body: _score_pairs + _topk_tail (see those
    for the conventions)."""
    return _topk_tail(
        _score_pairs(probes, candidates, on=on, broadcast_probes=broadcast_probes),
        k=k,
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: nearest-centroid cell assignment, then search only the query's cell."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("emb"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("c_emb")
    )
    cells = ivf_assign(emb, centroids)
    probes = cells.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"), "cell"
    )
    candidates = cells.filter(F.col("vec_id") >= N_QUERIES)
    return _cell_topk(probes, candidates)


def _ivf_oracle(nprobe: int) -> str:
    """One SQL body for both IVF variants: candidates from the rn=1
    assignment, query probes from the same window with rn <= nprobe."""
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, emb AS c_emb FROM e WHERE vec_id < {N_CENTROIDS}
), ranked AS (
  SELECT e.vec_id, e.emb, cent.centroid_id AS cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY list_dot_product(e.emb, cent.c_emb) DESC,
                                     cent.centroid_id ASC) AS rn
  FROM e CROSS JOIN cent
), q AS (
  SELECT vec_id AS query_id, emb AS q_emb, cell FROM ranked
  WHERE vec_id < {N_QUERIES} AND rn <= {nprobe}
), c AS (
  SELECT vec_id, emb, cell FROM ranked
  WHERE vec_id >= {N_QUERIES} AND rn = 1
), scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         list_dot_product(q_emb, emb) /
           (sqrt(list_dot_product(q_emb, q_emb)) * sqrt(list_dot_product(emb, emb)))
           AS cos
  FROM q JOIN c USING (cell)
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


ORACLE_ANN_IVF = _ivf_oracle(1)


# ---------------------------------------------------------------------------
# Vector norms / label centroids — aggregate over array columns.
# ---------------------------------------------------------------------------
# Dyadic quantization scale for order-free float aggregation: x * 2^k is
# an EXACT double operation, so sign(v)·floor(|v|+0.5) rounds identically
# on both engines by construction, and the quantized BIGINT sums are
# accumulation-order-free — AVG/SUM over raw irrational doubles adds in
# Spark partition-merge order vs DuckDB scan order and can flip a
# round(4) boundary (round-6 review; the embedding_dim_audit discipline).
_NORM_Q = 1 << 26
_KM_Q = 1 << 30  # k-means centroid math (q_kmeans_step)


def _q_away(x: Column, q: int) -> Column:
    """sign(x)·floor(|x·q| + 0.5) as BIGINT — the repo's half-away-from-
    zero quantizer (tests/_qsum twin), exact for dyadic q."""
    v = x * q
    return (F.signum(v) * F.floor(F.abs(v) + F.lit(0.5))).cast("bigint")


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    )
    return (
        emb.select("label", _norm(F.col("emb")).alias("norm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            # quantized integer sum, ONE final division (order-free)
            F.round(
                F.sum(_q_away(F.col("norm"), _NORM_Q))
                / (F.count("*") * F.lit(float(_NORM_Q))),
                4,
            ).alias("avg_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
    )


ORACLE_EMBEDDING_NORMS = f"""
SELECT label, COUNT(*) AS n_vecs,
       ROUND(SUM(CAST(sign(norm * {_NORM_Q})
                      * FLOOR(abs(norm * {_NORM_Q}) + 0.5) AS BIGINT))
             / (COUNT(*) * {float(_NORM_Q)}), 4) AS avg_norm,
       ROUND(MAX(norm), 4) AS max_norm
FROM (
  SELECT label, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
)
GROUP BY label
"""


# ---------------------------------------------------------------------------
# Int8 scalar quantization — the 100 TB memory lever for vector search:
# per-vector symmetric scale (max|x|/127), values rounded to [-127, 127].
# A quantized corpus is 4-8x smaller than float32/float64, which is what
# lets a candidate set fit executor memory (or a broadcast) at scale. For
# COSINE the per-vector scales cancel, so scoring is a pure ratio of
# integer-valued doubles — exact on both engines, no float-drift risk.
# Quantized values stay integral-in-double: products/sums are exact
# (≤127²·dim ≪ 2^53), so ranking is deterministic.
# ---------------------------------------------------------------------------
def quantize_int8(emb: Column) -> Column:
    """array<double> → integral-valued array<double> in [-127, 127].

    Zero-vector guard: scale = 0 would make x/scale NaN on Spark (NaN
    sorts ABOVE every real cosine, flooding top-k) but NULL on DuckDB —
    an all-zero vector quantizes to all zeros on both engines instead
    (round-6 review; _label_centroid_ranks guards the same case)."""
    scale = (
        F.aggregate(emb, F.lit(0.0).cast("double"), lambda a, v: F.greatest(a, F.abs(v)))
        / 127.0
    )
    return F.transform(
        emb,
        lambda x: F.when(scale > 0, F.round(x / scale, 0)).otherwise(
            F.lit(0.0)
        ),
    )


def q_ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized ANN: 4x smaller vectors, top-k re-ranked in int space."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", quantize_int8(as_double(F.col("embedding"))).alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    candidates = emb.filter(F.col("vec_id") >= N_QUERIES).repartition(
        spark.sparkContext.defaultParallelism
    )
    return brute_force_topk(queries, candidates)


ORACLE_ANN_INT8_TOPK = f"""
WITH z AS (
  SELECT vec_id,
         list_transform(
           embedding::DOUBLE[],
           x -> CASE WHEN list_max(list_transform(embedding::DOUBLE[],
                                                  y -> abs(y))) > 0
                     THEN round(x / (list_max(list_transform(embedding::DOUBLE[],
                                                             y -> abs(y))) / 127.0))
                     ELSE 0.0 END
         ) AS emb
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM z WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id, emb FROM z WHERE vec_id >= {N_QUERIES}
), scored AS (
  SELECT query_id, vec_id AS neighbor_id,
         list_dot_product(q_emb, emb) /
           (sqrt(list_dot_product(q_emb, q_emb)) * sqrt(list_dot_product(emb, emb)))
           AS cos
  FROM q CROSS JOIN c
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# Metadata-filtered ANN (pre-filter form): top-k among candidates sharing
# the query's label — the production pattern where vector search composes
# with a relational predicate (tenant, language, license class). The label
# equi-join IS the filter: it prunes the candidate set before any scoring,
# and at scale it is the partition key that keeps each search inside one
# shard of the corpus. Post-filter ANN (search then filter) loses recall
# when the filter is selective; pre-filter keeps exactly k true results.
# ---------------------------------------------------------------------------
def q_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        "label",
    )
    candidates = emb.filter(F.col("vec_id") >= N_QUERIES).repartition(
        spark.sparkContext.defaultParallelism
    )
    return _cell_topk(queries, candidates, on="label", broadcast_probes=True)


ORACLE_ANN_FILTERED_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb, label
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb, label
  FROM embeddings WHERE vec_id >= {N_QUERIES}
), scored AS (
  SELECT query_id, vec_id AS neighbor_id,
         list_dot_product(q_emb, emb) /
           (sqrt(list_dot_product(q_emb, q_emb)) * sqrt(list_dot_product(emb, emb)))
           AS cos
  FROM q JOIN c USING (label)
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# One k-means update step — the training loop behind the IVF coarse
# quantizer (`ivf_assign` is the E-step; this is the M-step + convergence
# metric). Per cell: member count, the recomputed centroid's norm, and the
# cosine between old and new centroid (the "movement" a trainer iterates
# until ≈1). Shape: posexplode the assigned vectors once, average per
# (cell, dimension), reduce per cell — centroid math becomes scalar
# aggregations, no array reconstruction, no collect. At 100 TB: the
# assignment join broadcasts k centroids; the update is two keyed
# aggregations on (cell, dim) then (cell) — k×dim is tiny, so every
# iteration's output is driver-negligible and the loop's heavy pass is
# always the single assignment scan (pyspark.ml KMeans runs the same
# shape; this keeps it declarative and oracle-checkable).
# ---------------------------------------------------------------------------
def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("emb"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("c_emb")
    )
    assigned = ivf_assign(emb, centroids)
    # exact-integer centroid math (round-6 review): avg(val) and the
    # m·m / m·cval double sums accumulate in engine-specific order; with
    # the dyadic _q_away quantization the un-normalized numerators are
    # exact DECIMAL sums and the scales divide out at the end —
    #   m_p        = m_num_p / (n·Q)
    #   ‖m‖        = sqrt(Σ m_num_p²) / (n·Q)
    #   cos(m, c)  = Σ m_num_p·cq_p / (sqrt(Σ m_num_p²)·sqrt(Σ cq_p²))
    # exact while n·Q < 1e19 (n ≤ ~8e9 members/cell at Q = 2^30)
    means = (
        assigned.select("cell", F.posexplode("emb").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(
            F.sum(_q_away(F.col("val"), _KM_Q))
            .cast("decimal(19,0)")
            .alias("m_num")
        )
    )
    cent_elems = centroids.select(
        F.col("centroid_id").alias("cell"),
        F.posexplode("c_emb").alias("pos", "cval"),
    ).select(
        "cell", "pos", _q_away(F.col("cval"), _KM_Q).cast("decimal(19,0)").alias("cq")
    )
    moved = (
        means.join(cent_elems, ["cell", "pos"])
        .groupBy("cell")
        .agg(
            F.sum(F.col("m_num") * F.col("m_num")).alias("mm_raw"),
            F.sum(F.col("m_num") * F.col("cq")).alias("mc_raw"),
            F.sum(F.col("cq") * F.col("cq")).alias("cc_raw"),
        )
    )
    counts = assigned.groupBy("cell").agg(F.count("*").alias("n_members"))
    sq_mm = F.sqrt(F.col("mm_raw").cast("double"))
    return counts.join(moved, "cell").select(
        "cell",
        "n_members",
        F.round(
            sq_mm / (F.col("n_members") * F.lit(float(_KM_Q))), 4
        ).alias("new_centroid_norm"),
        F.round(
            F.col("mc_raw").cast("double")
            / (sq_mm * F.sqrt(F.col("cc_raw").cast("double"))),
            4,
        ).alias("movement_cos"),
    )


ORACLE_KMEANS_STEP = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, emb AS c_emb FROM e WHERE vec_id < {N_CENTROIDS}
), assigned AS (
  SELECT vec_id, emb, centroid_id AS cell FROM (
    SELECT e.vec_id, e.emb, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY list_dot_product(e.emb, cent.c_emb) DESC,
                                       cent.centroid_id ASC) AS rn
    FROM e CROSS JOIN cent
  ) WHERE rn = 1
), means AS (
  SELECT cell, pos,
         CAST(SUM(CAST(sign(val * {_KM_Q}) * FLOOR(abs(val * {_KM_Q}) + 0.5)
                       AS BIGINT)) AS DECIMAL(19,0)) AS m_num
  FROM (
    SELECT cell, generate_subscripts(emb, 1) AS pos, unnest(emb) AS val
    FROM assigned
  ) GROUP BY cell, pos
), cent_elems AS (
  SELECT cell, pos,
         CAST(CAST(sign(cval * {_KM_Q}) * FLOOR(abs(cval * {_KM_Q}) + 0.5)
                   AS BIGINT) AS DECIMAL(19,0)) AS cq
  FROM (
    SELECT centroid_id AS cell, generate_subscripts(c_emb, 1) AS pos,
           unnest(c_emb) AS cval
    FROM cent
  )
), moved AS (
  SELECT cell, SUM(m_num * m_num) AS mm_raw, SUM(m_num * cq) AS mc_raw,
         SUM(cq * cq) AS cc_raw
  FROM means JOIN cent_elems USING (cell, pos)
  GROUP BY cell
), counts AS (
  SELECT cell, COUNT(*) AS n_members FROM assigned GROUP BY cell
)
SELECT cell, n_members,
       ROUND(sqrt(CAST(mm_raw AS DOUBLE)) / (n_members * {float(_KM_Q)}), 4)
         AS new_centroid_norm,
       ROUND(CAST(mc_raw AS DOUBLE)
             / (sqrt(CAST(mm_raw AS DOUBLE)) * sqrt(CAST(cc_raw AS DOUBLE))), 4)
         AS movement_cos
FROM counts JOIN moved USING (cell)
"""


# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive training: per anchor, the top-k most
# similar vectors with a DIFFERENT label — nearly-confusable cross-class
# pairs, the batch op behind triplet/InfoNCE dataset construction. Same
# broadcast-anchors × partitioned-candidates shape as brute_force_topk with
# the label inequality applied BEFORE scoring (prunes same-class pairs from
# the dot-product loop); the production path swaps the cross join for the
# IVF/LSH-bucketed candidate generation above, unchanged downstream.
# ---------------------------------------------------------------------------
def q_ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb"), "label"
    )
    anchors = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("emb").alias("q_emb"),
        F.col("label").alias("anchor_label"),
    )
    candidates = emb.filter(F.col("vec_id") >= N_QUERIES).repartition(
        spark.sparkContext.defaultParallelism
    )
    q = F.broadcast(anchors.withColumn("q_norm", _norm(F.col("q_emb"))))
    c = candidates.withColumn("c_norm", _norm(F.col("emb")))
    pairs = (
        q.crossJoin(c)
        .filter(F.col("label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            (
                _dot(F.col("q_emb"), F.col("emb"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos"),
        )
    )
    w = W.partitionBy("anchor_id").orderBy(F.desc("cos"), F.asc("negative_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("anchor_id", "anchor_label", "negative_id", "negative_label", F.col("rank").cast("long").alias("rank"))
    )


ORACLE_ANN_HARD_NEGATIVES = f"""
WITH q AS (
  SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS q_emb, label AS anchor_label
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb, label
  FROM embeddings WHERE vec_id >= {N_QUERIES}
), scored AS (
  SELECT anchor_id, anchor_label, vec_id AS negative_id, label AS negative_label,
         list_dot_product(q_emb, emb) /
           (sqrt(list_dot_product(q_emb, q_emb)) * sqrt(list_dot_product(emb, emb)))
           AS cos
  FROM q CROSS JOIN c
  WHERE label <> anchor_label
)
SELECT anchor_id, anchor_label, negative_id, negative_label, rank FROM (
  SELECT anchor_id, anchor_label, negative_id, negative_label,
         ROW_NUMBER() OVER (PARTITION BY anchor_id
                            ORDER BY cos DESC, negative_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# Power iteration for the corpus's top principal direction — Gram-free
# distributed PCA: v ← normalize(Xᵀ(Xv)), never materializing the d×d
# covariance. Each iteration is two keyed aggregations over the
# pos-exploded matrix: scores sᵢ = xᵢ·v (groupBy vec_id, v broadcast) and
# v'ₚ = Σᵢ xᵢ[p]·sᵢ (groupBy pos, scores broadcast — d rows out), plus a
# one-row norm broadcast. At 100 TB the exploded matrix is the only big
# relation, partitioned once and reused across the fixed iteration count
# (localCheckpoint cadence per connected_components for longer runs).
# Deterministic start v₀ = e₀; output rounded to 6dp — cross-engine sum
# noise is ~1e-12 against component magnitudes of ~1e-1.
# ---------------------------------------------------------------------------
POWER_ITERS = 3


@pinned_query("power_iter_")
def q_power_iteration_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10 (guide §2.4): the pos-exploded matrix form joined x with a
    # broadcast v on pos and with broadcast scores on vec_id — two joins +
    # a vec_id-keyed aggregation over n·d rows per iteration. The array
    # form keeps each vector whole: sᵢ = xᵢ·v is an in-row fold against a
    # ONE-ROW broadcast coefficient array (no join, no vec_id agg at all),
    # and v' = Σᵢ xᵢ[p]·sᵢ is one posexplode + pos-keyed aggregation whose
    # map-side partials reduce to d rows per task. Per iteration: 2 joins
    # + 2 n·d-row aggs → 1 map pass + 1 d-row agg. The corpus is pinned
    # once as n array rows (smaller than the old n·d exploded pin).
    # Float semantics: sᵢ becomes an index-ordered fold instead of an
    # unordered partition sum — same ±1e-15-class noise the round-6
    # output boundary already absorbs on both engines.
    emb = pin(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", as_double(F.col("embedding")).alias("emb")
        ).repartition(spark.sparkContext.defaultParallelism)
    )
    # v₀ = e₀ as a one-row array (fixture embeddings are fixed-width; a
    # width change would surface as an oracle rows/hash mismatch)
    varr = emb.agg(F.max(F.size("emb")).alias("d")).select(
        F.transform(
            F.sequence(F.lit(0), F.col("d") - 1),
            lambda i: F.when(i == 0, 1.0).otherwise(0.0),
        ).alias("varr")
    )
    # Normalization deferred to the END: scaling cancels in the direction,
    # and growth over a fixed 3 iterations stays far inside double range —
    # dropping the per-iteration norm + rescale removes two stages per
    # round (measured ~25% of the operator's wall time).
    v = None
    for _ in range(POWER_ITERS):
        if v is not None:
            varr = v.agg(
                F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv")
            ).select(F.transform("pv", lambda s: s["v"]).alias("varr"))
        scored = emb.crossJoin(F.broadcast(varr)).select(
            _dot(F.col("emb"), F.col("varr")).alias("s"), "emb"
        )
        v = (
            scored.select("s", F.posexplode("emb").alias("pos", "val"))
            .groupBy("pos")
            .agg(F.sum(F.col("val") * F.col("s")).alias("v"))
        )
    norm = v.agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("n"))
    return v.crossJoin(F.broadcast(norm)).select(
        # long at the boundary: posexplode yields int32, oracle emits BIGINT
        F.col("pos").cast("long").alias("pos"),
        F.round(F.col("v") / F.col("n"), 6).alias("component"),
    )


def _power_iteration_oracle() -> str:
    base = """
WITH x AS (
  SELECT vec_id, generate_subscripts(emb, 1) - 1 AS pos, unnest(emb) AS val
  FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
),
v0 AS (
  SELECT pos, CASE WHEN pos = 0 THEN 1.0 ELSE 0.0 END AS v
  FROM (SELECT DISTINCT pos FROM x)
)"""
    prev = "v0"
    for i in range(1, POWER_ITERS + 1):
        base += f""",
s{i} AS (
  SELECT vec_id, SUM(val * v) AS s FROM x JOIN {prev} USING (pos) GROUP BY vec_id
),
v{i} AS (
  SELECT pos, SUM(val * s) AS v FROM x JOIN s{i} USING (vec_id) GROUP BY pos
)"""
        prev = f"v{i}"
    return base + f""",
nrm AS (SELECT sqrt(SUM(v * v)) AS n FROM {prev})
SELECT pos, ROUND(v / n, 6) AS component FROM {prev} CROSS JOIN nrm"""


ORACLE_POWER_ITERATION_PC1 = _power_iteration_oracle()


# ---------------------------------------------------------------------------
# ANN recall report — the evaluation the recall-floor tests run, as an
# in-engine query: per query vector, how many of the exact top-k the
# LSH-bucketed index recovered. Ground truth and approximate results are
# both tiny (n_queries × k), so the comparison join is free; the expensive
# parts are the two searches themselves, each already scale-shaped. This
# is the query an index-tuning loop watches while turning the multi-probe
# / banding knobs.
# ---------------------------------------------------------------------------
def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = q_ann_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    approx = q_ann_lsh_bucketed(spark, sf_dir).select(
        F.col("query_id").alias("a_query"), F.col("neighbor_id").alias("a_neighbor")
    )
    joined = exact.join(
        approx,
        (exact.query_id == approx.a_query)
        & (exact.neighbor_id == approx.a_neighbor),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("a_neighbor").alias("n_recovered"),
        F.round(F.count("a_neighbor") / float(TOP_K), 4).alias("recall_at_k"),
    )


ORACLE_ANN_RECALL_REPORT = f"""
SELECT e.query_id, COUNT(a.neighbor_id) AS n_recovered,
       ROUND(COUNT(a.neighbor_id) * 1.0 / {TOP_K}, 4) AS recall_at_k
FROM ({ORACLE_ANN_COSINE_TOPK}) e
LEFT JOIN ({ORACLE_ANN_LSH_BUCKETED}) a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
"""


# ---------------------------------------------------------------------------
# Matryoshka truncation evaluation (Kusupati et al., "Matryoshka
# Representation Learning", NeurIPS 2022 operational side): how much
# recall@k survives when vectors are truncated to their first d
# dimensions? The question every MRL deployment asks before shipping the
# cheap prefix index; here it is one query — exact top-k at full
# dimension is the ground truth, the same brute-force search re-runs on
# array-slice prefixes, and recall = |prefix ∩ full| / (Q·k) as an exact
# integer ratio. Scale: each prefix search is the brute-force shape
# (broadcast queries, parallel scan, per-query window); the comparison
# join runs on Q·k-row tables.
# ---------------------------------------------------------------------------
MRL_DIMS = [64, 32, 16, 8]


@pinned_query("mrl_")
def q_ann_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of prefix-truncated embeddings vs full-dim ground truth,
    one row per retained dimensionality."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    candidates = emb.filter(F.col("vec_id") >= N_QUERIES).repartition(
        spark.sparkContext.defaultParallelism
    )
    # r10 (guide §2.3/§2.4): the four per-dim searches used to run as four
    # independent query×candidate passes (the d=64 ground truth plus three
    # prefix brute-force scans), and the final semi-join re-derived the
    # ground-truth search once more — five pair passes total. One pair
    # pass now computes every prefix cosine side by side (prefix norms
    # hoisted per side, exactly as brute_force_topk hoists them), explodes
    # to (dim, cos), and ranks per (dim, query) in a single window; the
    # per-dim cosines are the same `_dot`/`_norm` doubles over the same
    # slices, and d = MRL_DIMS[0] keeps the UNSLICED arrays so its doubles
    # are bit-identical to q_ann_cosine_topk's. The dims×queries×k top-k
    # table is pinned (released by pinned_query) so the recall semi-join
    # reads cache instead of re-running the pass.
    def _slice(col: str, d: int) -> Column:
        return F.col(col) if d == MRL_DIMS[0] else F.slice(col, 1, d)

    q = F.broadcast(
        queries.select(
            "query_id",
            "q_emb",
            *[
                _norm(_slice("q_emb", d)).alias(f"q_norm_{d}")
                for d in MRL_DIMS
            ],
        )
    )
    c = candidates.select(
        "vec_id",
        "emb",
        *[_norm(_slice("emb", d)).alias(f"c_norm_{d}") for d in MRL_DIMS],
    )
    pairs = q.crossJoin(c).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dim"),
                        (
                            _dot(_slice("q_emb", d), _slice("emb", d))
                            / (F.col(f"q_norm_{d}") * F.col(f"c_norm_{d}"))
                        ).alias("cos"),
                    )
                    for d in MRL_DIMS
                ]
            )
        ).alias("dc"),
    )
    w = W.partitionBy("dc.dim", "query_id").orderBy(
        F.desc("dc.cos"), F.asc("neighbor_id")
    )
    topk = pin(
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(F.col("dc.dim").alias("dim"), "query_id", "neighbor_id")
    )
    full = topk.filter(F.col("dim") == MRL_DIMS[0]).select(
        "query_id", "neighbor_id"
    )
    hits = topk.join(full, ["query_id", "neighbor_id"], "left_semi")
    denom = N_QUERIES * TOP_K
    return (
        hits.groupBy("dim")
        .agg(F.count("*").alias("n_hits"))
        .select(
            "dim",
            "n_hits",
            F.round(F.col("n_hits") / denom, 4).alias("recall_at_k"),
        )
        .orderBy(F.desc("dim"))
    )


def _mrl_oracle() -> str:
    searches = "\nUNION ALL\n".join(
        f"""
SELECT {d} AS dim, query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           list_dot_product(q.q_emb[1:{d}], c.emb[1:{d}]) /
             (sqrt(list_dot_product(q.q_emb[1:{d}], q.q_emb[1:{d}]))
              * sqrt(list_dot_product(c.emb[1:{d}], c.emb[1:{d}]))) AS cos
    FROM q CROSS JOIN c
  )
) WHERE rank <= {TOP_K}"""
        for d in MRL_DIMS
    )
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings WHERE vec_id >= {N_QUERIES}
), full_topk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.q_emb, c.emb) /
               (sqrt(list_dot_product(q.q_emb, q.q_emb))
                * sqrt(list_dot_product(c.emb, c.emb))) AS cos
      FROM q CROSS JOIN c
    )
  ) WHERE rank <= {TOP_K}
), trunc AS ({searches})
SELECT dim, COUNT(*) AS n_hits,
       ROUND(COUNT(*) * 1.0 / {N_QUERIES * TOP_K}, 4) AS recall_at_k
FROM trunc t
WHERE EXISTS (
  SELECT 1 FROM full_topk f
  WHERE f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
)
GROUP BY dim ORDER BY dim DESC
"""


ORACLE_ANN_MATRYOSHKA_RECALL = _mrl_oracle()


# ---------------------------------------------------------------------------
# Product quantization with asymmetric-distance scoring (PQ/ADC — Jégou et
# al., "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
# The memory-compression scale path: each 64-dim float vector becomes M=4
# one-byte codes (64× smaller), so a 100 TB embedding corpus's index fits
# in executor memory. Encoding = per-subspace nearest sub-centroid
# (codebooks here are deterministic — subvectors of the first K vectors —
# so the oracle replays them; production would k-means them via
# ann_kmeans_step). Search = ADC: the query precomputes an M×K distance
# table (tiny, broadcast), candidate distance = sum of M table lookups —
# no float vector is touched at scan time. The M partial distances are
# summed WIDE (one column per subspace, fixed left-assoc adds) so the
# float addition order is identical on Spark and DuckDB; a groupBy SUM
# would add in partition order and could differ in the last ULP.
#
# Plan shape: codebook and distance tables are broadcast joins; the only
# shuffle is the final per-query top-k window over |candidates|·M rows.
# ---------------------------------------------------------------------------
_PQ_M, _PQ_SUBDIM, _PQ_K = 4, 16, 16


def _pq_subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, sub, svec) — the M per-subspace slices of each vector."""
    return emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("sub"),
                        F.slice("emb", m * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("svec"),
                    )
                    for m in range(_PQ_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.sub", "s.svec")


def q_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-coded ANN: 4x16 codebook encode, asymmetric-distance top-k."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("emb"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    subs = _pq_subvectors(emb)
    cb = subs.filter(F.col("vec_id") < _PQ_K).select(
        "sub", F.col("vec_id").alias("code"), F.col("svec").alias("cvec")
    )

    def d2(a, b):
        return (_dot(a, a) - F.lit(2.0) * _dot(a, b)) + _dot(b, b)

    scored = subs.filter(F.col("vec_id") >= N_QUERIES).join(F.broadcast(cb), "sub").select(
        "vec_id", "sub", "code", d2(F.col("svec"), F.col("cvec")).alias("cd2")
    )
    wenc = W.partitionBy("vec_id", "sub").orderBy("cd2", "code")
    codes = (
        scored.withColumn("rn", F.row_number().over(wenc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "code")
    )
    qtab = subs.filter(F.col("vec_id") < N_QUERIES).join(F.broadcast(cb), "sub").select(
        F.col("vec_id").alias("query_id"),
        "sub",
        "code",
        d2(F.col("svec"), F.col("cvec")).alias("qd2"),
    )
    parts = codes.join(F.broadcast(qtab), ["sub", "code"]).groupBy(
        "query_id", "vec_id"
    ).agg(
        *[
            F.min(F.when(F.col("sub") == m, F.col("qd2"))).alias(f"d{m}")
            for m in range(_PQ_M)
        ]
    )
    ad = F.col("d0") + F.col("d1") + F.col("d2") + F.col("d3")
    wq = W.partitionBy("query_id").orderBy(ad.asc(), F.asc("vec_id"))
    return (
        parts.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), F.col("rank").cast("long").alias("rank"))
    )


ORACLE_ANN_PQ_ADC = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), subs AS (
  SELECT vec_id, m AS sub,
         emb[(m * {_PQ_SUBDIM} + 1):(m * {_PQ_SUBDIM} + {_PQ_SUBDIM})] AS svec
  FROM e CROSS JOIN (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m)
), cb AS (
  SELECT sub, vec_id AS code, svec AS cvec FROM subs WHERE vec_id < {_PQ_K}
), scored AS (
  SELECT s.vec_id, s.sub, cb.code,
         (list_dot_product(s.svec, s.svec)
          - 2.0::DOUBLE * list_dot_product(s.svec, cb.cvec))
          + list_dot_product(cb.cvec, cb.cvec) AS cd2
  FROM subs s JOIN cb USING (sub) WHERE s.vec_id >= {N_QUERIES}
), codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                 ORDER BY cd2 ASC, code ASC) AS rn
    FROM scored
  ) WHERE rn = 1
), qtab AS (
  SELECT s.vec_id AS query_id, s.sub, cb.code,
         (list_dot_product(s.svec, s.svec)
          - 2.0::DOUBLE * list_dot_product(s.svec, cb.cvec))
          + list_dot_product(cb.cvec, cb.cvec) AS qd2
  FROM subs s JOIN cb USING (sub) WHERE s.vec_id < {N_QUERIES}
), parts AS (
  SELECT query_id, vec_id,
         MIN(CASE WHEN sub = 0 THEN qd2 END) AS d0,
         MIN(CASE WHEN sub = 1 THEN qd2 END) AS d1,
         MIN(CASE WHEN sub = 2 THEN qd2 END) AS d2,
         MIN(CASE WHEN sub = 3 THEN qd2 END) AS d3
  FROM codes JOIN qtab USING (sub, code)
  GROUP BY query_id, vec_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY d0 + d1 + d2 + d3 ASC, vec_id ASC) AS rank
  FROM parts
) WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# IVF with multi-probe (nprobe=2): each query searches its TWO nearest
# centroid cells — the standard recall/latency knob on an IVF index (the
# cell boundary cuts off true neighbors that sit just across it; probing
# the runner-up cell recovers most of them for 2× the scanned fraction).
# Same plan family as q_ann_ivf: broadcast centroid assignment, the probe
# set is a per-query top-2 window over k centroid scores (k rows per
# query, never data-scaled), then one cell-equi-join + per-query top-k.
# ---------------------------------------------------------------------------
N_PROBE = 2


def q_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ann_ivf with the query side probing its N_PROBE nearest cells —
    same assignment and search bodies (ivf_assign / _cell_topk), only the
    probe bound differs."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("emb"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("c_emb")
    )
    probes = ivf_assign(
        emb.filter(F.col("vec_id") < N_QUERIES), centroids, nprobe=N_PROBE
    ).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"), "cell"
    )
    candidates = ivf_assign(emb, centroids).filter(F.col("vec_id") >= N_QUERIES)
    return _cell_topk(probes, candidates)


ORACLE_ANN_IVF_MULTIPROBE = _ivf_oracle(N_PROBE)


# ---------------------------------------------------------------------------
# IVF index health audit — the operational gate before shipping an IVF
# index: per-cell occupancy, share of corpus, imbalance vs the uniform
# ideal, and empty cells (surfaced via the centroid spine left-join, like
# corpus_drift_psi's bin spine). Hot cells mean probe-time skew: a query
# landing in a cell holding 10% of a 100 TB corpus scans 10%, not 1/k —
# exactly what this report flags before the index goes live. All outputs
# are counts or ratios of integer sums (deterministic cross-engine).
# Scale: reuses the assignment plan of q_ann_ivf (broadcast centroids +
# per-vector argmax); the audit itself is one k-row aggregate.
# ---------------------------------------------------------------------------
def q_ann_ivf_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("emb"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("c_emb")
    )
    occ = (
        ivf_assign(emb, centroids)
        .groupBy("cell")
        .agg(F.count("*").alias("n_vectors"))
    )
    spine = centroids.select(F.col("centroid_id").alias("cell"))
    # r10 (guide §1.2): n_total via an unpartitioned window sum over the
    # bounded N_CENTROIDS-row occupancy frame instead of a second
    # aggregate of `occ` cross-joined back — the totals subtree
    # re-derived the whole embeddings scan + ivf_assign (a distance pass
    # against every centroid) + groupBy. Every assigned cell is a
    # centroid_id by construction, so the spine left-join keeps all occ
    # rows and the filled zeros leave the exact integer sum unchanged.
    return (
        spine.join(occ, "cell", "left")
        .na.fill({"n_vectors": 0})
        .withColumn("n_total", F.sum("n_vectors").over(W.partitionBy()))
        .select(
            "cell",
            "n_vectors",
            F.round(F.col("n_vectors") / F.col("n_total"), 4).alias("share"),
            F.round(
                F.col("n_vectors") * N_CENTROIDS / F.col("n_total"), 4
            ).alias("imbalance"),
            (F.col("n_vectors") == 0).alias("is_empty"),
        )
    )


ORACLE_ANN_IVF_HEALTH = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, emb AS c_emb FROM e WHERE vec_id < {N_CENTROIDS}
), assigned AS (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT e.vec_id, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY list_dot_product(e.emb, cent.c_emb) DESC,
                                       cent.centroid_id ASC) AS rn
    FROM e CROSS JOIN cent
  ) WHERE rn = 1
), occ AS (
  SELECT cell, COUNT(*) AS n_vectors FROM assigned GROUP BY cell
), total AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS n_total FROM occ)
SELECT s.centroid_id AS cell,
       CAST(COALESCE(o.n_vectors, 0) AS BIGINT) AS n_vectors,
       ROUND(COALESCE(o.n_vectors, 0) * 1.0 / n_total, 4) AS share,
       ROUND(COALESCE(o.n_vectors, 0) * {N_CENTROIDS} * 1.0 / n_total, 4)
         AS imbalance,
       (COALESCE(o.n_vectors, 0) = 0) AS is_empty
FROM cent s LEFT JOIN occ o ON s.centroid_id = o.cell CROSS JOIN total
"""


# ---------------------------------------------------------------------------
# Recall-vs-nprobe curve — the tuning table for the IVF probe knob: for
# each nprobe in 1..4, recall@k of the multi-probe search against the
# brute-force ground truth, as one row per setting (the matryoshka-recall
# convention: exact integer intersection count over Q·k). This is the
# evaluation an operator reads before fixing nprobe in production; the
# brute-force side is documented ground-truth-only, the per-n searches
# are the audited IVF shape (shared ivf_assign/_cell_topk bodies).
# ---------------------------------------------------------------------------
NPROBE_CURVE = [1, 2, 3, 4]


def q_ann_nprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("emb"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("c_emb")
    )
    # FLATTENED (r10, the customer_rfm-flatten class): the old form
    # unioned 4 near-identical subplans — each setting re-ran its own
    # probe assignment, probe×candidate join, and per-query window, so
    # the shared work compiled and executed up to 4×. Now the probe
    # assignment runs ONCE at max(nprobe) keeping the probe rank, the
    # cosine scoring join runs ONCE over the union of probed cells, and
    # the settings fan out as a row explode (pair with probe_rank r
    # serves every n >= r) into a single (nprobe, query) top-k window —
    # same values by construction (rn<=n filtering is monotone in n).
    # NOT pinned: a review suggested persisting the loop invariants of
    # the old form; a measured pin() variant was ~1.7x SLOWER at sf0.1
    # (materialization + broken pipelining cost more than re-execution)
    # — the flatten removes the re-execution instead.
    truth = q_ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    candidates = ivf_assign(emb, centroids).filter(F.col("vec_id") >= N_QUERIES)
    qemb = emb.filter(F.col("vec_id") < N_QUERIES)
    denom = float(N_QUERIES * TOP_K)
    probes = ivf_assign(
        qemb, centroids, nprobe=max(NPROBE_CURVE), keep_rank=True
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        "cell",
        "probe_rank",
    )
    pairs = _score_pairs(probes, candidates, carry=("probe_rank",))
    fanned = pairs.select(
        "*",
        F.explode(F.array(*[F.lit(n) for n in NPROBE_CURVE])).alias("nprobe"),
    ).filter(F.col("probe_rank") <= F.col("nprobe"))
    topk = _topk_tail(fanned, partition=("nprobe", "query_id"))
    counts = (
        topk.join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("nprobe")
        .agg(F.count("*").alias("n_recovered"))
    )
    # settings spine: a setting that recovers NOTHING must still emit its
    # (n, 0, 0.0) row like the old per-setting agg (and the oracle's
    # UNION ALL) did — groupBy drops empty groups (degenerate-sweep catch)
    spine = spark.range(1).select(
        F.explode(F.array(*[F.lit(n) for n in NPROBE_CURVE])).alias("nprobe")
    )
    return (
        spine.join(counts, "nprobe", "left")
        .na.fill({"n_recovered": 0})
        .select(
            "nprobe",
            "n_recovered",
            F.round(F.col("n_recovered") / denom, 4).alias("recall_at_k"),
        )
    )


def _nprobe_recall_oracle() -> str:
    parts = [
        f"""
SELECT {n} AS nprobe, COUNT(*) AS n_recovered,
       ROUND(COUNT(*) * 1.0 / {N_QUERIES * TOP_K}, 4) AS recall_at_k
FROM ({_ivf_oracle(n)}) a
JOIN ({ORACLE_ANN_COSINE_TOPK}) e
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id"""
        for n in NPROBE_CURVE
    ]
    return "\nUNION ALL\n".join(parts)


ORACLE_ANN_NPROBE_RECALL = _nprobe_recall_oracle()


# ---------------------------------------------------------------------------
# Per-dimension embedding audit — dead/degenerate-dimension detection, the
# pre-flight check for PQ/int8 quantization (a near-constant dimension
# wastes codebook bits; ann_int8_topk's scale factor assumes non-trivial
# spread). Mean and variance per dimension are computed from 1e-6-grid
# integer sums held in DECIMAL(38,0) (exact, order-independent at any row
# count — a float SUM would accumulate in partition order), then divided
# once; the final subtraction can round to IEEE -0.0, hence `+ 0.0`.
# Scale: posexplode is map-side (64 rows per vector), one aggregate
# shuffle on the 64-value dim key with map-side partials.
# ---------------------------------------------------------------------------
_DIM_SCALE = 1_000_000
_VAR_DEGENERATE = 1e-4


def q_embedding_dim_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    comp = emb.select(F.posexplode("emb").alias("dim", "v")).select(
        "dim", F.round(F.col("v") * _DIM_SCALE).cast("long").alias("q")
    )
    # cast to decimal BEFORE the square: with ANSI off a LONG q*q wraps
    # silently for |component| ≳ 3e3 after the 1e6 quantization, while the
    # DuckDB oracle promotes SUM(q*q) to HUGEINT (same divergence class as
    # graph_modularity's degree sums)
    d_q = F.col("q").cast("decimal(38,0)")
    agg = comp.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum(d_q).cast("double").alias("s"),
        F.sum(d_q * d_q).cast("double").alias("s2"),
    )
    mean = F.col("s") / (F.col("n") * float(_DIM_SCALE))
    var = F.col("s2") / (F.col("n") * float(_DIM_SCALE) ** 2) - mean * mean
    return agg.select(
        "dim",
        "n",
        (F.round(mean, 6) + 0.0).alias("mean"),
        (F.round(var, 6) + 0.0).alias("variance"),
        (var < _VAR_DEGENERATE).alias("is_degenerate"),
    )


ORACLE_EMBEDDING_DIM_AUDIT = f"""
WITH comp AS (
  SELECT CAST(j - 1 AS INT) AS dim,
         CAST(round(embedding[CAST(j AS INT)]::DOUBLE * {_DIM_SCALE}) AS BIGINT) AS q
  FROM (SELECT embedding, unnest(generate_series(1, len(embedding))) AS j
        FROM embeddings)
), agg AS (
  SELECT dim, COUNT(*) AS n,
         CAST(SUM(q) AS DOUBLE) AS s,
         CAST(SUM(q * q) AS DOUBLE) AS s2
  FROM comp GROUP BY dim
)
SELECT dim, n,
       ROUND(s / (n * {float(_DIM_SCALE)!r}), 6) + 0.0 AS mean,
       ROUND(s2 / (n * {float(_DIM_SCALE) ** 2!r})
             - (s / (n * {float(_DIM_SCALE)!r})) * (s / (n * {float(_DIM_SCALE)!r})), 6)
         + 0.0 AS variance,
       (s2 / (n * {float(_DIM_SCALE) ** 2!r})
        - (s / (n * {float(_DIM_SCALE)!r})) * (s / (n * {float(_DIM_SCALE)!r})))
         < {_VAR_DEGENERATE} AS is_degenerate
FROM agg
"""


# ---------------------------------------------------------------------------
# NDCG@k — rank-aware retrieval quality (Järvelin & Kekäläinen 2002), the
# companion to the set-based recall report above: recall says WHETHER the
# exact neighbors were recovered, NDCG says whether they were recovered
# NEAR THE TOP, which is what a reranking or RAG consumer actually sees.
# Binary relevance (membership in the exact top-k), so
# DCG = Σ_{hits} 1/log2(rank+1) and ideal DCG is the full-k constant.
#
# Cross-engine float discipline: the per-rank discount gains are
# quantized to integers IN PYTHON (round(1e5/log2(r+1)) for the k
# possible ranks) and the SAME literals are pasted into both engines'
# plans — no transcendental is evaluated by either engine, the DCG sum is
# a pure integer sum, and NDCG is one IEEE division of two exact
# integers rounded at 4. Scale shape: both searches are the existing
# scale-shaped queries; the comparison join is n_queries × k rows.
# ---------------------------------------------------------------------------
_NDCG_GAINS = {r: round(100000 / math.log2(r + 1)) for r in range(1, TOP_K + 1)}
_NDCG_IDEAL = sum(_NDCG_GAINS.values())


def q_ann_ndcg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = q_ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = q_ann_lsh_bucketed(spark, sf_dir).select(
        F.col("query_id").alias("a_query"),
        F.col("neighbor_id").alias("a_neighbor"),
        "rank",
    )
    joined = exact.join(
        approx,
        (exact.query_id == approx.a_query)
        & (exact.neighbor_id == approx.a_neighbor),
        "left",
    )
    gain = F.lit(0)
    for r, g in _NDCG_GAINS.items():
        gain = F.when(F.col("rank") == r, F.lit(g)).otherwise(gain)
    return joined.groupBy("query_id").agg(
        F.count("rank").cast("bigint").alias("n_hits"),
        F.round(
            F.sum(gain).cast("double") / float(_NDCG_IDEAL), 4
        ).alias("ndcg_at_k"),
    )


_NDCG_GAIN_SQL = "CASE a.rank " + " ".join(
    f"WHEN {r} THEN {g}" for r, g in _NDCG_GAINS.items()
) + " ELSE 0 END"

ORACLE_ANN_NDCG_REPORT = f"""
SELECT e.query_id,
       CAST(COUNT(a.rank) AS BIGINT) AS n_hits,
       ROUND(CAST(SUM({_NDCG_GAIN_SQL}) AS DOUBLE) / {_NDCG_IDEAL}, 4)
         AS ndcg_at_k
FROM ({ORACLE_ANN_COSINE_TOPK}) e
LEFT JOIN ({ORACLE_ANN_LSH_BUCKETED}) a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
"""


# ---------------------------------------------------------------------------
# Label-quality audits over the (embedding, label) pairs: the cleanlab-style
# confident-learning question (Northcutt et al. 2021) — "which labels does
# the geometry disagree with?" — and the active-learning acquisition step
# that ranks points by nearest-vs-second-centroid margin (classic margin
# / uncertainty sampling, Lewis & Gale 1994).
#
# Both share one plan: per-label class centroids, then every vector scored
# against all L centroids (n×L pairs, L=|labels| — broadcast centroids,
# argmax window per vector; the ivf_assign shape with labels as cells).
#
# Cross-engine determinism — the argmax is the hard part: a 1-ulp
# difference in a centroid element could flip which label wins a near-tie
# and change INTEGER outputs, so float-sum-order noise is not acceptable
# here (unlike a rounded report column). Fix: centroids are INTEGER SUM
# vectors — each element is Σ round(val·2^20) summed exactly as BIGINT —
# and the count division is skipped entirely because cosine is invariant
# under positive per-vector scaling. Every double that reaches the argmax
# is then a pure function of exact integers and sequential array folds —
# bit-identical on both engines. (At ~1e10 rows/label the 2^20-scaled
# element sums approach 2^53; drop the quantization to 2^10 before the
# exact-double cast stops holding.)
# ---------------------------------------------------------------------------
_CENTROID_Q = 1 << 20


def _label_centroid_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, c_label, cos, rn) — every vector scored against every
    label centroid, rn = 1 for the nearest centroid (ties → lower label)."""
    # Deliberately NOT rebalanced (r10 A/B, best-of-3 at sf0.1): an input
    # repartition of the embeddings scan makes both consumers SLOWER
    # (label_noise_audit 1.36→1.69s, al_margin_sample 1.51→1.93s) — the
    # 2,000-vector frame is small enough that the exchange overhead
    # exceeds the serial-scan cost it removes.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        as_double(F.col("embedding")).alias("emb"),
    )
    elems = emb.select("label", F.posexplode("emb").alias("pos", "val"))
    sums = elems.groupBy("label", "pos").agg(
        F.sum(F.round(F.col("val") * _CENTROID_Q, 0).cast("bigint")).alias("c")
    )
    cent = (
        sums.groupBy(F.col("label").alias("c_label"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"].cast("double"),
            ).alias("c_emb")
        )
        # zero-norm guards (integer-exact conditions, so no NULL-ordering
        # ambiguity downstream): an all-zero quantized centroid — or an
        # all-zero input vector below — would make cosine's denominator 0,
        # which CRASHES under Spark's ANSI default while DuckDB yields
        # NULL. Cosine against the zero vector is undefined anyway; both
        # engines drop such rows identically.
        .filter(F.exists("c_emb", lambda x: x != 0))
    )
    emb = emb.filter(F.exists("emb", lambda x: x != 0))
    scores = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "c_label",
        cosine(F.col("emb"), F.col("c_emb")).alias("cos"),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("c_label"))
    return scores.withColumn("rn", F.row_number().over(w))


def q_label_noise_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning confusion matrix: per (assigned label, nearest
    class centroid), how many vectors — off-diagonal cells are the
    candidate mislabels a relabeling pass reviews first."""
    top1 = _label_centroid_ranks(spark, sf_dir).filter(F.col("rn") == 1)
    conf = top1.groupBy(
        F.col("label").alias("true_label"),
        F.col("c_label").alias("nearest_label"),
    ).agg(F.count("*").cast("bigint").alias("n_vectors"))
    per_label = W.partitionBy("true_label")
    return conf.select(
        "true_label",
        "nearest_label",
        "n_vectors",
        F.round(
            F.col("n_vectors").cast("double")
            / F.sum("n_vectors").over(per_label).cast("double"),
            4,
        ).alias("share"),
        (F.col("true_label") != F.col("nearest_label")).alias("is_suspect"),
    )


def q_al_margin_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based acquisition: the 20 most geometrically ambiguous points
    (smallest nearest-vs-second-centroid cosine gap) — the batch an
    active-learning loop sends for annotation next. Top-k via
    orderBy+limit (TakeOrderedAndProject — per-partition heads, no global
    sort); the raw double margin orders, the rounded one ships."""
    rk = _label_centroid_ranks(spark, sf_dir)
    best = rk.filter(F.col("rn") == 1).select(
        "vec_id",
        F.col("label").alias("own_label"),
        F.col("c_label").alias("nearest_label"),
        F.col("cos").alias("cos1"),
    )
    second = rk.filter(F.col("rn") == 2).select(
        F.col("vec_id").alias("v2"),
        F.col("c_label").alias("second_label"),
        F.col("cos").alias("cos2"),
    )
    joined = best.join(second, best.vec_id == second.v2)
    return (
        joined.select(
            "vec_id",
            "own_label",
            "nearest_label",
            "second_label",
            (F.col("cos1") - F.col("cos2")).alias("margin_raw"),
        )
        .orderBy(F.asc("margin_raw"), F.asc("vec_id"))
        .limit(20)
        .select(
            "vec_id",
            "own_label",
            "nearest_label",
            "second_label",
            (F.round(F.col("margin_raw"), 4) + F.lit(0.0)).alias("margin"),
        )
    )


_LABEL_RANKS_SQL = f"""
  WITH e AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           embedding::DOUBLE[] AS emb
    FROM embeddings
  ), el AS (
    SELECT label, generate_subscripts(emb, 1) AS pos, unnest(emb) AS val
    FROM e
  ), cs AS (
    SELECT label AS c_label, pos,
           SUM(CAST(ROUND(val * {_CENTROID_Q}, 0) AS BIGINT)) AS c
    FROM el GROUP BY 1, 2
  ), cent AS (
    SELECT c_label, c_emb
    FROM (SELECT c_label, list(CAST(c AS DOUBLE) ORDER BY pos) AS c_emb
          FROM cs GROUP BY 1)
    WHERE len(list_filter(c_emb, x -> x <> 0)) > 0
  ), sc AS (
    SELECT vec_id, label, c_label,
           list_dot_product(emb, c_emb)
             / (sqrt(list_dot_product(emb, emb))
                * sqrt(list_dot_product(c_emb, c_emb))) AS cos
    FROM (SELECT * FROM e
          WHERE len(list_filter(emb, x -> x <> 0)) > 0) e
    CROSS JOIN cent
  )
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY cos DESC, c_label ASC) AS rn
  FROM sc"""

ORACLE_LABEL_NOISE_AUDIT = f"""
WITH rk AS ({_LABEL_RANKS_SQL})
SELECT label AS true_label, c_label AS nearest_label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY label), 4)
         AS share,
       (label <> c_label) AS is_suspect
FROM rk WHERE rn = 1
GROUP BY label, c_label
"""

ORACLE_AL_MARGIN_SAMPLE = f"""
WITH rk AS ({_LABEL_RANKS_SQL})
SELECT b.vec_id,
       b.label AS own_label,
       b.c_label AS nearest_label,
       s.c_label AS second_label,
       ROUND(b.cos - s.cos, 4) + 0.0 AS margin
FROM (SELECT * FROM rk WHERE rn = 1) b
JOIN (SELECT * FROM rk WHERE rn = 2) s USING (vec_id)
ORDER BY b.cos - s.cos ASC, b.vec_id ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Embedding drift audit — the monitoring query between two embedding
# snapshots (model-version bump, re-encode job, new data slice): per
# dimension, did the mean activation shift? A drifted dimension breaks
# every stored ANN index and centroid built on the old geometry, so this
# is the gate before an index rebuild is skipped. Snapshots here are the
# even/odd vec_id halves (the fixture has one epoch; a real deploy points
# the two sides at two snapshot paths — the split is the only fixture-
# specific line).
#
# Float discipline: per-dimension sums are integer-quantized
# (Σ round(val·2^20) as exact BIGINT, the label-centroid recipe above),
# and the drift gate |q_cand·n_ref − q_ref·n_cand| > θ·2^20·n_ref·n_cand
# is an integer cross-multiplication — no float mean ever feeds a
# threshold compare. Means/shift are published as single divisions of
# exact integers, ROUND(6). Scale shape: one posexplode scan →
# 2·n_dims-row aggregate; everything downstream is dimension-sized.
# ---------------------------------------------------------------------------
_DRIFT_THRESHOLD_SCALED = round(0.05 * _CENTROID_Q)  # θ = 0.05 mean shift


def q_embedding_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 2 == 1).alias("cand"),
        as_double(F.col("embedding")).alias("emb"),
    )
    elems = emb.select("cand", F.posexplode("emb").alias("pos", "val"))
    q = F.round(F.col("val") * _CENTROID_Q, 0).cast("bigint")
    per_dim = elems.groupBy("pos").agg(
        F.sum(F.when(~F.col("cand"), q)).cast("bigint").alias("q_ref"),
        F.sum(F.when(~F.col("cand"), 1).otherwise(0)).cast("bigint").alias("n_ref"),
        F.sum(F.when(F.col("cand"), q)).cast("bigint").alias("q_cand"),
        F.sum(F.when(F.col("cand"), 1).otherwise(0)).cast("bigint").alias("n_cand"),
    )

    def d(c: str):
        return F.col(c).cast("decimal(38,0)")

    diff = d("q_cand") * d("n_ref") - d("q_ref") * d("n_cand")
    gate = d("n_ref") * d("n_cand") * F.lit(_DRIFT_THRESHOLD_SCALED)
    denom = float(_CENTROID_Q)
    return per_dim.select(
        F.col("pos").cast("bigint").alias("dim"),
        "n_ref",
        "n_cand",
        (
            F.round(
                F.try_divide(F.col("q_ref").cast("double"), F.col("n_ref") * denom),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_ref"),
        (
            F.round(
                F.try_divide(
                    F.col("q_cand").cast("double"), F.col("n_cand") * denom
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_cand"),
        (
            F.round(
                F.try_divide(
                    diff.cast("double"),
                    (d("n_ref") * d("n_cand")).cast("double") * denom,
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_shift"),
        (F.abs(diff) > gate).alias("is_drifted"),
    )


ORACLE_EMBEDDING_DRIFT_AUDIT = f"""
WITH e AS (
  SELECT (vec_id % 2 = 1) AS cand, embedding::DOUBLE[] AS emb
  FROM embeddings
), el AS (
  SELECT cand, generate_subscripts(emb, 1) - 1 AS pos, unnest(emb) AS val
  FROM e
), per_dim AS (
  SELECT pos,
         CAST(SUM(CASE WHEN NOT cand
                       THEN CAST(ROUND(val * {_CENTROID_Q}, 0) AS BIGINT)
                  END) AS BIGINT) AS q_ref,
         CAST(SUM(CASE WHEN NOT cand THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(SUM(CASE WHEN cand
                       THEN CAST(ROUND(val * {_CENTROID_Q}, 0) AS BIGINT)
                  END) AS BIGINT) AS q_cand,
         CAST(SUM(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT) AS n_cand
  FROM el GROUP BY pos
)
SELECT CAST(pos AS BIGINT) AS dim, n_ref, n_cand,
       ROUND(CAST(q_ref AS DOUBLE) / (n_ref * {_CENTROID_Q}.0), 6) + 0.0
         AS mean_ref,
       ROUND(CAST(q_cand AS DOUBLE) / (n_cand * {_CENTROID_Q}.0), 6) + 0.0
         AS mean_cand,
       ROUND(CAST(CAST(q_cand AS HUGEINT) * n_ref
                  - CAST(q_ref AS HUGEINT) * n_cand AS DOUBLE)
             / (CAST(CAST(n_ref AS HUGEINT) * n_cand AS DOUBLE)
                * {_CENTROID_Q}.0), 6) + 0.0 AS mean_shift,
       (ABS(CAST(q_cand AS HUGEINT) * n_ref - CAST(q_ref AS HUGEINT) * n_cand)
          > CAST(n_ref AS HUGEINT) * n_cand * {_DRIFT_THRESHOLD_SCALED})
         AS is_drifted
FROM per_dim
"""


QUERIES = {
    "ann_pq_adc": q_ann_pq_adc,
    "ann_recall_report": q_ann_recall_report,
    "ann_ndcg_report": q_ann_ndcg_report,
    "label_noise_audit": q_label_noise_audit,
    "al_margin_sample": q_al_margin_sample,
    "embedding_drift_audit": q_embedding_drift_audit,
    "ann_matryoshka_recall": q_ann_matryoshka_recall,
    "ann_kmeans_step": q_kmeans_step,
    "ann_hard_negatives": q_ann_hard_negatives,
    "embeddings_power_iteration": q_power_iteration_pc1,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_int8_topk": q_ann_int8_topk,
    "ann_filtered_topk": q_ann_filtered_topk,
    "ann_lsh_bucketed": q_ann_lsh_bucketed,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_multiprobe": q_ann_ivf_multiprobe,
    "ann_nprobe_recall": q_ann_nprobe_recall,
    "ann_ivf_health": q_ann_ivf_health,
    "embedding_dim_audit": q_embedding_dim_audit,
    "embedding_norms": q_embedding_norms,
}

ORACLES = {
    "ann_pq_adc": ORACLE_ANN_PQ_ADC,
    "ann_recall_report": ORACLE_ANN_RECALL_REPORT,
    "ann_ndcg_report": ORACLE_ANN_NDCG_REPORT,
    "label_noise_audit": ORACLE_LABEL_NOISE_AUDIT,
    "al_margin_sample": ORACLE_AL_MARGIN_SAMPLE,
    "embedding_drift_audit": ORACLE_EMBEDDING_DRIFT_AUDIT,
    "ann_matryoshka_recall": ORACLE_ANN_MATRYOSHKA_RECALL,
    "ann_kmeans_step": ORACLE_KMEANS_STEP,
    "ann_hard_negatives": ORACLE_ANN_HARD_NEGATIVES,
    "embeddings_power_iteration": ORACLE_POWER_ITERATION_PC1,
    "ann_cosine_topk": ORACLE_ANN_COSINE_TOPK,
    "ann_int8_topk": ORACLE_ANN_INT8_TOPK,
    "ann_filtered_topk": ORACLE_ANN_FILTERED_TOPK,
    "ann_lsh_bucketed": ORACLE_ANN_LSH_BUCKETED,
    "ann_ivf": ORACLE_ANN_IVF,
    "ann_ivf_multiprobe": ORACLE_ANN_IVF_MULTIPROBE,
    "ann_nprobe_recall": ORACLE_ANN_NPROBE_RECALL,
    "ann_ivf_health": ORACLE_ANN_IVF_HEALTH,
    "embedding_dim_audit": ORACLE_EMBEDDING_DIM_AUDIT,
    "embedding_norms": ORACLE_EMBEDDING_NORMS,
}
