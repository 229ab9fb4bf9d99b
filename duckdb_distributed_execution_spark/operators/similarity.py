"""Similarity search API over embedding columns (array<float>).

Two paths (north-star greenfield, BASELINE.json):

- ``brute_force_topk`` — exact: broadcast the query set, stream the
  corpus, per-query top-k via window. The corpus never shuffles.
- ``lsh_topk`` — approximate scale path: random-hyperplane signatures
  bucket the corpus; candidates come only from the query's bucket
  (equi-join), then exact cosine re-ranks. An IVF variant is the same
  plan with learned centroids instead of hyperplanes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import dot_product, l2_norm
from duckdb_distributed_execution_spark.queries.vectors import _hyperplanes, lsh_bucket


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector. Norms are
    computed once per row, not per pair."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    sims = c.join(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        (dot_product(F.col("__qv"), F.col("__cv"))
         / (F.col("__qn") * F.col("__cn"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sq_l2(a, b):
    """Squared L2 distance via the expansion ‖a‖²−2⟨a,b⟩+‖b‖² —
    written with this exact operation order on both engines so the
    doubles agree bit-for-bit (the zip-fold form would differ from
    the oracle's dot-product form in the last ulp)."""
    return (
        dot_product(a, a) - F.lit(2.0) * dot_product(a, b)
    ) + dot_product(b, b)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
) -> DataFrame:
    """IVF index build: assign every corpus vector to its nearest
    centroid (argmin squared-L2, centroid id as tie-break). Centroids
    broadcast; the corpus never shuffles except the tiny argmin
    window keyed by vector id. Returns (id, cid, dist)."""
    c = centroids.select(
        F.col(cid_col).alias("__cid"), F.col(vec_col).alias("__cv")
    )
    v = corpus.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v"))
    dists = v.join(F.broadcast(c)).select(
        "__vid", "__cid", sq_l2(F.col("__v"), F.col("__cv")).alias("dist")
    )
    w = Window.partitionBy("__vid").orderBy(F.col("dist").asc(), F.col("__cid"))
    return (
        dists.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__vid").alias(id_col),
            F.col("__cid").alias(cid_col),
            "dist",
        )
    )


def ivf_assign_n(
    vecs: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
) -> DataFrame:
    """Multi-probe assignment: the ``nprobe`` nearest centroids per
    vector (squared-L2, centroid id tie-break). ``nprobe=1`` is
    exactly ``ivf_assign``. Used on the QUERY side of an IVF probe —
    searching the runner-up cells recovers most of the recall lost to
    quantization at the cost of nprobe× candidates, still ≪ brute
    force."""
    c = centroids.select(
        F.col(cid_col).alias("__cid"), F.col(vec_col).alias("__cv")
    )
    v = vecs.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v"))
    dists = v.join(F.broadcast(c)).select(
        "__vid", "__cid", sq_l2(F.col("__v"), F.col("__cv")).alias("dist")
    )
    w = Window.partitionBy("__vid").orderBy(F.col("dist").asc(), F.col("__cid"))
    return (
        dists.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .select(
            F.col("__vid").alias(id_col),
            F.col("__cid").alias(cid_col),
            "dist",
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """IVF probe: route each query to its ``nprobe`` nearest centroid
    cells and rank only those cells' members by cosine — candidates
    shrink by ~n_cells/nprobe× vs brute force; the cell join is a
    plain equi-join. Each corpus vector lives in exactly one cell and
    the probed cells are distinct, so no (query, neighbor) pair is
    generated twice."""
    cells = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "cid"
    )
    member = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    ).join(cells, on="neighbor_id")
    q_cells = ivf_assign_n(queries, centroids, nprobe, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), "cid"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    ).join(q_cells, on="query_id")
    sims = member.join(F.broadcast(q), on="cid").select(
        "query_id",
        "neighbor_id",
        (dot_product(F.col("__qv"), F.col("__cv"))
         / (F.col("__qn") * F.col("__cn"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine rank within candidates.

    Scale ``n_planes`` with log2(corpus): bucket occupancy is
    ~n / 2^n_planes and same-bucket pair work is quadratic in
    occupancy (measured on a 10× corpus probe: 8 planes / 256
    buckets holds to ~10⁵ vectors; add a plane per corpus doubling
    to keep occupancy constant — recall is then tuned back via
    multi-table OR-construction, the standard LSH trade)."""
    planes = _hyperplanes(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    sims = c.join(F.broadcast(q), on="__bucket").select(
        "query_id",
        "neighbor_id",
        (dot_product(F.col("__qv"), F.col("__cv"))
         / (F.col("__qn") * F.col("__cn"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_banded_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    n_tables: int = 16,
    band_bits: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Sub-quadratic candidate generation for embedding-cosine dedup:
    multi-table random-hyperplane LSH (OR-construction). Each of the
    ``n_tables`` tables hashes a vector to a ``band_bits``-bit bucket
    from the sign bits of deterministic hyperplane projections; a pair
    is a candidate iff it collides in ANY table (within its block).

    Plan shape: one projection pass computes all n_tables bucket ids,
    posexplode to (id, table, bucket) — n_tables narrow rows per
    vector — then a bucket-equi self-join and a DISTINCT on the pair
    id. Work is Σ occupancy² per (block, table, bucket), never
    all-pairs; at 100 TB you add band bits per corpus doubling to
    hold occupancy constant and add tables to buy the recall back
    (the standard AND/OR LSH trade, Indyk-Motwani). Measured recall
    vs the exact all-pairs truth at threshold 0.3: 0.99/0.98/0.98 at
    sf 0.001/0.01/0.1 with the default 16x2 config (gated by
    ``embedding_banded_recall``).

    Reference has no ANN/dedup surface (north star, BASELINE.json);
    the exact contract this approximates is dedup_embedding_cosine
    (queries/llm.py)."""
    planes = _hyperplanes(n_tables * band_bits, dim)
    buckets = F.array(
        *[
            lsh_bucket(
                F.col(vec_col), planes[t * band_bits : (t + 1) * band_bits]
            )
            for t in range(n_tables)
        ]
    )
    block = F.col(block_col) if block_col else F.lit(0)
    sig = df.select(
        F.col(id_col).alias("__id"),
        block.alias("__blk"),
        F.posexplode(buckets).alias("__t", "__bk"),
    )
    a = sig.select(
        F.col("__id").alias("id_a"), "__blk", "__t", "__bk"
    )
    b = sig.select(
        F.col("__id").alias("id_b"), "__blk", "__t", "__bk"
    )
    return (
        a.join(b, on=["__blk", "__t", "__bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def cosine_banded_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.3,
    n_tables: int = 16,
    band_bits: int = 2,
    dim: int = 64,
) -> DataFrame:
    """LSH candidates → exact cosine verify ≥ threshold. The verify
    step is exact, so precision is 1.0 by construction; recall is the
    candidate-generation recall (see cosine_banded_candidates).
    Returns (id_a, id_b, sim) with sim rounded to 4 decimals."""
    cand = cosine_banded_candidates(
        df, id_col, vec_col, block_col, n_tables, band_bits, dim
    )
    v = df.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    sims = (
        cand.join(
            v.select(
                F.col("__vid").alias("id_a"),
                F.col("__v").alias("__va"),
                F.col("__n").alias("__na"),
            ),
            on="id_a",
        )
        .join(
            v.select(
                F.col("__vid").alias("id_b"),
                F.col("__v").alias("__vb"),
                F.col("__n").alias("__nb"),
            ),
            on="id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                dot_product(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb"))
            ).alias("sim"),
        )
    )
    return sims.filter(F.col("sim") >= threshold).select(
        "id_a", "id_b", F.round("sim", 4).alias("sim")
    )


def oracle_cosine_banded_candidates_sql(
    vec_sql: str = "CAST(embedding AS DOUBLE[])",
    block_sql: str = "label",
    n_tables: int = 16,
    band_bits: int = 2,
    dim: int = 64,
) -> str:
    """DuckDB CTE body computing the same multi-table LSH candidate
    pairs: sig materializes the per-table bucket columns, the
    self-join keeps a pair if ANY table's buckets collide (the
    OR-construction, written as a disjunction — equivalent to the
    Spark union-of-equi-joins + DISTINCT)."""
    from duckdb_distributed_execution_spark.queries.vectors import (
        _oracle_lsh_bucket,
    )

    planes = _hyperplanes(n_tables * band_bits, dim)
    cols = ", ".join(
        f"{_oracle_lsh_bucket('e', planes[t * band_bits:(t + 1) * band_bits])}"
        f" AS b{t}"
        for t in range(n_tables)
    )
    anymatch = " OR ".join(f"a.b{t} = b.b{t}" for t in range(n_tables))
    return f"""
    sig AS (SELECT vec_id, {block_sql} AS blk, e, {cols}
            FROM (SELECT vec_id, {block_sql}, {vec_sql} AS e FROM embeddings)),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.e AS ea, b.e AS eb
      FROM sig a JOIN sig b
        ON a.blk = b.blk AND a.vec_id < b.vec_id AND ({anymatch}))
    """


def kmeans_train(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    tol: float = 1e-6,
) -> DataFrame:
    """Full IVF training: Lloyd's k-means over the embedding column.

    Deterministic seeding (no RNG — reproducible on any cluster): the
    k vectors with the smallest md5-derived hash of their id. Each
    iteration is one distributed pass — broadcast the k centroids,
    assign every vector (ivf_assign: broadcast join + per-vector
    argmin), then recompute centroids with a single grouped
    element-wise mean (posexplode → avg by (cid, pos) → rebuild
    array). Iteration happens on the DRIVER over k×dim floats only;
    the corpus is never collected and never shuffles on anything
    wider than the k-valued cell id. Convergence = max centroid
    squared-L2 shift < tol, checked on the collected k centroids
    (k×dim values — O(KB), not data-scale).

    The reference has no ANN/training surface at all; this is the
    north-star scale path (BASELINE.json) that makes `ivf_topk`
    self-contained: train → assign → probe within one engine.
    """
    from duckdb_distributed_execution_spark.operators.dedup import hash60

    dim = len(corpus.select(vec_col).first()[0])
    centroids = (
        corpus.orderBy(hash60(F.col(id_col).cast("string")))
        .limit(k)
        .select(
            F.monotonically_increasing_id().alias("__seed_ord"),
            F.col(vec_col),
        )
        .drop("__seed_ord")
        .rdd.map(lambda r: r[0])
        .collect()
    )
    spark = corpus.sparkSession
    prev = [list(map(float, c)) for c in centroids]

    for _ in range(max_iter):
        cdf = spark.createDataFrame(
            [(i, v) for i, v in enumerate(prev)],
            f"cid INT, {vec_col} ARRAY<DOUBLE>",
        )
        assigned = ivf_assign(corpus, cdf, id_col=id_col, vec_col=vec_col)
        joined = corpus.join(assigned.select(id_col, "cid"), on=id_col)
        new_rows = (
            joined.select("cid", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select("cid", F.transform("pm", lambda s: s["m"]).alias("v"))
            .collect()
        )
        new = list(prev)
        for r in new_rows:
            new[r.cid] = [float(x) for x in r.v]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, nw))
            for old, nw in zip(prev, new)
        )
        prev = new
        if shift < tol:
            break

    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(prev)],
        f"cid INT, {vec_col} ARRAY<DOUBLE>",
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — asymmetric distance computation
# ---------------------------------------------------------------------------
#
# The 100 TB compression step past int8 SQ: a d-dim vector becomes m
# sub-codes (one byte each at k<=256), a 64-dim float corpus shrinks
# 32x, and query scoring never touches the original vectors — each
# query precomputes an (m x k) lookup table of partial distances to
# every codebook entry, and scoring a corpus vector is m table
# lookups + adds (the ADC of Jegou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011). In Spark terms: the encoded
# corpus is a narrow (id, sub, code) table, the LUT is a broadcast,
# and scoring is one broadcast equi-join + grouped sum — no vector
# ever shuffles after encoding.


def pq_subvectors(
    df: DataFrame, id_col: str, vec_col: str, m: int, dsub: int
) -> DataFrame:
    """Explode each vector into its ``m`` contiguous ``dsub``-dim
    subvectors: (id, sub, sv). Narrow rows — ``m`` per vector, each
    carrying only a ``dsub``-dim slice."""
    spark = df.sparkSession
    subs = spark.range(m).select(F.col("id").cast("int").alias("sub"))
    return df.crossJoin(F.broadcast(subs)).select(
        F.col(id_col).alias("__id"),
        "sub",
        F.slice(
            F.col(vec_col).cast("array<double>"),
            F.col("sub") * dsub + 1,
            F.lit(dsub),
        ).alias("sv"),
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dsub: int = 8,
) -> DataFrame:
    """Encode the corpus against a codebook DF (sub, code, cv):
    per (vector, subspace) the argmin-squared-L2 code, code-id
    tie-break. The codebook (m*k tiny rows) broadcasts; the argmin is
    a struct-min grouped aggregate (partial/final, map-side combine),
    so encoding is one narrow shuffle of (id, sub, dist, code) rows.
    Returns (id, sub, code)."""
    sv = pq_subvectors(corpus, id_col, vec_col, m, dsub)
    cb = codebook.select("sub", "code", "cv")
    dists = sv.join(F.broadcast(cb), on="sub").select(
        "__id",
        "sub",
        sq_l2(F.col("sv"), F.col("cv")).alias("dist"),
        "code",
    )
    # min(struct(dist, code)) == ORDER BY dist, code LIMIT 1: struct
    # comparison is lexicographic and the doubles are bit-identical
    # across engines (same op order in sq_l2).
    return (
        dists.groupBy("__id", "sub")
        .agg(F.min(F.struct("dist", "code")).alias("__m"))
        .select(F.col("__id").alias(id_col), "sub", F.col("__m.code").alias("code"))
    )


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dsub: int = 8,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k: per query build the (sub, code) →
    partial-squared-L2 lookup table against the codebook (m*k rows per
    query — broadcastable for any practical query batch), join it to
    the encoded corpus on (sub, code), and sum the m partials per
    (query, vector). The per-partial values are snapped to 6 fixed
    decimals before the sum (``exact_sum``) so the total is
    order-independent and engine-exact. Returns
    (query_id, neighbor_id, rank, adist)."""
    from duckdb_distributed_execution_spark.functions import exact_sum

    qv = pq_subvectors(queries, id_col, vec_col, m, dsub).select(
        F.col("__id").alias("query_id"), "sub", F.col("sv").alias("qv")
    )
    cb = codebook.select("sub", "code", "cv")
    lut = qv.join(F.broadcast(cb), on="sub").select(
        "query_id", "sub", "code", sq_l2(F.col("qv"), F.col("cv")).alias("pdist")
    )
    scored = (
        corpus_codes.select(F.col(id_col).alias("neighbor_id"), "sub", "code")
        .join(F.broadcast(lut), on=["sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(exact_sum("pdist").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
