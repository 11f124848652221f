"""Semantic deduplication: k-means cluster, then near-dup only within
clusters (the SemDeDup recipe — Abbas et al. 2023, "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication").

Beyond the reference's inventory (its queries are the two taxi windowed
aggregations, flink-taxi-stream-processor/.../ProcessTaxiStream.java:96-136);
this is the embedding-space dedup step of an LLM data pipeline: pairwise
cosine over a 100 TB embedding corpus is O(N^2) and infeasible, so
SemDeDup first partitions the space with k-means and only compares
vectors that share a cluster — O(sum of cluster_size^2), bounded by
choosing K ~ N / target_cluster_size.

Determinism across engines (the oracle is hash-compared): floating-point
k-means is not reproducible across engines because partial-aggregate
accumulation order differs, so all CROSS-ROW arithmetic here is exact
integer math. Each vector is L2-normalized and quantized to BIGINT
millionths once (per-row, sequential fold — bit-identical in both
engines); centroid updates are integer sums + counts (exact, order-
independent) finished by one correctly-rounded double division; cluster
assignment maximizes the exact integer score 2*(v.c) - (c.c) (the
monotone L2 ordering), ties broken toward the lowest cluster id. Both
engines therefore walk identical cluster states through every Lloyd
iteration.

Spark plan shape at scale:
- seeds/centroids: K rows, collapsed into ONE array row and broadcast —
  assignment is a narrow per-row fold over the broadcast array, no
  shuffle, no per-vector join.
- centroid update: posexplode to (cluster, pos, val) with map-side
  partial sums — the exchange carries O(partitions * K * DIM) combined
  rows, never the vectors.
- within-cluster pairing: one shuffle on the cluster key; the pairwise
  cosine runs on exact quantized ints, clusters bound the quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table

K_CLUSTERS = 8
LLOYD_ITERS = 2       # centroid updates; assignments run ITERS + 1 times
QUANT = "1000000.0"   # normalized components -> BIGINT millionths
SEM_COS = "0.42"      # near-dup threshold on the 6-decimal rounded cosine
DIM = 64


def _doti(a: str, b: str, dialect: str) -> str:
    """Exact BIGINT dot product of two quantized vectors."""
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
            f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
    return (
        f"CAST(list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> {a}[i] * {b}[i])) AS BIGINT)"
    )


def _dotd(a: str, b: str, dialect: str) -> str:
    """Sequential-fold DOUBLE dot product (per-row, order-deterministic)."""
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) ->"
            f" CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return (
        f"CAST(list_sum(list_transform(range(1, len({a}) + 1), i ->"
        f" CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) AS DOUBLE)"
    )


def _quant_expr(vec: str, dialect: str) -> str:
    """L2-normalize + quantize to BIGINT millionths; zero vectors -> zeros.

    Every operation is per-element IEEE double (divide, sqrt, multiply,
    floor) over identical inputs in identical order -> bit-identical
    codes in both engines.
    """
    n2 = _dotd(vec, vec, dialect)
    lam = (
        f"x -> CAST(floor(CAST(x AS DOUBLE) / sqrt({n2})"
        f" * CAST({QUANT} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    zlam = "x -> CAST(0 AS BIGINT)"
    if dialect == "spark":
        return (
            f"CASE WHEN {n2} = CAST(0.0 AS DOUBLE)"
            f" THEN transform({vec}, {zlam})"
            f" ELSE transform({vec}, {lam}) END"
        )
    return (
        f"CASE WHEN {n2} = CAST(0.0 AS DOUBLE)"
        f" THEN list_transform({vec}, {zlam})"
        f" ELSE list_transform({vec}, {lam}) END"
    )


# Spark-side argmax over the broadcast centroid array: score each
# centroid ONCE via transform (the fold's CASE would otherwise evaluate
# the 64-term dot twice per centroid), then a sequential fold in
# ascending-cluster order with a strict > keeps the LOWEST cluster id
# on score ties — the same rule as the oracle's ORDER BY score DESC, cl.
def _pick_cluster_expr() -> str:
    score = (
        "(2 * " + _doti("vq", "c.cvq", "spark") + " - "
        + _doti("c.cvq", "c.cvq", "spark") + ")"
    )
    return (
        "aggregate("
        f"transform(cents, c -> named_struct('cl', c.cl, 's', {score})),"
        " named_struct('cl', CAST(-1 AS INT),"
        " 's', CAST(-9223372036854775807 AS BIGINT)),"
        " (acc, c) -> CASE WHEN c.s > acc.s THEN c ELSE acc END).cl"
    )


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.expr(_quant_expr("embedding", "spark")).alias("vq")
    )


def _seed_cents(qv: DataFrame) -> DataFrame:
    """ONE row: the K lowest-vec_id quantized vectors as (cl, cvq) structs."""
    return (
        qv.orderBy("vec_id")
        .limit(K_CLUSTERS)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(vec_id, vq))),"
                " (x, i) -> struct(CAST(i AS INT) AS cl, x.vq AS cvq))"
            ).alias("cents")
        )
    )


def _assign(qv: DataFrame, cents: DataFrame) -> DataFrame:
    return qv.crossJoin(F.broadcast(cents)).select(
        "vec_id", "vq", F.expr(_pick_cluster_expr()).alias("cl")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Integer mean per (cluster, dim), rebuilt into ONE centroid-array row."""
    ex = assigned.select("cl", F.posexplode("vq").alias("pos", "val"))
    dims = ex.groupBy("cl", "pos").agg(
        F.sum("val").alias("sv"), F.count("*").alias("nv")
    )
    cdim = dims.select(
        "cl",
        "pos",
        F.expr(
            "CAST(floor(CAST(sv AS DOUBLE) / CAST(nv AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cd"),
    )
    cent = cdim.groupBy("cl").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, cd))), x -> x.cd)"
        ).alias("cvq")
    )
    return cent.agg(
        F.expr("array_sort(collect_list(struct(cl, cvq)))").alias("cents")
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: K-means (K=8, 2 exact-integer
    Lloyd iterations, seeds = K lowest vec_ids), then cosine >= SEM_COS
    pairs *within* each final cluster; every vector reports its cluster,
    the lowest-id earlier near-dup that covers it (dup_of), and whether
    it survives (is_kept)."""
    # The quantized working set is referenced by every Lloyd iteration
    # AND the final pairing — checkpoint it once (the canonical Spark
    # iterative-algorithm pattern, same as dedup_clusters' loop) so the
    # plan holds ONE embeddings scan instead of re-deriving qv per
    # reference (6 corpus scans at 100 TB otherwise). Each centroid
    # generation is a 1-row frame; checkpointing it keeps the final
    # lineage flat instead of nesting assign/update trees per iteration.
    qv = _quantized(spark, sf_dir).localCheckpoint(eager=False)
    cents = _seed_cents(qv)
    for _ in range(LLOYD_ITERS):
        cents = _update(_assign(qv, cents)).localCheckpoint(eager=False)
    final = _assign(qv, cents).withColumn(
        "n2", F.expr(_doti("vq", "vq", "spark"))
    )
    a = final.select(
        F.col("vec_id").alias("a_id"),
        F.col("vq").alias("a_vq"),
        F.col("n2").alias("a_n2"),
        F.col("cl").alias("a_cl"),
    )
    b = final.select(
        F.col("vec_id").alias("b_id"),
        F.col("vq").alias("b_vq"),
        F.col("n2").alias("b_n2"),
        F.col("cl").alias("b_cl"),
    )
    cos = (
        "round(CAST(" + _doti("a_vq", "b_vq", "spark") + " AS DOUBLE)"
        " / (sqrt(CAST(a_n2 AS DOUBLE)) * sqrt(CAST(b_n2 AS DOUBLE))), 6)"
    )
    dup = (
        a.join(b, (F.col("a_cl") == F.col("b_cl")) & (F.col("a_id") < F.col("b_id")))
        .filter(F.expr(f"{cos} >= CAST({SEM_COS} AS DOUBLE)"))
        .groupBy("b_id")
        .agg(F.min("a_id").alias("dup_of"))
    )
    return (
        final.join(dup, final.vec_id == dup.b_id, "left")
        .select(
            "vec_id",
            F.col("cl").alias("cluster"),
            "dup_of",
            F.expr("dup_of IS NULL").alias("is_kept"),
        )
    )


# Lloyd iterations checkpoint per-generation centroids during plan
# construction — the plan cache must re-run the algorithm per call.
q_semantic_dedup.stateful_build = True


def _lloyd_ctes() -> tuple[list[str], str]:
    """The shared DuckDB CTE chain for the unrolled exact-integer Lloyd
    iterations: quantize -> seed -> (assign, update)*ITERS -> assign.
    Returns (ctes, name-of-final-assignment)."""
    d = "duckdb"
    quant = _quant_expr("embedding", d)
    ctes = [
        f"qv AS (SELECT vec_id, {quant} AS vq FROM embeddings)",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl, vq AS cvq
  FROM (SELECT vec_id, vq FROM qv ORDER BY vec_id LIMIT {K_CLUSTERS}))""",
    ]
    score = (
        "(2 * " + _doti("q.vq", "c.cvq", d) + " - " + _doti("c.cvq", "c.cvq", d) + ")"
    )
    for it in range(LLOYD_ITERS + 1):
        ctes.append(
            f"""a{it} AS (
  SELECT vec_id, vq, cl FROM (
    SELECT q.vec_id, q.vq, c.cl,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {score} DESC, c.cl ASC) AS rn
    FROM qv q CROSS JOIN c{it} c) WHERE rn = 1)"""
        )
        if it < LLOYD_ITERS:
            ctes.append(
                f"""c{it + 1} AS (
  SELECT cl, list(cd ORDER BY pos) AS cvq FROM (
    SELECT cl, i - 1 AS pos,
           CAST(floor(CAST(sum(vq[i]) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cd
    FROM a{it}, range(1, {DIM} + 1) r(i) GROUP BY cl, i) GROUP BY cl)"""
            )
    return ctes, f"a{LLOYD_ITERS}"


def _semantic_dedup_sql() -> str:
    d = "duckdb"
    ctes, last = _lloyd_ctes()
    cos = (
        "round(CAST(" + _doti("a.vq", "b.vq", d) + " AS DOUBLE)"
        " / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))), 6)"
    )
    ctes.append(
        f"nq AS (SELECT vec_id, vq, cl, {_doti('vq', 'vq', d)} AS n2 FROM {last})"
    )
    ctes.append(
        f"""pairs AS (
  SELECT b.vec_id AS vid, min(a.vec_id) AS dup_of
  FROM nq a JOIN nq b ON a.cl = b.cl AND a.vec_id < b.vec_id
  WHERE {cos} >= CAST({SEM_COS} AS DOUBLE)
  GROUP BY b.vec_id)"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT n.vec_id, n.cl AS cluster, p.dup_of AS dup_of,
       p.dup_of IS NULL AS is_kept
FROM nq n LEFT JOIN pairs p ON n.vec_id = p.vid
"""


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone k-means corpus clustering (the partitioning step
    SemDeDup embeds, exposed as the first-class cluster-profile view a
    pipeline uses for corpus balancing / mixture design): per final
    cluster, its size, the dominant ground-truth label (ties to the
    lowest label id), that label's count, and an exact integer purity in
    ppm. Identical exact-integer Lloyd state walk as semantic_dedup
    (seeds = K lowest vec_ids, LLOYD_ITERS updates) so both engines land
    the same clustering.

    Scale: assignment is a narrow fold over the ONE broadcast centroid
    row (no per-vector join); the profile is a groupBy over (cluster,
    label) — K x |labels| combined rows cross the exchange, never
    vectors. Purity = top_n * 1e6 DIV n (integer division truncates
    identically in both engines)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvl = emb.select(
        "vec_id",
        "label",
        F.expr(_quant_expr("embedding", "spark")).alias("vq"),
    ).localCheckpoint(eager=False)
    cents = _seed_cents(qvl.select("vec_id", "vq"))
    for _ in range(LLOYD_ITERS):
        cents = _update(_assign(qvl, cents)).localCheckpoint(eager=False)
    final = qvl.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", F.expr(_pick_cluster_expr()).alias("cl")
    )
    per = final.groupBy("cl", "label").agg(F.count("*").alias("n"))
    prof = per.groupBy("cl").agg(
        F.sum("n").alias("n_vectors"),
        # max over (count, -label): ties break toward the LOWEST label
        F.max(F.struct(F.col("n"), (-F.col("label")).alias("neg"))).alias("m"),
    )
    return prof.select(
        F.col("cl").alias("cluster"),
        "n_vectors",
        (-F.col("m.neg")).cast("int").alias("top_label"),
        F.col("m.n").alias("top_label_n"),
        F.expr("(m.n * CAST(1000000 AS BIGINT)) DIV n_vectors").alias(
            "purity_ppm"
        ),
    )


q_kmeans_clusters.stateful_build = True


def _kmeans_clusters_sql() -> str:
    ctes, last = _lloyd_ctes()
    ctes.append(
        f"""pcl AS (
  SELECT a.cl, e.label, count(*) AS n
  FROM {last} a JOIN embeddings e ON a.vec_id = e.vec_id
  GROUP BY a.cl, e.label)"""
    )
    ctes.append(
        """prof AS (
  SELECT cl, label, n,
         sum(n) OVER (PARTITION BY cl) AS tot,
         row_number() OVER (PARTITION BY cl
                            ORDER BY n DESC, label ASC) AS rn
  FROM pcl)"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT cl AS cluster, CAST(tot AS BIGINT) AS n_vectors,
       CAST(label AS INT) AS top_label,
       CAST(n AS BIGINT) AS top_label_n,
       CAST(n AS BIGINT) * 1000000 // CAST(tot AS BIGINT) AS purity_ppm
FROM prof WHERE rn = 1
"""


QUERIES = {
    "semantic_dedup": q_semantic_dedup,
    "kmeans_clusters": q_kmeans_clusters,
}

ORACLES = {
    "semantic_dedup": _semantic_dedup_sql(),
    "kmeans_clusters": _kmeans_clusters_sql(),
}
