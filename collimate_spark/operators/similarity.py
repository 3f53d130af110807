"""Similarity search over the ``embeddings`` table (array<float> column).

- brute-force cosine top-k: broadcast the (small) query set against the
  corpus; per-query Window top-k. The exact baseline.
- IVF-style top-k: coarse quantizer = per-label centroids (the label
  column stands in for a k-means assignment); queries probe only their
  nearest ``NPROBE`` clusters — the partition-pruning scale path. Recall
  vs brute force is asserted in tests, not hash-matched (approximate by
  construction).

All vector math is double-precision sequential folds (functions/vectors.py)
so Spark and the DuckDB oracle agree bit-for-bit before rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from collimate_spark.catalog import load_table
from collimate_spark.functions import vectors as V

N_QUERIES = 5  # vec_id < 5 are the demo query vectors
TOP_K = 10
NPROBE = 3


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: corpus × broadcast(queries) → cosine →
    row_number over per-query window → k. One pass over the corpus per
    batch of queries; at 100 TB this is the scan-heavy exact fallback."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb"))
    scored = (
        corpus.join(F.broadcast(queries))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos_raw", V.cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "cand_id", F.round("cos_raw", 4).alias("cosine"), "rk")
        .orderBy("query_id", "rk")
    )


ANN_BRUTEFORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         list_sum(list_transform(list_zip(q.q_emb, CAST(c.embedding AS DOUBLE[])), s -> s[1]*s[2]))
           / (sqrt(list_sum(list_transform(q.q_emb, x -> x*x)))
            * sqrt(list_sum(list_transform(CAST(c.embedding AS DOUBLE[]), x -> x*x)))) AS cos_raw
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, cand_id, cos_raw,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(cos_raw, 6) DESC, cand_id ASC) AS rk
  FROM scored
)
SELECT query_id, cand_id, ROUND(cos_raw, 4) AS cosine, rk
FROM ranked WHERE rk <= {TOP_K}
ORDER BY query_id, rk
"""


def centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors (the IVF coarse quantizer): element-wise
    mean via posexplode + groupBy(label, pos) — shuffle on (label, pos),
    fully parallel, no driver collection of vectors."""
    emb = load_table(spark, "embeddings", sf_dir)
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        # decimal-sum mean: float partial-aggregate merge order varies run
        # to run, which would make downstream top-k ranks flaky near
        # rounding boundaries; decimal sums are order-exact.
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(27,12)"))
                / F.count(F.lit(1))
            )
            .cast("double")
            .alias("m")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform("pm", lambda s: s.getField("m")).alias("centroid"))
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: score queries against the (tiny,
    broadcast) centroid table, keep the NPROBE nearest clusters per query,
    then search only those clusters' vectors. Scan cost drops from |corpus|
    to |corpus|·NPROBE/n_clusters — the standard ANN partition-prune.
    Rows-only correctness check (approximate); recall asserted in tests."""
    emb = load_table(spark, "embeddings", sf_dir)
    cents = centroids(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cent_cos").desc(), F.col("label").asc()
    )
    probe = (
        queries.join(F.broadcast(cents))
        .withColumn("cent_cos", V.cosine(F.col("q_emb"), F.col("centroid")))
        .withColumn("crk", F.row_number().over(wq))
        .filter(F.col("crk") <= NPROBE)
        .select("query_id", "q_emb", "label")
    )
    cands = emb.select("label", F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb"))
    scored = (
        cands.join(F.broadcast(probe), "label")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos_raw", V.cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "cand_id", F.round("cos_raw", 4).alias("cosine"), "rk")
        .orderBy("query_id", "rk")
    )


N_HYPERPLANES = 6
_EMB_DIM = 64


def _hyperplanes() -> list[list[float]]:
    """Deterministic random hyperplanes (fixed-seed PCG64) for
    sign-random-projection LSH. Generated driver-side, embedded as column
    literals — at 64 dims × 8 planes that is 512 constants, broadcast with
    the plan itself."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(4251))
    return rng.standard_normal((N_HYPERPLANES, _EMB_DIM)).tolist()


def _srp_bucket(vec_col):
    """Sign-random-projection bucket id: bit i = sign(dot(h_i, v))."""
    planes = _hyperplanes()
    bucket = F.lit(0)
    for i, h in enumerate(planes):
        hcol = F.array(*[F.lit(float(x)) for x in h])
        d = V.dot(hcol, vec_col)
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (the second scale path next to IVF):
    corpus vectors hash to a 6-bit sign-random-projection bucket; each
    query multi-probes Hamming distance ≤ 2 (22 of 64 buckets ≈ 1/3 of the
    corpus — these synthetic embeddings are weakly clustered, cosine of
    true neighbors ≈ 0.45, so SRP needs generous probing; on real
    embedding manifolds tighten to 1-bit probes and more planes).
    Rows-only correctness (approximate); recall asserted in tests."""
    emb = load_table(spark, "embeddings", sf_dir)
    corpus = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        _srp_bucket(F.col("embedding")).alias("bucket"),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _srp_bucket(F.col("embedding")).alias("qbucket"),
    )
    flips = [0] + [1 << i for i in range(N_HYPERPLANES)] + [
        (1 << i) | (1 << j)
        for i in range(N_HYPERPLANES)
        for j in range(i + 1, N_HYPERPLANES)
    ]
    probes = queries.select(
        "query_id",
        "q_emb",
        F.explode(
            F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in flips])
        ).alias("bucket"),
    )
    scored = (
        corpus.join(F.broadcast(probes), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos_raw", V.cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "cand_id", F.round("cos_raw", 4).alias("cosine"), "rk")
        .orderBy("query_id", "rk")
    )


QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_lsh_topk": ann_lsh_topk,
}

ORACLES = {
    "ann_bruteforce_topk": ANN_BRUTEFORCE_SQL,
    # ann_ivf_topk: rows-only (approximate by construction; recall vs
    # brute force asserted in tests/test_similarity.py)
}
