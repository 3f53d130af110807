"""Deduplication operators over the ``documents`` table — the
training-data-pipeline surface: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine near-dup.

Scale design: every variant is expressed as scans + equi-joins on derived
keys (hash buckets / shingles / LSH bands) — candidate generation is never
O(n²); the only quadratic step is *within* a bucket after blocking, which
is how near-dedup at 100 TB works in practice (cf. MinHashLSH literature:
Broder '97; SimHash: Charikar '02).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from collimate_spark.catalog import load_table
from collimate_spark.functions import fast_text
from collimate_spark.functions import text as X
from collimate_spark.functions import vectors as V
from collimate_spark.functions.pairs import bounded_self_pairs

JACCARD_THRESHOLD = 0.8
MINHASH_K = 128
LSH_BANDS = 32
LSH_ROWS = 4  # 32 bands × 4 rows = 128 hashes; P(miss | j=0.8) ≈ 5e-8
BUCKET_CAP = 1024  # max members whose pairs one task may generate


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by md5 of normalized text: one hash-shuffle groupBy,
    keep the minimum doc_id per content hash (deterministic survivor)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.withColumn("text_hash", F.md5(X.normalize_text(F.col("text")).cast("binary")))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keep_doc_id")
    )


DEDUP_EXACT_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash,
       MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY 1
ORDER BY keep_doc_id
"""

# Shared exact-Jaccard oracle (trigram shingles, threshold 0.8): used for
# both the exact n-gram pair join AND the MinHash-LSH variant — at these
# banding parameters LSH recall at j>=0.8 is 1 - 5e-8, so verified LSH
# output equals the exact result.
NGRAM_JACCARD_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
            range(1, greatest(len(toks) - 1, 1)),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
  FROM d WHERE len(toks) >= 3
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sz sa ON doc_a = sa.doc_id
JOIN sz sb ON doc_b = sb.doc_id
WHERE i * 1.0 / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition a (possibly single-file) input across all cores before a
    compute-heavy per-row kernel. At 100 TB inputs arrive in thousands of
    splits and this is a no-op decision; locally a 1-file table would
    otherwise pin mapInPandas to one core. The split count comes from the
    scan's input files (plan-only metadata — checking df.rdd here would
    force a full RDD conversion of the logical plan per call)."""
    if len(df.inputFiles()) < spark.sparkContext.defaultParallelism:
        return df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String trigram-shingle sets via pure JVM expressions (used by the
    zero-Python expr variant)."""
    docs = _spread(spark, load_table(spark, "documents", sf_dir))
    toks = X.tokens(F.col("text"))
    return docs.select("doc_id", X.word_shingles(toks, 3).alias("shingles")).filter(
        F.size("shingles") > 0
    )


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit hashed trigram-shingle sets (Arrow-batched numpy kernel) —
    set algebra over these matches the string shingles w.h.p. (2^-64 per
    pair), so exact-Jaccard verification still hash-matches the
    string-based DuckDB oracle."""
    docs = _spread(spark, load_table(spark, "documents", sf_dir))
    return (
        docs.select("doc_id", "text")
        .mapInPandas(fast_text.shingle_hash_sets, fast_text.SHINGLE_SET_SCHEMA)
        .filter(F.size("sh") > 0)
        .withColumnRenamed("sh", "shingles")
    )


def _verified_jaccard_pairs(candidates: DataFrame, shingled: DataFrame) -> DataFrame:
    """Join candidate (doc_a, doc_b) pairs back to shingle sets and compute
    exact Jaccard via array_intersect/union sizes (broadcast-friendly at
    bucket scale; at 100 TB the shingle arrays travel with the pair join)."""
    a = shingled.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = shingled.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard_raw", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("jaccard_raw", 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: explode distinct trigram
    shingles → self equi-join on shingle (candidate generation bounded by
    shared-shingle pairs, not n²) → exact verification. Shingles travel as
    64-bit hashes (see _shingle_sets)."""
    shingled = _shingle_sets(spark, sf_dir)
    exploded = shingled.select("doc_id", F.explode("shingles").alias("shingle"))
    pairs = (
        exploded.alias("a")
        .join(exploded.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verified_jaccard_pairs(pairs, shingled)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup pairs.

    shingle → 128-hash MinHash → 32 bands × 4 rows → self equi-join on
    (band, band_hash) → exact-Jaccard verify. Candidate generation touches
    only colliding bands — the scale path that replaces the exact variant's
    shared-shingle join when shingle frequency explodes (at 100 TB a common
    shingle joins everything to everything; band hashes keep bucket sizes
    ~uniform).

    The hash kernel is the Arrow-batched numpy one (functions/fast_text):
    ~10× the interpreted higher-order-function form, embarrassingly
    parallel per partition. The correctness contract is unchanged — LSH
    candidates are verified against exact Jaccard, so the oracle (exact
    pairs) matches as long as banding recall ≈ 1 (P(miss|j≥0.8) ≈ 5e-8 at
    32×4). The pure-expression form stays available as
    ``minhash_band_hash`` + ``dedup_minhash_lsh_expr``.
    """
    docs = _spread(spark, load_table(spark, "documents", sf_dir))
    banded = docs.select("doc_id", "text").mapInPandas(
        fast_text.minhash_bands, fast_text.BAND_SCHEMA
    )
    candidates = _bucket_pairs(banded, "band", "band_hash")
    return _verified_jaccard_pairs(candidates, _shingle_sets(spark, sf_dir))


def _bucket_pairs(banded: DataFrame, *bucket_cols: str, cap: int = BUCKET_CAP) -> DataFrame:
    """Candidate pairs from bucket membership, with bounded per-task work.

    Common path (bucket ≤ cap members): groupBy the bucket key, collect
    the member list, emit sorted pairs with a nested-transform expression
    — replaces a self-join (two shuffles of the full banded relation +
    join); member lists stay small because band hashes spread non-dup
    docs uniformly.

    Degenerate path (bucket > cap members — e.g. thousands of near-empty
    docs sharing a band signature): an uncapped collect_set would build
    one executor-resident member array and a single task emitting s²
    pairs. Those buckets are routed to the chunked self-join
    (functions/pairs.bounded_self_pairs): exact same pair set, ≤ cap²
    candidates per task. No candidates are dropped either way. Input must
    be unique per (bucket key, doc_id) — one row per doc per band, which
    both the numpy and expression banders produce."""
    banded = banded.select(*bucket_cols, "doc_id")
    sizes = (
        banded.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)  # singleton buckets pair with nothing
    )
    sized = banded.join(sizes, list(bucket_cols))
    small_pairs = (
        sized.filter(F.col("__n") <= cap)
        .groupBy(*bucket_cols)
        .agg(F.collect_set("doc_id").alias("ids"))
        .select(F.array_sort("ids").alias("ids"))
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                            lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
    )
    big_pairs = bounded_self_pairs(
        sized.filter(F.col("__n") > cap), list(bucket_cols), "doc_id", "__n", cap=cap
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    return small_pairs.unionByName(big_pairs).distinct()


def dedup_minhash_lsh_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-expression (zero-Python) MinHash-LSH: explode band indices
    FIRST, then compute only that band's seed minima per row
    (minhash_band_hash) — total hash work = one full signature per doc.
    Slicing an inline signature expression instead would let
    CollapseProject recompute the whole signature per band (32×).
    Same verified output as dedup_minhash_lsh; ~10× slower kernel, kept as
    the no-Python fallback and for parity testing."""
    shingled = _shingled(spark, sf_dir)
    banded = (
        shingled.select(
            "doc_id",
            "shingles",
            F.explode(F.sequence(F.lit(0), F.lit(LSH_BANDS - 1))).alias("band"),
        )
        .select(
            "doc_id",
            "band",
            X.minhash_band_hash(F.col("shingles"), F.col("band"), LSH_ROWS).alias("band_hash"),
        )
    )
    candidates = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verified_jaccard_pairs(candidates, shingled)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprint per doc (Arrow-batched
    numpy kernel, functions/fast_text); pairs within Hamming distance ≤ 3
    found via 4×16-bit band blocking (a pair within distance 3 must agree
    exactly on ≥1 of 4 bands — pigeonhole), then exact Hamming
    verification via bit_count. No DuckDB oracle (the hash family is
    engine-specific) → driver records the rows-only check; determinism is
    covered by tests/test_dedup.py.
    """
    docs = _spread(spark, load_table(spark, "documents", sf_dir))
    fp = docs.select("doc_id", "text").mapInPandas(
        fast_text.simhash_fingerprints, fast_text.SIMHASH_SCHEMA
    )
    # band b = bits [16b, 16b+16) of the fingerprint (shift amounts must be
    # Python ints → build the 4 band structs explicitly and explode)
    banded = fp.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_val").alias("band_val"))
    # capped bucket pairing (identical docs share ALL bands — the
    # adversarial hot bucket), then re-join fingerprints for the exact
    # Hamming verify
    candidates = _bucket_pairs(banded, "band", "band_val")
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("hamming", X.hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


EMB_COSINE_THRESHOLD = 0.4
EMB_BLOCK_CAP = 1024  # max cluster members whose pairs one task generates


def dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, block_cap: int = EMB_BLOCK_CAP
) -> DataFrame:
    """Embedding near-dup: pairs with cosine ≥ threshold, blocked by the
    ``label`` cluster id (IVF-style partition pruning: only same-cluster
    pairs are compared — the 100 TB answer to all-pairs cosine).

    Within-cluster pairing goes through the chunked self-join
    (functions/pairs.bounded_self_pairs), so a cluster larger than
    ``block_cap`` is split into hash chunks and its pairs spread over
    ⌈s/cap⌉² bounded tasks instead of one quadratic straggler — output is
    identical (the chunk grid covers every unordered pair exactly once);
    only the task shape changes. Cluster sizes come from a broadcast
    10-row count."""
    emb = load_table(spark, "embeddings", sf_dir)
    sizes = emb.groupBy("label").agg(F.count(F.lit(1)).alias("__n"))
    sized = emb.join(F.broadcast(sizes), "label")
    pairs = bounded_self_pairs(
        sized, ["label"], "vec_id", "__n", cap=block_cap, payload_cols=["embedding"]
    )
    return (
        pairs.withColumn("cos_raw", V.cosine(F.col("embedding_a"), F.col("embedding_b")))
        .filter(F.round(F.col("cos_raw"), 6) >= EMB_COSINE_THRESHOLD)
        .select(
            "label",
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            F.round("cos_raw", 4).alias("cosine"),
        )
        .orderBy("vec_a", "vec_b")
    )


DEDUP_EMB_SQL = f"""
WITH pairs AS (
  SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_sum(list_transform(list_zip(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), s -> s[1]*s[2]))
           / (sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x*x)))
            * sqrt(list_sum(list_transform(CAST(b.embedding AS DOUBLE[]), x -> x*x)))) AS cos_raw
  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT label, vec_a, vec_b, ROUND(cos_raw, 4) AS cosine
FROM pairs
WHERE ROUND(cos_raw, 6) >= {EMB_COSINE_THRESHOLD}
ORDER BY vec_a, vec_b
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_minhash_lsh_expr": dedup_minhash_lsh_expr,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": NGRAM_JACCARD_SQL,
    "dedup_minhash_lsh": NGRAM_JACCARD_SQL,
    "dedup_minhash_lsh_expr": NGRAM_JACCARD_SQL,
    # dedup_simhash: rows-only (engine-specific hash family)
    "dedup_embedding_cosine": DEDUP_EMB_SQL,
}
