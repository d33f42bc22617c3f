"""Similarity search over embedding columns (``array<float>``).

* ``embeddings_to_matrix``  — posexplode to the engine's long form; from
  there the whole s_plus similarity family applies to embeddings for free.
* ``ann_bruteforce_topk``   — exact cosine top-k baseline (the s_plus cosine
  kernel: join on dimension → hash-agg → norms → window top-k).
* ``ann_lsh_topk``          — random-hyperplane LSH buckets (deterministic
  sign patterns from an integer-hash plane matrix), exact cosine *within*
  buckets: the scale path. Recall vs brute force is measured in tests, and
  multi-probe (``n_tables``) trades cost for recall.
* ``embedding_dedup_pairs`` — near-duplicate vectors (cosine ≥ threshold).

Hyperplane coefficients are ±1 from an explicit integer hash of
(table, plane, dim) — engine-independent, broadcastable, and never
materialized bigger than n_tables·n_planes·dim rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from similaripy_spark.functions.similarity import cosine
from similaripy_spark.operators.topk import top_k

_HA = 2654435761
_HB = 97
_PRIME = 2038074743


def embeddings_to_matrix(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, array<float>) → long form (row, col=dimension, value)."""
    return emb.select(
        F.col(id_col).cast("long").alias("row"),
        F.posexplode(F.col(vec_col)).alias("col", "value"),
    ).select("row", "col", F.col("value").cast("double").alias("value"))


def ann_bruteforce_topk(
    emb: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k neighbor lists (row, col=neighbor, value=cosine)."""
    m = embeddings_to_matrix(emb, id_col, vec_col)
    out = cosine(m, m.select(F.col("col").alias("row"), F.col("row").alias("col"),
                             "value"), k=k + (0 if include_self else 1))
    if not include_self:
        out = out.filter(F.col("row") != F.col("col"))
        out = top_k(out, k)
    return out


def _plane_table(spark, n_tables: int, n_planes: int, dim: int) -> DataFrame:
    """(table, plane, col, coef ±1) deterministic hyperplane matrix."""
    return (
        spark.range(n_tables)
        .select(F.col("id").cast("int").alias("table"))
        .crossJoin(
            spark.range(n_planes).select(F.col("id").cast("int").alias("plane"))
        )
        .crossJoin(spark.range(dim).select(F.col("id").cast("int").alias("col")))
        .withColumn(
            "coef",
            F.when(
                (
                    (
                        (F.col("table") * 131 + F.col("plane") + 1) * _HA
                        + (F.col("col") + 1) * _HB
                    )
                    % _PRIME
                )
                % 2
                == 1,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
    )


def lsh_buckets(
    emb: DataFrame,
    n_tables: int = 4,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (row, table, bucket): sign-pattern bucket per hash table."""
    spark = emb.sparkSession
    m = embeddings_to_matrix(emb, id_col, vec_col)
    dim = emb.select(F.size(vec_col).alias("d")).agg(F.max("d").alias("d")).first()["d"]
    planes = _plane_table(spark, n_tables, n_planes, dim)
    proj = (
        m.join(F.broadcast(planes), "col")
        .groupBy("row", "table", "plane")
        .agg(F.sum(F.col("value") * F.col("coef")).alias("dot"))
    )
    bit = F.when(F.col("dot") > 0, F.expr("shiftleft(1L, plane)")).otherwise(0)
    return proj.groupBy("row", "table").agg(F.sum(bit).alias("bucket"))


def ann_lsh_topk(
    emb: DataFrame,
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: candidates = pairs sharing any (table,
    bucket); exact cosine on candidates only; per-row top-k."""
    buckets = lsh_buckets(emb, n_tables, n_planes, id_col, vec_col)
    a = buckets.select(F.col("row").alias("doc_a"), "table", "bucket")
    b = buckets.select(F.col("row").alias("doc_b"), "table", "bucket")
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    m = embeddings_to_matrix(emb, id_col, vec_col)
    mt = m.select(F.col("col").alias("row"), F.col("row").alias("col"), "value")
    scored = cosine(
        m,
        mt,
        k=k,
        target_cols=cand.select(F.col("doc_a").alias("row"), F.col("doc_b").alias("col")),
    )
    return scored


def embedding_dedup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate embedding pairs: cosine ≥ threshold, a < b."""
    nn = ann_bruteforce_topk(emb, k=k, id_col=id_col, vec_col=vec_col)
    return (
        nn.filter((F.col("value") >= threshold) & (F.col("row") < F.col("col")))
        .select(
            F.col("row").alias("doc_a"),
            F.col("col").alias("doc_b"),
            F.col("value").alias("cosine"),
        )
    )
