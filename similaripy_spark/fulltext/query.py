"""BM25 top-k retrieval — query path A (relational / oracle-grade).

The reference's retrieval composition is ``dot_product(query_matrix,
bm25_weighted_docs.T, k)`` (README.md:73-95); for a binarized query vector
that is textbook Okapi BM25 ranking. Relationally (SURVEY.md §2.4):

    queries ⋈ weighted postings ON term      -- posting-list lookup
      → groupBy(query_id, doc_id).sum(weight) -- the sparse accumulator
      → top-k (score DESC, doc_id ASC)         -- deterministic heap

Spark turns the window + rn<=k into WindowGroupLimit (per-partition top-k
before and after the shuffle) — the distributed twin of the reference's
per-row heap (s_plus.h:39-64).

Unlike the similarity API (threshold=0 drops negative scores, matching
s_plus defaults), retrieval keeps negative BM25 scores: a top-10 over a
corpus where every query term is a stopword must still return 10 docs.
Pass ``threshold=0.0`` to reproduce the reference composition exactly.

Scale: the exploded query-term side is usually tiny next to the index, but a
production query BATCH can be arbitrarily large — the join is therefore left
UNHINTED so AQE broadcast-converts it only when the measured size is small
(plan-pinned in tests/test_plans.py) and falls back to a shuffle join
otherwise (VERDICT r2 finding 1). The postings side is term-partitioned
parquet so the join prunes to exactly the touched terms (predicate pushdown
on ``term``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from similaripy_spark.operators.topk import top_k


def bm25_topk(
    weighted_postings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    threshold: float | None = None,
    query_weighted: bool = False,
) -> DataFrame:
    """queries(query_id, terms array<string>) × postings(doc_id, term, weight)
    → (query_id, doc_id, score, rank), rank 1..k by (score DESC, doc_id ASC).

    query_weighted=True is the general dot_product composition: queries must
    then carry a ``weights`` array<double> parallel to ``terms``, and the
    score is Σ qw·weight — duplicate terms are NOT deduplicated (their qw
    contributions add, exactly as repeated query-vector mass would in the
    reference's ``dot_product(q, W.T)``). Default is the binarized query
    vector of the README example (distinct terms, qw=1).
    """
    # the matched stream is explicitly clustered by query_id with the
    # configured shuffle parallelism BEFORE the score aggregate: the
    # aggregate and the top-k window then share that ONE exchange (same
    # single-exchange shape as the similarity kernel — an
    # ENSURE_REQUIREMENTS exchange here would be planned on (query_id,
    # doc_id) and the window would pay a second full shuffle + sort of
    # the same stream). Partial aggregation loses almost nothing: a
    # (query, doc) cell has at most |query terms| contributions.
    n_part = int(
        queries.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    if query_weighted:
        if "weights" not in queries.columns:
            raise ValueError(
                "query_weighted=True requires a `weights` array column "
                "parallel to `terms`"
            )
        qterms = queries.select(
            "query_id",
            F.explode(F.arrays_zip("terms", "weights")).alias("tw"),
        ).select(
            "query_id",
            F.col("tw.terms").alias("term"),
            F.col("tw.weights").cast("double").alias("qw"),
        )
        scores = (
            qterms.join(weighted_postings, "term")
            .repartition(n_part, F.col("query_id"))
            .groupBy("query_id", "doc_id")
            .agg(F.sum(F.col("qw") * F.col("weight")).alias("score"))
        )
    else:
        qterms = queries.select(
            "query_id", F.explode("terms").alias("term")
        ).distinct()
        scores = (
            qterms.join(weighted_postings, "term")
            .repartition(n_part, F.col("query_id"))
            .groupBy("query_id", "doc_id")
            .agg(F.sum("weight").alias("score"))
        )
    if threshold is not None:
        scores = scores.filter(
            (F.col("score") >= threshold) & (F.col("score") != 0.0)
        )
    out = top_k(
        scores, k, group="query_id", order_value="score", tiebreak="doc_id",
        keep_rank=True,
    )
    return out.select("query_id", "doc_id", "score", "rank")
