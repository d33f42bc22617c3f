"""BM25 weighting over postings — the index-build weighting pass.

Reproduces the contract of ``inplace_normalize_csr_bm25plus``
(normalization.pyx:260-334, transcribed in SURVEY.md §2.3) on the postings
relation, structured for scale:

* ``dl`` already rides on every posting (map-side, postings.py) — no doc-side
  shuffle at all;
* ``term_stats`` (V rows) and the 1-row corpus stats are broadcast — the big
  postings relation is never shuffled by this stage.

The reference's N is the declared matrix shape incl. empty docs; pass
``n_docs`` to pin it (e.g. total pages before language filtering), else the
distinct doc count in the postings is used.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from similaripy_spark.functions.normalization import idf_expr, tf_expr
from similaripy_spark.fulltext.postings import corpus_stats, term_stats


def bm25_weights(
    postings: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    delta: float = 0.0,
    tf_mode: str = "raw",
    idf_mode: str = "bm25",
    logbase: float = math.e,
    n_docs: int | None = None,
) -> DataFrame:
    """postings(doc_id, term, tf, dl) → + (weight double).

    weight = idf * (tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl)) + delta)
    """
    stats = term_stats(postings)
    if n_docs is None:
        corpus = corpus_stats(postings, from_postings=True)
    else:
        corpus = postings.agg(
            (F.sum(F.col("tf").cast("double")) / float(n_docs)).alias("avgdl")
        ).withColumn("n_docs", F.lit(float(n_docs)))

    p = (
        postings.join(F.broadcast(stats), "term")
        .crossJoin(F.broadcast(corpus))
    )
    tf_ = tf_expr(F.col("tf").cast("double"), F.col("dl").cast("double"), tf_mode, logbase)
    idf_ = idf_expr(F.col("df").cast("double"), F.col("n_docs").cast("double"), idf_mode, logbase)
    norm_dl = (1.0 - b) + b * F.col("dl").cast("double") / F.col("avgdl")
    weight = idf_ * (tf_ * (k1 + 1.0) / (tf_ + k1 * norm_dl) + delta)
    return p.select(
        "doc_id", "term", "tf", "dl", weight.alias("weight")
    )
