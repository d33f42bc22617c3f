"""Unified query front-end: ONE entry point, physical path chosen for you.

The engine has three exact top-k strategies (wand.py), each best in a
different regime — exactly like the reference exposes one ``dot_product``
call while s_plus.h picks blocked vs single-pass accumulation internally
(s_plus.pyx:217-225):

* ``term_major_topk`` — point queries: ships only the queried terms' blocks
  (partition-pruned merged layout) to a per-query group.
* ``bucket_topk``     — mid-size batches: per-term-bucket cogroups, fan-out
  independent of shard count.
* ``segment_topk``    — large batches: replicate the batch to every doc
  shard, one vectorized pass per shard amortizes all decodes.

``topk(spark, index_dir, queries)`` routes on the query-batch size and the
index's own metadata (``meta.json`` for the shard list — no per-call
shard-discovery job — and ``merged/_meta.json`` for the bucket count). Every
path returns the same (query_id, doc_id, score, rank) with the same
deterministic tie rule (score DESC, doc_id ASC), so routing is a pure
physical choice — parity across the routing boundaries is pinned in
tests/test_retrieve.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from similaripy_spark.fulltext.index_build import read_meta, read_segments
from similaripy_spark.fulltext.wand import (
    bucket_topk,
    segment_topk,
    term_major_topk,
)

#: batch-size routing cutoffs: below POINT the per-query group cost is
#: negligible and block shipping is minimal; above BATCH the per-shard
#: vectorized pass amortizes decode best (measured crossover regions, see
#: BENCH/BASELINE.md; both overridable per call).
POINT_CUTOFF = 32
BATCH_CUTOFF = 4096


def route(
    n_queries: int,
    has_merged: bool,
    point_cutoff: int = POINT_CUTOFF,
    batch_cutoff: int = BATCH_CUTOFF,
) -> str:
    """'term_major' | 'bucket' | 'segment' (pure function — unit-tested)."""
    if not has_merged:
        return "segment"
    if n_queries <= point_cutoff:
        return "term_major"
    if n_queries <= batch_cutoff:
        return "bucket"
    return "segment"


def topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    *,
    path: str | None = None,
    query_weighted: bool = False,
    point_cutoff: int = POINT_CUTOFF,
    batch_cutoff: int = BATCH_CUTOFF,
) -> DataFrame:
    """BM25 top-k over a built index; physical path auto-routed.

    ``path`` forces 'segment' | 'bucket' | 'term_major' (parity testing /
    expert override). Weighted queries (``weights`` column) are only
    supported by the batch scorer, so they always route to 'segment'.
    Routing counts the query batch — one action over the (small) query side
    only; pass ``path`` to skip even that.
    """
    meta = read_meta(index_dir)
    has_merged = os.path.isdir(os.path.join(index_dir, "merged"))
    if query_weighted:
        path = "segment"
    elif path is None:
        n_q = queries.count()
        path = route(n_q, has_merged, point_cutoff, batch_cutoff)
    elif path != "segment" and not has_merged:
        raise ValueError(
            f"path={path!r} needs the term-major merged layout; run "
            "index_merge.merge_to_term_major first"
        )

    if path == "segment":
        return segment_topk(
            read_segments(spark, index_dir),
            queries,
            k=k,
            shard_ids=range(int(meta["n_shards"])),
            query_weighted=query_weighted,
        )
    if path == "term_major":
        return term_major_topk(spark, index_dir, queries, k=k)
    if path == "bucket":
        return bucket_topk(spark, index_dir, queries, k=k)
    raise ValueError(f"unknown path {path!r}")
