"""Segment-based BM25 top-k with Block-Max MaxScore pruning.

Physical strategy (the engine's one custom dataflow kernel, playing the role
s_plus.h plays in the reference):

* **Doc-shard scatter**: queries (tiny) are replicated to every shard of the
  doc-sharded index; a cogrouped ``applyInPandas`` scores ALL queries of a
  shard against that shard's posting blocks in one Arrow pass. Decoded blocks
  are memoized across queries within the shard — hot-term decode cost is paid
  once per shard, not once per query.
* **Local top-k, global merge**: each shard emits its local top-k per query
  (global top-k ⊆ union of shard top-k); a windowed top-k merges them.
* **Block-Max MaxScore** (Turtle & Flood 1995; block-max variant after Ding &
  Suel, SIGIR 2011): per query, terms are processed in descending
  max-weight order. Once the running k-th-best lower bound θ exceeds the
  best possible score of any unseen doc (block max_score + suffix of term
  maxima), whole blocks of hot terms are skipped for *new* candidates and
  only probed (binary search) for already-found candidates. BM25 idf is
  unclamped (reference semantics) so weights can be NEGATIVE; bounds use
  positive-part maxima and negative-part minima to stay exact — parity with
  the exhaustive path is tested, not assumed.

Scoring accumulates float32 stored weights in float64, matching the SQL
path within 1e-6 relative (tests pin rtol 1e-4, the reference's own
tolerance: tests/test_similarity.py:293-294).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from similaripy_spark.fulltext import codec
from similaripy_spark.operators.topk import top_k

_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


class _ShardIndex:
    """Per-shard lazy block store: decodes a term's blocks on first touch."""

    def __init__(self, seg: pd.DataFrame):
        self._groups = {}
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for term, g in seg.groupby("term", sort=False):
            # (shard, block_id) order keeps docIDs globally ascending even
            # when blocks from several doc-range shards are mixed (the
            # term-major merged layout)
            g = g.sort_values(["shard", "block_id"])
            self._groups[term] = g

    def terms(self):
        return self._groups.keys()

    def term_meta(self, term):
        """(tmax, tmin, block first_docs, max_docs, max_scores) or None."""
        g = self._groups.get(term)
        if g is None:
            return None
        return (
            float(g["max_score"].max()),
            float(g["min_score"].min()),
            g["first_doc"].to_numpy(np.int64),
            g["max_doc"].to_numpy(np.int64),
            g["max_score"].to_numpy(np.float32),
        )

    def decode_blocks(self, term, block_mask: np.ndarray | None = None):
        """→ (docs int64 asc, weights float64) for selected blocks.
        Full-term decodes are memoized."""
        g = self._groups[term]
        if block_mask is None:
            hit = self._cache.get(term)
            if hit is not None:
                return hit
            rows = g
        else:
            rows = g[block_mask]
        docs_parts, w_parts = [], []
        for r in rows.itertuples(index=False):
            deltas = codec.decode_varints(r.doc_deltas, r.n)
            docs_parts.append(codec.delta_decode(deltas, r.first_doc))
            w_parts.append(codec.decode_f32(r.weights).astype(np.float64))
        if docs_parts:
            out = (np.concatenate(docs_parts), np.concatenate(w_parts))
        else:
            out = (np.zeros(0, np.int64), np.zeros(0, np.float64))
        if block_mask is None:
            self._cache[term] = out
        return out


def _score_exhaustive(idx: _ShardIndex, terms) -> tuple[np.ndarray, np.ndarray]:
    """Union-accumulate all postings of all terms (always exact)."""
    d_parts, w_parts = [], []
    for t in terms:
        if t in idx._groups:
            d, w = idx.decode_blocks(t)
            d_parts.append(d)
            w_parts.append(w)
    if not d_parts:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    docs = np.concatenate(d_parts)
    ws = np.concatenate(w_parts)
    udocs, inv = np.unique(docs, return_inverse=True)
    scores = np.bincount(inv, weights=ws, minlength=len(udocs))
    return udocs, scores


def _score_maxscore(idx: _ShardIndex, terms, k: int):
    """Block-Max MaxScore: exact top-k candidate set with block skipping."""
    metas = []
    for t in terms:
        m = idx.term_meta(t)
        if m is not None:
            metas.append((t, m))
    if not metas:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    # descending by term max weight: rare, high-impact terms first
    metas.sort(key=lambda tm: -tm[1][0])
    tmaxs = np.array([m[1][0] for m in metas])
    tmins = np.array([m[1][1] for m in metas])
    # suffix sums of positive maxima: best future gain for any doc
    pos = np.maximum(tmaxs, 0.0)
    suffix_gain = np.concatenate([np.cumsum(pos[::-1])[::-1][1:], [0.0]])
    # worst future loss for a doc containing remaining terms
    neg = np.minimum(tmins, 0.0)
    suffix_loss = np.concatenate([np.cumsum(neg[::-1])[::-1][1:], [0.0]])

    acc_docs = np.zeros(0, np.int64)
    acc_scores = np.zeros(0, np.float64)
    for j, (t, (tmax, tmin, firsts, maxds, bmaxs)) in enumerate(metas):
        theta = None
        if len(acc_docs) >= k:
            # safe lower bound on the final k-th best score: candidates may
            # still lose term j's own negative contribution (it has not been
            # applied to them yet) plus every later term's
            lower = acc_scores + neg[j] + suffix_loss[j]
            theta = np.partition(lower, len(lower) - k)[len(lower) - k]

        if theta is None or tmax + suffix_gain[j] >= theta:
            # term may still create new entrants — but individual blocks
            # whose max can't reach θ are skipped for new candidates
            if theta is not None:
                entrant_mask = (bmaxs + suffix_gain[j]) >= theta
            else:
                entrant_mask = np.ones(len(bmaxs), dtype=bool)
        else:
            entrant_mask = np.zeros(len(bmaxs), dtype=bool)

        # blocks needed to update existing candidates (range overlap)
        if len(acc_docs):
            lo = np.searchsorted(acc_docs, firsts, side="left")
            hi = np.searchsorted(acc_docs, maxds, side="right")
            update_mask = hi > lo
        else:
            update_mask = np.zeros(len(bmaxs), dtype=bool)

        need = entrant_mask | update_mask
        if not need.any():
            continue
        if need.all():
            d, w = idx.decode_blocks(t)
        else:
            d, w = idx.decode_blocks(t, block_mask=need)

        if entrant_mask.all():
            # merge whole list
            docs = np.concatenate([acc_docs, d])
            ws = np.concatenate([acc_scores, w])
            acc_docs, inv = np.unique(docs, return_inverse=True)
            acc_scores = np.bincount(inv, weights=ws, minlength=len(acc_docs))
        else:
            # existing candidates: exact membership probe
            pos_idx = np.searchsorted(d, acc_docs)
            pos_idx = np.clip(pos_idx, 0, len(d) - 1) if len(d) else pos_idx
            if len(d):
                hitmask = d[pos_idx] == acc_docs
                acc_scores = acc_scores + np.where(hitmask, w[pos_idx], 0.0)
            # new entrants from allowed blocks only
            if entrant_mask.any():
                # restrict to docs not already candidates
                sel = np.isin(d, acc_docs, invert=True, assume_unique=False)
                # only docs from entrant blocks matter; d already filtered by
                # `need`, so drop docs that came from update-only blocks
                # (cheap conservative recheck: block ranges)
                nd, nw = d[sel], w[sel]
                if len(nd):
                    acc_docs2 = np.concatenate([acc_docs, nd])
                    acc_scores2 = np.concatenate([acc_scores, nw])
                    order = np.argsort(acc_docs2, kind="stable")
                    acc_docs = acc_docs2[order]
                    acc_scores = acc_scores2[order]
    return acc_docs, acc_scores


def _local_topk(docs, scores, k):
    if len(docs) == 0:
        return docs, scores
    if len(docs) > k:
        # top-k by (score desc, doc asc)
        order = np.lexsort((docs, -scores))[:k]
    else:
        order = np.lexsort((docs, -scores))
    return docs[order], scores[order]


def segment_topk(
    segments: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prune: bool = True,
) -> DataFrame:
    """queries(query_id, terms) × doc-sharded segments → global top-k
    (query_id, doc_id, score, rank)."""
    spark = segments.sparkSession
    # distinct shard ids are tiny (n_docs / shard_size); collecting breaks the
    # self-join lineage between the cogroup sides
    shard_ids = [
        r["shard"] for r in segments.select("shard").distinct().collect()
    ]
    shards = spark.createDataFrame([(s,) for s in shard_ids], "shard int")
    qx = queries.select("query_id", "terms").crossJoin(F.broadcast(shards))

    def score_shard(seg_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(seg_pdf) == 0 or len(q_pdf) == 0:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "doc_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")}
            )
        idx = _ShardIndex(seg_pdf)
        out_q, out_d, out_s = [], [], []
        for qid, terms in zip(q_pdf["query_id"], q_pdf["terms"]):
            uterms = list(dict.fromkeys(terms))
            if prune:
                docs, scores = _score_maxscore(idx, uterms, k)
            else:
                docs, scores = _score_exhaustive(idx, uterms)
            docs, scores = _local_topk(docs, scores, k)
            out_q.extend([qid] * len(docs))
            out_d.extend(docs.tolist())
            out_s.extend(scores.tolist())
        return pd.DataFrame(
            {"query_id": np.asarray(out_q, np.int64),
             "doc_id": np.asarray(out_d, np.int64),
             "score": np.asarray(out_s, np.float64)}
        )

    local = (
        segments.groupby("shard")
        .cogroup(qx.groupby("shard"))
        .applyInPandas(score_shard, schema=_RESULT_SCHEMA)
    )
    out = top_k(
        local, k, group="query_id", order_value="score", tiebreak="doc_id",
        keep_rank=True,
    )
    return out.select("query_id", "doc_id", "score", "rank")


def term_major_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    prune: bool = True,
    n_buckets: int = 64,
) -> DataFrame:
    """Point-query path over the term-major merged layout: bucket-pruned scan
    of exactly the queried terms' blocks, then one scoring pass per query.

    Best when the query batch is small and selective (the blocks of each
    query's terms are shipped to that query's group). For large batches use
    ``segment_topk`` — it amortizes decode per shard instead.
    """
    from similaripy_spark.fulltext.index_merge import read_merged_for_terms

    qterms = queries.select("query_id", F.explode("terms").alias("term"))
    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    blocks = read_merged_for_terms(spark, index_dir, terms, n_buckets)
    joined = blocks.join(F.broadcast(qterms), "term")

    def score_query(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = key[0]
        seg = pdf.drop_duplicates(subset=["term", "shard", "block_id"])
        idx = _ShardIndex(seg)
        uterms = list(dict.fromkeys(pdf["term"]))
        if prune:
            docs, scores = _score_maxscore(idx, uterms, k)
        else:
            docs, scores = _score_exhaustive(idx, uterms)
        docs, scores = _local_topk(docs, scores, k)
        return pd.DataFrame(
            {"query_id": np.full(len(docs), qid, np.int64),
             "doc_id": docs, "score": scores}
        )

    local = joined.groupby("query_id").applyInPandas(
        score_query, schema=_RESULT_SCHEMA
    )
    out = top_k(
        local, k, group="query_id", order_value="score", tiebreak="doc_id",
        keep_rank=True,
    )
    return out.select("query_id", "doc_id", "score", "rank")
