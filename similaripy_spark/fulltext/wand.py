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
    """Per-shard lazy block store over the Arrow batch of segment rows.

    Construction is fully vectorized (factorize + lexsort — a pandas
    ``groupby`` materializing one sub-frame per term costs ~0.5 ms × 10^4
    terms per shard, which dominated the first implementation). Blocks of a
    term are stored as contiguous row slices in (shard, block_id) order, so
    docIDs stay globally ascending even in the term-major merged layout.
    """

    def __init__(self, seg: pd.DataFrame):
        codes, uniques = pd.factorize(seg["term"], sort=False)
        order = np.lexsort(
            (seg["block_id"].to_numpy(), seg["shard"].to_numpy(), codes)
        )
        sc = codes[order]
        starts = np.flatnonzero(np.concatenate(([True], sc[1:] != sc[:-1])))
        ends = np.append(starts[1:], len(sc))
        self._slice = {
            uniques[sc[s]]: (int(s), int(e)) for s, e in zip(starts, ends)
        }
        self._n = seg["n"].to_numpy(np.int64)[order]
        self._first = seg["first_doc"].to_numpy(np.int64)[order]
        self._maxd = seg["max_doc"].to_numpy(np.int64)[order]
        self._maxs = seg["max_score"].to_numpy(np.float32)[order]
        self._mins = seg["min_score"].to_numpy(np.float32)[order]
        self._dd = seg["doc_deltas"].to_numpy(dtype=object)[order]
        self._ww = seg["weights"].to_numpy(dtype=object)[order]
        self._groups = self._slice  # membership checks elsewhere
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def terms(self):
        return self._slice.keys()

    def term_meta(self, term):
        """(tmax, tmin, block first_docs, max_docs, max_scores) or None."""
        se = self._slice.get(term)
        if se is None:
            return None
        s, e = se
        return (
            float(self._maxs[s:e].max()),
            float(self._mins[s:e].min()),
            self._first[s:e],
            self._maxd[s:e],
            self._maxs[s:e],
        )

    def _decode_rows(self, rows: np.ndarray):
        """Bulk-decode arbitrary block rows in one vectorized pass: varints
        of all blocks are decoded from one concatenated buffer, absolute
        docIDs restored with a cross-block cumsum-rebase (the first delta of
        every block is 0 by construction)."""
        if len(rows) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        ns = self._n[rows]
        deltas = codec.decode_varints(
            b"".join(self._dd[r] for r in rows), int(ns.sum())
        ).astype(np.int64)
        cs = np.cumsum(deltas)
        starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
        base = self._first[rows] - cs[starts]
        docs = cs + np.repeat(base, ns)
        weights = np.frombuffer(
            b"".join(self._ww[r] for r in rows), dtype=np.float32
        ).astype(np.float64)
        return docs, weights

    def decode_blocks(self, term, block_mask: np.ndarray | None = None):
        """→ (docs int64 asc, weights float64) for selected blocks.
        Full-term decodes are memoized."""
        s, e = self._slice[term]
        if block_mask is None:
            hit = self._cache.get(term)
            if hit is not None:
                return hit
            rows = np.arange(s, e)
        else:
            rows = np.arange(s, e)[block_mask]
        out = self._decode_rows(rows)
        if block_mask is None:
            self._cache[term] = out
        return out

    def decode_terms(self, terms):
        """Bulk decode many terms at once → (docs, weights, spans) where
        spans[term] = (start, end) into the returned arrays."""
        spans = {}
        row_parts = []
        pos = 0
        for t in terms:
            se = self._slice.get(t)
            if se is None:
                continue
            s, e = se
            n = int(self._n[s:e].sum())
            spans[t] = (pos, pos + n)
            row_parts.append(np.arange(s, e))
            pos += n
        if not row_parts:
            return np.zeros(0, np.int64), np.zeros(0, np.float64), spans
        docs, weights = self._decode_rows(np.concatenate(row_parts))
        return docs, weights, spans


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


def _accumulate(q_all, d_all, w_all):
    """(query, doc, w) triples → unique (query, doc) with summed scores."""
    d_min = int(d_all.min())
    span = int(d_all.max()) - d_min + 1
    key = q_all * span + (d_all - d_min)
    ukey, inv = np.unique(key, return_inverse=True)
    scores = np.bincount(inv, weights=w_all, minlength=len(ukey))
    uq = (ukey // span).astype(np.int64)
    ud = (ukey % span + d_min).astype(np.int64)
    return uq, ud, scores


def _gather_terms(incidence, spans, which):
    """Replicate posting spans per referencing query → (q_idx, gather_idx)."""
    idx_parts, q_parts = [], []
    for t, qlist in incidence.items():
        if t not in spans or (which is not None and t not in which):
            continue
        s, e = spans[t]
        nq = len(qlist)
        idx_parts.append(np.tile(np.arange(s, e), nq))
        q_parts.append(np.repeat(np.asarray(qlist, np.int64), e - s))
    if not idx_parts:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(q_parts), np.concatenate(idx_parts)


def _group_topk_df(qids, uq, ud, scores, k):
    order = np.lexsort((ud, -scores, uq))
    uq, ud, scores = uq[order], ud[order], scores[order]
    starts = np.flatnonzero(np.concatenate(([True], uq[1:] != uq[:-1])))
    group_start = np.repeat(starts, np.diff(np.append(starts, len(uq))))
    rank = np.arange(len(uq)) - group_start
    keep = rank < k
    return pd.DataFrame(
        {"query_id": qids[uq[keep]], "doc_id": ud[keep], "score": scores[keep]}
    )


_EMPTY_RESULT = {
    "query_id": pd.Series(dtype="int64"),
    "doc_id": pd.Series(dtype="int64"),
    "score": pd.Series(dtype="float64"),
}


def _score_batch(
    idx: _ShardIndex, q_pdf: pd.DataFrame, k: int, hot_frac: float = 0.125
) -> pd.DataFrame:
    """Score ALL queries of the shard in one vectorized flow, with hot-term
    pruning (the batch form of Block-Max MaxScore):

    1. RARE terms (shard df < hot_frac · shard-max-df, min 64) are scored
       exhaustively for every referencing query — one bulk decode, one
       np.unique aggregation.
    2. HOT terms never scan per query: each hot term's (sorted) posting list
       is probed by binary search ONLY at the candidate docs phase 1
       produced. Candidates then hold their EXACT final scores.
    3. Exactness bound per query: a non-candidate doc can score at most
       Σ max(0, tmax_hot). Queries where that bound reaches their k-th best
       candidate score — or with fewer than k candidates — fall back to the
       plain exhaustive pass (rare on BM25+Zipf: hot terms have negative
       idf). Everything stays exact; only work is skipped.
    """
    qids = q_pdf["query_id"].to_numpy(np.int64)
    incidence: dict[str, list[int]] = {}
    for qi, terms in enumerate(q_pdf["terms"]):
        for t in dict.fromkeys(terms):
            if t in idx._groups:
                incidence.setdefault(t, []).append(qi)
    if not incidence:
        return pd.DataFrame(_EMPTY_RESULT)

    docs, weights, spans = idx.decode_terms(list(incidence))
    if len(docs) == 0:
        return pd.DataFrame(_EMPTY_RESULT)
    sizes = {t: e - s for t, (s, e) in spans.items()}
    cutoff = max(64, int(max(sizes.values()) * hot_frac))
    hot = {t for t, n in sizes.items() if n >= cutoff}
    rare = set(spans) - hot

    # ---- phase 1: exhaustive over rare terms --------------------------
    q_all, gather = _gather_terms(incidence, spans, rare)
    if len(q_all):
        uq, ud, scores = _accumulate(q_all, docs[gather], weights[gather])
    else:
        uq = np.zeros(0, np.int64)
        ud = np.zeros(0, np.int64)
        scores = np.zeros(0, np.float64)

    # ---- phase 2: probe hot terms at candidate positions --------------
    hot_gain = np.zeros(len(q_pdf), np.float64)  # Σ max(0, tmax) per query
    for t in hot:
        s, e = spans[t]
        h_docs = docs[s:e]
        h_w = weights[s:e]
        tmax = h_w.max() if len(h_w) else 0.0
        qlist = np.asarray(incidence[t], np.int64)
        if tmax > 0:
            hot_gain[qlist] += tmax
        if len(uq) == 0:
            continue
        qmask = np.isin(uq, qlist)
        if not qmask.any():
            continue
        cand = ud[qmask]
        pos = np.searchsorted(h_docs, cand)
        pos_c = np.minimum(pos, len(h_docs) - 1)
        hitw = np.where(h_docs[pos_c] == cand, h_w[pos_c], 0.0)
        scores[qmask] += hitw

    # ---- phase 3: exactness bound → fallback set ----------------------
    has_rare = np.zeros(len(q_pdf), bool)
    has_any = np.zeros(len(q_pdf), bool)
    for t, qlist in incidence.items():
        ql = np.asarray(qlist, np.int64)
        has_any[ql] = True
        if t in rare:
            has_rare[ql] = True
    need_fallback = has_any & ~has_rare  # hot-only queries must scan
    if len(uq):
        # per-query candidate count and k-th best score
        order = np.lexsort((ud, -scores, uq))
        suq, sscores = uq[order], scores[order]
        starts = np.flatnonzero(
            np.concatenate(([True], suq[1:] != suq[:-1]))
        )
        counts = np.diff(np.append(starts, len(suq)))
        qs_present = suq[starts]
        kth = np.where(
            counts >= k, sscores[np.minimum(starts + k - 1, len(suq) - 1)], -np.inf
        )
        need = (counts < k) | (hot_gain[qs_present] >= kth)
        need_fallback[qs_present[need]] = True
    else:
        need_fallback |= has_any

    out_parts = []
    done_mask = ~need_fallback
    if len(uq):
        keep_q = done_mask[uq]
        if keep_q.any():
            out_parts.append(
                _group_topk_df(qids, uq[keep_q], ud[keep_q], scores[keep_q], k)
            )
    fb = np.flatnonzero(need_fallback)
    if len(fb):
        fb_set = set(fb.tolist())
        fb_incidence = {
            t: [q for q in ql if q in fb_set]
            for t, ql in incidence.items()
        }
        fb_incidence = {t: ql for t, ql in fb_incidence.items() if ql}
        q_all, gather = _gather_terms(fb_incidence, spans, None)
        if len(q_all):
            fuq, fud, fscores = _accumulate(
                q_all, docs[gather], weights[gather]
            )
            out_parts.append(_group_topk_df(qids, fuq, fud, fscores, k))
    if not out_parts:
        return pd.DataFrame(_EMPTY_RESULT)
    return pd.concat(out_parts, ignore_index=True)


def segment_topk(
    segments: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prune: bool = True,
    batch: bool | None = None,
) -> DataFrame:
    """queries(query_id, terms) × doc-sharded segments → global top-k
    (query_id, doc_id, score, rank).

    ``batch=True`` scores every query of a shard in one vectorized pass
    (fastest for large batches, exhaustive); ``batch=False`` scores
    query-at-a-time with Block-Max MaxScore pruning (``prune``) — best for
    small selective batches. Default: batch for ≥64 queries per shard is a
    good rule of thumb, but since the query count isn't known at plan time,
    ``batch=None`` resolves to True (the bench/batch use case).
    """
    if batch is None:
        batch = True
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
        if batch:
            return _score_batch(idx, q_pdf, k)
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
