"""Segment-based BM25 top-k: the engine's custom physical strategy (playing
the role s_plus.h plays in the reference).

Distributed shape:

* **Doc-shard scatter**: queries (tiny) are replicated to every shard of the
  doc-sharded index; a cogrouped ``applyInPandas`` scores ALL queries of a
  shard against that shard's posting blocks in one Arrow pass.
* **Local top-k, global merge**: each shard emits its local top-k per query
  (global top-k ⊆ union of shard top-k); a windowed top-k merges them.

Three exact scorers, chosen by workload:

* ``_score_batch`` (default for batches): a dense sparse-accumulator — the
  distributed twin of the reference's SPA (s_plus.h:71-240) — scatter-adds
  every (query, term)'s posting weights into a (chunk × shard-span) grid via
  one ``np.bincount``. The chunk is sized so all concurrent workers' grids
  stay L3-resident: the same kernel with a 25 MB grid is DRAM-bound and
  stops scaling past ~8 cores (measured; see BENCH/BASELINE.md).
* ``_score_maxscore`` (point queries / term-major path): Block-Max MaxScore
  (Turtle & Flood 1995; block-max variant after Ding & Suel, SIGIR 2011) —
  terms in descending max-weight order; once the k-th-best lower bound θ
  exceeds any unseen doc's best possible score (block max_score + suffix of
  term maxima), hot-term blocks are skipped for new candidates and only
  probed by binary search for existing ones. BM25 idf is unclamped
  (reference semantics) so weights can be NEGATIVE; bounds use positive-part
  maxima and negative-part minima to stay exact.
* ``_score_exhaustive``: the oracle-grade union-accumulate.

All three are rank-identical (randomized adversarial parity tests, hot-term
and negative-weight regimes included). Scoring accumulates float32 stored
weights in float64, matching the relational SQL path within 1e-6 relative
(tests pin rtol 1e-4, the reference's own tolerance:
tests/test_similarity.py:293-294).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from similaripy_spark.fulltext import codec
from similaripy_spark.fulltext.weights import tf_part_np
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

    ``idf``: term → multiplier for FACTORED indexes (blocks store only the
    doc-local BM25 factor; meta.json weight_scheme='factored'). Decoded
    weights are scaled per term and block/term score bounds are adjusted —
    the stored tf-part is strictly positive, so a negative idf (unclamped
    reference semantics, df > N/2) flips each bound to the opposite
    extreme: effective max = idf × stored_min, effective min = idf ×
    stored_max. All three scorers then run unchanged and stay exact.

    ``raw``: params dict for RAW indexes (meta.json weight_scheme='raw' —
    blocks store dl in the weights column and tf in every block): decode
    derives the tf-part from (tf, dl) at the CURRENT corpus ``avgdl`` —
    this is what makes append-only ingestion exact, committed blocks never
    go stale. Stored block bounds were encoded at the pinned
    ``bounds_avgdl``; the tf-part is monotone increasing in avgdl and its
    drift is bounded by the avgdl ratio r (worst case tf + k1*(1-b) → 0),
    so scaling stored maxima by max(1, r) and minima by min(1, r) keeps
    every bound valid — pruning stays exact, merely a little looser until
    a reweight re-pins the bounds. ``raw`` requires ``idf`` (the factored
    idf plumbing is shared). Keys: k1, b, avgdl, bounds_avgdl,
    delta (optional).

    ``tomb``: SORTED int64 array of tombstoned doc_ids (delete.py).
    Deleted docs are dropped AT DECODE TIME — the single choke point every
    scorer reads through — so they can never enter a candidate set, inflate
    the MaxScore/BMW θ, crowd a local top-k, or match an AND intersection.
    Stored block/term bounds still include deleted docs' scores: they
    remain valid (superset) upper bounds for the survivors, so pruning
    stays exact, merely a little looser until delete.compact_index.
    """

    def __init__(self, seg: pd.DataFrame, idf: dict | None = None,
                 raw: dict | None = None, tomb=None, dv=None):
        self._idf = idf
        self._raw = raw
        self._tomb = tomb if tomb is not None and len(tomb) else None
        # dv: matcher entries ('dict', base, codes, lut) / ('range', base,
        # vals, lo, hi) — one per active doc-values filter (docvalues.py).
        # Applied in _live_mask (the decode choke point), so every scorer
        # is exact over the filtered corpus, same argument as tombstones.
        self._dv = dv if dv else None
        self._bs_up = self._bs_dn = 1.0
        if raw is not None:
            if idf is None:
                raise ValueError(
                    "raw-scheme scoring requires the per-term idf map"
                )
            r = float(raw["avgdl"]) / float(raw["bounds_avgdl"])
            self._bs_up, self._bs_dn = max(1.0, r), min(1.0, r)
            if r != 1.0:
                # stored bounds and kernel scores each round through
                # float32 at DIFFERENT avgdls, so a decoded score can
                # exceed the exact-math-scaled bound by an ULP; widen by
                # 1e-6 relative (≈8 f32 ULPs) — bounds stay valid, just
                # marginally looser (values are positive tf-parts)
                self._bs_up *= 1.0 + 1e-6
                self._bs_dn *= 1.0 - 1e-6
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
        self._tt = (
            seg["tfs"].to_numpy(dtype=object)[order]
            if raw is not None else None
        )
        self._groups = self._slice  # membership checks elsewhere
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def terms(self):
        return self._slice.keys()

    def term_meta(self, term):
        """(tmax, tmin, block first_docs, max_docs, max_scores) or None.
        Factored indexes: bounds are idf-adjusted here so the MaxScore
        pruning logic stays oblivious to the storage scheme."""
        se = self._slice.get(term)
        if se is None:
            return None
        s, e = se
        # raw scheme: stored bounds were encoded at bounds_avgdl — the
        # one-sided ratio scaling keeps them valid at the current avgdl
        maxs = self._maxs[s:e].astype(np.float64) * self._bs_up
        mins = self._mins[s:e].astype(np.float64) * self._bs_dn
        if self._idf is None:
            return (
                float(maxs.max()),
                float(mins.min()),
                self._first[s:e],
                self._maxd[s:e],
                maxs,
            )
        i = float(self._idf.get(term, 0.0))
        # bounds stay float64: a float32 round-down of an upper bound could
        # make block skipping inexact
        if i >= 0.0:
            tmax = i * float(maxs.max())
            tmin = i * float(mins.min())
            bmaxs = i * maxs
        else:
            # stored bounds are positive tf-parts: a negative multiplier
            # maps stored min → effective max and vice versa
            tmax = i * float(mins.min())
            tmin = i * float(maxs.max())
            bmaxs = i * mins
        return (tmax, tmin, self._first[s:e], self._maxd[s:e], bmaxs)

    def _decode_rows(self, rows: np.ndarray):
        """Bulk-decode arbitrary block rows in one vectorized pass
        (codec.decode_doc_blocks: one varint decode over the concatenated
        buffers + cumsum rebase — shared with index_merge.decode_segments)."""
        if len(rows) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        ns = self._n[rows]
        docs = codec.decode_doc_blocks(
            [self._dd[r] for r in rows], ns, self._first[rows]
        )
        weights = np.frombuffer(
            b"".join(self._ww[r] for r in rows), dtype=np.float32
        ).astype(np.float64)
        if self._raw is not None:
            # stored weights are dl; derive the tf-part at the CURRENT
            # avgdl (float32-rounded — bit-identical to what a factored
            # build at this avgdl would have stored)
            tfs = codec.decode_varints(
                b"".join(self._tt[r] for r in rows), int(ns.sum())
            )
            weights = tf_part_np(
                tfs, weights,
                k1=float(self._raw["k1"]), b=float(self._raw["b"]),
                avgdl=float(self._raw["avgdl"]),
                delta=float(self._raw.get("delta", 0.0)),
            ).astype(np.float64)
        return docs, weights

    def _live_mask(self, docs: np.ndarray) -> "np.ndarray | None":
        """Boolean keep-mask against the sorted tombstone set AND any
        active doc-values filters, or None when everything survives (the
        common case — skip the copy)."""
        if len(docs) == 0:
            return None
        keep = None
        if self._tomb is not None:
            pos = np.searchsorted(self._tomb, docs)
            pos[pos == len(self._tomb)] = 0
            k = self._tomb[pos] != docs
            keep = k if not k.all() else None
        if self._dv is not None:
            for entry in self._dv:
                if entry[0] == "range":
                    _, base, vals, lo, hi = entry
                    v = vals[docs - base]
                    k = (v >= lo) & (v <= hi)
                else:
                    _, base, codes, lut = entry
                    k = lut[codes[docs - base]]
                keep = k if keep is None else (keep & k)
        return None if keep is None or keep.all() else keep

    def decode_blocks(self, term, block_mask: np.ndarray | None = None):
        """→ (docs int64 asc, weights float64) for selected blocks; weights
        are idf-scaled on factored indexes. Full-term decodes are
        memoized (scaled — idf is fixed for this instance)."""
        s, e = self._slice[term]
        if block_mask is None:
            hit = self._cache.get(term)
            if hit is not None:
                return hit
            rows = np.arange(s, e)
        else:
            rows = np.arange(s, e)[block_mask]
        docs, weights = self._decode_rows(rows)
        if self._idf is not None:
            weights = weights * float(self._idf.get(term, 0.0))
        keep = self._live_mask(docs)
        if keep is not None:
            docs, weights = docs[keep], weights[keep]
        out = (docs, weights)
        if block_mask is None:
            self._cache[term] = out
        return out

    def decode_terms(self, terms):
        """Bulk decode many terms at once → (docs, weights, spans) where
        spans[term] = (start, end) into the returned arrays; weights are
        idf-scaled per span on factored indexes."""
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
        if self._idf is not None:
            for t, (p0, p1) in spans.items():
                weights[p0:p1] *= float(self._idf.get(t, 0.0))
        keep = self._live_mask(docs)
        if keep is not None:
            # remap every span through the prefix-sum of the keep mask so
            # (start, end) still index the filtered arrays
            cum = np.zeros(len(keep) + 1, np.int64)
            np.cumsum(keep, out=cum[1:])
            spans = {
                t: (int(cum[p0]), int(cum[p1]))
                for t, (p0, p1) in spans.items()
            }
            docs, weights = docs[keep], weights[keep]
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


def _score_bmw(idx: _ShardIndex, terms, k: int):
    """Block-Max WAND (Ding & Suel 2011) re-shaped for a vectorized batch
    kernel: pivot-and-skip realized as BEST-FIRST scoring of doc-range
    segments under block-max upper bounds.

    Classic BMW walks doc-at-a-time, sorts term pointers, picks the pivot
    where the running block-max sum first reaches θ, and skips to it — an
    inherently sequential pointer dance that is pathological in Python.
    The same skipping decision can be made for WHOLE doc ranges at once:

    1. cut doc space at every block boundary of the query's terms → a
       piecewise-constant upper bound UB(range) = Σ max(block_max, 0) over
       covering blocks (one np.add.at sweep over all blocks);
    2. visit segments in DESCENDING UB order, chunk at a time; a chunk
       decodes only the blocks overlapping its segments (block_mask) and
       exactly scores the docs inside them (every block containing such a
       doc overlaps the doc's segment, so scores are complete);
    3. θ = exact k-th best score so far; stop as soon as the next
       segment's UB < θ. Every unvisited doc has score ≤ its segment's
       UB < θ — exactly BMW's skip invariant, applied range-wise.

    Exact for negative idf too (unclamped reference semantics): block
    bounds arrive idf-adjusted from term_meta, and a block whose effective
    max is negative contributes 0 to UB (a doc need not contain the term).

    MEASURED VERDICT (100k-doc Zipf corpus, ~4.5-term queries, k=10,
    kernel-only, 200 queries, best-of-2, after tuning chunk size 64→16k
    and adding full-decode memoization for hot terms): BMW 5.09 s vs
    MaxScore 3.27 s — a ~1.5× LOSS, so Block-Max MaxScore stays the point
    path's default (same precedent as the bucket-pruning negative result).
    Why it loses HERE: the reference's unclamped idf makes hot terms'
    weights NEGATIVE, so their blocks contribute 0 to every upper bound
    yet must still be decoded for the exact score of any doc in a visited
    segment — segment-wise skipping cannot avoid the most expensive lists,
    while term-at-a-time MaxScore touches them once, in a single
    vectorized membership probe over the candidate set. On a
    positive-weight corpus (clamped idf / rare-term queries) the
    best-first order would skip far more; the kernel stays available as
    ``scorer='bmw'`` in term_major_topk. Rank/score identity vs MaxScore
    and the exhaustive scan is pinned in tests (incl. negative-idf
    factored indexes).
    """
    metas = []
    for t in dict.fromkeys(terms):
        m = idx.term_meta(t)
        if m is not None:
            metas.append((t, m))
    if not metas:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    firsts = np.concatenate([m[2] for _, m in metas])
    maxds = np.concatenate([m[3] for _, m in metas])
    ubs = np.concatenate([np.maximum(m[4], 0.0) for _, m in metas])
    # segment boundaries: every block start and one-past-every-block-end
    bounds = np.unique(np.concatenate([firsts, maxds + 1]))
    delta = np.zeros(len(bounds) + 1, np.float64)
    np.add.at(delta, np.searchsorted(bounds, firsts), ubs)
    np.add.at(delta, np.searchsorted(bounds, maxds + 1), -ubs)
    ub_seg = np.cumsum(delta[:-1])[:-1]  # UB of [bounds[i], bounds[i+1])
    n_seg = len(ub_seg)
    if n_seg == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    order = np.argsort(-ub_seg, kind="stable")
    # per-term segment-index span of each block (for overlap tests)
    blk_lo = {t: np.searchsorted(bounds, m[2], side="right") - 1
              for t, m in metas}
    blk_hi = {t: np.searchsorted(bounds, m[3], side="right") - 1
              for t, m in metas}

    acc_docs = np.zeros(0, np.int64)
    acc_scores = np.zeros(0, np.float64)
    theta = -np.inf
    pos = 0
    chunk = max(16 * k, 1024)
    while pos < n_seg:
        if len(acc_docs) >= k and ub_seg[order[pos]] < theta:
            break  # every remaining segment's UB < θ: BMW skip, exact
        take = order[pos:pos + chunk]
        if len(acc_docs) >= k:
            take = take[ub_seg[take] >= theta]
            if len(take) == 0:
                break
        pos += chunk
        sel = np.zeros(n_seg + 1, np.int64)
        sel[take] = 1
        csel = np.concatenate(([0], np.cumsum(sel)))
        d_parts, w_parts = [], []
        for t, _m in metas:
            lo, hi = blk_lo[t], blk_hi[t]
            # block needed iff any selected segment index in [lo, hi]
            need = (csel[hi + 1] - csel[lo]) > 0
            n_need = int(need.sum())
            if n_need == 0:
                continue
            # hot terms overlap almost every chunk: the memoized full-term
            # decode (paid once, reused every chunk) beats re-decoding the
            # same blocks chunk after chunk once a fair share is needed
            if n_need >= max(2, len(need) // 4):
                d, w = idx.decode_blocks(t)
            else:
                d, w = idx.decode_blocks(t, block_mask=need)
            # keep only docs inside the chunk's segments (a decoded block
            # may span unselected segments; those docs score later or never)
            seg_of = np.searchsorted(bounds, d, side="right") - 1
            inside = sel[seg_of] == 1
            d_parts.append(d[inside])
            w_parts.append(w[inside])
        if d_parts:
            docs = np.concatenate(d_parts)
            ws = np.concatenate(w_parts)
            if len(docs):
                udocs, inv = np.unique(docs, return_inverse=True)
                scores = np.bincount(inv, weights=ws, minlength=len(udocs))
                # segments are disjoint and visited once: no doc repeats
                acc_docs = np.concatenate([acc_docs, udocs])
                acc_scores = np.concatenate([acc_scores, scores])
        if len(acc_docs) >= k:
            theta = np.partition(acc_scores, len(acc_scores) - k)[
                len(acc_scores) - k
            ]
    order_out = np.argsort(acc_docs, kind="stable")
    return acc_docs[order_out], acc_scores[order_out]


def _score_intersect(idx: _ShardIndex, terms) -> tuple[np.ndarray, np.ndarray]:
    """Conjunctive (AND) scoring by literal posting-list intersection —
    the classic rarest-first algorithm over the block-compressed lists
    (Manning/Raghavan/Schütze IR ch.1 intersection, plus block skipping):

    1. decode the rarest term's postings in full (the candidate set can
       only shrink from there);
    2. every other term, rarest first, decodes ONLY the blocks whose
       [first_doc, max_doc] range contains a surviving candidate (the
       per-block metadata doubles as a skip list — two searchsorted calls
       against the sorted candidate array select the blocks);
    3. candidates are intersected by binary search into the decoded docs
       (both sides doc-sorted) and accumulate the term's BM25 weight.

    A term absent from this shard (or from the whole index) empties the
    result — strict AND. Cost is O(df_rarest × Σ log df_t) plus only the
    overlapping blocks' decode, independent of the largest list's size."""
    metas = []
    for t in dict.fromkeys(terms):
        se = idx._slice.get(t)
        if se is None:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        s, e = se
        metas.append((int(idx._n[s:e].sum()), t))
    metas.sort()
    docs, w = idx.decode_blocks(metas[0][1])
    scores = w.astype(np.float64, copy=True)  # decode may return the memo
    for _, t in metas[1:]:
        if len(docs) == 0:
            break
        s, e = idx._slice[t]
        lo = np.searchsorted(docs, idx._first[s:e], side="left")
        hi = np.searchsorted(docs, idx._maxd[s:e], side="right")
        mask = hi > lo
        if not mask.any():
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        td, tw = idx.decode_blocks(t, block_mask=mask)
        if len(td) == 0:
            # tombstone / doc-values filtering can empty the decoded
            # overlapping blocks even when the doc-range mask matched —
            # no surviving posting of this term ⇒ the intersection is
            # empty (indexing td[pos_c] here would be an IndexError)
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        pos = np.searchsorted(td, docs)
        pos_c = np.minimum(pos, len(td) - 1)
        hit = td[pos_c] == docs
        docs = docs[hit]
        scores = scores[hit] + tw[pos_c[hit]]
    return docs, scores


def _local_topk(docs, scores, k):
    if len(docs) == 0:
        return docs, scores
    if len(docs) > k:
        # top-k by (score desc, doc asc)
        order = np.lexsort((docs, -scores))[:k]
    else:
        order = np.lexsort((docs, -scores))
    return docs[order], scores[order]


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


def _attach_idfs(queries: DataFrame, idf_df: DataFrame) -> DataFrame:
    """queries(query_id, terms, ...) → + ``idfs`` array<double> positionally
    aligned with ``terms`` (factored indexes: the per-term idf the scorers
    multiply into the stored doc-local factors).

    Distributed by construction: explode the (tiny) query side, join the
    V-row idf table — AQE broadcast-converts it when small, shuffle-joins at
    web-scale vocabularies — and regroup by position. Terms absent from the
    index get idf 0 (they match no postings anyway)."""
    idfs = (
        queries.select(
            "query_id", F.posexplode("terms").alias("pos", "term")
        )
        .join(idf_df, "term", "left")
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "idf"))),
                lambda s: F.coalesce(s["idf"], F.lit(0.0)),
            ).alias("idfs")
        )
    )
    return queries.join(idfs, "query_id", "left")


def _idf_map_from_pdf(terms_col, idfs_col) -> dict:
    """Per-task idf lookup from the annotated query arrays."""
    idf: dict = {}
    for ts, vs in zip(terms_col, idfs_col):
        if vs is None:
            continue
        idf.update(zip(ts, vs))
    return idf


def _index_is_factored(index_dir: str) -> bool:
    """True for either query-time-idf scheme ('factored' or 'raw')."""
    from similaripy_spark.fulltext.index_build import read_meta

    return read_meta(index_dir).get("weight_scheme", "prod") in (
        "factored", "raw",
    )


def _tomb_for(index_dir: str | None, meta: dict | None) -> "np.ndarray | None":
    """Sorted tombstone doc_id array for kernel-side filtering, or None.
    Driver-side pyarrow read, gated on the meta flag so untombstoned
    indexes pay nothing."""
    if index_dir is None or not (meta or {}).get("n_tombstone_epochs"):
        return None
    from similaripy_spark.fulltext.delete import tombstone_array

    return tombstone_array(index_dir)


def _raw_params_from_meta(meta: dict) -> dict:
    """Kernel params for 'raw' indexes: the current corpus avgdl (applied
    to every decode) and the pinned bounds_avgdl the block bounds were
    encoded at (legacy metas without the field never drifted — they were
    written before append existed, so avgdl is the encode-time value)."""
    return {
        "k1": float(meta.get("k1", 1.2)),
        "b": float(meta.get("b", 0.75)),
        "avgdl": float(meta["avgdl"]),
        "bounds_avgdl": float(meta.get("bounds_avgdl", meta["avgdl"])),
    }


def _index_idf_table(spark, index_dir: str) -> DataFrame:
    """(term, idf) for a factored index — term_stats df × the meta n_docs."""
    from similaripy_spark.fulltext.index_build import (
        read_meta,
        read_term_stats,
    )
    from similaripy_spark.fulltext.weights import idf_table

    return idf_table(
        read_term_stats(spark, index_dir),
        int(read_meta(index_dir)["n_docs"]),
    )


def segments_with_idf(segments: DataFrame, index_dir: str) -> DataFrame:
    """Serve-path annotation for FACTORED indexes: join the per-term ``idf``
    onto the segment relation ONCE, at index-load time, so every subsequent
    ``segment_topk`` batch skips the per-batch query-side annotation
    (posexplode → V-row join → collect_list regroup — two extra exchanges
    per batch, measured +30% wall on a 10k-query batch at local[32]).
    Persist the result and hand it to ``segment_topk``; the scorers detect
    the column and build their idf lookup from the shard's own rows.

    The join keys on term over the block-metadata-sized relation
    (~postings/block_size rows): AQE broadcast-converts the V-row idf table
    when it is small; at a web-scale vocabulary it shuffle-joins — either
    way the cost is paid once per load and amortized over every batch an
    index server answers. A per-batch caller that loads segments fresh each
    time should NOT use this at large V (the query-side annotation only
    ever touches the tiny batch). No-op on 'prod' indexes."""
    if not _index_is_factored(index_dir):
        return segments
    idf_df = _index_idf_table(segments.sparkSession, index_dir)
    return segments.join(idf_df, "term", "left")


#: score+match grid budget per worker (bytes): the two per-chunk dense
#: grids must stay L3-resident PER CORE on a fully loaded socket — 1.2 MB
#: lands chunk=16 at the default 4.7k-doc shard span (measured optimum;
#: sweep in _score_batch). Override per-run with SIMILARIPY_SCORER_CHUNK.
_GRID_TARGET_BYTES = 1_200_000

#: deep-paging auto-cutover: below this k the one-pass merge volume is cheap
#: (k=100 measured only +11% over k=10); at/above it the exact two-pass
#: threshold scheme in segment_topk wins (k=1000: 48.5 s one-pass).
DEEP_K_CUTOFF = 512


def _score_batch(
    idx: _ShardIndex, q_pdf: pd.DataFrame, k: int, chunk: int | None = None,
    query_weighted: bool = False, tau: np.ndarray | None = None,
    mode: str = "or", min_match: int | None = None,
) -> pd.DataFrame:
    """Dense-accumulator batch scorer — the distributed twin of the
    reference's SPA (s_plus.h:71-240), vectorized across a whole query
    chunk: every (query, term) pair scatter-adds the term's posting weights
    into a (chunk × shard_span) dense score grid via ONE np.bincount; a
    parallel unweighted bincount marks matched cells (absence ≠ score 0,
    scores can be negative). Top-k per row via argpartition + tie-exact
    refinement (all cells ≥ the k-th value re-ranked by (-score, doc)).

    No sorting of candidate lists, no np.unique — cost is linear in
    Σ_q Σ_t df_t(shard) plus one O(chunk·span) partition pass. Memory is
    bounded by ``chunk`` (L3-sized by default — see _GRID_TARGET_BYTES).

    Deep paging (measured, 300k docs / 3k queries / local[8]): k=10 →
    11.2 s, k=100 → 12.4 s (+11%), k=1000 → 48.5 s — sublinear in k (10×
    more k costs 3.9× while returning 10× the rows); the k=1000 cost is
    the k-per-shard merge volume (n_q × n_shards × k rows into the global
    top-k), inherent to exact distributed deep paging. Rank identity at
    k ∈ {100, 1000} is pinned in tests/test_index.py."""
    qids_all = q_pdf["query_id"].to_numpy(np.int64)
    n_q = len(q_pdf)
    if tau is not None:
        # per-query score floor (deep-paging pass 2): emit only candidates
        # scoring >= tau_q — rank-exact because tau is a lower bound on the
        # query's global k-th score. NaN (no bound established) -> -inf.
        # A relative epsilon widens the floor so float-addition-order noise
        # between the two passes (~1 ULP; the tau join reorders query rows
        # and with them the accumulation order) can never drop a row whose
        # exact score ties the bound — extra kept rows are sorted out by
        # the final top_k.
        tau = tau.astype(np.float64)
        tau = tau - (np.abs(tau) * 1e-9 + 1e-12)
        tau = np.where(np.isnan(tau), -np.inf, tau)
    # --- vectorized incidence build: explode (query, term), factorize the
    # terms, keep those present in this shard, dedupe (query, term) pairs —
    # the only remaining Python loops run over DISTINCT terms, not over
    # (query × term) pairs (this loop dominated query-side scaling) -------
    term_lists = [np.asarray(t, dtype=object) for t in q_pdf["terms"]]
    qlens = np.array([len(t) for t in term_lists], np.int64)
    if qlens.sum() == 0:
        return pd.DataFrame(_EMPTY_RESULT)
    # NOT terms (Lucene MUST_NOT): docs containing ANY of a query's
    # not_terms are excluded from that query's ranking. Shard-local
    # decidable (a doc's postings live wholly in its shard), applied by
    # writing -inf into the excluded (query, doc) score cells before
    # selection — the existing isfinite() emission filter then drops them,
    # so exclusion can never crowd the local top-k or survive the merge.
    nt_lists = None
    if "not_terms" in q_pdf.columns:
        nt_lists = [
            np.asarray(t, dtype=object) if t is not None
            else np.zeros(0, dtype=object)
            for t in q_pdf["not_terms"]
        ]
        if sum(len(t) for t in nt_lists) == 0:
            nt_lists = None
    # AND mode: a doc qualifies only when its per-cell distinct-term match
    # count reaches the query's FULL distinct term count (terms absent from
    # the index or this shard can never be matched → strict AND empties)
    # min_match=m (quorum, mode='or'): a doc qualifies with >= m distinct
    # matched terms — the same match-count grid AND rides on, with a
    # constant requirement instead of the full distinct term count. A doc's
    # postings live wholly in its shard, so the quorum (like AND) is
    # shard-local decidable and the global merge is unchanged.
    nreq = (
        np.array([len(dict.fromkeys(t)) for t in term_lists], np.int64)
        if mode == "and"
        else (
            np.full(n_q, int(min_match), np.int64)
            if min_match is not None and min_match > 1
            else None
        )
    )
    all_terms = np.concatenate(term_lists)
    all_qi = np.repeat(np.arange(n_q, dtype=np.int64), qlens)
    nt_pair_qi = nt_pair_code = None
    if nt_lists is not None:
        # factorize positive and NOT terms together so both share one
        # code space (and one bulk decode below); split codes back after
        nt_lens = np.array([len(t) for t in nt_lists], np.int64)
        all_nt = np.concatenate(nt_lists)
        nt_qi = np.repeat(np.arange(n_q, dtype=np.int64), nt_lens)
        codes_all, uniq_terms = pd.factorize(
            np.concatenate([all_terms, all_nt])
        )
        codes, nt_codes = (
            codes_all[: len(all_terms)],
            codes_all[len(all_terms):],
        )
    else:
        codes, uniq_terms = pd.factorize(all_terms)
    present = np.array([t in idx._groups for t in uniq_terms], bool)
    keep = present[codes]
    if not keep.any():
        return pd.DataFrame(_EMPTY_RESULT)
    n_codes = len(uniq_terms)
    key = all_qi[keep] * n_codes + codes[keep]
    if nt_lists is not None:
        nt_keep = present[nt_codes]
        nt_key = np.unique(
            nt_qi[nt_keep] * n_codes + nt_codes[nt_keep]
        )
        nt_pair_qi = nt_key // n_codes  # ascending (qi-major unique)
        nt_pair_code = nt_key % n_codes
    if query_weighted:
        # duplicate (query, term) occurrences ADD their qw mass — exactly
        # the relational Σ qw·weight semantics (query.py). Per-row length
        # parity is validated here: a mismatch whose totals coincide would
        # otherwise silently shift qw mass across queries (ADVICE r2)
        wlens = np.array([len(w) for w in q_pdf["weights"]], np.int64)
        if not np.array_equal(wlens, qlens):
            bad = int(np.flatnonzero(wlens != qlens)[0])
            raise ValueError(
                f"query_id={qids_all[bad]}: weights length {wlens[bad]} != "
                f"terms length {qlens[bad]}"
            )
        all_qw = np.concatenate(
            [np.asarray(w, np.float64) for w in q_pdf["weights"]]
        )
        pair_key, inv = np.unique(key, return_inverse=True)
        pair_qw = np.bincount(inv, weights=all_qw[keep],
                              minlength=len(pair_key))
    else:
        pair_key = np.unique(key)
        pair_qw = None
    pair_qi = pair_key // n_codes  # ascending (qi-major unique)
    pair_code = pair_key % n_codes

    docs, weights, spans = idx.decode_terms(
        [t for t, p in zip(uniq_terms, present) if p]
    )
    if len(docs) == 0:
        return pd.DataFrame(_EMPTY_RESULT)
    # span arrays indexed by term code (absent codes keep 0-length spans)
    code_s = np.zeros(n_codes, np.int64)
    code_e = np.zeros(n_codes, np.int64)
    for ci in np.flatnonzero(present):
        se = spans.get(uniq_terms[ci])
        if se is not None:
            code_s[ci], code_e[ci] = se
    d_min = int(docs.min())
    span = int(docs.max()) - d_min + 1
    local = docs - d_min
    if chunk is None:
        env = os.environ.get("SIMILARIPY_SCORER_CHUNK")
        if env is not None:
            chunk = int(env)
        else:
            # Cache-resident grids: the per-chunk score+match grids
            # (chunk × span × 8 B × 2) are zeroed, scattered into, and
            # re-read every chunk — total grid traffic is n_q × span,
            # INDEPENDENT of chunk size, so the only lever is where that
            # traffic lands. Sized per-core-L3-resident it never touches
            # DRAM; at the old fixed chunk=256 (≈19 MB of grid per worker
            # at 4.7k-doc shards) it all did, and the scorer was the
            # engine's DRAM-bandwidth hog. Measured, 300k-doc corpus, 30k
            # queries: local[8] 118.8 s → 78.5 s (chunk 256 → 16, +34%
            # throughput); local[2] improves 21%, and the 2→8-core query
            # scaling pair goes 0.75 → ~0.90 because 8 concurrent workers
            # no longer fight for the socket's memory bandwidth. Sweep:
            # 256→118.8, 64→85.2, 32→84.5, 16→78.5, 8→79.3, 4→116.3 s.
            chunk = int(max(8, min(256, _GRID_TARGET_BYTES // (span * 16))))

    out_parts = []
    for c0 in range(0, n_q, chunk):
        c1 = min(c0 + chunk, n_q)
        nq = c1 - c0
        lo = np.searchsorted(pair_qi, c0)
        hi = np.searchsorted(pair_qi, c1)
        if lo == hi:
            continue
        # fully vectorized chunk assembly (no per-term Python loop):
        # for every (query, term) pair expand the term's posting span via
        # the ranges-from-starts/lengths trick, then one gather
        p_qi = pair_qi[lo:hi]
        p_s = code_s[pair_code[lo:hi]]
        p_e = code_e[pair_code[lo:hi]]
        p_qw = pair_qw[lo:hi] if pair_qw is not None else None
        lens = p_e - p_s
        nz = lens > 0
        if not nz.any():
            continue
        p_qi, p_s, lens = p_qi[nz], p_s[nz], lens[nz]
        if p_qw is not None:
            p_qw = p_qw[nz]
        ends = np.cumsum(lens)
        m = int(ends[-1])
        arena = (
            np.arange(m, dtype=np.int64)
            - np.repeat(ends - lens, lens)
            + np.repeat(p_s, lens)
        )
        flat = np.repeat((p_qi - c0) * span, lens) + local[arena]
        wts = weights[arena]
        if p_qw is not None:
            wts = wts * np.repeat(p_qw, lens)
        nbins = nq * span
        S = np.bincount(flat, weights=wts, minlength=nbins).reshape(nq, span)
        cnt = np.bincount(flat, minlength=nbins).reshape(nq, span)
        matched = cnt > 0
        S[~matched] = -np.inf
        if nt_pair_qi is not None:
            # MUST_NOT: write -inf into every (query, doc) cell touched by
            # a NOT term's postings — the isfinite() emission filter drops
            # them, so an excluded doc can never crowd the local top-k
            nlo = np.searchsorted(nt_pair_qi, c0)
            nhi = np.searchsorted(nt_pair_qi, c1)
            if nlo < nhi:
                e_qi = nt_pair_qi[nlo:nhi]
                e_s = code_s[nt_pair_code[nlo:nhi]]
                e_len = code_e[nt_pair_code[nlo:nhi]] - e_s
                enz = e_len > 0
                if enz.any():
                    e_qi, e_s, e_len = e_qi[enz], e_s[enz], e_len[enz]
                    e_ends = np.cumsum(e_len)
                    e_arena = (
                        np.arange(int(e_ends[-1]), dtype=np.int64)
                        - np.repeat(e_ends - e_len, e_len)
                        + np.repeat(e_s, e_len)
                    )
                    e_flat = (
                        np.repeat((e_qi - c0) * span, e_len)
                        + local[e_arena]
                    )
                    S.reshape(-1)[e_flat] = -np.inf
        if nreq is not None:
            # deduped (query, term) pairs scatter each matching term once
            # per doc, so cnt IS the distinct-term match count
            conj = cnt >= nreq[c0:c1, None]
            S[~conj] = -np.inf
            matched &= conj

        kk = min(k, span)
        if kk < span:
            part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            kth = S[np.arange(nq)[:, None], part].min(axis=1)
            # exact tie handling: keep every cell >= the k-th value
            cand_mask = S >= kth[:, None]
        else:
            cand_mask = matched
        rows_i, cols_i = np.nonzero(cand_mask)
        sc = S[rows_i, cols_i]
        keep = np.isfinite(sc)
        if tau is not None:
            keep &= sc >= tau[c0:c1][rows_i]
        rows_i, cols_i, sc = rows_i[keep], cols_i[keep], sc[keep]
        out_parts.append(
            _group_topk_df(
                qids_all[c0:c1],
                rows_i.astype(np.int64),
                (cols_i + d_min).astype(np.int64),
                sc,
                k,
            )
        )
    if not out_parts:
        return pd.DataFrame(_EMPTY_RESULT)
    return pd.concat(out_parts, ignore_index=True)


def segment_topk(
    segments: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prune: bool = True,
    batch: bool | None = None,
    shard_ids=None,
    query_weighted: bool = False,
    index_dir: str | None = None,
    weight_scheme: str | None = None,
    deep_paging: bool | None = None,
    mode: str = "or",
    min_match: int | None = None,
    dv_filter: dict | None = None,
) -> DataFrame:
    """queries(query_id, terms) × doc-sharded segments → global top-k
    (query_id, doc_id, score, rank).

    ``dv_filter={field: [values...]}`` restricts ranking to documents whose
    doc-values attribute is IN the list (AND across fields) — Lucene
    filter-query semantics: corpus statistics (idf/avgdl) stay
    whole-corpus, the surviving top-k is EXACT over the filtered set. The
    predicate is applied at the decode choke point inside the kernel
    (docvalues.py), delivered per shard as sentinel segment rows riding
    the existing cogroup — no broadcast of corpus-sized state. Requires
    ``index_dir`` with a fresh docvalues sidecar (build_docvalues).

    ``mode='or'`` (default) ranks any doc matching ≥1 query term (the BM25
    union semantics of the reference's sparse dot products); ``mode='and'``
    keeps only docs containing EVERY query term — the batch scorer filters
    on its distinct-term match-count grid, the point path runs rarest-first
    posting-list intersection with per-block [first_doc, max_doc] skipping
    (_score_intersect). AND is shard-local decidable (a doc's postings live
    wholly in its shard), so the global merge is unchanged.

    ``min_match=m`` (quorum retrieval, Lucene's minimum_should_match):
    with ``mode='or'``, keep only docs matching at least ``m`` DISTINCT
    query terms — m=1 is plain OR, m=len(terms) is AND; in between is the
    standard long-query recall/precision knob. Rides the batch scorer's
    match-count grid (requires ``batch=True``), shard-local decidable like
    AND. Queries with fewer than m distinct index-present terms return
    nothing (strict quorum, matching the relational HAVING semantics).

    ``not_terms`` (an optional array<string> column on ``queries`` —
    Lucene's MUST_NOT): docs containing ANY of a query's not_terms are
    excluded from that query's ranking; scores of survivors are unchanged
    (exclusion, not scoring). Shard-local decidable, composes with
    mode/min_match/filters, requires the batch scorer.

    ``batch=True`` scores every query of a shard in one vectorized pass
    (fastest for large batches, exhaustive); ``batch=False`` scores
    query-at-a-time with Block-Max MaxScore pruning (``prune``) — best for
    small selective batches. Default: batch for ≥64 queries per shard is a
    good rule of thumb, but since the query count isn't known at plan time,
    ``batch=None`` resolves to True (the bench/batch use case).

    Shard enumeration: pass ``shard_ids`` (``range(meta['n_shards'])``) or
    ``index_dir`` (the shard count is read from ``meta.json``, a driver-side
    file read — no job). Only a bare-DataFrame call with neither falls back
    to a shard-discovery ``distinct().collect()`` job.

    Weight scheme: a FACTORED index (meta.json weight_scheme='factored' —
    the default build) stores only the doc-local BM25 factor; this function
    then annotates the query batch with per-term idf from term_stats and
    the scorers apply it during decode. Resolution: explicit
    ``weight_scheme`` wins, else ``index_dir``'s meta, else 'prod'
    (round-3 format). Factored scoring needs ``index_dir`` (for term_stats
    + n_docs).
    """
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    if min_match is not None:
        if mode != "or":
            raise ValueError(
                "min_match only applies to mode='or' (mode='and' IS "
                "min_match = all terms)"
            )
        if int(min_match) < 1:
            raise ValueError(f"min_match must be >= 1, got {min_match}")
        if batch is False:
            raise ValueError(
                "min_match requires the batch scorer (batch=True): the "
                "quorum filter lives on its match-count grid"
            )
        min_match = int(min_match)
    if "not_terms" in queries.columns and batch is False:
        raise ValueError(
            "not_terms (MUST_NOT exclusion) requires the batch scorer "
            "(batch=True): exclusion is applied on its score grid"
        )
    if batch is None:
        batch = True
    if query_weighted and not batch:
        raise ValueError(
            "query_weighted requires the batch scorer (batch=True); the "
            "MaxScore point path assumes binarized queries"
        )
    if query_weighted and "weights" not in queries.columns:
        raise ValueError(
            "query_weighted=True requires a `weights` array column "
            "parallel to `terms`"
        )
    spark = segments.sparkSession
    meta = None
    if index_dir is not None:
        from similaripy_spark.fulltext.index_build import read_meta

        meta = read_meta(index_dir)
    if weight_scheme is None:
        weight_scheme = (meta or {}).get("weight_scheme", "prod")
    # 'factored' and 'raw' indexes both apply the term-global idf at query
    # time; 'raw' additionally derives the doc-local tf-part in the kernel
    # from the stored (tf, dl) and the CURRENT corpus avgdl (exact under
    # append-only ingestion — see append.py)
    factored = weight_scheme in ("factored", "raw")
    raw_params = None
    if weight_scheme == "raw":
        if meta is None:
            raise ValueError(
                "weight_scheme='raw' scoring needs index_dir (for "
                "term_stats and the corpus scalars)"
            )
        raw_params = _raw_params_from_meta(meta)
    tomb = _tomb_for(index_dir, meta)
    dv_luts = None
    if dv_filter is not None:
        if index_dir is None:
            raise ValueError(
                "dv_filter needs index_dir (the docvalues sidecar lives "
                "beside the index)"
            )
        from similaripy_spark.fulltext import docvalues as _dvmod

        dv_luts = _dvmod.resolve_filter(index_dir, dv_filter)
        base_segments = segments
        for field in dv_filter:
            segments = segments.unionByName(
                _dvmod.sentinel_segments(
                    spark, index_dir, field, base_segments
                )
            )
    # segments pre-annotated with idf (segments_with_idf — the serve path)
    # need no per-batch query-side annotation: the kernel reads the idf
    # straight off the shard's own rows
    seg_has_idf = factored and "idf" in segments.columns
    if factored and not seg_has_idf:
        if meta is None:
            raise ValueError(
                f"weight_scheme={weight_scheme!r} scoring needs index_dir "
                "(for term_stats and n_docs)"
            )
        from similaripy_spark.fulltext.index_build import read_term_stats
        from similaripy_spark.fulltext.weights import idf_table

        queries = _attach_idfs(
            queries,
            idf_table(
                read_term_stats(spark, index_dir), int(meta["n_docs"])
            ),
        )
    if shard_ids is None and meta is not None:
        shard_ids = range(int(meta["n_shards"]))
    if shard_ids is None:
        # last resort (bare-DataFrame caller, no index_dir): distinct shard
        # ids are tiny (n_docs / shard_size) but this IS a Spark job —
        # engine-internal paths always pass shard_ids or index_dir.
        shard_ids = [
            r["shard"] for r in segments.select("shard").distinct().collect()
        ]
    shards_list = [int(s) for s in shard_ids]
    shards = spark.createDataFrame([(s,) for s in shards_list], "shard int")
    qcols = (
        ["query_id", "terms"]
        + (["weights"] if query_weighted else [])
        + (["idfs"] if factored and not seg_has_idf else [])
        + (["not_terms"] if "not_terms" in queries.columns else [])
    )
    def make_score_shard(k_emit: int, with_tau: bool):
        def score_shard(
            seg_pdf: pd.DataFrame, q_pdf: pd.DataFrame
        ) -> pd.DataFrame:
            if len(seg_pdf) == 0 or len(q_pdf) == 0:
                return pd.DataFrame(
                    {"query_id": pd.Series(dtype="int64"),
                     "doc_id": pd.Series(dtype="int64"),
                     "score": pd.Series(dtype="float64")}
                )
            dv = None
            if dv_luts:
                from similaripy_spark.fulltext.docvalues import (
                    split_dv_rows,
                )

                seg_pdf, dv = split_dv_rows(seg_pdf, dv_luts)
                if len(seg_pdf) == 0:
                    return pd.DataFrame(
                        {"query_id": pd.Series(dtype="int64"),
                         "doc_id": pd.Series(dtype="int64"),
                         "score": pd.Series(dtype="float64")}
                    )
            if not factored:
                idf = None
            elif seg_has_idf:
                idf = dict(zip(
                    seg_pdf["term"],
                    np.nan_to_num(
                        seg_pdf["idf"].to_numpy(np.float64), nan=0.0
                    ),
                ))
            else:
                idf = _idf_map_from_pdf(q_pdf["terms"], q_pdf["idfs"])
            idx = _ShardIndex(
                seg_pdf, idf=idf, raw=raw_params, tomb=tomb, dv=dv
            )
            if batch:
                return _score_batch(
                    idx, q_pdf, k_emit, query_weighted=query_weighted,
                    tau=(
                        q_pdf["tau"].to_numpy(np.float64)
                        if with_tau else None
                    ),
                    mode=mode, min_match=min_match,
                )
            out_q, out_d, out_s = [], [], []
            for qid, terms in zip(q_pdf["query_id"], q_pdf["terms"]):
                uterms = list(dict.fromkeys(terms))
                if mode == "and":
                    docs, scores = _score_intersect(idx, uterms)
                elif prune:
                    docs, scores = _score_maxscore(idx, uterms, k_emit)
                else:
                    docs, scores = _score_exhaustive(idx, uterms)
                docs, scores = _local_topk(docs, scores, k_emit)
                out_q.extend([qid] * len(docs))
                out_d.extend(docs.tolist())
                out_s.extend(scores.tolist())
            return pd.DataFrame(
                {"query_id": np.asarray(out_q, np.int64),
                 "doc_id": np.asarray(out_d, np.int64),
                 "score": np.asarray(out_s, np.float64)}
            )

        return score_shard

    def sweep(qdf: DataFrame, qdf_cols: list, k_emit: int,
              with_tau: bool, shard_subset: list | None = None) -> DataFrame:
        seg = segments
        sh = shards
        if shard_subset is not None:
            # pass-1 sampling: prune BOTH sides to the sampled shards so
            # the un-sampled shards' segment rows never reach Python
            seg = seg.filter(F.col("shard").isin(shard_subset))
            sh = spark.createDataFrame(
                [(s,) for s in shard_subset], "shard int"
            )
        qx = qdf.select(*qdf_cols).crossJoin(F.broadcast(sh))
        return (
            seg.groupby("shard")
            .cogroup(qx.groupby("shard"))
            .applyInPandas(
                make_score_shard(k_emit, with_tau), schema=_RESULT_SCHEMA
            )
        )

    n_shards = len(shards_list)
    if deep_paging is None:
        deep_paging = batch and k >= DEEP_K_CUTOFF and n_shards >= 8
    k1 = max(32, -(-4 * k // max(n_shards, 1)))
    if deep_paging and k1 < k:
        # Exact two-pass deep paging. The one-pass merge ships
        # n_q × n_shards × k rows into the global top-k — at k=1000 that
        # volume IS the cost (measured 48.5 s vs 12.4 s at k=100, 300k
        # docs). Scoring itself is nearly k-independent (dense accumulator;
        # k only affects selection), so: pass 1 scores with a small
        # per-shard cap k1 ≈ 4k/n_shards (union ≥ 4k real candidates per
        # query), and tau_q = that union's k-th (score DESC, doc_id ASC)
        # — the k-th best of ANY ≥k real docs is a lower bound on the
        # global k-th, so filtering pass 2's emission to score >= tau_q
        # keeps every true top-k row. Pass 2 re-scores with the floor
        # applied INSIDE the kernel (before Arrow serialization), so the
        # big emission never exists. Queries with < k pass-1 candidates
        # get tau = null -> no floor (rare: only when most shards hold
        # < k1 matches). Rank identity vs the one-pass path is pinned in
        # tests/test_retrieve.py.
        # Pass-1 SHARD SAMPLING (round 5): tau only needs SOME ≥k real
        # candidate scores — the k-th best over any shard SUBSET is still
        # a valid lower bound on the global k-th (adding docs can only
        # raise the k-th), so pass 1 sweeps a deterministic stride sample
        # of ~1/4 of the shards at a proportionally larger per-shard cap.
        # The floor it yields is a little weaker (≈ the global 4k-th), so
        # pass 2 emits ~4k rows/query instead of ~k — still nothing next
        # to the k·n_shards one-pass volume — while pass 1 scores 1/4 of
        # the shards. MEASURED (100k Zipf docs, 98 shards, 2000 queries,
        # k=1000, local[8], warm, best-of-2): one-pass 24.1 s; two-pass
        # unsampled 9.5 s; sampled 8.8 s (pass 2's floored sweep dominates
        # the two-pass cost, so the pass-1 cut yields ~7%). Exactness is
        # unchanged (rank-identity pinned in tests/test_retrieve.py);
        # disable with SIMILARIPY_DEEP_SAMPLE=0 or tune the divisor.
        sample_div = int(os.environ.get("SIMILARIPY_DEEP_SAMPLE", "4"))
        if sample_div > 1 and n_shards >= 4 * sample_div:
            p = max(8, n_shards // sample_div)
            stride = max(1, n_shards // p)
            sample_ids = shards_list[::stride][:p]
            k1s = max(32, -(-4 * k // len(sample_ids)))
            cand = sweep(queries, qcols, k1s, with_tau=False,
                         shard_subset=sample_ids)
        else:
            cand = sweep(queries, qcols, k1, with_tau=False)
        cand_topk = top_k(
            cand, k, group="query_id", order_value="score",
            tiebreak="doc_id", keep_rank=True,
        )
        tau_df = cand_topk.filter(F.col("rank") == k).select(
            "query_id", F.col("score").alias("tau")
        )
        q2 = queries.join(tau_df, "query_id", "left")
        local = sweep(q2, qcols + ["tau"], k, with_tau=True)
    else:
        local = sweep(queries, qcols, k, with_tau=False)
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
    n_buckets: int | None = None,
    max_pruned_terms: int = 10_000,
    mode: str = "or",
    scorer: str = "maxscore",
) -> DataFrame:
    """Point-query path over the term-major merged layout: bucket-pruned scan
    of exactly the queried terms' blocks, then one scoring pass per query.

    ``mode='and'``: rarest-first posting-list intersection inside the
    per-query group (every queried term's full posting list is shipped
    there, so the intersection is complete). Query terms absent from the
    index vanish at the blocks⋈terms join, so the query's distinct term
    count is attached BEFORE the join (``nreq``) — a group holding fewer
    distinct terms than nreq returns empty, the strict-AND contract.

    Best when the query batch is small and selective (the blocks of each
    query's terms are shipped to that query's group). For large batches use
    ``segment_topk`` — it amortizes decode per shard instead.

    The partition-pruning ``isin`` literal list requires collecting the
    distinct query terms to the driver; the collect is capped at
    ``max_pruned_terms`` — above the cap the scan degrades to a semi-join
    on the query terms (row-level pruning only, no partition pruning, but
    safe at any batch size).

    ``scorer``: the OR-mode pruning kernel — 'maxscore' (Block-Max
    MaxScore, default: measured ~1.5× faster than BMW on the Zipf corpus
    because unclamped-idf hot terms defeat segment-wise skipping, see
    _score_bmw's measured verdict) or 'bmw' (Block-Max WAND as best-first
    segment scoring). Both are exact; rank identity is pinned in tests.
    ``prune=False`` forces the exhaustive scan.
    """
    import os as _os

    if scorer not in ("bmw", "maxscore"):
        raise ValueError(f"scorer must be 'bmw' or 'maxscore', got {scorer!r}")

    from similaripy_spark.fulltext.index_merge import (
        merged_n_buckets,
        read_merged_for_terms,
    )

    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    if n_buckets is None:
        n_buckets = merged_n_buckets(index_dir)
    qterms = queries.select("query_id", F.explode("terms").alias("term"))
    qn = (
        qterms.groupBy("query_id")
        .agg(F.countDistinct("term").alias("nreq"))
        if mode == "and" else None
    )
    from similaripy_spark.fulltext.index_build import read_meta

    meta = read_meta(index_dir)
    factored = _index_is_factored(index_dir)
    raw_params = None
    if factored:
        if meta.get("weight_scheme") == "raw":
            raw_params = _raw_params_from_meta(meta)
        qterms = qterms.join(_index_idf_table(spark, index_dir), "term",
                             "left")
    tomb = _tomb_for(index_dir, meta)
    dterms = qterms.select("term").distinct()
    term_rows = dterms.limit(max_pruned_terms + 1).collect()
    if len(term_rows) <= max_pruned_terms:
        terms = [r["term"] for r in term_rows]
        blocks = read_merged_for_terms(spark, index_dir, terms, n_buckets)
        joined = blocks.join(F.broadcast(qterms), "term")
    else:
        merged = spark.read.parquet(_os.path.join(index_dir, "merged"))
        blocks = merged.join(dterms, "term", "left_semi")
        joined = blocks.join(qterms, "term")
    if qn is not None:
        joined = joined.join(F.broadcast(qn), "query_id")

    def score_query(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = key[0]
        seg = pdf.drop_duplicates(subset=["term", "shard", "block_id"])
        idf = None
        if "idf" in pdf.columns:
            idf = {
                t: (0.0 if v is None or (isinstance(v, float) and v != v)
                    else float(v))
                for t, v in zip(pdf["term"], pdf["idf"])
            }
        idx = _ShardIndex(seg, idf=idf, raw=raw_params, tomb=tomb)
        uterms = list(dict.fromkeys(pdf["term"]))
        if "nreq" in pdf.columns:
            if len(uterms) < int(pdf["nreq"].iloc[0]):
                return pd.DataFrame(_EMPTY_RESULT)
            docs, scores = _score_intersect(idx, uterms)
        elif prune and scorer == "bmw":
            docs, scores = _score_bmw(idx, uterms, k)
        elif prune:
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


def bucket_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    n_buckets: int | None = None,
    prune: bool = False,
) -> DataFrame:
    """Mid-size-batch path over the term-major merged layout: one cogroup
    per TERM BUCKET (not per shard, not per query).

    BM25 scores are additive over terms, so each bucket scores only the
    postings of ITS query terms into partial (query_id, doc_id, partial)
    sums; a groupBy(query_id, doc_id) merge + top-k finishes the job. Query
    fan-out is the number of distinct buckets a query's terms hash to
    (<= its term count, independent of shard count) — between
    ``term_major_topk`` (ships each query's blocks to a per-query group:
    great for point queries, hot blocks duplicated per query) and
    ``segment_topk`` (replicates the whole batch to every shard: great for
    huge batches). No driver-side term collect anywhere.

    MEASURED VERDICT (50k-doc Zipf corpus, local[8], cached index; see
    ROUND3_NOTES.md): the doc-sharded ``segment_topk`` beats this path at
    every batch size tried (50→1000 queries: 1.5-2.0 s vs 3.8-36.6 s) —
    the additive-partials design emits one row per touched (query, doc)
    pair, so a stopword term referenced by a third of the batch
    materializes ~df partial rows PER QUERY where the shard scorer emits
    only per-shard top-k. Bucket remains the right shape only when the
    whole-index scan of the segment path is the cost that matters (cold,
    selective access over the partition-pruned merged layout) with batches
    too big for per-query term-major groups. Auto-routing therefore no
    longer selects it (retrieve.route); it stays available explicitly.

    ``prune=True`` adds BOUND-THEN-REFINE (exact — ranks AND scores
    identical to the exhaustive scan, adversarially tested). Also a
    measured LOSS on this corpus (pruned 4.7-56.6 s vs exhaustive
    1.3-36.6 s): the unclamped-idf semantics give hot terms large NEGATIVE
    weights that contribute to every returned score, so correctness makes
    them essential and unprunable, while the θ/probe phases add two windows
    and a cogroup of fixed cost; the non-essential mass that remains is the
    cheap mid-tail. Default is therefore prune=False; the operator, its
    exactness proof and its tests are kept because the technique pays off
    in positive-weight regimes (clamped idf / stopword-free vocabularies):

    1. metadata-only lower bound θ_q on the final k-th score: any term t
       with df ≥ k guarantees k docs scoring ≥ min_weight_t + Σ_{t'≠t}
       min(0, min_weight_{t'}) (a doc not containing t' gets 0 ≥ lb_{t'});
       θ_q = the best such guarantee (term_stats only, no decode);
    2. MaxScore-style essential split (Turtle & Flood 1995): order q's
       terms by ub = max(0, max_weight) descending; the maximal suffix with
       Σ ub < θ_q is NON-ESSENTIAL — a doc appearing only there scores
       < θ_q ≤ k-th final, so it can never enter the top-k (strict, so
       doc_id tie-breaks cannot flip it);
    3. only essential postings are decoded + scatter-scored (the expensive
       phase — on Zipfian corpora the hot stopword terms have small ub and
       land in the non-essential suffix, which is exactly the work worth
       skipping);
    4. refine: per query, θ₂ = k-th best partial+Σlb_ne; candidates (those
       with partial+Σub_ne ≥ θ₂) have their non-essential terms PROBED —
       binary-searched in only the posting blocks whose [first_doc,
       max_doc] range overlaps a candidate — restoring exact totals.
    """
    from similaripy_spark.fulltext.index_merge import merged_n_buckets

    if n_buckets is None:
        n_buckets = merged_n_buckets(index_dir)
    merged = spark.read.parquet(os.path.join(index_dir, "merged"))
    qterms = (
        queries.select("query_id", F.explode("terms").alias("term"))
        .distinct()
        .withColumn("bucket", F.crc32(F.col("term")) % n_buckets)
    )
    from similaripy_spark.fulltext.index_build import read_meta

    meta = read_meta(index_dir)
    raw_params = None
    if _index_is_factored(index_dir):
        if meta.get("weight_scheme") == "raw":
            raw_params = _raw_params_from_meta(meta)
        qterms = qterms.join(
            _index_idf_table(spark, index_dir), "term", "left"
        )
    tomb = _tomb_for(index_dir, meta)
    if prune:
        return _bucket_topk_pruned(
            spark, index_dir, merged, qterms, k, n_buckets,
            raw_params=raw_params, tomb=tomb,
        )
    blocks = merged.withColumn(
        "bucket", F.crc32(F.col("term")) % n_buckets
    ).join(qterms.select("term").distinct(), "term", "left_semi")

    partials = (
        qterms.groupby("bucket")
        .cogroup(blocks.groupby("bucket"))
        .applyInPandas(
            _bucket_scorer(raw_params, tomb), schema=_RESULT_SCHEMA
        )
    )
    totals = partials.groupBy("query_id", "doc_id").agg(
        F.sum("score").alias("score")
    )
    out = top_k(
        totals, k, group="query_id", order_value="score", tiebreak="doc_id",
        keep_rank=True,
    )
    return out.select("query_id", "doc_id", "score", "rank")


#: dense-accumulator budget for the bucket scorer: bins per chunk
#: (chunk_queries × distinct docs in bucket); 2^24 float64 bins ≈ 128 MB
_BUCKET_BINS = 1 << 24


def _bucket_scorer(raw: dict | None, tomb=None):
    """Two-positional-arg cogroup wrappers (pyspark counts the function's
    positional parameters to decide whether to pass the group key — a
    default-arg lambda would be handed (key, left, right))."""

    def score(q_pdf: pd.DataFrame, seg_pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_bucket(q_pdf, seg_pdf, raw=raw, tomb=tomb)

    return score


def _bucket_prober(raw: dict | None, tomb=None):
    def probe(p_pdf: pd.DataFrame, seg_pdf: pd.DataFrame) -> pd.DataFrame:
        return _probe_bucket(p_pdf, seg_pdf, raw=raw, tomb=tomb)

    return probe


def _score_bucket(q_pdf: pd.DataFrame, seg_pdf: pd.DataFrame,
                  raw: dict | None = None, tomb=None) -> pd.DataFrame:
    """Exhaustive bucket scorer: decode the bucket's query terms ONCE,
    factorize the bucket's docIDs into a dense local space, then
    scatter-add every (query, term) pair's posting weights with chunked
    ``np.bincount`` — the same SPA pattern as ``_score_batch``. The round-2
    version tiled postings per query and merged with a sort-based
    ``np.unique`` over int64 keys, ~10× slower per byte on hot buckets
    (Zipf stopword terms referenced by a third of the batch). Dense-doc
    factorization also removes the int64 key-wrap hazard of raw corpus
    spans (ADVICE r2)."""
    if q_pdf.empty or seg_pdf.empty:
        return pd.DataFrame(_EMPTY_RESULT)
    idf = None
    if "idf" in q_pdf.columns:
        idf = {
            t: (0.0 if v is None or (isinstance(v, float) and v != v)
                else float(v))
            for t, v in zip(q_pdf["term"], q_pdf["idf"])
        }
    idx = _ShardIndex(seg_pdf, idf=idf, raw=raw, tomb=tomb)
    uterms = list(dict.fromkeys(q_pdf["term"]))
    docs, weights, spans = idx.decode_terms(uterms)
    if len(docs) == 0:
        return pd.DataFrame(_EMPTY_RESULT)
    udocs, dcode = np.unique(docs, return_inverse=True)
    n_ud = len(udocs)

    # incidence: (local query index, term span) pairs, query-major
    q_uniq, q_local_all = np.unique(
        q_pdf["query_id"].to_numpy(np.int64), return_inverse=True
    )
    p_q, p_s, p_e = [], [], []
    for qi, t in zip(q_local_all, q_pdf["term"]):
        se = spans.get(t)
        if se is None:
            continue
        p_q.append(qi)
        p_s.append(se[0])
        p_e.append(se[1])
    if not p_q:
        return pd.DataFrame(_EMPTY_RESULT)
    p_q = np.asarray(p_q, np.int64)
    p_s = np.asarray(p_s, np.int64)
    p_e = np.asarray(p_e, np.int64)
    order = np.argsort(p_q, kind="stable")
    p_q, p_s, p_e = p_q[order], p_s[order], p_e[order]

    chunk_q = max(1, _BUCKET_BINS // max(n_ud, 1))
    n_q = len(q_uniq)
    out = []
    for c0 in range(0, n_q, chunk_q):
        c1 = min(c0 + chunk_q, n_q)
        lo = np.searchsorted(p_q, c0)
        hi = np.searchsorted(p_q, c1)
        if lo == hi:
            continue
        lens = p_e[lo:hi] - p_s[lo:hi]
        nz = lens > 0
        if not nz.any():
            continue
        cq, cs, lens = p_q[lo:hi][nz], p_s[lo:hi][nz], lens[nz]
        ends = np.cumsum(lens)
        arena = (
            np.arange(int(ends[-1]), dtype=np.int64)
            - np.repeat(ends - lens, lens)
            + np.repeat(cs, lens)
        )
        flat = np.repeat((cq - c0) * n_ud, lens) + dcode[arena]
        nbins = (c1 - c0) * n_ud
        S = np.bincount(flat, weights=weights[arena], minlength=nbins)
        matched = np.bincount(flat, minlength=nbins) > 0
        cells = np.flatnonzero(matched)
        out.append(
            pd.DataFrame(
                {
                    "query_id": q_uniq[cells // n_ud + c0],
                    "doc_id": udocs[cells % n_ud],
                    "score": S[cells],
                }
            )
        )
    if not out:
        return pd.DataFrame(_EMPTY_RESULT)
    return pd.concat(out, ignore_index=True)


def _probe_bucket(p_pdf: pd.DataFrame, seg_pdf: pd.DataFrame,
                  raw: dict | None = None, tomb=None) -> pd.DataFrame:
    """Refine phase: for given (query_id, doc_id, term) probe rows, return
    the exact weight contribution of ``term`` to ``doc_id`` where present.
    Decodes ONLY blocks whose [first_doc, max_doc] range overlaps a probed
    doc (binary search on block metadata, then on the decoded list)."""
    if p_pdf.empty or seg_pdf.empty:
        return pd.DataFrame(_EMPTY_RESULT)
    idf = None
    if "idf" in p_pdf.columns:
        idf = {
            t: (0.0 if v is None or (isinstance(v, float) and v != v)
                else float(v))
            for t, v in zip(p_pdf["term"], p_pdf["idf"])
        }
    idx = _ShardIndex(seg_pdf, idf=idf, raw=raw, tomb=tomb)
    out = []
    for t, grp in p_pdf.groupby("term"):
        meta = idx.term_meta(t)
        if meta is None:
            continue
        _, _, firsts, maxds, _ = meta
        g_docs = grp["doc_id"].to_numpy(np.int64)
        need = np.unique(g_docs)
        lo = np.searchsorted(need, firsts, side="left")
        hi = np.searchsorted(need, maxds, side="right")
        mask = hi > lo
        if not mask.any():
            continue
        d, w = idx.decode_blocks(t, block_mask=None if mask.all() else mask)
        if len(d) == 0:
            continue
        pos = np.clip(np.searchsorted(d, g_docs), 0, len(d) - 1)
        hit = d[pos] == g_docs
        if not hit.any():
            continue
        out.append(
            pd.DataFrame(
                {
                    "query_id": grp["query_id"].to_numpy(np.int64)[hit],
                    "doc_id": g_docs[hit],
                    "score": w[pos[hit]],
                }
            )
        )
    if not out:
        return pd.DataFrame(_EMPTY_RESULT)
    return pd.concat(out, ignore_index=True)


def essential_split(spark, index_dir: str, qterms: DataFrame, k: int):
    """Phase 0 of bound-then-refine: classify each (query, term) pair as
    essential / non-essential from term_stats metadata alone. Returns
    qterms + (df, ub, lb, suffix_ub, theta, essential). Exposed for tests
    and diagnostics — the pruning win is exactly the non-essential mass."""
    from pyspark.sql import Window

    from similaripy_spark.fulltext.index_build import (
        read_meta,
        read_term_stats,
    )

    neg_inf = float("-inf")
    ts = read_term_stats(spark, index_dir)
    factored = _index_is_factored(index_dir)
    qterms = qterms.drop("idf")  # derived fresh below; avoids a dup column
    if factored:
        meta = read_meta(index_dir)
        if meta.get("weight_scheme") == "raw":
            # raw bounds were encoded at the pinned bounds_avgdl; the
            # one-sided avgdl-ratio scaling keeps them valid (and
            # conservative) at the current corpus avgdl — stays double
            # so an upper bound is never rounded down
            rp = _raw_params_from_meta(meta)
            r = rp["avgdl"] / rp["bounds_avgdl"]
            up, dn = max(1.0, r), min(1.0, r)
            if r != 1.0:
                # same float32 cross-rounding widening as _ShardIndex
                up *= 1.0 + 1e-6
                dn *= 1.0 - 1e-6
            ts = ts.select(
                "term", "df",
                (F.col("max_weight").cast("double") * up)
                .alias("max_weight"),
                (F.col("min_weight").cast("double") * dn)
                .alias("min_weight"),
            )
        # stored bounds are positive tf-parts; idf-adjust them here so the
        # pruning algebra below is scheme-oblivious (negative idf swaps the
        # extremes, exactly as _ShardIndex.term_meta does per shard)
        ts = ts.join(_index_idf_table(spark, index_dir), "term")
        eff_max = F.when(
            F.col("idf") >= 0, F.col("idf") * F.col("max_weight")
        ).otherwise(F.col("idf") * F.col("min_weight"))
        eff_min = F.when(
            F.col("idf") >= 0, F.col("idf") * F.col("min_weight")
        ).otherwise(F.col("idf") * F.col("max_weight"))
        ts = ts.select(
            "term", "df", "idf",
            eff_max.cast("double").alias("max_weight"),
            eff_min.cast("double").alias("min_weight"),
        )
    qt = qterms.join(ts, "term")  # unhinted: AQE broadcasts when small
    ub = F.greatest(F.col("max_weight").cast("double"), F.lit(0.0))
    lb = F.least(F.col("min_weight").cast("double"), F.lit(0.0))
    qt = qt.select(
        "query_id", "term", "bucket", "df",
        *(["idf"] if factored else []),
        ub.alias("ub"), lb.alias("lb"),
        F.col("min_weight").cast("double").alias("minw"),
    )
    # tombstones: term_stats df counts deleted docs, so the "df ≥ k docs
    # exist" guarantee must be discounted by the WHOLE tombstone count (at
    # worst every deleted doc contained t) — θ stays a valid lower bound
    # on the SURVIVING k-th score, just weaker until compact_index
    n_tomb = 0
    meta_es = read_meta(index_dir)
    if meta_es.get("n_tombstone_epochs"):
        t_arr = _tomb_for(index_dir, meta_es)
        n_tomb = 0 if t_arr is None else len(t_arr)
    # θ_q = max over t with df - n_tomb ≥ k of (minw_t - lb_t) + Σ_all lb
    per_q = qt.groupBy("query_id").agg(
        F.sum("lb").alias("sum_lb"),
        F.max(
            F.when(F.col("df") - n_tomb >= k, F.col("minw") - F.col("lb"))
        ).alias("theta_base"),
    ).select(
        "query_id",
        F.coalesce(
            F.col("theta_base") + F.col("sum_lb"), F.lit(neg_inf)
        ).alias("theta"),
    )
    w_desc = Window.partitionBy("query_id").orderBy(
        F.col("ub").desc(), F.col("term").asc()
    )
    suffix = F.sum("ub").over(
        w_desc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    qt = qt.withColumn("suffix_ub", suffix).join(per_q, "query_id")
    # non-essential = maximal suffix with Σ ub < θ (STRICT — ties at the
    # k-th score must never be pruned). θ and suffix_ub come from separate
    # aggregations over the same rows, and Spark may recompute each branch
    # with a different float addition order — widen the boundary by a
    # relative epsilon (the deep-paging tau pattern) so ULP noise between
    # recomputations can never flip a tied term to non-essential.
    theta_eps = F.col("theta") - (
        F.abs(F.col("theta")) * 1e-9 + F.lit(1e-12)
    )
    return qt.withColumn("essential", F.col("suffix_ub") >= theta_eps)


def _bucket_topk_pruned(
    spark, index_dir: str, merged: DataFrame, qterms: DataFrame, k: int,
    n_buckets: int, raw_params: dict | None = None, tomb=None,
) -> DataFrame:
    """Bound-then-refine (docstring in bucket_topk). All bounds come from
    term_stats (block-metadata-derived, index_build._write_term_stats) and
    are float32-consistent with the stored weights, so every comparison is
    conservative-exact."""
    from pyspark.sql import Window

    neg_inf = float("-inf")
    qt = essential_split(spark, index_dir, qterms, k)
    idf_cols = ["idf"] if "idf" in qt.columns else []

    ess = qt.filter("essential").select(
        "query_id", "term", "bucket", *idf_cols
    )
    ne = qt.filter(~F.col("essential")).select(
        "query_id", "term", "bucket", "ub", "lb", *idf_cols
    )
    bounds_ne = ne.groupBy("query_id").agg(
        F.sum("ub").alias("ub_ne"), F.sum("lb").alias("lb_ne")
    )

    # phase 1: exhaustive scoring of ESSENTIAL postings only. The block
    # side recomputes its bucket column independently (same crc32 % n)
    # rather than joining the query side's — reusing that attribute in a
    # later cogroup would be an ambiguous self-join.
    ess_blocks = merged.join(
        ess.select("term").distinct(), "term", "left_semi"
    ).withColumn("bucket", F.crc32(F.col("term")) % n_buckets)
    partials = (
        ess.groupby("bucket")
        .cogroup(ess_blocks.groupby("bucket"))
        .applyInPandas(
            _bucket_scorer(raw_params, tomb), schema=_RESULT_SCHEMA
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score").alias("p"))
    )

    # phase 2: candidate filter — θ₂ = k-th best (p + Σlb_ne); keep docs
    # with p + Σub_ne ≥ θ₂ (missing bounds row ⇒ no ne terms ⇒ exact)
    scored = partials.join(bounds_ne, "query_id", "left").select(
        "query_id", "doc_id", "p",
        (F.col("p") + F.coalesce(F.col("lb_ne"), F.lit(0.0))).alias("d_lb"),
        (F.col("p") + F.coalesce(F.col("ub_ne"), F.lit(0.0))).alias("d_ub"),
    )
    w_lb = Window.partitionBy("query_id").orderBy(F.col("d_lb").desc())
    theta2 = (
        scored.withColumn("rn", F.row_number().over(w_lb))
        .filter(F.col("rn") == k)
        .select("query_id", F.col("d_lb").alias("theta2"))
    )
    # `scored` is recomputed independently on the theta2 branch and here,
    # and bucket-partial aggregation order is not deterministic across
    # recomputations — the doc DEFINING theta2 can land an ULP below its
    # own bound and vanish. Widen by a relative epsilon (deep-paging tau
    # pattern); extra survivors are exact-probed and sorted out by the
    # final top-k, so exactness is unchanged.
    t2 = F.coalesce(F.col("theta2"), F.lit(neg_inf))
    cand = scored.join(theta2, "query_id", "left").filter(
        F.col("d_ub") >= t2 - (F.abs(t2) * 1e-9 + F.lit(1e-12))
    ).select("query_id", "doc_id", "p")

    # phase 3: probe non-essential terms for the candidates only
    probe_in = cand.select("query_id", "doc_id").join(
        ne.select("query_id", "term", "bucket", *idf_cols), "query_id"
    )
    ne_blocks = merged.join(
        ne.select("term").distinct(), "term", "left_semi"
    ).withColumn("bucket", F.crc32(F.col("term")) % n_buckets)
    probe_partials = (
        probe_in.groupby("bucket")
        .cogroup(ne_blocks.groupby("bucket"))
        .applyInPandas(
            _bucket_prober(raw_params, tomb), schema=_RESULT_SCHEMA
        )
    )

    # phase 4: exact totals for candidates + deterministic top-k
    totals = (
        cand.select("query_id", "doc_id", F.col("p").alias("score"))
        .unionByName(probe_partials)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score").alias("score"))
    )
    out = top_k(
        totals, k, group="query_id", order_value="score", tiebreak="doc_id",
        keep_rank=True,
    )
    return out.select("query_id", "doc_id", "score", "rank")
