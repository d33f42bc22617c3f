"""Dense NumPy oracle — literal transcription of the reference's kernel
semantics (similaripy/cython_code/normalization.pyx, s_plus.h), used the same
way the reference's own tests use pure scipy reimplementations
(tests/test_similarity.py:32-209, test_normalization.py:12-96).

Everything operates on dense float64 arrays where position (i, j) == long-form
cell (row=i, col=j); a stored zero never exists (the engine eliminates zeros,
so oracle masks are ``X != 0``).
"""

from __future__ import annotations

import math

import numpy as np


# --- normalization kernels (normalization.pyx) -----------------------------

def norm_scale(X: np.ndarray, norm: str, axis: int = 1) -> np.ndarray:
    """l1/l2/max with the kernels' skip rules (pyx:97-197)."""
    X = np.array(X, dtype=np.float64)
    if axis == 0:
        return norm_scale(X.T, norm, 1).T
    out = X.copy()
    for i in range(X.shape[0]):
        row = X[i]
        if norm == "l1":
            d = np.abs(row).sum()
            if d != 0:
                out[i] = row / d
        elif norm == "l2":
            d = math.sqrt((row * row).sum())
            if d != 0:
                out[i] = row / d
        elif norm == "max":
            d = row.max() if row.size else 0.0
            if d > 0:
                out[i] = row / d
        else:
            raise ValueError(norm)
    return out


def tf_np(freq, doc_len, mode, logbase):
    if mode == "binary":
        return 1.0 if freq != 0 else 0.0
    if mode == "raw":
        return freq
    if mode == "sqrt":
        return math.sqrt(freq)
    if mode == "freq":
        return freq / doc_len
    if mode == "log":
        return math.log(1 + freq) / math.log(logbase)
    raise ValueError(mode)


def idf_np(df, n_docs, mode, logbase):
    lb = math.log(logbase)
    if mode == "unary":
        return 1.0
    if mode == "base":
        return math.log(n_docs / df) / lb
    if mode == "smooth":
        return math.log(n_docs / (1 + df)) / lb
    if mode == "prob":
        return math.log((n_docs - df) / df) / lb
    if mode == "bm25":
        return math.log((n_docs - df + 0.5) / (df + 0.5)) / lb
    raise ValueError(mode)


def _doc_term_stats(X):
    dl = X.sum(axis=1)  # sum of values (pyx:311-312)
    df = (X > 0).sum(axis=0).astype(np.float64)  # strictly positive (pyx:313-314)
    return dl, df


def tfidf_np(X, axis=1, logbase=math.e, tf_mode="sqrt", idf_mode="smooth"):
    """normalization.pyx:200-257."""
    X = np.array(X, dtype=np.float64)
    if axis == 0:
        return tfidf_np(X.T, 1, logbase, tf_mode, idf_mode).T
    n_docs = X.shape[0]
    dl, df = _doc_term_stats(X)
    out = np.zeros_like(X)
    for i in range(X.shape[0]):
        for j in range(X.shape[1]):
            if X[i, j] != 0:
                out[i, j] = tf_np(X[i, j], dl[i], tf_mode, logbase) * (
                    idf_np(df[j], n_docs, idf_mode, logbase) if df[j] != 0 else 0.0
                )
    return out


def bm25plus_np(X, axis=1, k1=1.2, b=0.75, delta=1.0, tf_mode="raw",
                idf_mode="bm25", logbase=math.e):
    """normalization.pyx:260-334 (bm25 == delta=0, normalization.py:116-149)."""
    X = np.array(X, dtype=np.float64)
    if axis == 0:
        return bm25plus_np(X.T, 1, k1, b, delta, tf_mode, idf_mode, logbase).T
    n_docs = X.shape[0]
    dl, df = _doc_term_stats(X)
    avgdl = dl.sum() / n_docs  # over ALL rows incl. empty (pyx:315, 323)
    norm_dl = (1.0 - b) + b * dl / avgdl  # pyx:326-327
    out = np.zeros_like(X)
    for i in range(X.shape[0]):
        for j in range(X.shape[1]):
            if X[i, j] != 0:
                tf_ = tf_np(X[i, j], dl[i], tf_mode, logbase)
                idf_ = idf_np(df[j], n_docs, idf_mode, logbase) if df[j] != 0 else 0.0
                out[i, j] = idf_ * (tf_ * (k1 + 1.0) / (tf_ + k1 * norm_dl[i]) + delta)
    return out


# --- s_plus kernel (s_plus.h:129-156) ---------------------------------------

def s_plus_np(X1, X2, *, l1=0.0, l2=0.0, l3=0.0, t1=1.0, t2=1.0,
              c1=0.5, c2=0.5, pop1="none", pop2="none", p1=0.0, p2=0.0,
              alpha=1.0, shrink=0.0, shrink_type="stabilized",
              threshold=0.0, binary=False):
    """Dense score matrix BEFORE top-k; threshold + zero-drop applied by
    leaving failing cells at exactly 0 (callers treat 0 as absent)."""
    X1 = np.array(X1, dtype=np.float64)
    X2 = np.array(X2, dtype=np.float64)
    if binary:
        X1 = (X1 != 0).astype(np.float64)
        X2 = (X2 != 0).astype(np.float64)
    h_stab = h_bayes = h_add = 0.0
    if shrink_type == "stabilized":
        h_stab = shrink
    elif shrink_type == "bayesian":
        h_bayes = shrink
    elif shrink_type == "additive":
        h_add = shrink

    xy = X1 @ X2
    xsq = (X1 * X1).sum(axis=1)  # s_plus_utils.pyx:169-201
    ysq = (X2 * X2).sum(axis=0)

    if isinstance(pop1, np.ndarray):
        xdep = np.power(pop1.astype(np.float64), p1)
    elif pop1 == "sum":
        xdep = np.power(X1.sum(axis=1), p1)
    else:
        xdep = np.ones(X1.shape[0])
    if isinstance(pop2, np.ndarray):
        ydep = np.power(pop2.astype(np.float64), p2)
    elif pop2 == "sum":
        ydep = np.power(X2.sum(axis=0), p2)
    else:
        ydep = np.ones(X2.shape[1])

    out = np.zeros_like(xy)
    has_denom = l1 != 0 or l2 != 0 or l3 != 0 or h_stab != 0 or h_bayes != 0
    for i in range(xy.shape[0]):
        for j in range(xy.shape[1]):
            v = xy[i, j]
            if v == 0:
                continue  # the sparse accumulator never visits this cell
            raw = v
            num = v ** alpha if alpha != 1.0 else v
            if has_denom:
                denom = h_stab
                if l1 != 0:
                    denom += l1 * (t1 * (xsq[i] - raw) + t2 * (ysq[j] - raw) + raw)
                if l2 != 0:
                    denom += l2 * ((xsq[i] + h_add) ** c1) * ((ysq[j] + h_add) ** c2)
                if l3 != 0:
                    denom += l3 * xdep[i] * ydep[j]
                val = num / denom if denom != 0 else 0.0
                if h_bayes != 0:
                    val = val * (num / (num + h_bayes))
            else:
                val = raw
            if val >= threshold and val != 0:
                out[i, j] = val
    return out


def topk_np(S: np.ndarray, k: int):
    """Deterministic top-k per row: ORDER BY score DESC, col ASC; zero cells
    are absent. Returns {row: [(col, score), ...]}."""
    res = {}
    for i in range(S.shape[0]):
        cols = np.nonzero(S[i])[0]
        if cols.size == 0:
            continue
        vals = S[i, cols]
        order = np.lexsort((cols, -vals))[:k]
        res[i] = [(int(cols[o]), float(vals[o])) for o in order]
    return res
