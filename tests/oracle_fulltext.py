"""Pure-Python BM25 search oracle over a token corpus — literal
implementation of the reference contract (SURVEY.md §2.3 /
normalization.pyx:260-334) + deterministic top-k (score DESC, doc ASC)."""

from __future__ import annotations

import math
import re
from collections import Counter

TOKEN_RE = re.compile(r"[^a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return [t for t in TOKEN_RE.split(text.lower()) if t]


def build_index(texts: dict[int, str]):
    """texts: doc_id → text. Returns (postings, dl, df, n_docs, avgdl)."""
    postings: dict[str, dict[int, int]] = {}
    dl: dict[int, int] = {}
    for doc, text in texts.items():
        toks = tokenize(text)
        dl[doc] = len(toks)
        for term, tf in Counter(toks).items():
            postings.setdefault(term, {})[doc] = tf
    n_docs = len(texts)
    avgdl = sum(dl.values()) / n_docs if n_docs else 0.0
    df = {t: len(d) for t, d in postings.items()}
    return postings, dl, df, n_docs, avgdl


def bm25_weight(tf, dl, df, n_docs, avgdl, k1=1.2, b=0.75, delta=0.0):
    idf = math.log((n_docs - df + 0.5) / (df + 0.5))
    norm_dl = (1.0 - b) + b * dl / avgdl
    return idf * (tf * (k1 + 1.0) / (tf + k1 * norm_dl) + delta)


def search(index, query_terms: list[str], k: int = 10, k1=1.2, b=0.75):
    """→ [(rank, doc_id, score)]; ties broken by doc_id ascending."""
    postings, dl, df, n_docs, avgdl = index
    scores: dict[int, float] = {}
    for term in set(query_terms):
        if term not in postings:
            continue
        for doc, tf in postings[term].items():
            w = bm25_weight(tf, dl[doc], df[term], n_docs, avgdl, k1, b)
            scores[doc] = scores.get(doc, 0.0) + w
    ranked = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]
    return [(r + 1, doc, s) for r, (doc, s) in enumerate(ranked)]
