"""Query-string surface (fulltext/querylang.py): grammar + composition.

Contract (module docstring): conjunctive Lucene-flavored grammar — ranked
terms, -term MUST_NOT, "phrase" constraints, field:v / field:[lo TO hi]
doc-values filters. Phrase-free strings must be EXACTLY the kernel path
(same rows as topk with not_terms + filter); phrase strings compose the
positional match sets with exact relational re-scoring against the
whole-corpus BM25 twin.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from similaripy_spark.fulltext.docvalues import (
    build_docvalues,
    filter_docs,
)
from similaripy_spark.fulltext.index_build import IndexBuilder
from similaripy_spark.fulltext.positional import build_positions
from similaripy_spark.fulltext.postings import build_postings
from similaripy_spark.fulltext.querylang import parse_query, search
from similaripy_spark.fulltext.retrieve import open_index
from similaripy_spark.fulltext.tokenizer import TOKEN_SPLIT_RE
from similaripy_spark.fulltext.weights import bm25_weights
from similaripy_spark.operators.topk import top_k
from similaripy_spark.sources.pages import generate_pages

N_DOCS = 1200


# --------------------------- grammar ---------------------------------


def test_parse_terms_not_phrase_filters():
    p = parse_query('foo Bar -baz "Alpha beta" lang:en,de n:[10 TO 20]')
    assert p["terms"] == ["foo", "bar"]
    assert p["not_terms"] == ["baz"]
    assert p["phrases"] == [["alpha", "beta"]]
    assert p["filters"] == {"lang": ["en", "de"], "n": (10, 20)}


def test_parse_edges():
    # multi-token bare/negated tokens split under the build tokenizer
    p = parse_query("foo.bar -x.y")
    assert p["terms"] == ["foo", "bar"] and p["not_terms"] == ["x", "y"]
    # open range ends; ISO bounds pass through as strings
    p = parse_query("t ts:[* TO 2026-01-01]")
    assert p["filters"]["ts"] == (None, "2026-01-01")
    # digit-leading tokens are terms, not filters
    assert parse_query("12:30")["terms"] == ["12", "30"]
    # empty phrase ignored; empty query → nothing
    assert parse_query('"" ')["phrases"] == []
    assert parse_query("")["terms"] == []
    with pytest.raises(ValueError):
        parse_query("-lang:en")
    with pytest.raises(ValueError):
        parse_query("-n:[1 TO 2]")


def test_parse_repeated_clauses_narrow():
    """Repeated clauses on one field INTERSECT — every clause narrows
    (Lucene MUST semantics), never silently replaces."""
    assert parse_query("lang:en,de lang:de,fr")["filters"] == {
        "lang": ["de"]
    }
    assert parse_query("n:[10 TO 30] n:[20 TO 40]")["filters"] == {
        "n": (20, 30)
    }
    # open ends tighten one side only; ISO/int bounds compare coerced
    assert parse_query("n:[10 TO *] n:[* TO 40]")["filters"] == {
        "n": (10, 40)
    }
    # empty intersection is a valid (matches-nothing) narrowing
    assert parse_query("lang:en lang:fr")["filters"] == {"lang": []}
    with pytest.raises(ValueError, match="one kind"):
        parse_query("x:a x:[1 TO 2]")


# --------------------------- execution -------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    pages = generate_pages(
        spark, N_DOCS, vocab_size=300, partitions=8
    ).persist()
    pages.count()
    yield pages
    pages.unpersist()


@pytest.fixture(scope="module")
def indexed(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qs") / "idx")
    IndexBuilder(d, n_groups=2, shard_size=256).build(corpus)
    build_docvalues(corpus, d, ["lang", ("warc_ts", "numeric")])
    build_positions(corpus, d)
    return d


def _rows(df):
    return [
        (r.query_id, r.doc_id, round(r.score, 9))
        for r in df.orderBy("query_id", "rank").collect()
    ]


def _doc_tokens(corpus, doc_id, lo, hi):
    row = corpus.filter(F.col("doc_id") == doc_id).select("text").first()
    return row["text"].split(" ")[lo:hi]


def test_kernel_path_equals_topk(spark, corpus, indexed):
    t = _doc_tokens(corpus, 7, 0, 5)
    qs = f"{t[0]} {t[1]} {t[2]} -{t[3]} lang:en"
    got = _rows(search(spark, indexed, qs, k=5))
    handle = open_index(spark, indexed, cache=False)
    qdf = spark.createDataFrame(
        [(0, t[:3], [t[3]])],
        "query_id long, terms array<string>, not_terms array<string>",
    )
    want = _rows(handle.topk(qdf, k=5, filter={"lang": ["en"]}))
    assert got == want
    assert len(got) > 0


def test_phrase_composition_vs_relational_twin(spark, corpus, indexed):
    t = _doc_tokens(corpus, 30, 0, 4)
    # NOT term absent from the phrase's source doc, so at least that doc
    # survives the exclusion (a NOT term drawn from the same doc empties
    # the result — both engine and twin agreed on empty in testing)
    own = set(_doc_tokens(corpus, 30, 0, 10_000))
    neg = next(
        tok for tok in _doc_tokens(corpus, 31, 0, 10_000)
        if tok not in own
    )
    qs = f'"{t[0]} {t[1]}" {t[2]} -{neg}'
    got = _rows(search(spark, indexed, qs, k=8))
    # twin: phrase-adjacency regexp on the raw text, NOT anti-join,
    # BM25 over the distinct ranked terms via the whole-corpus weights
    pat = f"(^|{TOKEN_SPLIT_RE}){t[0]}{TOKEN_SPLIT_RE}{t[1]}($|{TOKEN_SPLIT_RE})"
    match = corpus.filter(
        F.regexp_like(F.lower("text"), F.lit(pat))
    ).select("doc_id")
    posts = build_postings(corpus)
    bad = posts.filter(F.col("term") == neg).select("doc_id").distinct()
    keep = match.join(bad, "doc_id", "left_anti")
    ranked = list(dict.fromkeys(t[:3]))
    w = bm25_weights(posts).filter(F.col("term").isin(ranked))
    scored = (
        w.join(keep, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.sum("weight").alias("score"))
        .select(F.lit(0).cast("long").alias("query_id"), "doc_id", "score")
    )
    want = _rows(
        top_k(scored, 8, group="query_id", order_value="score",
              tiebreak="doc_id", keep_rank=True)
    )
    assert [(q, d) for q, d, _ in got] == [(q, d) for q, d, _ in want]
    assert np.allclose(
        [s for _, _, s in got], [s for _, _, s in want], rtol=1e-9
    )
    assert len(got) > 0


def test_phrase_with_filter(spark, corpus, indexed):
    t = _doc_tokens(corpus, 60, 0, 2)
    qs = f'"{t[0]} {t[1]}" lang:en'
    got = _rows(search(spark, indexed, qs, k=10))
    en = {
        r.doc_id
        for r in corpus.filter("lang = 'en'").select("doc_id").collect()
    }
    assert got and all(d in en for _, d, _ in got)
    # the unfiltered phrase result over 'xx' docs must be disjoint
    got_xx = _rows(search(spark, indexed, f'"{t[0]} {t[1]}" lang:xx', k=10))
    assert not ({d for _, d, _ in got} & {d for _, d, _ in got_xx})


def test_filter_only_and_empty_queries(spark, indexed):
    assert search(spark, indexed, "lang:en", k=5).count() == 0
    assert search(spark, indexed, "", k=5).count() == 0


def test_filter_docs_parity(spark, corpus, indexed):
    docs = corpus.select("doc_id")
    got = {
        r.doc_id
        for r in filter_docs(
            spark, docs, indexed, {"lang": ["xx"]}
        ).collect()
    }
    want = {
        r.doc_id
        for r in corpus.filter("lang = 'xx'").select("doc_id").collect()
    }
    assert got == want
    lo, hi = [
        int(corpus.selectExpr(
            f"percentile(unix_micros(warc_ts), {p})"
        ).first()[0])
        for p in (0.3, 0.6)
    ]
    got = {
        r.doc_id
        for r in filter_docs(
            spark, docs, indexed, {"warc_ts": (lo, hi)}
        ).collect()
    }
    want = {
        r.doc_id
        for r in corpus.filter(
            (F.unix_micros("warc_ts") >= lo)
            & (F.unix_micros("warc_ts") <= hi)
        ).select("doc_id").collect()
    }
    assert got == want


def test_handle_search_method(spark, corpus, indexed):
    t = _doc_tokens(corpus, 7, 0, 2)
    with open_index(spark, indexed, cache=False) as h:
        a = _rows(h.search(f"{t[0]} {t[1]}", k=5))
        b = _rows(search(spark, indexed, f"{t[0]} {t[1]}", k=5))
    assert a == b and len(a) > 0
