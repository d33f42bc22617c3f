"""Phrase retrieval (retrieve.phrase_topk): exact candidate-driven
verification — AND posting-list intersection from the index, token-adjacency
regexp against the pages relation, BM25 scoring, standard tie rule."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from similaripy_spark.fulltext.index_build import IndexBuilder
from similaripy_spark.fulltext.postings import build_postings
from similaripy_spark.fulltext.retrieve import phrase_topk
from similaripy_spark.fulltext.tokenizer import TOKEN_SPLIT_RE, tokenize_expr
from similaripy_spark.fulltext.weights import bm25_weights
from similaripy_spark.operators.topk import top_k
from similaripy_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def corpus(spark):
    pages = generate_pages(
        spark, 1500, vocab_size=300, partitions=8
    ).persist()
    pages.count()
    yield pages
    pages.unpersist()


@pytest.fixture(scope="module")
def index_dir(corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("phrase") / "idx")
    IndexBuilder(d, n_groups=3, shard_size=256).build(corpus)
    return d


def _rows(df):
    return [
        (r.query_id, r.doc_id, round(r.score, 9))
        for r in df.orderBy("query_id", "rank").collect()
    ]


def test_phrase_matches_relational_regex_oracle(spark, corpus, index_dir):
    """Index path == fully relational oracle (AND match-count + the same
    adjacency regexp over the pages text + BM25 sum over distinct terms)."""
    q = corpus.filter(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 2), " "
        ).alias("phrase"),
    )
    got = _rows(phrase_topk(spark, index_dir, corpus, q, k=5))

    qq = q.withColumn("terms", tokenize_expr(F.col("phrase"))).withColumn(
        "pattern",
        F.concat(
            F.lit("(^|" + TOKEN_SPLIT_RE + ")"),
            F.array_join("terms", TOKEN_SPLIT_RE),
            F.lit("($|" + TOKEN_SPLIT_RE + ")"),
        ),
    )
    w = bm25_weights(build_postings(corpus))
    qt = qq.select("query_id", F.explode("terms").alias("term")).distinct()
    qn = qt.groupBy("query_id").agg(F.countDistinct("term").alias("nreq"))
    sc = (
        qt.join(w, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("weight").alias("score"),
             F.countDistinct("term").alias("nm"))
        .join(qn, "query_id")
        .filter("nm = nreq")
    )
    ver = (
        sc.join(qq.select("query_id", "pattern"), "query_id")
        .join(corpus.select("doc_id", F.lower("text").alias("lt")),
              "doc_id")
        .filter(F.regexp_like(F.col("lt"), F.col("pattern")))
    )
    want = _rows(top_k(
        ver.select("query_id", "doc_id", "score"), 5, group="query_id",
        order_value="score", tiebreak="doc_id", keep_rank=True,
    ))
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    assert np.allclose([s for *_, s in got], [s for *_, s in want],
                       rtol=1e-4)
    assert len(got) > 0


def test_phrase_requires_adjacency_in_order(spark, tmp_path):
    """Co-occurrence without adjacency (or in the wrong order) must not
    match; punctuation separates tokens exactly like the build tokenizer."""
    pages = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),      # "alpha beta" adjacent
            (1, "beta alpha gamma"),      # reversed — no match
            (2, "alpha gamma beta"),      # co-occur, not adjacent
            (3, "xx Alpha, BETA! yy"),    # adjacent across punctuation
            (4, "alphabet a beta"),       # token boundary: no match
        ],
        "doc_id long, text string",
    )
    d = str(tmp_path / "idx")
    IndexBuilder(d, n_groups=1, shard_size=16).build(pages)
    q = spark.createDataFrame(
        [(0, "alpha beta")], "query_id long, phrase string"
    )
    got = sorted(
        r.doc_id for r in phrase_topk(spark, d, pages, q, k=10).collect()
    )
    assert got == [0, 3]


def test_single_term_phrase_is_containment(spark, tmp_path):
    pages = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "the alphabet")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "idx")
    IndexBuilder(d, n_groups=1, shard_size=16).build(pages)
    q = spark.createDataFrame(
        [(0, "alpha")], "query_id long, phrase string"
    )
    got = sorted(
        r.doc_id for r in phrase_topk(spark, d, pages, q, k=10).collect()
    )
    assert got == [0]  # 'alphabet' is a different token


def test_empty_phrase_returns_nothing(spark, corpus, index_dir):
    q = corpus.sparkSession.createDataFrame(
        [(0, "!!! ...")], "query_id long, phrase string"
    )
    assert phrase_topk(spark, index_dir, corpus, q, k=5).count() == 0


def test_phrase_respects_tombstones(spark, tmp_path):
    from similaripy_spark.fulltext.delete import delete_docs

    pages = spark.createDataFrame(
        [(0, "alpha beta one"), (1, "alpha beta two"), (2, "other text")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "idx")
    IndexBuilder(d, n_groups=1, shard_size=16).build(pages)
    delete_docs(spark, d, [0])
    q = spark.createDataFrame(
        [(0, "alpha beta")], "query_id long, phrase string"
    )
    got = sorted(
        r.doc_id for r in phrase_topk(spark, d, pages, q, k=10).collect()
    )
    assert got == [1]


def test_phrase_through_handle(spark, corpus, index_dir):
    from similaripy_spark.fulltext.retrieve import open_index

    q = corpus.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 2), " "
        ).alias("phrase"),
    )
    with open_index(spark, index_dir, cache=False) as h:
        got = _rows(h.phrase_topk(corpus, q, k=5))
    want = _rows(phrase_topk(spark, index_dir, corpus, q, k=5))
    assert got == want and len(got) > 0
