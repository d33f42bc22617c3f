"""Aligned-input index build: the no-shuffle fast path.

When the source already co-locates complete shards per partition (a crawl
table stored with Iceberg bucket/range partitioning on the doc id), the
build runs with NO wide exchange of the postings stream. These tests pin:
segment-level parity with the shuffle path, the absence of the exchange in
the physical plan, and that a violated layout contract fails the build
instead of publishing corrupt posting lists.
"""

from __future__ import annotations

import os

import pytest

from similaripy_spark.fulltext.index_build import IndexBuilder, read_segments
from similaripy_spark.fulltext.wand import segment_topk
from similaripy_spark.sources.pages import generate_pages, generate_queries_pandas

N_DOCS, VOCAB, SHARD = 3000, 900, 512


def _seg_pdf(spark, d):
    return (
        read_segments(spark, d)
        .orderBy("shard", "term", "block_id")
        .toPandas()
        .reset_index(drop=True)
    )


def test_aligned_build_parity_and_plan(spark, tmp_path):
    d_al, d_sh = str(tmp_path / "al"), str(tmp_path / "sh")
    aligned_pages = generate_pages(
        spark, N_DOCS, vocab_size=VOCAB, align_to=SHARD
    )
    b = IndexBuilder(d_al, shard_size=SHARD, n_groups=3,
                     input_layout="aligned")
    b.build(aligned_pages)

    IndexBuilder(d_sh, shard_size=SHARD, n_groups=3).build(
        generate_pages(spark, N_DOCS, vocab_size=VOCAB)
    )
    # identical physical segments, byte for byte (same blocks, same codec
    # payloads) — the two paths differ only in HOW rows reached the encoder
    pa, ps = _seg_pdf(spark, d_al), _seg_pdf(spark, d_sh)
    assert pa.equals(ps)

    # plan (factored scheme, the default): the aligned segment job has NO
    # exchange of ANY kind — not even a broadcast. The weighting is the
    # doc-local tf-part only (no term-stats join), so the one web-scale
    # caveat the prod scheme carried (vocabulary must fit in memory for
    # the forced broadcast) is gone.
    from similaripy_spark.fulltext.postings import build_postings
    from similaripy_spark.fulltext.weights import bm25_tf_part, bm25_weights
    from pyspark.sql import functions as F

    w = bm25_tf_part(
        build_postings(aligned_pages), avgdl=120.0
    ).withColumn("shard", (F.col("doc_id") / SHARD).cast("int"))
    plan = b._segment_plan(w, 6)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Broadcast" not in plan

    # legacy prod scheme: the stats join stays broadcast (never a stream
    # re-hash) and nothing above it repartitions the postings
    wp = bm25_weights(
        build_postings(aligned_pages), n_docs=N_DOCS, avgdl=120.0,
        broadcast_stats=True,
    ).withColumn("shard", (F.col("doc_id") / SHARD).cast("int"))
    plan_p = b._segment_plan(wp, 6)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shard" not in plan_p
    assert "Exchange" not in plan_p.split("BroadcastExchange")[0].split(
        "BroadcastHashJoin"
    )[0]  # nothing above the join repartitions the stream


def test_aligned_query_parity(spark, tmp_path):
    d = str(tmp_path / "alq")
    IndexBuilder(d, shard_size=SHARD, n_groups=2,
                 input_layout="aligned").build(
        generate_pages(spark, N_DOCS, vocab_size=VOCAB, align_to=SHARD)
    )
    q = spark.createDataFrame(generate_queries_pandas(30, vocab_size=VOCAB))
    from similaripy_spark.fulltext.retrieve import topk

    got = topk(spark, d, q, k=10).orderBy("query_id", "rank").toPandas()
    assert len(got) == 300


def test_misaligned_input_fails_commit(spark, tmp_path):
    d = str(tmp_path / "bad")
    # partitions straddle shard boundaries (equal ranges of N/8=375 docs,
    # shard 512): the duplicate-block guard must fail the build
    bad_pages = generate_pages(spark, N_DOCS, vocab_size=VOCAB, partitions=8)
    with pytest.raises(ValueError, match="aligned.*contract violated"):
        IndexBuilder(d, shard_size=SHARD, n_groups=2,
                     input_layout="aligned").build(bad_pages)
    # nothing half-published: no committed groups
    assert IndexBuilder(d, shard_size=SHARD, n_groups=2).committed_groups() \
        == set()


def test_generator_alignment_is_byte_identical(spark):
    a = generate_pages(spark, 700, vocab_size=300, align_to=256).orderBy(
        "doc_id").toPandas()
    b = generate_pages(spark, 700, vocab_size=300).orderBy("doc_id").toPandas()
    assert a.equals(b)


def test_input_layout_validation(tmp_path):
    with pytest.raises(ValueError, match="input_layout"):
        IndexBuilder(str(tmp_path / "x"), input_layout="bogus")
